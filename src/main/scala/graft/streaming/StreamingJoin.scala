package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM–STREAM event-time join — the last Structured
  * Streaming primitive family without an engine exercise (r15
  * verdict item 1). Reference analog: the collector correlates its
  * JSONL intake with the server's live event stream
  * (`collector.clj:55-74` consuming `http.clj:99-100`) — two live
  * feeds matched on key and time proximity. The engine form is the
  * classic ATTRIBUTION join: each `click` matches the same user's
  * `view`s in the preceding window (view_ts ∈ [click_ts − W,
  * click_ts]).
  *
  * One shared join tail ([[attach]]) is consumed by BOTH the ○ batch
  * query (`q_join_interval`, hash-checked against DuckDB) and the
  * streaming form ([[joined]]), so the two cannot drift — the
  * StreamingIvf/PplBand discipline. The streaming form adds ONLY the
  * watermarks.
  *
  * Exactly-once equivalence (StreamingJoinSpec pins it): with each
  * input arriving in event-time order, stream ≡ batch for ANY
  * watermark delay ≥ 0. State eviction uses the PREVIOUS batch's
  * watermark, and a view is evicted only when
  * `view_ts + W < watermark ≤ all future click_ts` — so every
  * evicted row's matches are already emitted, and no in-order row
  * ever arrives behind the watermark. Disorder within a micro-batch
  * is harmless (watermarks advance at batch boundaries).
  *
  * Scale stance (100 TB / unbounded streams): join state is the
  * WINDOW, not the stream — each side retains only rows with
  * `ts + W + delay` past the current watermark, i.e. (window +
  * delay) × arrival-rate rows, partitioned by user_id across
  * executors like any stream-stream join (state store per
  * partition). The interval condition rides the user_id equi-join as
  * a state-pruning bound, never a theta join. A stalled source
  * stalls the GLOBAL watermark (min across inputs) — state then
  * grows with the healthy source's rate until the laggard resumes,
  * which is the documented Structured Streaming contract, not an
  * engine defect. */
object StreamingJoin {

  /** Attribution window (hours): views this far before a click are
    * credited to it. Shared by the batch query and the twin. */
  val WindowHours = 6

  /** clicks side of the join, projected and renamed (event_id →
    * click_id, ts → click_ts). */
  def clicksOf(events: DataFrame): DataFrame =
    events.where(col("event_type") === "click")
      .select(col("event_id").cast("long").as("click_id"),
        col("user_id").cast("long").as("user_id"),
        col("ts").as("click_ts"))

  /** views side of the join (user_id renamed so the join condition
    * is unambiguous in the self-derived batch form). */
  def viewsOf(events: DataFrame): DataFrame =
    events.where(col("event_type") === "view")
      .select(col("event_id").cast("long").as("view_id"),
        col("user_id").cast("long").as("v_user_id"),
        col("ts").as("view_ts"))

  /** The SHARED interval-join tail: user equi-key + the event-time
    * band. In batch this plans as a hash/SMJ equi-join with the band
    * as a post-probe filter (the `q_join_range` shape); in streaming
    * the SAME condition is what lets Spark derive state-cleanup
    * bounds for both sides. Output is unordered — the ○ queries add
    * their presentation sort, the stream never sorts.
    *
    * `joinType` "left_outer" is the AUDIT form: every click emits,
    * unattributed ones with a NULL view side. In streaming the outer
    * row for an unmatched click emits only once the watermark proves
    * no in-window view can still arrive — the late-data semantics
    * StreamingJoinSpec pins (inner rows at match time, null rows
    * after the watermark passes the click's window).
    *
    * `joinType` "full_outer" (round 17) is the INVENTORY form: both
    * null classes emit — unattributed clicks (null view side) AND
    * unclicked views (null click side, the wasted-impression
    * measurement). The output user key is `coalesce` of the two
    * sides so a view-only row still carries its user — identical to
    * the clicks-side key for inner/left (both present / left always
    * present), so the shared tail stays ONE expression for all three
    * forms. In streaming each null class is watermark-gated from its
    * own side: a click's null row waits for the watermark to pass
    * `click_ts` (no earlier view can arrive), a view's null row
    * waits for it to pass `view_ts + window` (no later click can
    * still claim the view). */
  def attach(clicks: DataFrame, views: DataFrame,
      windowHours: Int = WindowHours,
      joinType: String = "inner"): DataFrame =
    clicks.join(views,
        col("user_id") === col("v_user_id") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $windowHours HOURS"),
        joinType)
      .select(col("click_id"), col("view_id"),
        coalesce(col("user_id"), col("v_user_id")).as("user_id"),
        col("click_ts"), col("view_ts"))

  /** The streaming form: watermark BOTH event streams, then the
    * shared tail. `clickEvents` / `viewEvents` are raw event frames
    * (event_id, user_id, ts, event_type) — the type filters live in
    * [[clicksOf]]/[[viewsOf]] so batch and stream filter
    * identically. */
  def joined(clickEvents: DataFrame, viewEvents: DataFrame,
      windowHours: Int = WindowHours,
      delay: String = "1 minute",
      joinType: String = "inner"): DataFrame =
    attach(
      clicksOf(clickEvents).withWatermark("click_ts", delay),
      viewsOf(viewEvents).withWatermark("view_ts", delay),
      windowHours, joinType)
}
