package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-conversion funnel — the stateful twin of
  * `q_funnel` (r17 verdict item 3): users' first-anchor chain
  * (t1 = first signup, t2 = first click at/after t1, t3 = first
  * purchase at/after t2) maintained live as events stream in, with
  * the funnel report swept from the accumulated per-user marks by the
  * batch aggregation.
  *
  * State per user is O(1) — three anchor timestamps plus two
  * equal-timestamp tie flags — which is what keeps the operator
  * user-cardinality (the `flatMapGroupsWithState` form the batch
  * query's per-user `min` chain demands; an aggregation-per-stage
  * twin would need three cascaded stateful joins).
  *
  * Ordering contract: the [[StreamingSessionizer]] contract — events
  * arrive in `(ts, event_id)` order within each user across
  * micro-batches (within a batch the group is sorted here). Under it
  * each anchor is set exactly once... EXCEPT at equal timestamps: the
  * batch rule is pure `ts >=` comparison, so a click in an EARLIER
  * batch at exactly the timestamp where a later signup lands still
  * qualifies as t2 (and likewise purchase at t2). The state carries
  * two flags — "a click/purchase was seen at the current (maximal)
  * timestamp" — which is the entire residue the ordering leaves
  * unresolved: anything strictly older can never satisfy `ts >=` a
  * strictly newer anchor. StreamingFunnelRetentionSpec pins the swept
  * report ≡ `q_funnel` on the real events table and on an adversarial
  * equal-timestamp fixture split across batches at the tie.
  *
  * Scale stance: state is user-cardinality × O(1); emission is one
  * (user, reached) row per user per batch in Update mode (monotone
  * `reached`, so any replay or restart folds away under the sweep's
  * max); the sweep is a |users|-row aggregation. */
object StreamingFunnel {

  private val Unset = Long.MinValue

  /** (t1, t2, t3) anchor micros ([[Unset]] = not reached), the
    * maximal seen timestamp, and the equal-timestamp tie flags. */
  case class FunnelState(t1: Long, t2: Long, t3: Long,
      curTs: Long, clickAtCur: Boolean, purchAtCur: Boolean)

  case class FunnelMark(user_id: Long, reached: Int)

  /** events: (user_id, event_id, event_type, tsMicros). Emits each
    * touched user's current funnel depth (Update mode downstream). */
  def marks(spark: SparkSession,
      events: Dataset[(Long, Long, String, Long)]): Dataset[FunnelMark] = {
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[(Long, Long, String, Long)],
            state: GroupState[FunnelState]) => {
          val sorted = it.toSeq
            .sortBy { case (_, eventId, _, ts) => (ts, eventId) }
          var st = state.getOption.getOrElse(
            FunnelState(Unset, Unset, Unset, Unset, false, false))
          sorted.foreach { case (_, _, tpe, ts) =>
            if (ts > st.curTs)
              st = st.copy(curTs = ts, clickAtCur = false, purchAtCur = false)
            tpe match {
              case "signup" =>
                if (st.t1 == Unset) {
                  st = st.copy(t1 = ts)
                  // ties: a click already seen at this exact ts
                  // satisfies ts >= t1; a purchase at it satisfies
                  // ts >= t2 once the tie-click set t2 here
                  if (st.clickAtCur && st.t2 == Unset)
                    st = st.copy(t2 = ts)
                  if (st.t2 != Unset && st.purchAtCur && st.t3 == Unset &&
                      ts >= st.t2)
                    st = st.copy(t3 = ts)
                }
              case "click" =>
                if (st.t1 != Unset && st.t2 == Unset && ts >= st.t1) {
                  st = st.copy(t2 = ts)
                  if (st.purchAtCur && st.t3 == Unset)
                    st = st.copy(t3 = ts)
                }
                st = st.copy(clickAtCur = true)
              case "purchase" =>
                if (st.t2 != Unset && st.t3 == Unset && ts >= st.t2)
                  st = st.copy(t3 = ts)
                st = st.copy(purchAtCur = true)
              case _ => () // non-funnel event types pass through
            }
          }
          state.update(st)
          val reached =
            if (st.t3 != Unset) 3
            else if (st.t2 != Unset) 2
            else if (st.t1 != Unset) 1
            else 0
          if (reached == 0) Iterator.empty
          else Iterator(FunnelMark(user, reached))
        })
  }

  /** The batch `q_funnel` stage table from accumulated marks: latest
    * (= max, `reached` is monotone) depth per user, then cumulative
    * stage counts. */
  def sweep(marks: DataFrame): DataFrame = {
    val last = marks.groupBy(col("user_id"))
      .agg(max(col("reached")).as("reached"))
    Seq(("1_signup", 1), ("2_click", 2), ("3_purchase", 3)).map {
      case (name, k) =>
        last.where(col("reached") >= k)
          .agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("stage"), col("n_users"))
    }.reduce(_ union _).orderBy(col("stage"))
  }
}
