package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD-2 version builder — the CDC-grain twin of
  * `q_dim_scd2`: where the batch query versions an entity at SNAPSHOT
  * grain (the warehouse's periodic dimension refresh), this one
  * versions at EVENT grain — every state change closes the open
  * version the moment the changing event arrives, which is exactly
  * what a CDC feed into a versioned dimension does. A closed version
  * row carries [from, to) as both event ids and timestamps; the open
  * version lives only in state (it has no end yet — a downstream
  * AS-OF consumer unions the closed stream with the current-state
  * snapshot, the same split every CDC-fed dimension serves).
  *
  * State per entity: the open version (value, from-event, ordinal) —
  * O(1) per entity, dimension-bounded, no TTL needed. Within a
  * micro-batch events sort by (ts, event_id) before folding;
  * ACROSS batches the fold assumes time-monotone ingest (the
  * replay/collector stance shared with [[StreamingEntityResolution]]
  * — an out-of-order feed needs an upstream watermark sort, not
  * wider state here).
  *
  * StreamingScd2Spec pins: the closed-version stream after batch k ≡
  * a plain-Scala fold over the stream prefix, exactly-once per
  * (entity, version), across arbitrary micro-batch splits, and
  * version values/boundaries cross-checked against `q_dim_scd2`'s
  * snapshot-grain semantics where the two grains must agree (a value
  * constant across a whole snapshot interval).
  */
object StreamingScd2 {

  /** The open version carried per entity. */
  case class OpenVersion(value: Double, fromId: Long, fromTs: Long, version: Int)

  /** One CLOSED version: [from_event, to_event) — to_event is the
    * event that changed the value. */
  case class ClosedVersion(user_id: Long, version: Int, value: Double,
      from_event: Long, from_ts: Long, to_event: Long, to_ts: Long)

  /** events: streaming (event_id, ts, user_id, value) → closed
    * versions, exactly once each under time-monotone ingest. */
  def versions(spark: SparkSession, events: DataFrame): Dataset[ClosedVersion] = {
    import spark.implicits._
    val typed = events
      .select(col("event_id").cast("long"),
        col("ts").cast("timestamp").cast("long").as("ts"),
        col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
    typed.groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[(Long, Long, Long, Double)],
            state: GroupState[OpenVersion]) => {
          val sorted = it.toSeq.sortBy(e => (e._2, e._1))
          val out = Seq.newBuilder[ClosedVersion]
          var open = state.getOption
          for ((id, ts, _, v) <- sorted) open match {
            case None =>
              open = Some(OpenVersion(v, id, ts, 1))
            case Some(o) if v != o.value =>
              out += ClosedVersion(uid, o.version, o.value,
                o.fromId, o.fromTs, id, ts)
              open = Some(OpenVersion(v, id, ts, o.version + 1))
            case _ => ()
          }
          open.foreach(state.update)
          out.result().iterator
        })
  }
}
