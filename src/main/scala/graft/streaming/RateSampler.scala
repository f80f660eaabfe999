package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T1 — the reference's per-subscriber rate sampler
  * (`http.clj:74-78`): deliver at most `epm` events per minute;
  * between deliveries the 1-slot sliding buffer means the *latest*
  * event wins and older ones are dropped (never queued).
  *
  * Two faithful realizations:
  *
  *  - [[lastPerBucket]] — declarative batch/micro-batch analog:
  *    bucket event time into 60/epm-second windows and keep the last
  *    event of each bucket. Oracle-checkable (q_sample_rate is the
  *    1-minute instance).
  *
  *  - [[throttle]] — genuinely stateful streaming form via
  *    `flatMapGroupsWithState`: per subscriber key, emit an event only
  *    if at least 60/epm seconds of *event time* passed since the last
  *    emission; otherwise drop (no queueing). This is the reference's
  *    token-with-drop semantics, minus its wall-clock raciness —
  *    state is one (lastEmit: Long) per key, so memory is O(keys).
  */
object RateSampler {

  case class Keyed(key: String, ts: Timestamp, lemma: String)
  case class LastEmit(var micros: Long)

  /** Latest-event-wins sampling per event-time bucket. Bucket width is
    * ceil(60s/epm) so at most epm events survive any 60 s span; the
    * winner is picked by a TOTAL order (ts, then the full row) — a
    * bare max_by over ts would be partition-order-dependent on ties
    * (the nondeterminism class SURVEY §7.5 bans). */
  def lastPerBucket(requests: DataFrame, epm: Int): DataFrame = {
    require(epm > 0, s"epm must be positive, got $epm")
    val bucketMillis = (60000L + epm - 1) / epm
    val payload = struct(requests.columns.map(col): _*)
    requests
      .groupBy(window(col("ts"), s"$bucketMillis milliseconds"))
      .agg(max_by(payload, struct(col("ts"), payload)).as("_e"))
      .select(requests.columns.map(c => col("_e." + c)): _*)
  }

  /** Stateful drop-not-queue throttle, keyed by subscriber. */
  def throttle(spark: SparkSession, events: Dataset[Keyed], epm: Int): Dataset[Keyed] = {
    require(epm > 0, s"epm must be positive, got $epm")
    import spark.implicits._
    val intervalMicros = (60000000L + epm - 1) / epm
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Keyed], state: GroupState[LastEmit]) => {
          var last: Option[Long] = state.getOption.map(_.micros)
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.lemma)).flatMap { e =>
            val micros = e.ts.getTime * 1000L
            if (last.forall(l => micros - l >= intervalMicros)) {
              last = Some(micros); Some(e)
            } else None // dropped, not queued — sliding-buffer(1) semantics
          }
          last.foreach(l => state.update(LastEmit(l)))
          out.iterator
        })
  }
}
