package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming traffic-anomaly detection — the stateful form of
  * `q_anomaly`: hourly per-type counts stream in (pre-aggregated
  * upstream, exactly like the batch query's first stage), and each
  * hour is z-scored against the trailing 24 observed hours of its own
  * type as soon as it CLOSES (a strictly later hour arrives for that
  * type).
  *
  * State per event_type is O(1) and stream-length independent: the
  * trailing ring of ≤ [[WindowHours]]+1 (hour, count) entries plus
  * the [[AnomalyState.scoredThrough]] watermark that makes every hour
  * score EXACTLY ONCE across micro-batch boundaries (an hour closed
  * in batch i is never re-emitted by batch i+1 — the ring keeps it
  * purely as history for its successors). The window arithmetic
  * (Σn, Σn², k) feeds the SAME exact-integer-to-double expression as
  * the batch query, so a closed hour's verdict equals the batch
  * verdict over the same prefix — StreamingAnomalySpec pins the
  * equivalence including across arbitrary batch split points.
  *
  * Hours beyond the trailing window of the newest arrival are assumed
  * in order per type (the batch query has the same event-time
  * assumption: its window frame is ROWS over the hour sort); within a
  * batch the group's input is sorted before merging.
  */
object StreamingAnomaly {

  /** Trailing counts oldest-first (last may still fill) + watermark:
    * every hour ≤ scoredThrough has already been evaluated.
    * `lateDropped` counts input rows that violated the per-type
    * in-order contract (arrived for an hour ≤ scoredThrough) — they
    * are REFUSED, not merged: consumed history is immutable, so a
    * contract violation is visible in state rather than silently
    * skewing the trailing window later hours are z-scored against. */
  case class AnomalyState(hours: Seq[(Long, Long)], scoredThrough: Long,
      lateDropped: Long = 0L)

  case class AnomalyVerdict(eventType: String, hour: Long, n: Long,
      mu: Double, z: Double, flagged: Boolean)

  /** Minimum trailing hours before scoring (batch query's k >= 12). */
  val MinHistory = 12

  /** Trailing window width in hours (batch query's 24 PRECEDING). */
  val WindowHours = 24

  /** Flag threshold on |z| (batch query's 2.5). */
  val Threshold = 2.5

  /** events: (eventType, hourEpochSec, count) — per-micro-batch hourly
    * partial counts. Emits one verdict per newly-CLOSED hour with
    * enough history (Append semantics downstream). */
  def detect(spark: SparkSession, events: Dataset[(String, Long, Long)])
      : Dataset[AnomalyVerdict] = {
    import spark.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (tpe: String, it: Iterator[(String, Long, Long)],
            state: GroupState[AnomalyState]) => {
          val prior = state.getOption.getOrElse(AnomalyState(Vector.empty, Long.MinValue))
          var hours = prior.hours.toVector
          val (late, fresh) = it.toSeq.partition(_._2 <= prior.scoredThrough)
          fresh.sortBy(_._2).foreach { case (_, h, c) =>
            hours.indexWhere(_._1 == h) match {
              case -1 => hours :+= (h, c)
              case i  => hours = hours.updated(i, (h, hours(i)._2 + c))
            }
          }
          hours = hours.sortBy(_._1)
          // evaluate every hour that is now closed (has a successor)
          // and not yet consumed by the watermark; advance the
          // watermark over ALL of them — an hour with too little
          // history is consumed silently, exactly like the batch
          // query's k >= MinHistory filter dropping the row
          val newlyClosed = hours.indices.dropRight(1)
            .filter(i => hours(i)._1 > prior.scoredThrough)
          val verdicts = newlyClosed.flatMap { i =>
            val (h, n) = hours(i)
            val trail = hours.slice(math.max(0, i - WindowHours), i)
            val k = trail.length
            if (k < MinHistory) None
            else {
              val s = trail.map(_._2).sum
              val sq = trail.map(t => t._2 * t._2).sum
              val mu = s.toDouble / k
              val sd = math.sqrt((sq.toDouble - s.toDouble * s / k) / (k - 1))
              if (sd <= 0) None
              else {
                val z = (n.toDouble - mu) / sd
                Some(AnomalyVerdict(tpe, h, n, mu, z, math.abs(z) > Threshold))
              }
            }
          }
          val scoredThrough =
            if (newlyClosed.nonEmpty) hours(newlyClosed.last)._1
            else prior.scoredThrough
          state.update(AnomalyState(hours.takeRight(WindowHours + 1), scoredThrough,
            prior.lateDropped + late.size))
          verdicts.iterator
        })
  }
}
