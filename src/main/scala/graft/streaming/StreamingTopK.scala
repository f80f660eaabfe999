package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-hour top-k — the stateful-streaming form of
  * `q_flagship_hourly_top`: lemma hits stream in, and each micro-batch
  * emits every updated hour's current top-k (count desc, lemma asc —
  * the batch query's exact tiebreak), so a dashboard always has the
  * latest leaderboard without recomputing the hour.
  *
  * State per hour is the full lemma→count map. That is NOT unbounded:
  * the flagship's lemma domain is the dictionary (the reference's
  * dimension is a bounded lemma list — `wbdb.clj:17-26`), so state is
  * O(|dictionary|) per open hour, and hours close; for an unbounded
  * key domain the entry would be a count-min + heap instead (the CMS
  * sketch already exists as `functions.CountMin`). Emission after any
  * prefix equals the batch group-by + row_number over the same rows —
  * StreamingTopKSpec pins the equivalence.
  */
object StreamingTopK {

  case class TopKState(counts: Map[String, Long])

  case class TopEntry(hour: Long, lemma: String, n: Long, rn: Int)

  /** events: (hourEpochSec, lemma). Emits the updated hours' top-k
    * per micro-batch (Update output mode downstream). */
  def topK(spark: SparkSession, events: Dataset[(Long, String)],
      k: Int): Dataset[TopEntry] = {
    import spark.implicits._
    require(k > 0, s"k must be positive, got $k")
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (hour: Long, it: Iterator[(Long, String)],
            state: GroupState[TopKState]) => {
          val counts = collection.mutable.Map.empty[String, Long]
          state.getOption.foreach(s => counts ++= s.counts)
          it.foreach { case (_, lemma) =>
            counts.update(lemma, counts.getOrElse(lemma, 0L) + 1L)
          }
          state.update(TopKState(counts.toMap))
          counts.toSeq
            .sortBy { case (lemma, n) => (-n, lemma) }
            .take(k)
            .zipWithIndex
            .map { case ((lemma, n), i) => TopEntry(hour, lemma, n, i + 1) }
            .iterator
        })
  }
}
