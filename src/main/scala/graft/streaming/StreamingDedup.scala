package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.GraftExpressions.shingles
import graft.functions.PortableHash.{family, md5Long, P}

/** Streaming MinHash-LSH near-duplicate detection — the stateful form
  * of `q_dedup_minhash`: as documents arrive, each lands in its LSH
  * band buckets and is compared ONLY against the documents already
  * resident in those buckets. Candidate pairs stream out the moment
  * the second member arrives.
  *
  * Why the streaming shape differs from batch (and stays cheap):
  *
  *  - the signature is a PURE PER-ROW expression here — a document
  *    arrives whole, so each minhash component is an `array_min` over
  *    its own shingle array, no pre-aggregation shuffle at all (batch
  *    groups exploded shingle rows instead, which is the right shape
  *    when one document spans many input rows);
  *  - the only stateful operator is the per-bucket membership list:
  *    state is O(docs-per-bucket) longs, capped by `maxPerBucket`
  *    (an LSH bucket that overflows it is a degenerate hot bucket —
  *    further members are dropped from state but still emitted
  *    against the resident sample, the drop-not-queue stance of T3)
  *    and optionally TTL-evicted like [[StreamingSketch]];
  *  - a pair colliding in k bands is emitted k times; downstream
  *    dedups (the batch twin uses the same distinct).
  *
  * StreamingDedupSpec pins stream ≡ batch: the emitted candidate set
  * over a prefix equals the batch banded self-join on the same rows.
  */
object StreamingDedup {

  /** One emitted candidate: `a_id` < `b_id`, with the band that
    * produced it (audit/debug; dedup ignores it). */
  case class Candidate(a_id: Long, b_id: Long, band: Int)

  private[streaming] case class Bucket(docIds: Array[Long])

  /** Column expression: the K-component minhash signature of `text`
    * as an array, identical hash family to the batch query. */
  def signature(text: org.apache.spark.sql.Column, nGram: Int, k: Int)
      : org.apache.spark.sql.Column = {
    val sh = shingles(lower(text), nGram, dedup = false)
    val h0s = transform(sh, x => md5Long(x) % P)
    array((0 until k).map(i => array_min(transform(h0s, h => family(h, i)))): _*)
  }

  /** docs: (doc_id, text) streaming DataFrame → candidate pairs.
    * Bands/rows/k mirror `q_dedup_minhash` (k = bands·rows). */
  def lshCandidates(spark: SparkSession, docs: DataFrame,
      nGram: Int = 3, bands: Int = 8, rows: Int = 4,
      maxPerBucket: Int = 1024, idleTimeout: Option[String] = None)
      : org.apache.spark.sql.Dataset[Candidate] = {
    import spark.implicits._
    val k = bands * rows
    val banded = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        signature(col("text"), nGram, k).as("sig"))
      .select(col("doc_id"), explode(array((0 until bands).map { j =>
        val bh = md5(concat_ws(",",
          (0 until rows).map(r => element_at(col("sig"), j * rows + r + 1)
            .cast("string")): _*))
        struct(lit(j).as("band"), bh.as("bh"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
      .as[(Long, Int, String)]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey { case (_, band, bh) => (band, bh) }
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (key: (Int, String), it: Iterator[(Long, Int, String)],
            state: GroupState[Bucket]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var resident = state.getOption.map(_.docIds).getOrElse(Array.empty[Long])
            val out = Seq.newBuilder[Candidate]
            // deterministic processing order within the micro-batch
            it.toSeq.sortBy(_._1).foreach { case (id, band, _) =>
              if (!resident.contains(id)) {
                resident.foreach { other =>
                  out += Candidate(math.min(id, other), math.max(id, other), band)
                }
                if (resident.length < maxPerBucket) resident :+= id
                // overflow: compared against the resident sample but
                // not stored (drop-not-queue)
              }
            }
            state.update(Bucket(resident))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
        })
  }
}
