package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.SimilarityQueries

/** Streaming bitext candidate mining — the stateful form of
  * `q_mine_bitext`'s candidate stage (r13 verdict stretch item 6: the
  * one round-13 shuffle-bearing query without a streaming twin). The
  * batch query has two phases with different streaming natures:
  *
  *  1. CANDIDATES (this operator — the [[StreamingEmbedDedup]] shape):
  *     as vectors arrive they are assigned to their quantizer cluster
  *     in the stateless-per-row key function (argmax cosine over the
  *     FIXED reference quantizer — capped bucket centroids + root
  *     floor, ≤ Anchors+CMin cosines per vector, bit-identical to the
  *     batch `max_by(struct(cs, -cent_id))` assignment), then each
  *     cluster's resident state pairs the newcomer against the
  *     OPPOSITE-language members already resident: the scored pair
  *     streams out the moment its second member arrives, exactly
  *     once, with the cosine bit-identical to the batch kernel
  *     (left-to-right double dot);
  *  2. MARGIN (the mark-then-sweep finalization — the
  *     [[StreamingSpanDedup]] pattern): the k-NN means, ratio margin,
  *     and mutual-best selection are corpus-level properties that do
  *     not exist at arrival time, so they run as a batch sweep over
  *     the marked candidate set — [[sweep]] IS
  *     `SimilarityQueries.bitextSweep`, the same code the batch query
  *     tails into, so stream and batch cannot fork in the margin
  *     math. StreamingBitextSpec pins stream candidates ≡ batch
  *     candidates and swept result ≡ `q_mine_bitext`, across
  *     micro-batch splits.
  *
  * Scale stance: the quantizer is a FIXED prior-corpus model
  * (broadcast, quantizer-sized — the KMeans/StreamingPsiGate
  * fixed-reference pattern); the stateful exchange carries (vec_id,
  * label, vector) rows keyed by cluster, state per cluster is the
  * resident membership capped by `maxPerCluster` (cluster populations
  * are ~[[SimilarityQueries]]'s SemCell by the k∝n sizing, so the cap
  * is a hot-cluster guard, drop-not-queue — the
  * [[StreamingEmbedDedup]] overflow contract).
  */
object StreamingBitext {

  /** A scored cross-language candidate: `ai` from the even-label
    * (source) side, `bi` odd-label (target), cosine unrounded —
    * the batch `sc` grain. */
  case class BitextCand(ai: Long, bi: Long, cos: Double)

  private[streaming] case class Cluster(ids: Array[Long],
      labels: Array[Int], vecs: Array[Array[Double]])

  /** Batch-exact cluster assignment from the collected quantizer:
    * argmax cosine over the vector's bucket anchors plus the root
    * floor, ties to the LOWER cent_id — the
    * `max_by(struct(cs, -cent_id))` order. */
  private[graft] def assign(bits: Int,
      buckets: Map[Long, Array[(Long, Array[Double])]],
      roots: Array[(Long, Array[Double])], v: Array[Double]): Long = {
    val b = SimilarityQueries.clusterBucketOf(v, bits)
    var bestId = Long.MaxValue
    var bestCs = Double.NegativeInfinity
    def consider(id: Long, cv: Array[Double]): Unit = {
      val cs = StreamingEmbedDedup.cos(v, cv)
      if (cs > bestCs || (cs == bestCs && id < bestId)) {
        bestCs = cs; bestId = id
      }
    }
    buckets.getOrElse(b, Array.empty).foreach { case (id, cv) => consider(id, cv) }
    roots.foreach { case (id, cv) => consider(id, cv) }
    bestId
  }

  /** vectors: streaming DataFrame with (vec_id, label, embedding) →
    * scored cross-language candidates of the fixed-quantizer
    * clusters. `model` is [[SimilarityQueries.bitextModel]]'s
    * (bits, bucket anchors, roots). */
  def candidates(spark: SparkSession, vectors: DataFrame,
      model: (Int, Map[Long, Array[(Long, Array[Double])]], Array[(Long, Array[Double])]),
      maxPerCluster: Int = 512, idleTimeout: Option[String] = None)
      : Dataset[BitextCand] =
    candidatesCounted(spark, vectors, model, maxPerCluster, idleTimeout)._1

  /** [[candidates]] plus its overflow DROP COUNTER (r14 advice: the
    * maxPerCluster drop is the documented StreamingEmbedDedup
    * overflow contract, but it was UNOBSERVABLE — a dropped newcomer
    * pairs against residents yet silently never pairs with later
    * arrivals, so an overflowing deployment's candidate set diverges
    * from batch `q_mine_bitext` with no signal). The named
    * accumulator ("graft.bitext.dropped", visible in the Spark UI /
    * status API) counts dropped vectors, and each overflowing
    * micro-batch group additionally logs one WARN line with the
    * cluster id and its drop count. Task retries can overcount the
    * accumulator (Spark's usual non-action-accumulator caveat) — it
    * is a monitoring signal: nonzero means "grow maxPerCluster or
    * re-quantize", exact magnitude is secondary. */
  def candidatesCounted(spark: SparkSession, vectors: DataFrame,
      model: (Int, Map[Long, Array[(Long, Array[Double])]], Array[(Long, Array[Double])]),
      maxPerCluster: Int = 512, idleTimeout: Option[String] = None)
      : (Dataset[BitextCand], org.apache.spark.util.LongAccumulator) = {
    import spark.implicits._
    val dropped = spark.sparkContext.longAccumulator("graft.bitext.dropped")
    val (bits, buckets, roots) = model
    val rows = vectors
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      // NULL embeddings never assign (the batch twin's NULL bucket
      // joins nothing) — drop in the stateless prefix
      .where(col("v").isNotNull)
      .as[(Long, Int, Array[Double])]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val ds = rows
      .groupByKey { case (_, _, v) => assign(bits, buckets, roots, v) }
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (key: Long, it: Iterator[(Long, Int, Array[Double])],
            state: GroupState[Cluster]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ids = state.getOption.map(_.ids).getOrElse(Array.empty[Long])
            val lbs = state.getOption.map(_.labels).getOrElse(Array.empty[Int])
            val vs = state.getOption.map(_.vecs)
              .getOrElse(Array.empty[Array[Double]])
            val nIds = scala.collection.mutable.ArrayBuffer.empty[Long]
            val nLbs = scala.collection.mutable.ArrayBuffer.empty[Int]
            val nVs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
            val out = Seq.newBuilder[BitextCand]
            def pair(id: Long, lb: Int, v: Array[Double], oid: Long,
                olb: Int, ov: Array[Double]): Unit =
              // only cross-language pairs score; ai is always the
              // even-label side (the batch sc orientation)
              if ((lb & 1) != (olb & 1)) {
                val c = StreamingEmbedDedup.cos(v, ov)
                if ((lb & 1) == 0) out += BitextCand(id, oid, c)
                else out += BitextCand(oid, id, c)
              }
            // deterministic processing order within the micro-batch
            var droppedHere = 0L
            it.toSeq.sortBy(_._1).foreach { case (id, lb, v) =>
              if (!ids.contains(id) && !nIds.contains(id)) {
                var i = 0
                while (i < ids.length) { pair(id, lb, v, ids(i), lbs(i), vs(i)); i += 1 }
                i = 0
                while (i < nIds.length) { pair(id, lb, v, nIds(i), nLbs(i), nVs(i)); i += 1 }
                if (ids.length + nIds.length < maxPerCluster) {
                  nIds += id; nLbs += lb; nVs += v
                } else droppedHere += 1 // overflow: drop-not-queue
              }
            }
            if (droppedHere > 0) {
              // the stream/batch divergence signal (r14 advice): these
              // vectors paired against residents but will never pair
              // with later arrivals
              dropped.add(droppedHere)
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"bitext cluster $key overflowed maxPerCluster=$maxPerCluster: " +
                  s"dropped $droppedHere vector(s) this micro-batch — " +
                  "candidate set now diverges from the batch twin")
            }
            state.update(Cluster(ids ++ nIds, lbs ++ nLbs, vs ++ nVs))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
        })
    (ds, dropped)
  }

  /** The margin finalization over the marked candidate set — the
    * IDENTICAL sweep `q_mine_bitext` tails into (k-NN decimal means,
    * ratio margin, mutual-best, threshold). Run it over the candidate
    * store after (or periodically during) the ingest. */
  def sweep(cands: DataFrame): DataFrame =
    SimilarityQueries.bitextSweep(
      cands.select(col("ai"), col("bi"), col("cos")))
}
