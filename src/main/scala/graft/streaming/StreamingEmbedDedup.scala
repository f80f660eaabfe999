package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming embedding near-dup detection — the stateful form of
  * `q_dedup_embed_lsh` and the per-event granularity of
  * `q_dedup_embed_incremental`: as vectors arrive, each lands in its
  * banded random-hyperplane buckets (the SAME deterministic
  * `DedupPlanes` family as the batch queries, via the native
  * `PlaneBits` kernel in the stateless prefix) and is verified by
  * exact cosine ONLY against the vectors already resident in those
  * buckets. Verified near-dup pairs (cos ≥ `minCos`) stream out the
  * moment the second member arrives — which is exactly the
  * incremental-ingest contract: a vector arriving after the corpus is
  * checked against the corpus without any corpus×corpus rework.
  *
  * Scale stance (the [[StreamingPhashDedup]] precedent, with one
  * difference that matters at 100 TB):
  *
  *  - banding runs stateless, so the only stateful exchange carries
  *    (vec_id, vector) rows keyed by (label, band, band-value) — the
  *    corpus never shuffles twice;
  *  - state per bucket is O(resident vectors) entries capped by
  *    `maxPerBucket` (an overflowing bucket is a degenerate hot
  *    bucket: further members are verified against the resident
  *    sample but not stored — drop-not-queue) and optionally
  *    TTL-evicted. Unlike the 16-byte phash entries a vector entry is
  *    ~8·dim bytes, so the default cap is sized an order smaller —
  *    the state-store budget per bucket, not a semantic knob;
  *  - a pair co-resident in k bands is emitted k times; downstream
  *    dedups (the [[StreamingDedup]] contract). The emitted sim is
  *    rounded to 4 decimals — identical on every duplicate, so the
  *    dedup is a plain distinct.
  *
  * StreamingEmbedDedupSpec pins stream ≡ batch: the distinct emitted
  * pair set over any prefix equals `q_dedup_embed_lsh`'s candidate+
  * verify result on the same vectors, across batch splits.
  */
object StreamingEmbedDedup {

  case class EmbedPair(a_id: Long, b_id: Long, sim: Double)

  private[streaming] case class Bucket(vecIds: Array[Long],
      vecs: Array[Array[Double]])

  /** Left-to-right double dot — same accumulation order as the batch
    * kernel (`CosineSim`), so sims are bit-identical to the batch
    * twin's before rounding. */
  private[graft] def cos(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length) // CosineSim's length stance
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** vectors: streaming DataFrame with (vec_id, label, embedding) →
    * verified near-dup pairs. Banding mirrors `q_dedup_embed_lsh`
    * (DedupBands × DedupRows sign planes). */
  def pairs(spark: SparkSession, vectors: DataFrame, minCos: Double = 0.4,
      maxPerBucket: Int = 512, idleTimeout: Option[String] = None)
      : Dataset[EmbedPair] = {
    import spark.implicits._
    import graft.queries.SimilarityQueries.{DedupBands, DedupRows, DedupPlanes}
    def bandValue(v: org.apache.spark.sql.Column, j: Int) =
      graft.functions.GraftExpressions.plane_bits(v,
        Array.tabulate(DedupRows)(r => DedupPlanes(j * DedupRows + r)),
        Array.tabulate(DedupRows)(r => 1L << r))
    val banded = vectors
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      // drop NULL/uncastable embeddings in the stateless prefix — the
      // batch twin's NULL vector yields a NULL bucket that never
      // equi-joins (≡ excluded from candidates), while here a NULL
      // band value would hit the non-nullable Long in the tuple
      // encoder and kill the whole streaming query
      .where(col("v").isNotNull)
      .select(col("vec_id"), col("label"), col("v"),
        explode(array((0 until DedupBands).map(j =>
          struct(lit(j).as("band"), bandValue(col("v"), j).as("bv"))): _*))
          .as("b"))
      .select(col("vec_id"), col("label"), col("v"),
        col("b.band").as("band"), col("b.bv").as("bv"))
      .as[(Long, Int, Array[Double], Int, Long)]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey { case (_, label, _, band, bv) => (label, band, bv) }
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (_: (Int, Int, Long), it: Iterator[(Long, Int, Array[Double], Int, Long)],
            state: GroupState[Bucket]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ids = state.getOption.map(_.vecIds).getOrElse(Array.empty[Long])
            val vs = state.getOption.map(_.vecs)
              .getOrElse(Array.empty[Array[Double]])
            val newIds = scala.collection.mutable.ArrayBuffer.empty[Long]
            val newVs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
            val out = Seq.newBuilder[EmbedPair]
            def verify(id: Long, v: Array[Double], oid: Long,
                ov: Array[Double]): Unit = {
              val c = cos(v, ov)
              // emit wherever verified — k-fold for k shared bands,
              // distinct'd downstream (the phash-twin contract; no
              // first-matching-band gate, which loses pairs under
              // overflow)
              if (c >= minCos)
                // HALF_UP to 4 decimals ≡ Spark's round(sim, 4) in the
                // batch twin (rint would be HALF_EVEN — a divergence
                // exactly on the .00005 grid)
                out += EmbedPair(math.min(id, oid), math.max(id, oid),
                  BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP)
                    .toDouble)
            }
            // deterministic processing order within the micro-batch
            it.toSeq.sortBy(_._1).foreach { case (id, _, v, _, _) =>
              if (!ids.contains(id) && !newIds.contains(id)) {
                var i = 0
                while (i < ids.length) { verify(id, v, ids(i), vs(i)); i += 1 }
                i = 0
                while (i < newIds.length) { verify(id, v, newIds(i), newVs(i)); i += 1 }
                if (ids.length + newIds.length < maxPerBucket) {
                  newIds += id
                  newVs += v
                } // overflow: drop-not-queue
              }
            }
            state.update(Bucket(ids ++ newIds, vs ++ newVs))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
        })
  }
}
