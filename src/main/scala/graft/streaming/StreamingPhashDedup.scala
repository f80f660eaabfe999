package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Pigeonhole

/** Streaming perceptual-hash image dedup — the stateful form of
  * `q_dedup_phash`: as images arrive, each is decoded partition-
  * locally to its 64-bit dHash, lands in its pigeonhole segment
  * buckets, and is verified ONLY against the images already resident
  * in those buckets. Verified near-dup pairs (Hamming ≤ `maxHamming`)
  * stream out the moment the second member arrives.
  *
  * Differences from the batch twin, and why they stay cheap:
  *
  *  - the decode runs in the STATELESS prefix of the plan
  *    ([[graft.multimodal.MediaPipeline.phashOf]] works unchanged on
  *    a streaming Dataset) — image bytes never reach the stateful
  *    exchange; only (doc_id, 8-byte hash) rows shuffle to buckets;
  *  - verification happens INSIDE the state function (both signatures
  *    are at hand), so unlike the minhash twin no downstream verify
  *    join exists. A pair co-resident in k segments is emitted k
  *    times; downstream dedups (same contract as
  *    [[StreamingDedup]]). A first-matching-segment rule would give
  *    exactly-once — but only when the first shared bucket stored the
  *    older member: under overflow the older member may be resident
  *    ONLY in a later shared bucket, and a rule keyed to the first
  *    segment would silently lose the pair there, a stream≠batch
  *    divergence worse than duplicates;
  *  - state per bucket is O(resident images) 16-byte entries, capped
  *    by `maxPerBucket` (an overflowing bucket is a degenerate hot
  *    bucket: further members are verified against the resident
  *    sample but not stored — drop-not-queue) and optionally
  *    TTL-evicted.
  *
  * StreamingPhashDedupSpec pins stream ≡ batch: the emitted pair set
  * over any prefix equals `q_dedup_phash` on the same images.
  */
object StreamingPhashDedup {

  case class PhashPair(a_id: Long, b_id: Long, hamming: Int)

  private[streaming] case class Bucket(docIds: Array[Long], hashes: Array[Long])

  /** media: streaming DataFrame with (doc_id, mime, content) →
    * verified near-dup pairs. Banding mirrors `q_dedup_phash`
    * (64-bit dHash, maxHamming+1 segments). */
  def pairs(spark: SparkSession, media: DataFrame, maxHamming: Int = 4,
      maxPerBucket: Int = 4096, idleTimeout: Option[String] = None)
      : Dataset[PhashPair] = {
    import spark.implicits._
    val ph = Pigeonhole(64, maxHamming)
    val banded = graft.multimodal.MediaPipeline.phashOf(spark, media)
      .toDF()
      .select(col("doc_id"), col("phash"),
        explode(array((0 until ph.segments).map(j =>
          struct(lit(j).as("seg"), ph.segmentValue(col("phash"), j).as("sv"))): _*))
          .as("b"))
      .select(col("doc_id"), col("phash"),
        col("b.seg").as("seg"), col("b.sv").as("sv"))
      .as[(Long, Long, Int, Long)]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey { case (_, _, seg, sv) => (seg, sv) }
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (key: (Int, Long), it: Iterator[(Long, Long, Int, Long)],
            state: GroupState[Bucket]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ids = state.getOption.map(_.docIds).getOrElse(Array.empty[Long])
            val sigs = state.getOption.map(_.hashes).getOrElse(Array.empty[Long])
            // batch arrivals accumulate in growable buffers (amortized
            // O(1) append) and concatenate into the stored arrays ONCE
            // per micro-batch — an Array :+ per element would copy the
            // whole bucket each time, O(n²) up to maxPerBucket.
            val newIds = scala.collection.mutable.ArrayBuffer.empty[Long]
            val newSigs = scala.collection.mutable.ArrayBuffer.empty[Long]
            val out = Seq.newBuilder[PhashPair]
            def verify(id: Long, sig: Long, otherId: Long, otherSig: Long): Unit = {
              val ham = java.lang.Long.bitCount(sig ^ otherSig)
              // emit wherever verified — k-fold for a pair
              // co-resident in k buckets, deduped downstream. Do
              // NOT gate on the pair's first matching segment:
              // under overflow the older member may be resident
              // only in a LATER shared bucket, and that gate
              // would lose the pair entirely.
              if (ham <= maxHamming)
                out += PhashPair(math.min(id, otherId), math.max(id, otherId), ham)
            }
            // deterministic processing order within the micro-batch
            it.toSeq.sortBy(_._1).foreach { case (id, sig, _, _) =>
              if (!ids.contains(id) && !newIds.contains(id)) {
                var i = 0
                while (i < ids.length) { verify(id, sig, ids(i), sigs(i)); i += 1 }
                i = 0
                while (i < newIds.length) { verify(id, sig, newIds(i), newSigs(i)); i += 1 }
                if (ids.length + newIds.length < maxPerBucket) {
                  newIds += id
                  newSigs += sig
                } // overflow: verified against the resident sample but
                  // not stored (drop-not-queue)
              }
            }
            state.update(Bucket(ids ++ newIds, sigs ++ newSigs))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
        })
  }
}
