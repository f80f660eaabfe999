package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Dev tool: scale validation for the round-9 media family
  * (`q_dedup_phash`, `q_dedup_phash_cc`, `q_multimodal_frames`),
  * pinning the claims their scaladocs make:
  *
  *  - the pigeonhole banding generates CANDIDATE pairs linear-ish in
  *    the true near-dup density, never all-pairs — the probe counts
  *    unique banded candidates against C(n,2) and against the
  *    verified pair count;
  *  - payload bytes never shuffle: only (doc_id, 8-byte phash) leaves
  *    the decode stage, so total shuffle RECORDS across the pair
  *    query are bounded by docs × segments per join side plus the
  *    verified pairs in the presentation sort — pinned from the
  *    exchanges' own shuffleRecordsWritten metrics;
  *  - `q_multimodal_frames` keeps the payload in the scan stage: its
  *    only exchange is the presentation sort, carrying exactly the
  *    sampled-frame digests.
  *
  * Timings at sf0.01 → sf0.1 show the 10× data step; per-SF lines are
  * recorded in PLANS.md. Usage: runMain graft.MediaScaleProbe [dir...]
  */
object MediaScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(logLevel = "ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

    def descend(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => descend(a.executedPlan)
      case qs: QueryStageExec => descend(qs.plan)
      case other => other.children.flatMap(descend)
    }) :+ p

    def shuffleRecords(p: SparkPlan): Long =
      descend(p).collect { case s: ShuffleExchangeExec =>
        s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
      }.sum

    for (dir <- dirs) {
      val nDocs = Tables(spark, dir, "documents").count()
      val allPairs = nDocs * (nDocs - 1) / 2

      // ---- candidate volume: banding vs all-pairs
      var t0 = System.nanoTime()
      val cand = queries.MultimodalQueries.phashCandidates(spark, dir).count()
      val candSecs = (System.nanoTime() - t0) / 1e9
      require(cand * 20 < allPairs,
        s"banding degenerated toward all-pairs: $cand candidates vs $allPairs")

      // ---- verified pairs + hash-only shuffle bound. The builder
      // runs INSIDE the clock: the signature localCheckpoint executes
      // the decode pass eagerly at construction, and excluding it
      // would make pair_secs incomparable with cand/cc timings.
      t0 = System.nanoTime()
      val pairsQ = SparkEntry.queries("q_dedup_phash")(spark, dir)
      val pExec = pairsQ.queryExecution.executedPlan
      val nPairs = pExec.executeCollect().length.toLong
      val pSecs = (System.nanoTime() - t0) / 1e9
      val pRecords = shuffleRecords(pExec)
      // 2 banded sides × 5 segments × docs + the sorted pair output;
      // slack ×2 for AQE stage re-reads. Corpus BYTES never appear.
      val bound = 2 * (2 * 5 * nDocs + nPairs)
      require(pRecords <= bound,
        s"pair query shuffled $pRecords records > hash-only bound $bound")
      println(f"MEDIASCALE q_dedup_phash dir=$dir%-24s docs=$nDocs%7d " +
        f"all_pairs=$allPairs%12d candidates=$cand%9d pairs=$nPairs%7d " +
        f"cand_secs=$candSecs%5.2f pair_secs=$pSecs%5.2f shuffle_records=$pRecords%9d")

      // ---- cluster manifest: rows == corpus, keepers <= corpus
      t0 = System.nanoTime()
      val cc = SparkEntry.queries("q_dedup_phash_cc")(spark, dir)
        .queryExecution.executedPlan.executeCollect()
      val ccSecs = (System.nanoTime() - t0) / 1e9
      val kept = cc.count(_.getBoolean(2)).toLong
      require(cc.length.toLong == nDocs, s"manifest rows ${cc.length} != docs $nDocs")
      println(f"MEDIASCALE q_dedup_phash_cc dir=$dir%-24s docs=$nDocs%7d " +
        f"kept=$kept%7d dropped=${nDocs - kept}%7d secs=$ccSecs%5.2f")

      // ---- frame sampling: payload stays in the scan stage
      t0 = System.nanoTime()
      val framesQ = SparkEntry.queries("q_multimodal_frames")(spark, dir)
      val fExec = framesQ.queryExecution.executedPlan
      val nFrames = fExec.executeCollect().length.toLong
      val fSecs = (System.nanoTime() - t0) / 1e9
      val fRecords = shuffleRecords(fExec)
      require(fRecords <= 2 * nFrames,
        s"frames query shuffled $fRecords records for $nFrames frames")
      println(f"MEDIASCALE q_multimodal_frames dir=$dir%-24s docs=$nDocs%7d " +
        f"frames=$nFrames%8d secs=$fSecs%5.2f shuffle_records=$fRecords%8d")
    }
    spark.stop()
  }
}
