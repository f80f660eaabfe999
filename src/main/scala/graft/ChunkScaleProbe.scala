package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.Fence.FenceOps

/** Dev tool: scale validation for the round-5 chunk/similarity
  * additions, pinning the claims their scaladocs make:
  *
  *  - q_sim_allpairs: the df ≤ DfCap cut makes candidate volume
  *    FEATURE-bound, not corpus-quadratic — the actual candidate pair
  *    count Σ_{h,lang} C(n, 2) must stay ≤ kept-features × C(DfCap, 2),
  *    and the saturation of that bound is reported across a 10× data
  *    step (pairs grow until posting lists hit the cap, then the
  *    per-feature contribution is constant);
  *  - q_rag_retrieve: WindowGroupLimit prunes BEFORE the per-query
  *    exchange — the qid-only hash exchange must carry
  *    ≤ |Q| · k · shuffle-partitions rows (measured from the
  *    exchange's own shuffleRecordsWritten), never the corpus-sized
  *    candidate list;
  *  - q_chunk_dedup: kept + dropped passages account for every
  *    ceil(len/128) chunk of every document (the PipelineSpec per-doc
  *    identity, held at the 10× step too).
  *
  * Per-SF output lines are recorded in PLANS.md.
  * Usage: runMain graft.ChunkScaleProbe [dir...]
  */
object ChunkScaleProbe {
  // the probe validates the QUERIES' constants — reference them, so a
  // tuned cap/k can never leave the probe checking a stale bound
  private val DfCap = graft.queries.DedupQueries.DfCap.toLong
  private val TopK = graft.queries.PipelineQueries.RagTopK.toLong
  private val NQueries = graft.queries.PipelineQueries.RagQueries.map(_._1).distinct.size.toLong
  private val NGram = graft.queries.DedupQueries.NGram
  private val DedupChunk = graft.queries.PipelineQueries.DedupChunk

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(logLevel = "ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

    def descend(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => descend(a.executedPlan)
      case qs: QueryStageExec => descend(qs.plan)
      case other => other.children.flatMap(descend)
    }) :+ p

    for (dir <- dirs) {
      val docs = Tables(spark, dir, "documents")
      val nDocs = docs.count()

      // ---- q_sim_allpairs: the df-cap candidate bound
      val tf = docs
        .select(col("doc_id"), col("lang"),
          explode(graft.functions.GraftExpressions.shingles(
            lower(col("text")), NGram, dedup = false)).as("g"))
        .groupBy(col("doc_id"), col("lang"), xxhash64(col("g")).as("h"))
        .agg(count(lit(1)).as("n"))
        .fenced()
      val kept = tf.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .where(col("df") <= DfCap).select(col("h"))
      val nFeatures = kept.count()
      val pairBound = nFeatures * (DfCap * (DfCap - 1) / 2)
      val nPairs = tf.join(kept, "h")
        .groupBy(col("h"), col("lang")).agg(count(lit(1)).as("m"))
        .agg(coalesce(sum((col("m") * (col("m") - 1) / 2).cast("long")), lit(0L)))
        .head().getLong(0)
      require(nPairs <= pairBound,
        s"candidate pairs $nPairs exceed the df-cap bound $pairBound")
      var t0 = System.nanoTime()
      val simRows = SparkEntry.queries("q_sim_allpairs")(spark, dir)
        .queryExecution.executedPlan.executeCollect().length
      val simSecs = (System.nanoTime() - t0) / 1e9
      println(f"CHUNKSCALE q_sim_allpairs dir=$dir%-24s docs=$nDocs%6d " +
        f"kept_features=$nFeatures%7d cand_pairs=$nPairs%9d bound=$pairBound%9d " +
        f"saturation=${nPairs.toDouble / pairBound}%6.4f rows=$simRows%4d time=$simSecs%5.2f s")

      // ---- q_rag_retrieve: WindowGroupLimit prunes before the qid exchange
      // (t0 BEFORE construction: the eager localCheckpoint corpus agg
      // runs at build time and belongs in the recorded wall)
      t0 = System.nanoTime()
      val rag = SparkEntry.queries("q_rag_retrieve")(spark, dir)
      val rExec = rag.queryExecution.executedPlan
      val ragRows = rExec.executeCollect().length
      val ragSecs = (System.nanoTime() - t0) / 1e9
      // the per-query exchange partitions on qid ALONE; the upstream
      // score agg partitions on (qid, doc_id, chunk_ix) and must not
      // be mistaken for it
      val qidEx = descend(rExec)
        .collect { case s: ShuffleExchangeExec => s }
        .filter { s =>
          val p = s.outputPartitioning.toString
          p.contains("hashpartitioning") && p.contains("qid") && !p.contains("doc_id")
        }
      require(qidEx.nonEmpty, "q_rag_retrieve: qid-only exchange not found")
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toLong
      val qidRecs = qidEx.map(_.metrics("shuffleRecordsWritten").value).max
      require(qidRecs <= NQueries * TopK * parts,
        s"per-query exchange carries $qidRecs rows — WindowGroupLimit did not prune " +
          s"(bound ${NQueries * TopK * parts})")
      println(f"CHUNKSCALE q_rag_retrieve dir=$dir%-24s docs=$nDocs%6d " +
        f"qid_exchange_recs=$qidRecs%4d bound=${NQueries * TopK * parts}%5d " +
        f"rows=$ragRows%3d time=$ragSecs%5.2f s")

      // ---- q_chunk_dedup: passage accounting at scale
      val expectedChunks = docs
        .select(greatest(floor((length(col("text")) - 1) / DedupChunk) + 1, lit(1))
          .cast("long").as("c"))
        .agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
      t0 = System.nanoTime()
      val dedup = SparkEntry.queries("q_chunk_dedup")(spark, dir)
        .agg(coalesce(sum(col("n_kept") + col("n_dropped")), lit(0L)))
        .head().getLong(0)
      val dedupSecs = (System.nanoTime() - t0) / 1e9
      require(dedup == expectedChunks,
        s"chunk accounting: $dedup != expected $expectedChunks")
      println(f"CHUNKSCALE q_chunk_dedup  dir=$dir%-24s docs=$nDocs%6d " +
        f"chunks=$dedup%7d time=$dedupSecs%5.2f s")
    }
    spark.stop()
  }
}
