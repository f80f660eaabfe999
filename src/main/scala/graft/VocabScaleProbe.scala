package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._
import graft.Fence.FenceOps

/** Dev tool: vocabulary-scale validation for `q_vocab_coverage`.
  *
  * The oracle-checked query runs at VocabMax = 30 — small enough that
  * "the shortlist broadcasts" is trivially true. Real tokenizer
  * builds rank 32k–256k terms, so this probe runs the SAME plan
  * (`TextQueries.coveragePlan` — one implementation, no drift) at
  * VocabMax = 32768 over a synthesized Zipf-ish vocabulary and pins
  * the two scale claims from the query's scaladoc:
  *
  *  - the global ranking materializes ONLY the top-vocabMax shortlist
  *    (TakeOrderedAndProject in the executed plan — the full
  *    vocabulary, 16× larger here, is never globally sorted);
  *  - the shortlist broadcast stays MB-sized (measured from the
  *    BroadcastExchange's own dataSize metric) — 32k (term, rank)
  *    rows ≈ 1 MB, far under any broadcast threshold, so the
  *    coverage join never shuffles the fact side on term.
  *
  * Two vocabulary sizes a decade apart show the broadcast bytes are
  * bounded by vocabMax, not by |vocabulary|. Output lines recorded in
  * PLANS.md. Usage: runMain graft.VocabScaleProbe
  */
object VocabScaleProbe {
  private val VocabMax = 32768
  private val Cutoffs = Seq(1024, 8192, 32768)
  private val Langs = 8

  private def descend(p: SparkPlan): Seq[SparkPlan] = (p match {
    case a: AdaptiveSparkPlanExec => descend(a.executedPlan)
    case qs: QueryStageExec => descend(qs.plan)
    case other => other.children.flatMap(descend)
  }) :+ p

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(logLevel = "ERROR")
    import spark.implicits._

    for (nVocab <- Seq(100000L, 1000000L)) {
      // Synthesized (lang, term, n) counts frame — the shape the real
      // query produces from its one fact-sized exchange. Zipf-ish
      // counts (nVocab/(id+1), min 1) so the top of the ranking is
      // dense and ties exercise the (gn desc, term) tiebreak.
      val lt = spark.range(nVocab)
        .select(col("id"),
          concat(lit("t"), col("id")).as("term"),
          greatest(lit(nVocab) / (col("id") + 1), lit(1L)).as("n0"))
        .select(explode(sequence(lit(0), lit(Langs - 1))).as("l"),
          col("term"), col("n0"))
        .select(concat(lit("lang"), col("l")).as("lang"), col("term"),
          (col("n0") + col("l")).cast("long").as("n"))
        .fenced()

      val t0 = System.nanoTime()
      val out = graft.queries.TextQueries.coveragePlan(lt, VocabMax, Cutoffs)
      val exec = out.queryExecution.executedPlan
      val rows = exec.executeCollect().length
      val secs = (System.nanoTime() - t0) / 1e9
      require(rows == Langs * Cutoffs.size,
        s"scaffold: $rows rows != ${Langs * Cutoffs.size}")

      val nodes = descend(exec)
      // claim 1: shortlist via TakeOrdered — never a full-vocab sort
      require(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
        "top-vocabMax shortlist did not plan as TakeOrderedAndProject")
      val rangeParts = nodes.count(
        _.toString.linesIterator.next().contains("rangepartitioning"))
      // claim 2: every broadcast is MB-sized (shortlist + cutoffs +
      // lang totals), bounded by vocabMax not |vocabulary|
      val bcastBytes = nodes.collect { case b: BroadcastExchangeExec =>
        b.metrics("dataSize").value
      }
      require(bcastBytes.nonEmpty, "shortlist broadcast not found")
      val maxMb = bcastBytes.max / 1e6
      require(maxMb < 16.0,
        f"largest broadcast $maxMb%.1f MB — shortlist no longer broadcastable")
      println(f"VOCABSCALE nVocab=$nVocab%8d vocabMax=$VocabMax " +
        f"rows=$rows%3d max_broadcast=$maxMb%6.2f MB " +
        f"range_exchanges=$rangeParts time=$secs%5.2f s")
    }
    spark.stop()
  }
}
