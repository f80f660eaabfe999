package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Corpus-pipeline invariants that the hash oracle alone can't state:
  * plan-equivalence between the scale-shaped engine form and the
  * declarative form, and budget arithmetic. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("bloom-pruned incremental dedup equals the broadcast anti-join plan") {
    import spark.implicits._
    val bloom = run("q_dedup_bloom")
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    val plain = run("q_dedup_incremental")
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(bloom == plain,
      s"bloom path diverged: only-bloom=${(bloom -- plain).size} " +
        s"only-plain=${(plain -- bloom).size}")
    assert(bloom.nonEmpty)
  }

  test("token budget: histogram-threshold plan equals the declarative window form") {
    import spark.implicits._
    val engine = run("q_token_budget")
      .select("doc_id", "source", "toks").as[(Long, String, Long)].collect().toSet
    // the oracle's shape, evaluated by Spark itself: corpus-wide
    // running sum per source (fine at test scale; the engine form
    // exists to avoid exactly this window at 100 TB)
    import org.apache.spark.sql.expressions.Window
    val tok = Tables(spark, Sf, "documents").select(col("doc_id"), col("source"),
      size(split(col("text"), "\\s+")).cast("long").as("toks"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("toks").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = tok.withColumn("cum", sum(col("toks")).over(w))
      .where(col("cum") <= graft.queries.PipelineQueries.TokenBudget)
      .select("doc_id", "source", "toks").as[(Long, String, Long)].collect().toSet
    assert(engine == naive)
  }

  test("weighted sampling: token-proportional draw overweights heavy docs") {
    import spark.implicits._
    val sample = run("q_sample_weighted")
      .select("lang", "toks", "rn").as[(String, Long, Int)].collect()
    assert(sample.nonEmpty)
    // per-lang ranks are exactly 1..k
    sample.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (1 to g.length))
    }
    // inclusion probability ∝ toks must pull the sample's mean token
    // mass above the population's (deterministic draw, so this is a
    // fixed property of the testdata, not a flaky statistical test)
    val popMean = Tables(spark, Sf, "documents")
      .select(size(split(col("text"), "\\s+")).cast("double").as("t"))
      .agg(avg(col("t"))).head().getDouble(0)
    val sampleMean = sample.map(_._2.toDouble).sum / sample.length
    assert(sampleMean > popMean,
      s"weighted sample mean $sampleMean not above population mean $popMean")
  }

  test("token budget: every source's admitted token mass respects the budget") {
    import spark.implicits._
    val bySource = run("q_token_budget")
      .groupBy("source").agg(sum("toks").as("mass"))
      .select("source", "mass").as[(String, Long)].collect()
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, mass) =>
      assert(mass <= graft.queries.PipelineQueries.TokenBudget,
        s"source $src over budget: $mass")
    }
  }
}
