package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.StatsQueries

/** Pins the approx profiler (HLL distincts, no Expand) to the
  * oracle-checked exact profiler `q_profile` on the same data: every
  * non-estimate column identical, every distinct estimate within 3×
  * the sketch's 5% default rsd — the same verdict the oracle-checked
  * `q_profile_approx` entry emits as its `hll_ok` column. */
class ProfileApproxSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  test("approx profile matches the exact profile within HLL tolerance") {
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
        .toMap
    val exact = byCol(SparkEntry.queries("q_profile")(spark, Sf))
    val approx = byCol(StatsQueries.approxProfile(spark, Sf))
    assert(exact.keySet === approx.keySet)
    for ((c, (n, nn, nd, mn, mx)) <- exact) {
      val (an, ann, and, amn, amx) = approx(c)
      // everything except the estimate is the same single-pass math
      assert((an, ann, amn, amx) === ((n, nn, mn, mx)), s"col $c")
      val err = math.abs(and - nd).toDouble / math.max(nd, 1L)
      assert(err <= 0.15, s"col $c: approx $and vs exact $nd (err $err)")
    }
  }

  test("q_profile_approx verdict column is all-true on this data") {
    val rows = SparkEntry.queries("q_profile_approx")(spark, Sf).collect()
    assert(rows.length === 4)
    assert(rows.forall(_.getBoolean(4)), "hll_ok false somewhere")
  }

  test("approx profile plans without an Expand node") {
    // the localCheckpoint in the operator body materializes the agg —
    // probe the aggregation plan directly instead
    import org.apache.spark.sql.functions._
    val plan = Tables(spark, Sf, "orders")
      .agg(count(lit(1)), approx_count_distinct(col("o_orderkey")),
        approx_count_distinct(col("o_orderstatus")),
        approx_count_distinct(col("o_orderdate")),
        approx_count_distinct(col("o_totalprice")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profiler expanded rows:\n$plan")
    // and the exact form genuinely pays the Expand — the documented
    // contrast that motivates the approx twin
    val exactPlan = Tables(spark, Sf, "orders")
      .agg(countDistinct(col("o_orderkey")), countDistinct(col("o_orderstatus")),
        countDistinct(col("o_orderdate")), countDistinct(col("o_totalprice")))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
  }
}
