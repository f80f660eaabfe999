package graft

import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("exact quantiles are ordered and members of the data") {
    import spark.implicits._
    val rows = run("q_quantile_exact").as[(String, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val qty = Tables(spark, Sf, "lineitem")
      .select("l_quantity").as[Double].collect().toSet
    rows.foreach { case (_, p25, p50, p75) =>
      assert(p25 <= p50 && p50 <= p75)
      assert(qty(p25) && qty(p50) && qty(p75), "rank selection never interpolates")
    }
  }

  test("correlation is in [-1,1] and matches Spark's own corr to float tolerance") {
    import spark.implicits._
    val rows = run("q_corr_cov").as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    val own = Tables(spark, Sf, "lineitem")
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.corr($"l_quantity", $"l_extendedprice"))
      .as[(String, Double)].collect().toMap
    rows.foreach { case (flag, cov, corr) =>
      assert(corr >= -1.0 && corr <= 1.0)
      assert(math.abs(corr - own(flag)) < 1e-6,
        s"$flag: decimal-moment corr $corr vs engine corr ${own(flag)}")
      assert(!cov.isNaN)
    }
  }

  test("histogram quantile sketch lands within one bin width of the exact quantile") {
    import spark.implicits._
    val ests = run("q_sketch_histq").as[(Double, Double)].collect().toMap
    val prices = Tables(spark, Sf, "lineitem")
      .select("l_extendedprice").as[Double].collect().sorted
    Seq(0.5, 0.9, 0.99).foreach { p =>
      val exact = prices(math.ceil(p * prices.length).toInt - 1)
      assert(math.abs(ests(p) - exact) <= 2000.0,
        s"p=$p est=${ests(p)} exact=$exact")
    }
  }

  test("histogram bins partition the table") {
    import spark.implicits._
    val rows = run("q_hist").as[(Int, Long, Double, Double)].collect()
    assert(rows.map(_._2).sum == Tables(spark, Sf, "lineitem").count())
    rows.foreach { case (bin, _, lo, hi) =>
      assert(math.floor(lo / 10000).toInt == bin && math.floor(hi / 10000).toInt == bin)
    }
  }

  test("grouping sets produce the declared lattice (full, by-status, grand total)") {
    import spark.implicits._
    val rows = run("q_grouping_sets")
      .as[(Option[String], Option[String], Double, Long)].collect()
    val total = Tables(spark, Sf, "lineitem").count()
    // grand total row
    assert(rows.count { case (f, s, _, _) => f.isEmpty && s.isEmpty } == 1)
    assert(rows.find { case (f, s, _, _) => f.isEmpty && s.isEmpty }.get._4 == total)
    // by-status rows sum to the total
    assert(rows.filter { case (f, s, _, _) => f.isEmpty && s.nonEmpty }
      .map(_._4).sum == total)
    // full-key rows sum to the total
    assert(rows.filter { case (f, s, _, _) => f.nonEmpty && s.nonEmpty }
      .map(_._4).sum == total)
  }
}
