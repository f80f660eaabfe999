package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PrefixSum

/** PrefixSum.cumsum == a sequential running sum, regardless of input
  * partitioning/order, across empty-partition and skewed layouts. */
class PrefixSumSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def check(values: Seq[(Long, Long)], nParts: Int): Unit = {
    // shuffle input order so the operator's range partitioning, not
    // incidental input order, produces the result
    val df = values.reverse.toDF("k", "v").repartition(5)
    val got = PrefixSum.cumsum(df, "k", "v", nParts, "cum")
      .orderBy("k").as[(Long, Long, Long)].collect()
    val expected = values.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (k, v)) => (k, v, acc + v) }
      .tail
    assert(got.toSeq == expected)
  }

  test("matches sequential cumsum on a small total order") {
    check((1L to 100L).map(k => (k, k % 7)), nParts = 8)
  }

  test("more partitions than rows (empty partitions)") {
    check(Seq((10L, 5L), (20L, 3L), (30L, 9L)), nParts = 16)
  }

  test("single partition degenerates to the sequential scan") {
    check((1L to 50L).map(k => (k, 2L)), nParts = 1)
  }

  test("skewed keys still produce the global order's sums") {
    val vals = (1L to 200L).map(k => (k, if (k < 190) 0L else k))
    check(vals, nParts = 4)
  }

  test("cumsumBy over a composite key: lexicographic running sum with a low-cardinality leading key") {
    // (g, k) with only 3 distinct g — the epoch-shuffle shape; range
    // partitioning on the composite must still parallelize and the
    // running sum must follow (g, k) lexicographic order exactly
    // k*31 mod 41 is a bijection on 1..40 — scrambled but unique, so
    // the composite (g, k) stays a total order
    val values = for (g <- 0L to 2L; k <- 1L to 40L) yield (g, k * 31 % 41, 1L)
    val df = values.reverse.toDF("g", "k", "v").repartition(7)
    val got = PrefixSum.cumsumBy(df, Seq("g", "k"), "v", 8, "cum")
      .orderBy("g", "k").as[(Long, Long, Long, Long)].collect()
    val expected = values.sortBy { case (g, k, _) => (g, k) }
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, acc), (g, k, v)) =>
        (g, k, v, acc + v) }
      .tail
    assert(got.toSeq == expected)
  }
}
