package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Independent brute-force cross-check of the itemset queries: load
  * the documents, mine frequent pairs/triples/rules with plain Scala
  * collections (no Spark, no SQL), compare exactly. This covers the
  * two engine-side performance devices the oracle cannot see — the
  * map-side HOF combination generators and the Apriori broadcast
  * prune — which must not change the answer. */
class ItemsetSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  private lazy val docs: Seq[Set[String]] =
    Tables(spark, Sf, "documents")
      .select(lower($"text")).as[String].collect().toSeq
      .map(_.split(" ", -1).toSet)

  private lazy val minsup: Long = math.ceil(docs.size * 0.10).toLong

  private lazy val f1: Map[String, Long] = docs
    .flatMap(_.toSeq).groupBy(identity)
    .map { case (t, xs) => t -> xs.size.toLong }
    .filter(_._2 >= minsup)

  private lazy val bruteFreqSets: Map[Int, Map[Seq[String], Long]] = {
    val fdocs = docs.map(_.filter(f1.contains).toSeq.sorted)
    def freq(r: Int) = fdocs
      .flatMap(_.combinations(r))
      .groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
      .filter(_._2 >= minsup)
    Map(2 -> freq(2), 3 -> freq(3))
  }

  test("frequent pairs match brute-force mining") {
    val got = SparkEntry.queries("q_itemsets_pairs")(spark, Sf)
      .as[(String, String, Long)].collect()
      .map { case (a, b, s) => Seq(a, b) -> s }.toMap
    assert(got == bruteFreqSets(2))
  }

  test("frequent triples match brute-force mining (Apriori prune is invisible)") {
    val got = SparkEntry.queries("q_itemsets_triples")(spark, Sf)
      .as[(String, String, String, Long)].collect()
      .map { case (a, b, c, s) => Seq(a, b, c) -> s }.toMap
    assert(got == bruteFreqSets(3))
  }

  test("association rules: support/confidence/lift recomputed independently") {
    val n = docs.size.toLong
    val expected = bruteFreqSets(2).toSeq.flatMap { case (Seq(a, b), s) =>
      Seq((a, b, s), (b, a, s))
    }.map { case (ant, cons, s) =>
      val conf = BigDecimal(s.toDouble / f1(ant))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val lift = BigDecimal(s.toDouble * n / (f1(ant).toDouble * f1(cons)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (ant, cons, s, conf, lift)
    }.filter(_._4 >= 0.75).toSet
    val got = SparkEntry.queries("q_itemsets_rules")(spark, Sf)
      .as[(String, String, Long, Double, Double)].collect().toSet
    assert(got == expected)
  }

  test("ordering contract: pairs sorted by support desc then items") {
    val rows = SparkEntry.queries("q_itemsets_pairs")(spark, Sf)
      .as[(String, String, Long)].collect().toSeq
    val resorted = rows.sortBy { case (a, b, s) => (-s, a, b) }
    assert(rows == resorted)
  }
}
