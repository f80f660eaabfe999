package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupQueries, TextQueries}

/** Pins the two round-10 corpus-frequency operators:
  *
  *  - `q_sim_ppjoin`: the prefix-filtered candidate set must CONTAIN
  *    every true-result pair (the pigeonhole completeness theorem the
  *    whole operator rests on) — verified here against brute-force
  *    per-pair Jaccard over the sf0.001 corpus;
  *  - `q_text_boilerplate`: a struck line occurs in ≥ BoilerMinDocs
  *    distinct documents, a kept line in fewer, and the cleaned text
  *    is exactly the kept lines in document order.
  */
class PrefixFilterSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.Sf

  test("ppjoin result equals brute-force Jaccard at tau = num/den") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        array_distinct(split(lower(col("text")), " ")).as("toks"))
      .as[(Long, String, Seq[String])].collect()
    val num = DedupQueries.PpNum
    val den = DedupQueries.PpDen
    val brute = (for {
      (a, la, ta) <- docs.iterator
      (b, lb, tb) <- docs.iterator
      if a < b && la == lb
      sa = ta.toSet; sb = tb.toSet
      inter = (sa & sb).size
      union = sa.size + sb.size - inter
      if inter * den >= num * union
    } yield (a, b)).toSet
    val got = SparkEntry.queries("q_sim_ppjoin")(spark, dir)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(got == brute,
      s"ppjoin mismatch: missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture produced no pairs — spec is vacuous")
  }

  test("boilerplate strikes exactly the corpus-repeated lines, in order") {
    val n = TextQueries.BoilerWords
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def lines(t: String): Seq[String] =
      t.split(" ").grouped(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    val freq = docs.flatMap { case (id, t) => lines(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    val boiler = freq.filter(_._2 >= TextQueries.BoilerMinDocs).keySet
    val expect = docs.map { case (id, t) =>
      val ls = lines(t)
      (id, ls.size, ls.count(boiler), ls.filterNot(boiler).mkString(" "))
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q_text_boilerplate")(spark, dir)
      .select(col("doc_id"), col("n_lines").cast("long"),
        col("n_boiler").cast("long"), col("cleaned"))
      .as[(Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2.toInt, r._3.toInt, r._4)).toSeq
    assert(got == expect)
    assert(expect.exists(_._3 > 0), "no boilerplate in fixture — spec is vacuous")
    assert(expect.exists(r => r._3 < r._2), "everything boilerplate — spec is vacuous")
  }
}
