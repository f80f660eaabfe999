package graft

import org.apache.spark.sql.functions.{col, lower}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** BM25 cross-check: the distributed scoring must match a from-scratch
  * single-machine recompute over the collected corpus (plain Scala
  * collections — no Spark expressions shared with the query under
  * test), including the exact rounding discipline. */
class TextRankingSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private val QueryTerms = Set("spark", "table", "hash")
  private val (k1, b) = (1.2, 0.75)

  test("q_text_bm25 equals a local BM25 recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("q_text_bm25")(spark, Sf)
      .as[(Long, Double)].collect().toSeq

    val docs = Tables(spark, Sf, "documents")
      .select(col("doc_id"), lower(col("text")))
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1).toSeq }

    val lens = docs.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val nd = docs.length.toLong
    val tokLen = lens.values.sum
    val dfreq = QueryTerms.map { q =>
      q -> docs.count(_._2.contains(q)).toLong
    }.toMap

    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def round4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    val expected = docs.flatMap { case (id, ws) =>
      val contribs = QueryTerms.toSeq.sorted.flatMap { q =>
        val n = ws.count(_ == q).toLong
        if (n == 0 || dfreq(q) == 0) None
        else {
          val idf = math.log(1 + ((nd - dfreq(q)).toDouble + 0.5) / (dfreq(q).toDouble + 0.5))
          val score = idf * (n.toDouble * 2.2) /
            (n.toDouble + k1 * ((1 - b) + b * ((lens(id) * nd).toDouble / tokLen.toDouble)))
          Some(round6(score))
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> round4(contribs.sum.toDouble))
    }.sortBy { case (id, s) => (-s, id) }.take(20).toSeq

    assert(got == expected)
  }
}
