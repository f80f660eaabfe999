package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.Clf

/** Property-style tests (SURVEY.md §5.3) using ScalaCheck generators
  * over deterministic seeds (no scalatestplus bridge available). */
class ClfPropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    Iterator.from(0).map(i => gen(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).flatten.toSeq

  private val lemmaGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(40))

  private val epochGen: Gen[Long] = Gen.chooseNum(0L, 4102444800L) // ≤ 2100

  test("format→parse identity: CLF timestamps round-trip for arbitrary instants") {
    val instants = samples(epochGen, 300).map(sec =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)))
    val df = instants.toDF("orig")
    val rendered = df.selectExpr(
      "orig", s"date_format(orig, 'dd/MMM/yyyy:HH:mm:ss') || ' +0000' AS s")
    val back = rendered.selectExpr("orig", s"to_timestamp(s, '${Clf.TsFormat}') AS got")
    assert(back.where("orig <> got").count() == 0)
  }

  test("parse is total: arbitrary garbage lines never throw, always null out") {
    val garbage = samples(Gen.asciiPrintableStr, 300)
      .map(_.replace("\n", " ").replace("\r", " "))
    val parsed = Clf.parse(garbage.toDF("line"))
    // no exception, and any line that doesn't match the grammar yields null ip
    assert(parsed.count() == garbage.length)
  }

  test("filter cascade is order-invariant (conjunction semantics)") {
    val lines = graft.pipeline.Flagship.synthLog(
      Tables(spark, TestSpark.Sf, "events"))
    import org.apache.spark.sql.functions._
    import graft.filters.LogFilters._
    val parsed = Clf.parse(lines.where(Clf.prefilter(col("line"))))
      .withColumn("segs", pathSegments(col("uri")))
      .withColumn("lemma", lemmaOf(col("segs")))
    val forward = parsed.where(ok(col("status")))
      .where(validLemma(col("lemma"))).where(mainDictOnly(col("segs")))
      .where(!isBot(col("user_agent"))).count()
    val reversed = parsed.where(!isBot(col("user_agent")))
      .where(mainDictOnly(col("segs"))).where(validLemma(col("lemma")))
      .where(ok(col("status"))).count()
    assert(forward == reversed)
  }
}
