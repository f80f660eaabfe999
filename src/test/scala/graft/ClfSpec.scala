package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.Clf

class ClfSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val good =
    """1.2.3.4 - - [08/Dec/2024:23:00:18 +0100] "GET /wb/obskur HTTP/1.1" 200 5123 "https://ref" "Mozilla/5.0""""

  test("parses all nine fields of a combined log line") {
    val row = Clf.parse(Seq(good).toDF("line")).collect()(0)
    assert(row.getAs[String]("ip") == "1.2.3.4")
    assert(row.getAs[String]("method") == "GET")
    assert(row.getAs[String]("uri") == "/wb/obskur")
    assert(row.getAs[String]("status") == "200")
    assert(row.getAs[Long]("size") == 5123L)
    assert(row.getAs[String]("referrer") == "https://ref")
    assert(row.getAs[String]("user_agent") == "Mozilla/5.0")
  }

  test("CLF timestamp with zone offset lands as the correct UTC instant") {
    val row = Clf.parse(Seq(good).toDF("line")).collect()(0)
    // 23:00:18 +0100 == 22:00:18Z
    assert(row.getAs[java.sql.Timestamp]("ts").toInstant.toString == "2024-12-08T22:00:18Z")
  }

  test("malformed lines yield nulls, never exceptions (F10)") {
    val bad = Seq("not a log line", "", "GET /wb/x garbled").toDF("line")
    val parsed = Clf.parse(bad).collect()
    assert(parsed.forall(_.isNullAt(0)))
    assert(parsed.forall(_.isNullAt(1)))
  }

  test("prefilter keeps dictionary hits, drops typeahead and others (F1)") {
    val df = Seq(
      good,
      good.replace("/wb/obskur", "/wb/typeahead/ob"),
      good.replace("GET /wb/obskur", "GET /other/x")).toDF("line")
    assert(df.where(Clf.prefilter(col("line"))).count() == 1)
  }
}
