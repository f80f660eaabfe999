package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Flagship

class FlagshipSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private lazy val result = Flagship(spark, Sf).cache()

  test("flagship produces enriched rows on sf0.001 (driver smoke analog)") {
    assert(result.count() > 0)
  }

  test("error-status events never survive the cascade (F4)") {
    assert(result.where(col("lemma") === "error").count() == 0)
  }

  test("percent-decoded lemmata survive and are left unenriched (J1 outer)") {
    val dec = result.where(col("lemma").endsWith("ä"))
    assert(dec.count() > 0)
    assert(dec.where(col("freq").isNotNull).count() == 0)
  }

  test("plain lemmata are enriched with dimension attributes") {
    val en = result.where(!col("lemma").endsWith("ä"))
    assert(en.count() > 0)
    assert(en.where(col("freq").isNull).count() == 0)
  }

  test("rejected side output partitions the input: kept + rejected = total") {
    val lines = Flagship.synthLog(Tables(spark, Sf, "events"))
    val total = lines.count()
    val kept = Flagship.logToRequests(lines).count()
    val rejected = Flagship.rejectedLines(lines).count()
    assert(kept + rejected == total)
    assert(rejected > 0)
  }

  test("flagship plan broadcasts the dimension and keeps the fact side shuffle-free pre-sort") {
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
