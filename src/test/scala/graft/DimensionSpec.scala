package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dim.Dimension

class DimensionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("argmin dedup keeps the record with smallest hidx, null ranks as 0") {
    val dim = Seq(
      ("haus", Some(2), "WDG"),
      ("haus", None, "DWB"),    // null hidx ≙ 0 → wins
      ("baum", Some(1), "WDG")).toDF("lemma", "hidx", "source")
    val out = Dimension.dedupBy(dim, "lemma", "hidx")
      .orderBy("lemma").as[(String, Option[Int], String)].collect().toSeq
    assert(out == Seq(("baum", Some(1), "WDG"), ("haus", None, "DWB")))
  }

  test("ties broken deterministically by remaining columns") {
    val dim = Seq(
      ("x", 1, "b"), ("x", 1, "a"), ("x", 2, "0")).toDF("lemma", "hidx", "source")
    val out = Dimension.dedupBy(dim, "lemma", "hidx")
      .as[(String, Int, String)].collect().toSeq
    assert(out == Seq(("x", 1, "a")))
  }
}
