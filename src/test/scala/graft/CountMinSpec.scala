package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  test("CMS estimates dominate true counts (one-sided error) and absent words stay near 0") {
    import spark.implicits._
    val est = SparkEntry.queries("q_sketch_cms")(spark, Sf)
      .as[(String, Long)].collect().toMap
    val truth = Tables(spark, Sf, "documents")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    est.foreach { case (w, e) =>
      assert(e >= truth.getOrElse(w, 0L), s"CMS under-estimated $w")
    }
    // d=4 × w=256 over ~26k tokens: collisions inflate, but an absent
    // word must stay well below the frequent ones
    assert(est("zzz_absent") < est("the"))
  }
}
