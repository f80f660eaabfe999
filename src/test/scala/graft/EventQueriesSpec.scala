package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Cross-query consistency for the product-analytics composites:
  * the row-level sessionization must agree with the session-window
  * rollup, the funnel must be monotone, retention bounded by cohort
  * size. */
class EventQueriesSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("sessionize assignment agrees with the session-window rollup") {
    import spark.implicits._
    // per-user multiset of session sizes from the row-level assignment
    val fromAssign = run("q_sessionize")
      .groupBy("user_id", "sid").agg(count(lit(1)).as("n"))
      .select("user_id", "n").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // ... must equal the native session_window aggregation's
    val fromWindow = run("q_window_session")
      .select("user_id", "n").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(fromAssign == fromWindow)
  }

  test("funnel stages are monotone non-increasing and non-empty") {
    import spark.implicits._
    val stages = run("q_funnel").select("stage", "n_users")
      .as[(String, Long)].collect().sortBy(_._1).map(_._2)
    assert(stages.length == 3)
    assert(stages(0) >= stages(1) && stages(1) >= stages(2))
    assert(stages(0) > 0)
  }

  test("retention: day-0 activity equals cohort size, later days bounded by it") {
    import spark.implicits._
    val rows = run("q_retention")
      .select(col("cohort").cast("string"), col("day_offset"), col("active_users"))
      .as[(String, Int, Long)].collect()
    val cohortSize = Tables(spark, Sf, "events")
      .groupBy("user_id").agg(min(date_trunc("day", col("ts"))).as("cohort"))
      .groupBy(col("cohort").cast("string")).agg(count(lit(1)).as("size"))
      .as[(String, Long)].collect().toMap
    assert(rows.nonEmpty)
    rows.foreach { case (cohort, off, active) =>
      assert(active <= cohortSize(cohort))
      if (off == 0) assert(active == cohortSize(cohort),
        s"cohort $cohort day-0 active $active != size ${cohortSize(cohort)}")
    }
  }
}
