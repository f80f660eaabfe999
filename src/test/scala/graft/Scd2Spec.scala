package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the SCD-2 history build — the contract a
  * fact-table AS-OF join relies on, checked independently of the
  * oracle's value-level hash. */
class Scd2Spec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  private lazy val rows =
    SparkEntry.queries("q_dim_scd2")(spark, Sf)
      .select($"user_id", $"version", $"value",
        $"valid_from_snap", $"valid_to_snap", $"is_current")
      .as[(Long, Long, Double, Long, Option[Long], Boolean)]
      .collect().toSeq

  test("per user: versions are 1..n, intervals chain, exactly one current") {
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val s = vs.sortBy(_._2)
      assert(s.map(_._2) == (1L to s.size), s"user $u: version gap")
      s.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.contains(b._4),
            s"user $u: version ${a._2} valid_to != next valid_from")
          assert(a._3 != b._3,
            s"user $u: consecutive versions carry the same value")
        case _ =>
      }
      assert(s.init.forall(!_._6) && s.last._6 && s.last._5.isEmpty,
        s"user $u: is_current/open-interval must mark exactly the last version")
    }
  }

  test("a changing user produces multiple versions somewhere") {
    assert(rows.groupBy(_._1).values.exists(_.size >= 2),
      "no user changed value across snapshots — vacuous fixture")
  }
}
