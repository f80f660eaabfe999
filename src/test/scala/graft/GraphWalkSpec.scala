package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The hash-seeded walks must be REAL walks (every consecutive pair
  * an edge of the graph), complete (every seed, every step), and a
  * pure function of (walk, step) — re-running yields the identical
  * corpus, the property that replaces the RNG. */
class GraphWalkSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  private def run() =
    SparkEntry.queries("q_graph_walks")(spark, Sf)
      .as[(Long, Long, Long)].collect().toSeq

  test("walks are valid paths over the graph, one node per (walk, step)") {
    val rows = run()
    assert(rows.nonEmpty)
    val li = Tables(spark, Sf, "lineitem")
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct().as[(Long, Long)].collect()
    val edges = li.flatMap { case (p, sp) => Seq(p -> sp, sp -> p) }.toSet

    val byWalk = rows.groupBy(_._1)
    val maxStep = rows.map(_._2).max
    byWalk.foreach { case (w, steps) =>
      val s = steps.sortBy(_._2)
      assert(s.map(_._2) == (0L to maxStep), s"walk $w: missing steps")
      assert(s.head._3 == w, s"walk $w: step 0 must be the seed")
      s.sliding(2).foreach {
        case Seq(a, b) =>
          assert(edges((a._3, b._3)),
            s"walk $w: step ${b._2} uses a non-edge ${a._3}->${b._3}")
        case _ =>
      }
    }
  }

  test("the corpus is a pure function of (walk, step): reruns are identical") {
    assert(run() == run())
  }

  private def runBiased() =
    SparkEntry.queries("q_graph_walks_biased")(spark, Sf)
      .as[(Long, Long, Long)].collect().toSeq

  test("biased (node2vec) walks are valid paths, complete, and the bias " +
      "actually changes the corpus vs the uniform walks") {
    val rows = runBiased()
    assert(rows.nonEmpty)
    val li = Tables(spark, Sf, "lineitem")
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct().as[(Long, Long)].collect()
    val edges = li.flatMap { case (p, sp) => Seq(p -> sp, sp -> p) }.toSet
    val maxStep = rows.map(_._2).max
    rows.groupBy(_._1).foreach { case (w, steps) =>
      val s = steps.sortBy(_._2)
      assert(s.map(_._2) == (0L to maxStep), s"biased walk $w: missing steps")
      assert(s.head._3 == w, s"biased walk $w: step 0 must be the seed")
      s.sliding(2).foreach {
        case Seq(a, b) =>
          assert(edges((a._3, b._3)),
            s"biased walk $w: step ${b._2} uses a non-edge ${a._3}->${b._3}")
        case _ =>
      }
    }
    // same seeds, same length, DIFFERENT trajectories: a biased corpus
    // identical to the uniform one would mean the bias is inert (the
    // hash salts also differ, so equality would be doubly suspicious)
    val uniform = run()
    assert(rows.map(_._1).toSet == uniform.map(_._1).toSet)
    assert(rows.toSet != uniform.toSet,
      "biased corpus identical to the uniform corpus — bias inert?")
    // purity: reruns identical
    assert(runBiased() == rows)
  }
}
