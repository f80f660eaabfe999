package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LabelProp

/** Pins [[LabelProp]] against a sequential reference of the same
  * deterministic recurrence (synchronous update, most-frequent
  * neighbor label, min-label tie-break), and the broadcast vs
  * co-partition paths bit-equal — the PageRankSpec discipline. */
class LabelPropSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Sequential reference over an adjacency list. */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val in = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
    var lab = edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = in.map { case (v, srcs) =>
        val counts = srcs.groupBy(lab).map { case (l, xs) => l -> xs.size }
        v -> counts.toSeq.minBy { case (l, n) => (-n, l) }._1
      }
    }
    lab
  }

  // two 4-cliques bridged by a single edge — LPA must find both
  private val clique1 = Seq(0L, 1L, 2L, 3L)
  private val clique2 = Seq(10L, 11L, 12L, 13L)
  private val edges: Seq[(Long, Long)] = {
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a != b) yield (a, b)
    clique(clique1) ++ clique(clique2) ++ Seq((3L, 10L), (10L, 3L))
  }

  test("matches the sequential reference and finds both cliques") {
    val e = edges.toDF("src", "dst").localCheckpoint()
    val got = LabelProp(e, 3).as[(Long, Long)].collect().toMap
    assert(got == reference(edges, 3))
    val labs1 = clique1.map(got)
    val labs2 = clique2.map(got)
    assert(labs1.distinct.size == 1 && labs2.distinct.size == 1,
      s"cliques not uniform: $labs1 / $labs2")
    assert(labs1.head != labs2.head, "bridge edge merged the cliques")
  }

  test("broadcast and co-partition paths are bit-equal") {
    val e = edges.toDF("src", "dst").localCheckpoint()
    val b = LabelProp(e, 3, broadcastLabels = Some(true))
      .as[(Long, Long)].collect().toMap
    val c = LabelProp(e, 3, broadcastLabels = Some(false))
      .as[(Long, Long)].collect().toMap
    assert(b == c)
    val plan = LabelProp(e, 1, broadcastLabels = Some(false))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      "co-partition path must not broadcast the label vector")
  }
}
