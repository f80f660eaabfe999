package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash
import graft.operators.RandomWalk

/** Focused operator spec for the r19 path-accumulator rewrite of
  * [[RandomWalk]] (one linear join chain + self-loop rows for dead
  * ends, replacing the per-step union): the DEAD-END semantics the
  * query-level GraphWalkSpec cannot see (the bench graph is
  * symmetrized, so every node has out-edges). Pins the operator
  * against a sequential reference on an asymmetric graph with
  *  - a reachable dead end (no out-edges),
  *  - a walk SEEDED at the dead end (emits only step 0),
  *  - a seed absent from the graph entirely (emits only step 0).
  */
class RandomWalkSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val Len = 4
  // 3 and 7 are dead ends (appear only as dst); 99 is off-graph
  private val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 1L, 2L -> 7L)
  private val seeds = Seq(101L -> 1L, 102L -> 2L, 103L -> 3L, 199L -> 99L)

  private def hashCol(salt: String)(wid: Column, st: Int): Column =
    PortableHash.md5Long(concat(wid.cast("string"), lit(s":$salt$st")))
  private def hashRef(salt: String)(w: Long, st: Int): Long =
    PortableHash.digest60(s"$w:$salt$st")

  private def ns: Map[Long, Vector[Long]] =
    edges.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toVector).toMap

  /** Sequential twin of the ORIGINAL union-form `walks` semantics. */
  private def refWalks: Seq[(Long, Long, Long)] =
    seeds.flatMap { case (w, s) =>
      var cur = s
      var alive = true
      (0L to Len.toLong).flatMap { st =>
        if (st == 0L) Some((w, 0L, cur))
        else if (!alive) None
        else ns.get(cur) match {
          case Some(nbrs) =>
            cur = nbrs((hashRef("")(w, st.toInt) % nbrs.size).toInt)
            Some((w, st, cur))
          case None => alive = false; None
        }
      }
    }

  /** Sequential twin of the ORIGINAL `biasedWalks` semantics
    * (wBack=4, wCommon=2, wFar=1; step 1 uniform). */
  private def refBiased: Seq[(Long, Long, Long)] =
    seeds.flatMap { case (w, s) =>
      val out = Seq.newBuilder[(Long, Long, Long)]
      out += ((w, 0L, s))
      var prev = s
      var cur = s
      var alive = ns.contains(s)
      if (alive) {
        val nbrs = ns(s)
        cur = nbrs((hashRef("b")(w, 1) % nbrs.size).toInt)
        out += ((w, 1L, cur))
        var st = 2
        while (st <= Len && alive) {
          ns.get(cur) match {
            case Some(nbrs2) =>
              val wts = nbrs2.map { x =>
                if (x == prev) 4L
                else if (ns.get(prev).exists(_.contains(x))) 2L
                else 1L
              }
              val wtot = wts.sum
              val r = hashRef("b")(w, st) % wtot
              var cum = 0L
              var picked = -1
              for (i <- nbrs2.indices if picked < 0) {
                cum += wts(i)
                if (cum > r && cum - wts(i) <= r) picked = i
              }
              prev = cur
              cur = nbrs2(picked)
              out += ((w, st.toLong, cur))
            case None => alive = false
          }
          st += 1
        }
      }
      out.result()
    }

  test("walks: dead ends, dead seeds and off-graph seeds match the " +
      "sequential reference") {
    val got = RandomWalk.walks(
      edges.toDF("src", "dst"), seeds.toDF("walk_id", "node"),
      Len, hashCol(""))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == refWalks.sorted)
    // sanity: the dead end is actually exercised (some walk shorter
    // than Len, and the dead/off-graph seeds emit exactly one row)
    assert(got.count(_._1 == 103L) == 1 && got.count(_._1 == 199L) == 1)
    assert(got.groupBy(_._1).values.map(_.size).min == 1)
  }

  test("biasedWalks: dead ends, dead seeds and off-graph seeds match " +
      "the sequential reference") {
    val got = RandomWalk.biasedWalks(
      edges.toDF("src", "dst"), seeds.toDF("walk_id", "node"),
      Len, hashCol("b"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == refBiased.sorted)
    assert(got.count(_._1 == 103L) == 1 && got.count(_._1 == 199L) == 1)
  }
}
