package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** Pins the distributed fixed-point PageRank to an independent
  * in-memory implementation of the same integer recurrence (the same
  * property-test pattern as CC vs union-find), plus the invariants the
  * fixed-point design guarantees. */
class PageRankSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Asymmetric digraph, every node with in- and out-edges: a 4-cycle
  // with chords plus a 2-node appendage — unequal degrees so ranks
  // genuinely differ (not the regular-graph fixed point).
  private val edges: Seq[(Long, Long)] = Seq(
    1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, // cycle
    1L -> 3L, 2L -> 4L, // chords: 3 and 4 get extra in-mass
    4L -> 5L, 5L -> 6L, 6L -> 4L // appendage cycle
  )

  test("distributed ranks equal the in-memory integer recurrence") {
    val df = edges.toDF("src", "dst").localCheckpoint()
    for (iters <- Seq(1, 3, 7)) {
      val got = PageRank(df, iters).as[(Long, Long)].collect().toMap
      val want = PageRank.reference(edges, iters)
      assert(got === want, s"iters=$iters")
    }
  }

  test("fixed-point invariants: teleport floor and mass ceiling") {
    val df = edges.toDF("src", "dst").localCheckpoint()
    val ranks = PageRank(df, 5).as[(Long, Long)].collect().toMap
    assert(ranks.keySet === (1L to 6L).toSet)
    // every rank ≥ 0.15 (teleport term), none above total initial mass
    assert(ranks.values.forall(_ >= PageRank.TeleportFp))
    assert(ranks.values.forall(_ <= 6L * PageRank.Scale))
    // truncating division only sheds mass: total never exceeds n·Scale
    assert(ranks.values.sum <= 6L * PageRank.Scale)
    // node 4 has the most in-edges (from 3, 2 and 6) — it tops the ranking
    assert(ranks(4L) === ranks.values.max)
  }

  test("broadcast and co-partition paths are bit-equal (and equal the reference)") {
    val df = edges.toDF("src", "dst").localCheckpoint()
    for (iters <- Seq(1, 4)) {
      val bc = PageRank(df, iters, broadcastRanks = Some(true))
        .as[(Long, Long)].collect().toMap
      val sh = PageRank(df, iters, broadcastRanks = Some(false))
        .as[(Long, Long)].collect().toMap
      assert(bc === sh, s"paths diverge at iters=$iters")
      assert(bc === PageRank.reference(edges, iters), s"iters=$iters")
    }
    // the co-partition path must genuinely not broadcast the ranks:
    // every per-iteration join plans as a shuffle-based join
    val plan = PageRank(df, 2, broadcastRanks = Some(false))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"rank join broadcast on the co-partition path:\n$plan")
  }

  test("ranks are partitioning-invariant (integer sums commute)") {
    val df = edges.toDF("src", "dst")
    val one = PageRank(df.coalesce(1).localCheckpoint(), 4)
      .orderBy(col("id")).as[(Long, Long)].collect().toSeq
    val many = PageRank(df.repartition(7).localCheckpoint(), 4)
      .orderBy(col("id")).as[(Long, Long)].collect().toSeq
    assert(one === many)
  }

  test("personalized on an asymmetric graph: src-only seeds keep teleport mass") {
    // The round-10 operator inner-joined scores against the teleport
    // vector, silently dropping a seed with out-edges but no in-edges
    // after iteration 1; the twin meanwhile threw on src nodes never
    // seen as dst. This graph has both pathologies: 10 is a src-only
    // SEED (no in-edges), 11 is dst-only (a sink).
    val asym: Seq[(Long, Long)] = Seq(
      10L -> 1L, // seed 10: out-edge only — must keep TeleportFp forever
      1L -> 2L, 2L -> 1L,
      2L -> 11L // 11: dst-only sink — outside the rank domain
    )
    val df = asym.toDF("src", "dst").localCheckpoint()
    val seedSet = Set(10L)
    val seeds = seedSet.toSeq.toDF("id")
    for (iters <- Seq(1, 2, 4)) {
      val got = PageRank.personalized(df, iters, seeds)
        .as[(Long, Long)].collect().toMap
      val want = PageRank.personalizedReference(asym, iters, seedSet)
      assert(got === want, s"iters=$iters")
      // the rank domain is exactly the src set; the seed keeps its
      // teleport floor in every iteration
      assert(got.keySet === Set(1L, 2L, 10L), s"iters=$iters")
      assert(got(10L) >= PageRank.TeleportFp, s"iters=$iters")
    }
  }

  test("personalized: matches its reference, concentrates near the seeds") {
    val df = edges.toDF("src", "dst").localCheckpoint()
    val seedSet = Set(1L)
    val seeds = seedSet.toSeq.toDF("id")
    for (iters <- Seq(1, 3, 5)) {
      val got = PageRank.personalized(df, iters, seeds)
        .as[(Long, Long)].collect().toMap
      assert(got === PageRank.personalizedReference(edges, iters, seedSet),
        s"iters=$iters")
    }
    val ppr = PageRank.personalized(df, 5, seeds).as[(Long, Long)].collect().toMap
    // trust decays with distance (a well-linked hub near the seed may
    // outrank the seed itself — that's PPR working, not failing): the
    // appendage (only reachable through 4 → 5 → 6) ranks below the
    // seed and below the seed's direct successor
    assert(ppr(5L) < ppr(1L) && ppr(6L) < ppr(1L))
    assert(ppr(5L) < ppr(2L) && ppr(6L) < ppr(2L))
    // a seedless far component would be rank-0: mass exists only via S
    assert(ppr.values.sum <= PageRank.Scale)
    // both join paths bit-equal here too
    val bc = PageRank.personalized(df, 3, seeds, broadcastRanks = Some(true))
      .as[(Long, Long)].collect().toMap
    val sh = PageRank.personalized(df, 3, seeds, broadcastRanks = Some(false))
      .as[(Long, Long)].collect().toMap
    assert(bc === sh)
  }
}
