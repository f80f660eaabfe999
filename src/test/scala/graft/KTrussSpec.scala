package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KTruss

/** Peeling correctness on hand-built graphs with known trusses, a
  * brute-force support cross-check (covering the degree-ordered
  * orientation device), and the oracle-unroll contracts: fixpoint
  * within 10 peels (with a doubled-graph margin) and idempotence. */
class KTrussSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  private def edges(pairs: Seq[(Long, Long)]) =
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")

  test("clique plus triangle chain: 4-truss is exactly the clique") {
    // K5 on 0..4 (every edge closes 3 triangles) plus a chain of
    // triangles 4-10-11, 10-11-12 hanging off node 4: chain edges
    // close ≤ 1 triangle and must peel away at k=4 (support ≥ 2).
    val k5 = for { i <- 0L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val chain = Seq((4L, 10L), (4L, 11L), (10L, 11L), (10L, 12L), (11L, 12L))
    val truss = KTruss(edges(k5 ++ chain), k = 4)
      .as[(Long, Long, Long)].collect().sorted
    assert(truss.toSeq == k5.map { case (u, v) => (u, v, 3L) })
  }

  test("triangle-free graph: empty truss, loop terminates") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    assert(KTruss(edges(star), k = 3).count() == 0)
  }

  test("single triangle is its own 3-truss") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val truss = KTruss(edges(tri), k = 3)
      .as[(Long, Long, Long)].collect().sorted
    assert(truss.toSeq == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("oriented support equals brute-force common-neighbor counts") {
    // the registry graph at sf0.001; independent recompute with plain
    // Scala adjacency sets — no orientation, no Spark
    val li = Tables(spark, Sf, "lineitem")
      .where(col("l_partkey") % 5 === 0)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("s"))
    val e = li.as("a").join(li.as("b"), "k")
      .where(col("a.s") =!= col("b.s"))
      .select(least(col("a.s"), col("b.s")).as("u"),
        greatest(col("a.s"), col("b.s")).as("v"))
      .distinct()
    val truss = KTruss(e, k = 5).as[(Long, Long, Long)].collect()

    val es = truss.map { case (u, v, _) => (u, v) }.toSet
    val adj = es.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    for ((u, v, s) <- truss) {
      val common = (adj(u) & adj(v)).size
      assert(common == s, s"edge ($u,$v): oriented support $s != brute $common")
      assert(s >= 3, s"edge ($u,$v): support $s below k-2 at the fixpoint")
    }
    assert(truss.nonEmpty, "no 5-truss at sf0.001 — vacuous")
  }

  test("q_graph_ktruss converges within the oracle's 10 peels, with margin") {
    val li = Tables(spark, Sf, "lineitem")
      .where(col("l_partkey") % 5 === 0)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("s"))
    val e = li.as("a").join(li.as("b"), "k")
      .where(col("a.s") =!= col("b.s"))
      .select(least(col("a.s"), col("b.s")).as("u"),
        greatest(col("a.s"), col("b.s")).as("v"))
      .distinct()
    // maxIters = 10: KTruss throws if the fixpoint needs more rounds
    // than the SQL oracle unrolls, so these passing IS the proof.
    val truss = KTruss(e, k = 5, maxIters = 10)
    val n = truss.count()
    assert(n > 0)

    // Margin: a doubled graph (disjoint shifted copy) has the same
    // peel depth; the oracle's fixed unroll is not sitting at the
    // convergence boundary of this one dataset.
    val shift = lit(1000000L)
    val doubled = e.union(e.select(($"u" + shift).as("u"), ($"v" + shift).as("v")))
    assert(KTruss(doubled, k = 5, maxIters = 10).count() == 2 * n)
  }
}
