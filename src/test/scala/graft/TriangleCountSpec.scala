package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** The degree-ordered-orientation triangle count must equal the
  * brute-force all-pairs count on the same edge set — the orientation
  * is a performance device and must not change the answer. */
class TriangleCountSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  test("oriented wedge count equals brute-force triangle enumeration") {
    import spark.implicits._
    val row = SparkEntry.queries("q_triangle_count")(spark, Sf)
      .as[(Long, Long, Long)].collect().head
    val (nNodes, nEdges, nTri) = row

    // independent recompute: collect the undirected edge set, count
    // triangles by intersecting adjacency sets (fine at test scale)
    val li = Tables(spark, Sf, "lineitem")
      .where(col("l_partkey") % 5 === 0)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("s"))
    val edges = li.as("a").join(li.as("b"), "k")
      .where($"a.s" =!= $"b.s")
      .select(least($"a.s", $"b.s").as("u"), greatest($"a.s", $"b.s").as("v"))
      .distinct().as[(Long, Long)].collect().toSet

    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    assert(nNodes == nodes.size)
    assert(nEdges == edges.size)

    val adj = nodes.map { n =>
      n -> edges.collect {
        case (u, v) if u == n => v
        case (u, v) if v == n => u
      }
    }.toMap
    val brute = edges.toSeq.map { case (u, v) =>
      (adj(u) intersect adj(v)).count(w => w > v) // u < v < w: once each
    }.sum
    // count each triangle once: for edge (u,v) with u<v, third vertex
    // w>v — but w may sort between u and v; count all intersections
    // and divide by 3 instead for robustness
    val bruteAll = edges.toSeq.map { case (u, v) =>
      (adj(u) intersect adj(v)).size
    }.sum
    assert(bruteAll % 3 == 0, s"every triangle closes 3 edges, got $bruteAll")
    assert(nTri == bruteAll / 3,
      s"oriented=$nTri brute=${bruteAll / 3} (w>v variant=$brute)")
  }
}
