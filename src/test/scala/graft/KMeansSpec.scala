package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans

/** Lloyd's k-means vs an in-memory reference implementation on the
  * embeddings table. */
class KMeansSpec extends AnyFunSuite {
  import TestSpark.spark

  private val K = 8
  private val Iters = 5

  private lazy val vecs = Tables(spark, TestSpark.Sf, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))

  private lazy val inMem: Seq[(Long, Array[Double])] = vecs
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    .sortBy(_._1)

  /** Sequential reference Lloyd, same init and tie-break. */
  private def referenceFit(k: Int, iters: Int): (Map[Long, Int], Array[Array[Double]]) = {
    var cents = inMem.take(k).map(_._2.clone()).toArray
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def nearest(v: Array[Double]): Int =
      cents.indices.minBy(j => (sq(v, cents(j)), j))
    (1 to iters).foreach { _ =>
      val byC = inMem.groupBy { case (_, v) => nearest(v) }
      cents = cents.indices.map { j =>
        byC.get(j).fold(cents(j)) { members =>
          val s = Array.ofDim[Double](cents(j).length)
          members.foreach { case (_, v) =>
            var i = 0; while (i < v.length) { s(i) += v(i); i += 1 } }
          s.map(_ / members.size)
        }
      }.toArray
    }
    (inMem.map { case (id, v) => id -> nearest(v) }.toMap, cents)
  }

  test("matches the sequential reference after the same iterations") {
    val (assigned, cents, wcss) = KMeans.fit(vecs, K, maxIter = Iters, tol = 0.0)
    val (refAssign, refCents) = referenceFit(K, Iters)
    // centroids agree to float-sum tolerance
    cents.zip(refCents).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    val mine = assigned.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(mine == refAssign)
    // the objective never increases across iterations
    assert(wcss.zip(wcss.tail).forall { case (a, b) => b <= a + 1e-9 })
    assert(wcss.size == Iters)
  }

  test("every point lands on its true nearest centroid") {
    val (assigned, cents, _) = KMeans.fit(vecs, K, maxIter = 3, tol = 0.0)
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byId = inMem.toMap
    assigned.collect().foreach { r =>
      val v = byId(r.getLong(0))
      val d = sq(v, cents(r.getInt(1)))
      val best = cents.map(sq(v, _)).min
      assert(d <= best + 1e-9)
    }
  }

  test("farthest-point seeding: deterministic, spread, and a valid Lloyd start") {
    val s1 = KMeans.seedFarthest(vecs, K)
    val s2 = KMeans.seedFarthest(vecs, K)
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq) // no RNG anywhere
    // seeds are pairwise distinct (farthest-point can never repeat a
    // point while distinct vectors remain)
    assert(s1.map(_.toSeq).distinct.length == K)
    // each next seed is at least as far from the prior seeds as every
    // LATER seed is from ITS priors (the k-center radius is monotone
    // non-increasing) — the defining property of the traversal
    def sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val radii = (1 until K).map(i => s1.take(i).map(sq(_, s1(i))).min)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a + 1e-9 })
    // and the seeded fit still satisfies the Lloyd invariants
    val (assigned, cents, wcss) = KMeans.fit(vecs, K, maxIter = 3, tol = 0.0,
      seeded = true)
    assert(assigned.select("cluster").distinct().count() > 1)
    assert(cents.length == K)
    assert(wcss.zip(wcss.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("deterministic across runs") {
    val a = KMeans.fit(vecs, K, maxIter = 3, tol = 0.0)._1.collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val b = KMeans.fit(vecs, K, maxIter = 3, tol = 0.0)._1.collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
