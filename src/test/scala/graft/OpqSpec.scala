package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Opq, Pca}
import graft.queries.SimilarityQueries

/** The parametric-OPQ rotation (Ge et al. CVPR'13 §4) behind
  * q_knn_ivf_opq: orthonormality (the property that makes rotated
  * assignment/rerank agree with raw space), deterministic allocation,
  * and the balance claim — the greedy eigenvalue-product allocation
  * must spread information across subspaces at least as evenly as the
  * naive contiguous split. */
class OpqSpec extends AnyFunSuite {
  import TestSpark.spark

  private val D = 64
  private val M = 4

  private lazy val rot =
    SimilarityQueries.opqRotation(spark, TestSpark.Sf)

  test("the rotation is orthonormal to machine precision (rows unit, " +
      "pairwise orthogonal) — so cosine/dot/norm survive it") {
    assert(rot.length == D && rot.forall(_.length == D))
    for (i <- 0 until D) {
      val n = math.sqrt(rot(i).map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"row $i norm $n")
      for (j <- (i + 1) until D) {
        val d0 = rot(i).zip(rot(j)).map { case (a, b) => a * b }.sum
        assert(math.abs(d0) < 1e-8, s"rows $i,$j dot $d0")
      }
    }
  }

  test("rotation is deterministic (two independent trainings agree " +
      "bit-for-bit) and genuinely differs from the identity") {
    val again = SimilarityQueries.opqRotation(spark, TestSpark.Sf)
    assert(rot.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "two trainings diverged — the no-RNG contract broke")
    val offDiag = (0 until D).map(i => rot(i)(i)).count(v => math.abs(v) > 0.99)
    assert(offDiag < D, "rotation is (near-)identity — vacuous OPQ")
  }

  test("greedy allocation balances per-subspace eigenvalue " +
      "log-products at least as well as the contiguous split, fills " +
      "every subspace to capacity, and covers every dimension once") {
    import spark.implicits._
    val vecs = graft.Tables(spark, TestSpark.Sf, "embeddings")
      .selectExpr("CAST(embedding AS array<double>) AS v")
      .as[Array[Double]]
    val (_, _, cov) = Pca.momentsOf(vecs, D)
    val (vals, _) = {
      // re-derive the spectrum the operator allocates over
      val m = Pca.fit(vecs, D, D)
      (m.eigenvalues, m.components)
    }
    val alloc = Opq.allocate(vals, M)
    assert(alloc.length == M && alloc.forall(_.length == D / M))
    assert(alloc.flatten.sorted.toSeq == (0 until D), "not a partition")
    def spread(a: Seq[Seq[Int]]): Double = {
      val ps = Opq.subspaceLogProducts(vals, a)
      ps.max - ps.min
    }
    val contiguous = (0 until M).map(j =>
      (j * (D / M) until (j + 1) * (D / M)).toSeq)
    assert(spread(alloc.map(_.toSeq).toSeq) <= spread(contiguous) + 1e-9,
      "greedy allocation is WORSE-balanced than the contiguous split")
    assert(cov.length == D)
  }
}
