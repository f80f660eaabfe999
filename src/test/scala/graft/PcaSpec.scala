package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

/** PCA pinning: the one-pass distributed moments must agree with an
  * in-memory covariance (and with the exact-decimal oracle twin
  * `q_embed_cov` on the shared dimension slice); the fitted
  * components must satisfy the eigen equations of that matrix. */
class PcaSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private val D = 64

  private lazy val inMem: Seq[Array[Double]] = {
    import spark.implicits._
    Tables(spark, Sf, "embeddings")
      .select(col("embedding").cast("array<double>"))
      .as[Array[Double]].collect().toSeq
  }

  private lazy val vecsDs = {
    import spark.implicits._
    Tables(spark, Sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v")).as[Array[Double]]
  }

  private def localCov: (Array[Double], Array[Array[Double]]) = {
    val n = inMem.length
    val mean = Array.tabulate(D)(i => inMem.map(_(i)).sum / n)
    val cov = Array.tabulate(D, D) { (i, j) =>
      inMem.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1)
    }
    (mean, cov)
  }

  test("distributed moments equal the in-memory covariance") {
    val (_, mean, cov) = Pca.momentsOf(vecsDs, D)
    val (lm, lc) = localCov
    (0 until D).foreach { i =>
      assert(math.abs(mean(i) - lm(i)) < 1e-9, s"mean($i)")
      (i until D).foreach { j =>
        assert(math.abs(cov(i)(j) - lc(i)(j)) < 1e-7,
          s"cov($i,$j): ${cov(i)(j)} vs ${lc(i)(j)}")
      }
    }
  }

  test("aggregator covariance agrees with the exact-decimal oracle twin on dims 1..8") {
    import spark.implicits._
    val twin = SparkEntry.queries("q_embed_cov")(spark, Sf)
      .as[(Int, Int, Double)].collect()
      .map { case (i, j, c) => (i - 1, j - 1) -> c }.toMap
    val (_, _, cov) = Pca.momentsOf(vecsDs, D)
    twin.foreach { case ((i, j), c) =>
      // the twin rounds elements to 6 dp first, so agreement is to
      // the rounding's propagated error, not machine epsilon
      assert(math.abs(cov(i)(j) - c) < 1e-5, s"twin cov($i,$j): ${cov(i)(j)} vs $c")
    }
  }

  test("fitted components are orthonormal eigenvectors with descending eigenvalues") {
    // extra iterations here: the random embedding cloud is near-
    // isotropic (tight eigengaps), and power-iteration convergence is
    // geometric in the gap ratio — the residual tolerance below is
    // the realistic bound for that spectrum, not machine epsilon
    val model = Pca.fit(vecsDs, D, k = 4, iters = 300)
    val (_, cov) = localCov
    // descending, positive
    model.eigenvalues.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) }
    assert(model.eigenvalues.forall(_ > 0))
    model.components.zip(model.eigenvalues).foreach { case (v, lambda) =>
      // unit norm
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
      // eigen equation: C v ≈ λ v
      val cv = Array.tabulate(D)(r => (0 until D).map(j => cov(r)(j) * v(j)).sum)
      val resid = math.sqrt(cv.zip(v).map { case (a, b) => val d = a - lambda * b; d * d }.sum)
      assert(resid < 1e-4 * math.max(1.0, math.abs(lambda)),
        s"eigen residual $resid for lambda=$lambda")
    }
    // pairwise orthogonality
    for (a <- model.components.indices; b <- a + 1 until model.components.length) {
      val dot = model.components(a).zip(model.components(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-4, s"components $a,$b not orthogonal: $dot")
    }
  }

  test("projection matches the in-memory computation and the query invariants hold") {
    import spark.implicits._
    val model = Pca.fit(vecsDs, D, k = 4)
    val got = graft.queries.SimilarityQueries.pcaProjection(spark, Sf)
      .as[(Long, Array[Double])].collect().toMap
    val raw = Tables(spark, Sf, "embeddings").where(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    assert(got.size === raw.length)
    raw.foreach { case (id, v) =>
      val proj = model.project(v)
      assert(got(id).length === proj.length)
      got(id).zip(proj).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-9, s"proj($id)")
      }
    }
    // the oracle-checked entry emits the Bessel verdict over this
    // same projection — all-true on real output, and NOT vacuous:
    // the projection captures a nonzero fraction of each norm
    val rows = SparkEntry.queries("q_embed_pca")(spark, Sf).collect()
    assert(rows.length === raw.length)
    assert(rows.forall(_.getBoolean(3)), "proj_ok false somewhere")
    raw.foreach { case (id, v) =>
      val p2 = model.project(v).map(x => x * x).sum
      assert(p2 > 0.0, s"zero projection for $id")
    }
  }
}
