package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the
  * dimensionality-reduction step ahead of ANN indexing (IVF/PQ train
  * on PCA-rotated vectors to equalize subspace energy).
  *
  * Scale shape (100 TB): the ONLY distributed pass is a single typed
  * [[Aggregator]] computing the moment triple (n, Σv, packed Σvvᵀ) —
  * a map-side-combined partial of fixed size d + d(d+1)/2 per task,
  * so the exchange carries O(d²) doubles per partition and nothing
  * row-sized (the CountMin UDAF precedent). The d×d eigenproblem is
  * then solved ON THE DRIVER by power iteration with deflation —
  * d = 64 here, and any practical embedding dimension keeps d² driver
  * work trivial next to one corpus scan. Projection is a second
  * stateless scan against the broadcast model.
  *
  * The naive declarative alternative (explode to elements, self-join
  * per id, groupBy (i,j)) shuffles d²·n rows — that form exists only
  * as the exact-decimal ORACLE twin over a dimension slice
  * (`q_embed_cov`); PcaSpec pins this aggregator against it and
  * against an in-memory reference fit.
  *
  * Determinism: no RNG — power iteration starts from the basis vector
  * of the largest diagonal entry, signs are canonicalized (first
  * nonzero component positive), and the input moments are plain
  * double sums (associative up to fp rounding; the spec compares with
  * tolerance, the oracle twin uses exact decimal instead).
  */
object Pca {

  /** Moment triple; `p` is the upper triangle of Σvvᵀ packed row-major. */
  case class Moments(n: Long, s: Array[Double], p: Array[Double])

  case class Model(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def project(v: Array[Double]): Array[Double] =
      components.map { c =>
        var acc = 0.0
        var i = 0
        while (i < v.length) { acc += (v(i) - mean(i)) * c(i); i += 1 }
        acc
      }
  }

  private class MomentsAgg(d: Int) extends Aggregator[Array[Double], Moments, Moments] {
    override def zero: Moments = Moments(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    override def reduce(m: Moments, v: Array[Double]): Moments = {
      require(v.length == d, s"expected dim $d, got ${v.length}")
      var i = 0
      var k = 0
      while (i < d) {
        m.s(i) += v(i)
        var j = i
        while (j < d) { m.p(k) += v(i) * v(j); j += 1; k += 1 }
        i += 1
      }
      Moments(m.n + 1, m.s, m.p)
    }
    override def merge(a: Moments, b: Moments): Moments = {
      var i = 0
      while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
      var k = 0
      while (k < a.p.length) { a.p(k) += b.p(k); k += 1 }
      Moments(a.n + b.n, a.s, a.p)
    }
    override def finish(m: Moments): Moments = m
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** One-pass distributed moments → driver-side (mean, covariance). */
  def momentsOf(vecs: Dataset[Array[Double]], d: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val m = vecs.select(new MomentsAgg(d).toColumn).head()
    val n = m.n
    require(n > 1, s"need at least 2 vectors, got $n")
    val mean = m.s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (m.p(k) - m.s(i) * m.s(j) / n) / (n - 1)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1; k += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Power iteration with deflation on the (driver-side) covariance. */
  private[operators] def topEigen(cov: Array[Array[Double]], k: Int, iters: Int)
      : (Array[Double], Array[Array[Double]]) = {
    val d = cov.length
    val c = cov.map(_.clone())
    val values = new Array[Double](k)
    val vectors = Array.ofDim[Double](k, d)
    var comp = 0
    while (comp < k) {
      // deterministic start: basis vector at the largest diagonal
      var best = 0
      var i = 1
      while (i < d) { if (c(i)(i) > c(best)(best)) best = i; i += 1 }
      var v = new Array[Double](d)
      v(best) = 1.0
      var it = 0
      while (it < iters) {
        val w = new Array[Double](d)
        var r = 0
        while (r < d) {
          var acc = 0.0
          var j = 0
          while (j < d) { acc += c(r)(j) * v(j); j += 1 }
          w(r) = acc
          r += 1
        }
        // Gram–Schmidt against already-found components: deflation
        // alone leaves O(residual) cross-talk when eigengaps are
        // tight; explicit re-orthogonalization keeps the basis
        // orthonormal to machine precision regardless of spectrum
        var pc = 0
        while (pc < comp) {
          val u = vectors(pc)
          var dot = 0.0
          var j = 0
          while (j < d) { dot += w(j) * u(j); j += 1 }
          j = 0
          while (j < d) { w(j) -= dot * u(j); j += 1 }
          pc += 1
        }
        val norm = math.sqrt(w.map(x => x * x).sum)
        if (norm > 0) { var j = 0; while (j < d) { w(j) /= norm; j += 1 } }
        v = w
        it += 1
      }
      // Rayleigh quotient = eigenvalue estimate
      var lambda = 0.0
      var r = 0
      while (r < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += c(r)(j) * v(j); j += 1 }
        lambda += v(r) * acc
        r += 1
      }
      // canonical sign: first nonzero component positive
      val fn = v.indexWhere(math.abs(_) > 1e-12)
      if (fn >= 0 && v(fn) < 0) { var j = 0; while (j < d) { v(j) = -v(j); j += 1 } }
      values(comp) = lambda
      vectors(comp) = v
      // deflate: c -= λ v vᵀ
      r = 0
      while (r < d) {
        var j = 0
        while (j < d) { c(r)(j) -= lambda * v(r) * v(j); j += 1 }
        r += 1
      }
      comp += 1
    }
    (values, vectors)
  }

  /** Fit the top-k model in one distributed pass + driver eigen. */
  def fit(vecs: Dataset[Array[Double]], d: Int, k: Int, iters: Int = 100): Model = {
    val (_, mean, cov) = momentsOf(vecs, d)
    val (values, vectors) = topEigen(cov, k, iters)
    Model(mean, values, vectors)
  }

  /** Project `(id, vec)` rows onto the model's components — a
    * stateless scan against the broadcast model closure. */
  def project(vecs: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    vecs.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, bc.value.project(v)) }
      .toDF(idCol, "pc")
  }
}
