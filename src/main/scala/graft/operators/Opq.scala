package graft.operators

/** Optimized Product Quantization — the PARAMETRIC solution of
  * Ge et al., CVPR'13 §4 ("OPQ-P"): instead of iterating
  * rotation↔codebook (the non-parametric alternation), assume the
  * data is Gaussian-ish and solve the rotation in closed form —
  * eigen-rotate to DECORRELATE the dimensions, then allocate
  * eigen-dimensions to the M subspaces balancing the per-subspace
  * eigenvalue PRODUCT (the paper's optimality condition: subspaces
  * of equal information quantize best under a shared code budget).
  *
  * Deterministic end to end: the eigenbasis comes from [[Pca]]'s
  * no-RNG power iteration with deflation + canonical signs, the
  * allocation is a greedy largest-eigenvalue-first to the
  * smallest-log-product bucket with free capacity (ties to the
  * lowest bucket index). The returned rotation is ORTHONORMAL (rows
  * are the re-ordered eigenvectors), so cosine/dot/norm are
  * preserved: IVF assignment and exact rerank in rotated space agree
  * with raw space up to fp rounding, and PQ sees decorrelated,
  * energy-balanced subspaces.
  *
  * Scale shape: one distributed moment pass ([[Pca.momentsOf]] — a
  * d²-sized map-side-combined aggregate), then O(d³) driver work —
  * trivial at any corpus size for embedding-scale d. */
object Opq {

  /** Greedy balanced allocation of eigen-dimension indices (whose
    * eigenvalues arrive DESC) to m equal-capacity buckets: each index
    * in turn goes to the open bucket with the smallest accumulated
    * log-product (ties to the lowest bucket index). */
  def allocate(vals: Array[Double], m: Int): Array[Vector[Int]] = {
    val d = vals.length
    require(d % m == 0, s"d=$d not divisible by m=$m")
    val cap = d / m
    val logProd = new Array[Double](m)
    val buckets = Array.fill(m)(Vector.empty[Int])
    var i = 0
    while (i < d) {
      var best = -1
      var s = 0
      while (s < m) {
        if (buckets(s).length < cap &&
            (best < 0 || logProd(s) < logProd(best))) best = s
        s += 1
      }
      buckets(best) = buckets(best) :+ i
      logProd(best) += math.log(math.max(vals(i), 1e-300))
      i += 1
    }
    buckets
  }

  /** Per-bucket eigenvalue log-products under an allocation — the
    * balance statistic OpqSpec pins (the greedy spread must beat the
    * naive contiguous split's). */
  def subspaceLogProducts(vals: Array[Double],
      allocation: Seq[Seq[Int]]): Seq[Double] =
    allocation.map(_.map(i => math.log(math.max(vals(i), 1e-300))).sum)

  /** The d×d rotation, rows grouped by subspace: rows
    * [j·(d/m), (j+1)·(d/m)) are subspace j's eigen-dimensions in
    * allocation order. */
  def rotation(cov: Array[Array[Double]], m: Int, iters: Int = 100)
      : Array[Array[Double]] = {
    val d = cov.length
    val (vals, vecs) = Pca.topEigen(cov, d, iters)
    allocate(vals, m).flatMap(_.map(vecs))
  }
}
