package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Fence.FenceOps

/** Distributed Lloyd's k-means over embedding columns — the trainer
  * for the IVF coarse quantizer (`q_knn_ivf` ships deterministic
  * literal centroids so it can be oracle-checked; production IVF
  * learns them from the corpus with exactly this loop).
  *
  * Scale shape per iteration:
  *
  *  - ASSIGN is a pure per-row expression: the k centroids are plain
  *    literals compiled into an `array_min` over (distance, index)
  *    structs — whole-stage codegen, no broadcast variable, no UDF,
  *    no shuffle;
  *  - UPDATE is one partial-aggregable groupBy: `posexplode` feeds a
  *    (cluster, dim) sum/count — the exchange carries k·dim doubles
  *    per upstream partition, never vectors — followed by a k·dim-row
  *    collect to the driver (the same driver-resident centroid state
  *    every Lloyd implementation keeps);
  *  - iteration state is k·dim doubles on the driver — nothing
  *    iterative lives in executor memory, so lineage stays flat
  *    (each round's plan references only literals + the input).
  *
  * Determinism: both init schemes are RNG-free — `seeded = false`
  * takes the k smallest-id vectors; `seeded = true` runs
  * deterministic k-means++-style farthest-point seeding
  * ([[seedFarthest]]). Sums run in double but cluster sizes at any
  * realistic scale make the final argmin assignment stable;
  * KMeansSpec property-checks the whole loop against an in-memory
  * reference implementation.
  */
object KMeans {

  /** Deterministic k-means++-style seeding, no RNG: seed 1 is the
    * smallest-id vector; each next seed is the point with MAXIMAL
    * distance² to its nearest existing seed (ties to the smallest
    * id) — the farthest-point traversal, i.e. k-means++ with the
    * argmax in place of the d²-weighted draw. Unlike smallest-id
    * init (degenerate when low ids cluster together), the seeds
    * provably 2-approximate the optimal k-center cover, so Lloyd's
    * starts from spread, non-colliding cells.
    *
    * Scale shape: k−1 passes, each ONE codegen scan (≤ k distance
    * expressions per row) into a TakeOrdered(1) — no shuffle, no
    * driver state beyond the k×d seed matrix. */
  def seedFarthest(vecs: DataFrame, k: Int): Array[Array[Double]] = {
    val src = vecs.toDF("id", "v")
    val first = src.orderBy(col("id")).limit(1)
      .select(col("v")).collect()
    require(first.nonEmpty, "need at least 1 vector to seed")
    var seeds = Vector(first(0).getSeq[Double](0).toArray)
    while (seeds.length < k) {
      val d2near = array_min(array(seeds.map { c =>
        val lit_c = array(c.map(lit(_)): _*)
        // native codegen kernel, same l->r accumulation as the HOF form
        graft.functions.GraftExpressions.sq_dist(col("v"), lit_c)
      }: _*))
      val far = src.select(col("id"), col("v"), d2near.as("d2"))
        .orderBy(col("d2").desc, col("id")).limit(1)
        .select(col("v"), col("d2")).collect()
      // Seed-collision guard: if the farthest remaining point is at
      // d2=0 the corpus has fewer than k distinct vectors, and the
      // duplicated seed would silently produce empty clusters — fail
      // loudly, like the unseeded path's `centroids.length == k`.
      require(far.nonEmpty && far(0).getDouble(1) > 0.0,
        s"need at least $k distinct vectors to seed, collided at ${seeds.length}")
      seeds :+= far(0).getSeq[Double](0).toArray
    }
    seeds.toArray
  }

  /** @param vecs (id, v: array<double>) — `id` any orderable column
    * @param seeded farthest-point seeding ([[seedFarthest]]) instead
    *   of the k smallest-id vectors; both deterministic
    * @return (assignments (id, cluster), centroids, per-iteration WCSS) */
  def fit(vecs: DataFrame, k: Int, maxIter: Int = 10, tol: Double = 1e-6,
      seeded: Boolean = false)
      : (DataFrame, Array[Array[Double]], Seq[Double]) = {
    require(k >= 1, s"k must be >= 1, got $k")
    val src = vecs.toDF("id", "v").fenced() // scanned every iteration
    var centroids: Array[Array[Double]] =
      if (seeded) seedFarthest(src, k)
      else src.orderBy(col("id")).limit(k)
        .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    require(centroids.length == k, s"need at least $k vectors, got ${centroids.length}")
    val wcss = Seq.newBuilder[Double]
    var moved = Double.MaxValue
    var iter = 0
    var assigned: DataFrame = null
    // The per-iteration stats collect is MODEL-scale past its map-side
    // partial agg — the exchange carries ≤ k·dim groups per map
    // partition no matter the corpus size — so AQE's per-exchange
    // re-plan + extra job per iteration buys nothing (the Sgns r19
    // precedent). The loop runs with AQE off and a model-derived
    // static partition count (k·dim groups, one partition per ~400 k —
    // i.e. 1 for any sane k·dim), session settings restored after.
    // Every aggregate here keys (cluster, dim) to a single reducer
    // whose partial-combine order is the map-id order either way, so
    // the collected sums are unchanged.
    val conf = vecs.sparkSession.conf
    val aqeBefore = conf.get("spark.sql.adaptive.enabled", "true")
    val shufBefore = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions",
      math.max(1L, k.toLong * centroids(0).length / 400000L + 1).toString)
    try {
      while (iter < maxIter && moved > tol) {
        assigned = assign(src, centroids)
        // one aggregation computes BOTH the new centroids and the
        // objective: (cluster, dim) sums/counts + per-row distance sum
        val stats = assigned
          .select(col("cluster"), col("d2"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy(col("cluster"), col("dim"))
          .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"),
            // d2 is per-row; counted once per row via dim 0 only
            sum(when(col("dim") === 0, col("d2")).otherwise(0.0)).as("sd2"))
          .collect()
        wcss += stats.map(_.getAs[Double]("sd2")).sum
        val next = Array.ofDim[Double](k, centroids(0).length)
        val counts = Array.ofDim[Long](k)
        stats.foreach { r =>
          val c = r.getAs[Int]("cluster"); val d = r.getAs[Int]("dim")
          next(c)(d) = r.getAs[Double]("sx")
          counts(c) = r.getAs[Long]("n")
        }
        (0 until k).foreach { c =>
          if (counts(c) > 0) (0 until next(c).length).foreach(d => next(c)(d) /= counts(c))
          else next(c) = centroids(c) // empty cluster keeps its centroid
        }
        moved = (0 until k).map(c => sqDist(centroids(c), next(c))).max
        centroids = next
        iter += 1
      }
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqeBefore)
      conf.set("spark.sql.shuffle.partitions", shufBefore)
    }
    (assign(src, centroids).select(col("id"), col("cluster")), centroids, wcss.result())
  }

  /** Per-row nearest-centroid assignment as a pure expression:
    * array_min over (distance², index) structs — struct comparison is
    * lexicographic, so ties break to the lower index, same as the
    * reference loop in the spec. */
  private def assign(src: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val dists: Seq[Column] = centroids.toIndexedSeq.zipWithIndex.map { case (c, j) =>
      val lit_c = array(c.map(lit(_)): _*)
      val d2 = graft.functions.GraftExpressions.sq_dist(col("v"), lit_c)
      struct(d2.as("d2"), lit(j).as("j"))
    }
    val best = array_min(array(dists: _*))
    src.select(col("id"), col("v"),
      best.getField("j").as("cluster"), best.getField("d2").as("d2"))
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }
}
