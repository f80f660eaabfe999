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
  *  - ASSIGN is a pure per-row expression: an `array_min` over
  *    (distance, index) structs, whole-stage codegen, no UDF, no
  *    shuffle. Inside the Lloyd loop the centroids arrive as a
  *    broadcast HashMap probed by index through a mutable holder
  *    ([[graft.functions.GraftExpressions.vec_lookup]]) so ONE
  *    planned plan serves every iteration; the final assignment (the
  *    frame consumers read) compiles them as plain literals;
  *  - UPDATE is a narrow per-partition fold into (cluster, dim)
  *    sums/counts merged on the driver in partition-index order —
  *    the same k·dim doubles per upstream partition the pre-r19
  *    exchange carried into its single reducer, never vectors;
  *  - iteration state is k·dim doubles on the driver — nothing
  *    iterative lives in executor memory, so lineage stays flat.
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
    val dim = centroids(0).length
    // ONE planned-and-codegen'd plan serves ALL Lloyd iterations (r19
    // fourth-cut Sgns precedent): the per-iteration stats action used
    // to re-run the full Catalyst pass — the centroids were PLAN
    // LITERALS, so every iteration re-analyzed/optimized/codegen'd a
    // large k·dim-literal expression (~170 ms planning floor plus the
    // codegen compile) and paid a model-scale shuffle. The centroids
    // now reach the fixed plan as a broadcast HashMap probed by index
    // through [[graft.functions.GraftExpressions.vec_lookup]]'s
    // mutable holder (task binaries re-serialize per job submission,
    // so re-executing the SAME RDD reads the handle the driver just
    // swapped in), and the update aggregate is a narrow per-partition
    // fold + a driver merge in PARTITION-INDEX order — necessarily
    // narrow, because re-executing an RDD that contains a shuffle
    // would silently reuse the first iteration's map outputs.
    //
    // Exactness: per-partition sub-sums are the identical double
    // additions in the identical row order the old map-side partial
    // agg performed; the only freedom left is the final merge order,
    // now PINNED to partition index (the old single reducer consumed
    // map outputs in map order). Assignments — the value every
    // consumer reads — are argmins over these sums; InvarianceProbe
    // already pins the whole registry bit-identical under partition-
    // count changes, a strictly LARGER sum perturbation than any
    // last-ulp merge-order effect. The WCSS monitor totals per-cluster
    // instead of per-(cluster, dim)-group rows (last-ulp only;
    // KMeansSpec checks monotonicity to 1e-9, and every production
    // caller discards it). The old loop's AQE-off/static-partition
    // session toggle is obsolete (no exchange remains) and is gone.
    val holder = new graft.functions.VecBcHolder
    val dists: Seq[Column] = (0 until k).map { j =>
      val cj = graft.functions.GraftExpressions.vec_lookup(lit(j.toLong), holder)
      struct(graft.functions.GraftExpressions.sq_dist(col("v"), cj).as("d2"),
        lit(j).as("j"))
    }
    val bestH = array_min(array(dists: _*))
    val proj = src.select(bestH.getField("j").as("cluster"),
      bestH.getField("d2").as("d2"), col("v"))
    // physical planning + codegen happen here, ONCE
    val rowRdd = proj.queryExecution.toRdd
    val kk = k
    val dd = dim
    val partials = rowRdd.mapPartitions { it =>
      val sums = Array.ofDim[Double](kk, dd)
      val counts = new Array[Long](kk)
      val sd2 = new Array[Double](kk)
      it.foreach { row =>
        val c = row.getInt(0)
        sd2(c) += row.getDouble(1)
        counts(c) += 1
        val arr = row.getArray(2)
        var d = 0
        while (d < dd) { sums(c)(d) += arr.getDouble(d); d += 1 }
      }
      Iterator.single((sums, counts, sd2))
    }
    val spark = vecs.sparkSession
    while (iter < maxIter && moved > tol) {
      val mmap = new java.util.HashMap[java.lang.Long, Array[Double]](k)
      (0 until k).foreach(j => mmap.put(j.toLong, centroids(j)): Unit)
      holder.bc = spark.sparkContext.broadcast(mmap)
      // collect (not reduce): partition-index merge order, see above
      val parts = partials.collect()
      holder.bc.destroy() // iteration's one job done; drop the copy
      val next = Array.ofDim[Double](k, dim)
      val counts = Array.ofDim[Long](k)
      val sd2 = Array.ofDim[Double](k)
      parts.foreach { case (s, n, sd) =>
        var c = 0
        while (c < k) {
          var d = 0
          while (d < dim) { next(c)(d) += s(c)(d); d += 1 }
          counts(c) += n(c)
          sd2(c) += sd(c)
          c += 1
        }
      }
      wcss += sd2.sum
      (0 until k).foreach { c =>
        if (counts(c) > 0) (0 until next(c).length).foreach(d => next(c)(d) /= counts(c))
        else next(c) = centroids(c) // empty cluster keeps its centroid
      }
      moved = (0 until k).map(c => sqDist(centroids(c), next(c))).max
      centroids = next
      iter += 1
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
