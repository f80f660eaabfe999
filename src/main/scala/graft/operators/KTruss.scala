package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Fence.FenceOps

/** k-truss decomposition by iterative edge peeling (public algorithm:
  * Cohen, "Trusses: cohesive subgraphs for social network analysis",
  * NSA TR 2008; the triangle-support peel is the standard distributed
  * framing): repeatedly delete every edge supported by fewer than
  * k−2 triangles within the surviving subgraph; the fixpoint is the
  * k-truss — the maximal subgraph where every edge closes ≥ k−2
  * triangles. The edge analog of [[KCore]]: where the core asks "how
  * many neighbors", the truss asks "how many MUTUAL neighbors", so it
  * isolates the tightly-interwoven clusters (template families whose
  * members all resemble each other, not just a shared hub) that
  * degree-based peeling keeps hub-and-spoke noise in.
  *
  * Scale shape (100 TB of edges): each round enumerates the surviving
  * triangles ONCE by degree-ordered orientation (wedges generated at
  * the lowest-(degree, id) vertex — the `operators.Triangles` device,
  * O(m^1.5) worst case instead of Σdeg²), explodes each triangle into
  * its 3 canonical edges, and counts per edge with map-side combine —
  * all equi-joins keyed by node/edge ids, nothing quadratic in the
  * corpus. The orientation order is frozen ONCE from the INITIAL
  * degrees (any total order is correct for exact enumeration; a
  * per-round reorder would add a degree pass without changing the
  * answer), and the edge set only ever SHRINKS, so round cost is
  * monotone non-increasing. Rounds to fixpoint are bounded by the
  * peeling depth (≤ 5 on the test graphs at k = 5; `maxIters` bounds
  * pathological chains, and an adversarial deployment would switch to
  * the ε-batched peel that removes the bottom support-quantile per
  * round). Survivor sets are fenced per round and superseded fences
  * freed.
  */
object KTruss {

  private def free(df: DataFrame): Unit =
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(df): Unit

  /** @param edges two columns (u, v) — canonical undirected edges,
    *              u < v, distinct
    * @param k     minimum per-edge triangle support + 2 (a k-truss
    *              edge closes ≥ k−2 surviving triangles); k ≥ 3
    * @return (u, v, support) — the k-truss edges with their in-truss
    *         triangle support; empty when no k-truss exists
    */
  def apply(edges: DataFrame, k: Int, maxIters: Int = 32): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    val cols = edges.columns
    require(cols.length == 2, s"edges must have exactly 2 columns, got ${cols.toSeq}")
    // entry fence + its sizing count ride one job (withCount, r19
    // optimization round)
    val (e0, e0Count) = graft.Fence.withCount(
      edges.select(col(cols(0)).as("u"), col(cols(1)).as("v")))

    // frozen orientation order: (initial degree, id) — carried as
    // columns and compared lexicographically, never a global rank
    // window over the node set
    val deg0 = e0.select(col("u").as("n")).union(e0.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).cast("long").as("d"))
      .fenced()

    /** Per-edge triangle support within `e` — oriented enumeration,
      * each triangle once, exploded to its 3 canonical edges. Also
      * returns the round's fenced orientation frame so the loop can
      * free it once the round's survivors are materialized (the
      * support frame evaluates FROM the fence, so it must stay alive
      * until then — and the final round's fence backs the returned
      * plan, so it is never freed). */
    def support(e: DataFrame): (DataFrame, DataFrame) = {
      val du = deg0.select(col("n").as("u"), col("d").as("du"))
      val dv = deg0.select(col("n").as("v"), col("d").as("dv"))
      val fwd = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      // NOT pinned (r19 measured): Fence.partitioned would run this
      // live join subtree with AQE off — losing runtime broadcast
      // conversion costs far more than the one wedge-join exchange a
      // src pin would save; a pin is only safe over an already-fenced
      // LogicalRDD.
      val ori = e.join(du, "u").join(dv, "v")
        .select(when(fwd, col("u")).otherwise(col("v")).as("src"),
          when(fwd, col("v")).otherwise(col("u")).as("dst"),
          when(fwd, col("dv")).otherwise(col("du")).as("dd"))
        .fenced() // 3 reuses: both wedge sides + the closing probe
      val w1 = ori.select(col("src"), col("dst").as("b"), col("dd").as("bd"))
      val w2 = ori.select(col("src"), col("dst").as("c"), col("dd").as("cd"))
      val close = ori.select(col("src").as("b"), col("dst").as("c"))
      val tri = w1.join(w2, Seq("src"))
        .where(col("bd") < col("cd") || (col("bd") === col("cd") && col("b") < col("c")))
        .join(close, Seq("b", "c"), "left_semi")
      // (src, b, c) is one triangle, found exactly once; its 3 edges
      // canonicalize by id (the orientation order is NOT the id order)
      val s = tri.select(explode(array(
          struct(least(col("src"), col("b")).as("u"),
            greatest(col("src"), col("b")).as("v")),
          struct(least(col("src"), col("c")).as("u"),
            greatest(col("src"), col("c")).as("v")),
          struct(least(col("b"), col("c")).as("u"),
            greatest(col("b"), col("c")).as("v")))).as("ed"))
        .groupBy(col("ed.u").as("u"), col("ed.v").as("v"))
        .agg(count(lit(1)).as("support"))
      (s, ori)
    }

    // each round's fence carries (u, v, support) — support is counted
    // within the PRE-filter edge set, so at the fixpoint (filter
    // removes nothing, next ≡ e) it IS the in-truss support: the
    // converged round's frame is the final answer and the old
    // post-loop `support(e)` pass (a full oriented triangle
    // enumeration — the most expensive plan in the operator — just to
    // recompute numbers already on the fence) disappears (r19).
    // rounds carry the fenced (u, v, support) survivor frame; the
    // next round's enumeration uses its (u, v) projection
    var cur: DataFrame = e0 // (u, v) pre-round-1; the loop always runs
    var size = e0Count
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val (s, ori) = support(cur.select(col("u"), col("v")))
      // per-round fence + convergence count in ONE job (withCount)
      val (next, nextSize) = graft.Fence.withCount(
        s.where(col("support") >= k - 2))
      free(ori) // survivors materialized; this round's fence is spent
      converged = nextSize == size
      if (iters > 0) free(cur) // superseded round fence (e0 itself
      // stays: deg0 and every round's orientation derive from it)
      cur = next
      size = nextSize
      iters += 1
      if (size == 0) converged = true
    }
    require(converged, s"k-truss peeling did not converge in $maxIters rounds")
    cur
  }
}
