package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Fence.FenceOps

/** k-core decomposition by iterative peeling (public algorithm:
  * Seidman, "Network structure and minimum degree", Social Networks
  * 1983; the BSP peeling formulation is the standard Pregel/GraphX
  * framing): repeatedly delete every node whose degree within the
  * surviving subgraph is < k; the fixpoint is the k-core — the
  * maximal subgraph where every node has ≥ k in-core neighbors.
  * Training-data pipelines use it on similarity graphs to find the
  * densely-interlinked cluster cores (template families, spam farms)
  * that per-pair dedup thresholds miss.
  *
  * Scale shape (100 TB of edges): each round is two semi-joins of the
  * static edge list against the shrinking node set plus one
  * groupBy-count — all keyed by node id, map-side combinable, nothing
  * quadratic. The node set only ever SHRINKS, so round cost is
  * monotone non-increasing; rounds to fixpoint are bounded by the
  * peeling depth (2–4 on the test graphs; pathological chains are
  * bounded by `maxIters`, and a production run on adversarial graphs
  * would switch to the ⌈log n⌉-round ε-batched peel that removes the
  * bottom degree-quantile per round). Each round's survivor set is
  * fenced — without the fence round r would replan rounds 1..r−1 —
  * and superseded fences are freed.
  */
object KCore {

  private def free(df: DataFrame): Unit =
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(df): Unit

  /** @param edges two columns (src, dst), already bidirectional —
    *              every undirected edge present in both orientations
    *              (the convention of the callers' shared graph CTE)
    * @param k     minimum in-core degree
    * @return (id, core_degree) — the k-core members with their degree
    *         within the core; empty when no k-core exists
    */
  def apply(edges: DataFrame, k: Int, maxIters: Int = 32): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"edges must have exactly 2 columns, got ${cols.toSeq}")
    // pin the edge fence to hashpartitioning(src): the per-round
    // degree count groups by src and both membership semi-joins are
    // broadcast-side probes that preserve the layout, so every round's
    // aggregate runs one-phase with zero exchanges (r19). The pin
    // costs one fence of the raw frame to learn the edge count that
    // sizes the layout (the PageRank rows-per-partition rule), then
    // the pinned copy; the raw fence is freed immediately.
    // the sizing count rides the raw fence's own job (withCount, r19
    // optimization round) instead of a second planned action
    val (e0, eCount) = graft.Fence.withCount(
      edges.select(col(cols(0)).as("src"), col(cols(1)).as("dst")))
    val e = graft.Fence.partitioned(e0,
      PageRank.edgeParts(edges.sparkSession, eCount), col("src"))
    free(e0)

    def degrees(nodes: DataFrame): DataFrame =
      e.join(nodes, col("src") === col("id"), "left_semi")
        .join(nodes.select(col("id").as("did")), col("dst") === col("did"), "left_semi")
        .groupBy(col("src")).agg(count(lit(1)).as("d"))

    // each round's fence carries (id, d) — d is the node's degree
    // within the PRE-filter set, so at the fixpoint (filter removes
    // nothing, next ≡ nodes) it IS the in-core degree: the converged
    // round's frame is the final answer and the old post-loop
    // `degrees(nodes)` pass (two corpus-scale semi-joins + agg, just
    // to recompute numbers already on the fence) disappears (r19).
    var (nodes, size) = graft.Fence.withCount(
      e.select(col("src").as("id")).distinct())
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      // per-round fence + convergence count in ONE job (withCount)
      val (next, nextSize) = graft.Fence.withCount(
        degrees(nodes)
          .where(col("d") >= k)
          .select(col("src").as("id"), col("d")))
      converged = nextSize == size
      free(nodes)
      nodes = next
      size = nextSize
      iters += 1
      if (size == 0) converged = true
    }
    require(converged, s"k-core peeling did not converge in $maxIters rounds")
    nodes.select(col("id"), col("d").as("core_degree"))
  }
}
