package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Fence
import graft.Fence.FenceOps

/** Synchronous label propagation (Raghavan et al. 2007, the LPA
  * community-detection pass) made DETERMINISTIC: every node starts as
  * its own label (= node id), and each round every node adopts the
  * most frequent label among its neighbors', ties broken by SMALLEST
  * label — synchronous update + total tie order means the result is a
  * pure function of the edge set, bit-identical across partitionings
  * and engines (classic async LPA is run-order dependent, useless
  * under an oracle).
  *
  * Contract: `edges` is symmetrized (every node has in- and
  * out-degree ≥ 1) and pre-cached by the caller; labels must be
  * non-negative longs (the argmax encodes "smallest label" as
  * `max(struct(n, -lab))`).
  *
  * Scale shape: the label vector is node-count sized and rides the
  * same REAL broadcast-vs-co-partition choice as [[PageRank]] (auto
  * by node count against the 4 M ≈ 64 MB ceiling, or forced): on the
  * co-partition path the edge table is hash-partitioned by `src`
  * once, so each round shuffles only the node-sized label vector.
  * Per round the count-per-(dst, label) aggregate combines map-side
  * and the argmax is a second combinable `max(struct)` aggregate —
  * no window, no sort, nothing driver-side; a fixed round count means
  * ONE declarative plan end to end. */
object LabelProp {

  /** @param edges (src: long, dst: long) symmetrized, pre-cached
    * @param broadcastLabels Some(true) = broadcast the label vector,
    *   Some(false) = co-partitioned shuffle joins, None = auto
    * @return (id: long, lab: long) — final label per node */
  def apply(edges: DataFrame, rounds: Int,
      broadcastLabels: Option[Boolean] = None): DataFrame = {
    // fence + ladder count in one job (withCount, r19 optimization
    // round); when the caller pins the ladder the count is free
    val (nodes, nNodes) = Fence.withCount(
      edges.select(col("src").as("id")).distinct())
    val useBroadcast = broadcastLabels.getOrElse {
      nNodes <= PageRank.MaxBroadcastNodes
    }
    // Both paths now derive a layout worth fencing (r19). Broadcast
    // path: hash by DST via Fence.partitioned — the broadcast probe
    // join preserves the visible layout, hashpartitioning(dst)
    // satisfies both per-round grouping distributions ((dst, lab) ⊇
    // {dst} and (dst)), so every round's two aggregates run one-phase
    // with ZERO exchanges. The old as-is reuse of the caller's frame
    // saved one edge-scale materialization but paid an EDGE-scale
    // (dst, lab) exchange per round — the pre-convergence (dst, lab)
    // key space is the edge count, so rounds × edge-scale shuffles
    // against one up-front exchange is a clear trade at any scale.
    // The edge count that sizes the layout is one trivial job against
    // the caller's already-fenced frame.
    val ed = if (useBroadcast)
      Fence.partitioned(edges,
        PageRank.edgeParts(edges.sparkSession, edges.count()), col("dst"))
    else edges.repartition(col("src")).fenced()
    var lab: DataFrame = nodes.select(col("id"), col("id").as("lab"))
    for (_ <- 1 to rounds) {
      val l = if (useBroadcast) broadcast(lab) else lab.hint("shuffle_merge")
      lab = ed.join(l, col("src") === col("id"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("n"))
        .groupBy(col("dst"))
        .agg(max(struct(col("n"), (-col("lab")).as("nl"))).as("m"))
        .select(col("dst").as("id"), (-col("m.nl")).as("lab"))
    }
    lab
  }
}
