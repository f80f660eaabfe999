package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
    val nodes = edges.select(col("src").as("id")).distinct().fenced()
    val useBroadcast = broadcastLabels.getOrElse {
      nodes.count() <= PageRank.MaxBroadcastNodes
    }
    // broadcast path: use the caller's (contractually pre-cached)
    // frame as-is — re-checkpointing it would materialize the
    // corpus-scaled edge table a second time. Only the co-partition
    // path derives a NEW layout worth fencing.
    val ed = if (useBroadcast) edges
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
