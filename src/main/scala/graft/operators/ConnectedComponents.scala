package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label
  * propagation: every node starts labelled with itself; each round a
  * node takes the minimum label among itself and its neighbours;
  * at the fixpoint every node carries the smallest node id reachable
  * from it — its component's canonical representative.
  *
  * Scale shape: each round is one shuffle join of the label table
  * against the (static) bidirectional edge list plus one aggregation —
  * all keyed by node id, nothing quadratic. Rounds needed = graph
  * diameter (near-dup clusters are shallow; a long-chain adversarial
  * graph needs the large-star/small-star variant, which this API slot
  * accommodates without changing callers). `localCheckpoint` per round
  * cuts the exponentially-growing lineage that would otherwise make
  * round k replan rounds 1..k-1.
  *
  * Used by `q_dedup_cc` (cluster resolution over LSH-verified
  * near-duplicate pairs); oracle twin is a recursive-CTE transitive
  * closure.
  */
object ConnectedComponents {

  /** @param edges two columns (src, dst), undirected (either
    *              orientation; both are added internally)
    * @return (id, label) — one row per node appearing in any edge,
    *         label = min node id in its component */
  def resolve(edges: DataFrame): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"edges must have exactly 2 columns, got ${cols.toSeq}")
    val e = edges.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
    val bi = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = bi.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = bi.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("lbl")).as("nl"))
      val next = labels.join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("nxt"))
      val stepped = next.select(col("id"), col("nxt").as("lbl"),
        (col("nxt") =!= col("lbl")).cast("long").as("moved"))
        .localCheckpoint()
      changed = stepped.agg(coalesce(sum(col("moved")), lit(0L))).head().getLong(0)
      labels = stepped.select(col("id"), col("lbl"))
    }
    labels
  }
}
