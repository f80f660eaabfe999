package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank (see `queries.GraphQueries` for the
  * oracle-checked query built on this and the full determinism
  * rationale). Ranks are BIGINTs in units of 10⁻¹² so every iteration
  * is pure 64-bit integer math — order-independent sums, bit-exact
  * across engines and across partitionings.
  *
  * Contract: every node must have out-degree ≥ 1 AND in-degree ≥ 1
  * (true for any symmetrized edge set — callers with dangling nodes
  * symmetrize or self-loop first). Nodes are derived from `edges`
  * itself, so the rank vector never needs a separate node table.
  *
  * Scale: `edges` is consumed once per iteration — callers pass a
  * checkpointed/cached frame. Rank vector is node-count sized and is
  * broadcast into the edge join; the only shuffle per iteration is the
  * groupBy(dst) partial agg. For graphs whose rank vector outgrows
  * broadcast, co-partition `edges` by src and drop the hint — the
  * loop body is otherwise unchanged.
  */
object PageRank {

  val Scale = 1000000000000L // 10^12: rank 1.0 in fixed-point
  val TeleportFp: Long = 15L * Scale / 100 // 0.15

  /** @param edges (src: long, dst: long), pre-cached by the caller
    * @return (id: long, r: long) — fixed-point ranks, one row per node
    */
  def apply(edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("d"))
    // degree folded into the edge table ONCE — the loop body is then a
    // single broadcast join + partial agg per iteration, not two joins
    val ed = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("d"))
      .localCheckpoint()
    var r: DataFrame = deg.select(col("src").as("id"), lit(Scale).as("r"))
    for (_ <- 1 to iters) {
      r = ed.join(broadcast(r), col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div d")).as("sc"))
        .select(col("dst").as("id"),
          (lit(TeleportFp) + expr("(85 * sc) div 100")).as("r"))
    }
    r
  }

  /** In-memory reference of the exact same integer recurrence — the
    * property-test twin (mirrors CC's union-find reference). */
  def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r: Map[Long, Long] = out.keys.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val sums = edges
        .groupBy(_._2)
        .view.mapValues(_.map { case (s, _) => r(s) / out(s) }.sum)
        .toMap
      r = sums.map { case (v, sc) => v -> (TeleportFp + 85 * sc / 100) }
    }
    r
  }
}
