package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Fence
import graft.Fence.FenceOps

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
  * checkpointed/cached frame. The rank vector is node-count sized;
  * which side of the per-iteration join it rides is a REAL choice
  * here, not a comment:
  *
  *  - **broadcast path** (node count ≤ [[MaxBroadcastNodes]]): ranks
  *    are broadcast into the edge join, so the only shuffle per
  *    iteration is the groupBy(dst) partial agg. ~16 B/node, the
  *    default 4 M-node ceiling is a ~64 MB build — safe on ordinary
  *    executors; the graded 100× part+supplier graph (~3 M nodes)
  *    stays under it.
  *  - **co-partition path** (beyond the ceiling, or forced): the
  *    degree-folded edge table is hash-partitioned by `src` ONCE
  *    before its checkpoint, so each iteration's sort-merge join
  *    re-shuffles ONLY the node-sized rank vector (the corpus-scaled
  *    edge side stays put), then the partial agg on dst. Nothing is
  *    ever driver- or single-executor-materialized.
  *
  * Both paths run the identical integer recurrence — PageRankSpec
  * pins them bit-equal to each other and to [[reference]].
  */
object PageRank {

  val Scale = 1000000000000L // 10^12: rank 1.0 in fixed-point
  val TeleportFp: Long = 15L * Scale / 100 // 0.15

  /** Auto-selection ceiling for the broadcast path: ranks are two
    * longs/row, so 4 M nodes ≈ 64 MB serialized — comfortably within
    * executor broadcast budgets while far above the graded graph. */
  val MaxBroadcastNodes = 4000000L

  /** Partition count for the pinned edge layout: ~250 k folded edge
    * rows (3 longs ≈ 24 B) per partition, capped at 4× the
    * scheduler's parallelism — derived from the measured edge count,
    * so it scales with the data, not with the local core count. */
  private[operators] def edgeParts(spark: org.apache.spark.sql.SparkSession,
      nEdges: Long): Int = {
    val cores = spark.sparkContext.defaultParallelism.toLong
    math.max(1L, math.min(nEdges / 250000L + 1, 4L * cores)).toInt
  }

  /** @param edges (src: long, dst: long), pre-cached by the caller
    * @param broadcastRanks force the rank-vector side: Some(true) =
    *   broadcast joins, Some(false) = co-partitioned shuffle joins,
    *   None = auto by node count vs [[MaxBroadcastNodes]]
    * @return (id: long, r: long) — fixed-point ranks, one row per node
    */
  def apply(edges: DataFrame, iters: Int,
      broadcastRanks: Option[Boolean] = None): DataFrame = {
    // deg is consumed three times (auto-selection count, the fold
    // join, the rank init) — materialize the node-sized frame once
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("d"))
      .fenced()
    // degree folded into the edge table ONCE — the loop body is then a
    // single join + partial agg per iteration, not two joins
    val folded = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("d"))
    // ONE node-scale job yields both the broadcast decision (node
    // count) and the edge count that sizes the pinned layout — same
    // action count as the old bare deg.count()
    val statsRow = deg.agg(count(lit(1)), sum(col("d"))).head()
    val (nNodes, nEdges) = (statsRow.getLong(0),
      Option(statsRow.get(1)).fold(0L)(_.asInstanceOf[Long]))
    val useBroadcast = broadcastRanks.getOrElse(nNodes <= MaxBroadcastNodes)
    // pin the edge layout BEFORE the checkpoint. Co-partition path:
    // hash by src, so per-iteration joins shuffle only the ranks.
    // Broadcast path (r19): hash by DST via [[Fence.partitioned]] —
    // the broadcast probe join preserves the layout and
    // hashpartitioning(dst) satisfies the groupBy(dst) distribution,
    // so every iteration's aggregate runs ONE-PHASE with ZERO
    // exchanges; the loop is a single stage chain plus the
    // per-iteration rank broadcast builds. One edge-scale exchange at
    // build time buys out `iters` per-iteration agg exchanges (plus
    // their AQE re-plan jobs).
    val parts = edgeParts(edges.sparkSession, nEdges)
    val ed = if (useBroadcast) Fence.partitioned(folded, parts, col("dst"))
             else folded.repartition(col("src")).fenced()
    var r: DataFrame = deg.select(col("src").as("id"), lit(Scale).as("r"))
    for (_ <- 1 to iters) {
      val ranks = if (useBroadcast) broadcast(r) else r.hint("shuffle_merge")
      r = ed.join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div d")).as("sc"))
        .select(col("dst").as("id"),
          (lit(TeleportFp) + expr("(85 * sc) div 100")).as("r"))
    }
    r
  }

  /** PERSONALIZED PageRank — the same fixed-point integer recurrence
    * with the teleport mass concentrated on a seed set (Haveliwala
    * 2002; the trust/quality-propagation form: rank = proximity to
    * the seeds through the link structure, the TrustRank recipe for
    * scoring a crawl from a vetted whitelist):
    *
    *   r₀(v)  = v ∈ S ? 10¹² : 0
    *   r′(v) = (v ∈ S ? 0.15·10¹² : 0) + ⌊85 · Σ_{u→v} ⌊r(u)/deg(u)⌋ / 100⌋
    *
    * Same integer-exactness, same broadcast-vs-co-partition choice;
    * the extra per-iteration work is one LEFT join of the node-sized
    * update against the teleport vector (seed flags folded into a
    * node-sized frame once, checkpointed). Seeds outside the edge
    * set are ignored (they have no edges to propagate through). */
  def personalized(edges: DataFrame, iters: Int, seeds: DataFrame,
      broadcastRanks: Option[Boolean] = None): DataFrame = {
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("d"))
      .fenced()
    val folded = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("d"))
    val statsRow = deg.agg(count(lit(1)), sum(col("d"))).head()
    val (nNodes, nEdges) = (statsRow.getLong(0),
      Option(statsRow.get(1)).fold(0L)(_.asInstanceOf[Long]))
    val useBroadcast = broadcastRanks.getOrElse(nNodes <= MaxBroadcastNodes)
    // same dst-vs-src layout pinning as [[apply]] (r19): the broadcast
    // path's per-iteration groupBy(dst) reuses the fence's visible
    // hashpartitioning(dst) — zero in-loop exchanges
    val parts = edgeParts(edges.sparkSession, nEdges)
    val ed = if (useBroadcast) Fence.partitioned(folded, parts, col("dst"))
             else folded.repartition(col("src")).fenced()
    // node-sized teleport vector: tp = TeleportFp on seeds, 0 off
    val tele = deg.select(col("src").as("id"))
      .join(seeds.select(col("id").as("sid")), col("id") === col("sid"), "left_outer")
      .select(col("id"),
        when(col("sid").isNotNull, lit(TeleportFp)).otherwise(lit(0L)).as("tp"))
      .fenced()
    var r: DataFrame = tele.select(col("id"),
      when(col("tp") > 0, lit(Scale)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      val ranks = if (useBroadcast) broadcast(r) else r.hint("shuffle_merge")
      val sc = ed.join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div d")).as("s"))
        .select(col("dst").as("id"), expr("(85 * s) div 100").as("sc"))
      // LEFT join from the teleport vector keeps the rank domain at
      // the full src set every iteration: a seed with out-edges but no
      // in-edges must retain its teleport mass (an inner join would
      // silently drop it after iteration 1 on asymmetric graphs).
      r = tele.join(if (useBroadcast) broadcast(sc) else sc, Seq("id"), "left_outer")
        .select(col("id"), (coalesce(col("sc"), lit(0L)) + col("tp")).as("r"))
    }
    r
  }

  /** Sequential twin of [[personalized]]. The distributed operator
    * keeps rank state only for nodes WITH out-edges (its teleport
    * vector is keyed by `deg`'s src set, and each iteration's rank
    * update is a LEFT-OUTER join from that teleport vector — the
    * src-set domain — with absent contribution read as 0), so the
    * twin mirrors that domain:
    * dst-only sinks contribute nothing after the hop that reaches
    * them, and a src node never seen as a dst reads rank 0 — hence
    * `getOrElse` rather than a partial lookup that would throw on
    * asymmetric graphs. */
  def personalizedReference(edges: Seq[(Long, Long)], iters: Int,
      seeds: Set[Long]): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r: Map[Long, Long] = out.keys.map(n => n -> (if (seeds(n)) Scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val sums = edges
        .groupBy(_._2)
        .view.mapValues(_.map { case (s, _) => r.getOrElse(s, 0L) / out(s) }.sum)
        .toMap
      r = out.keys.map { v =>
        v -> ((if (seeds(v)) TeleportFp else 0L) + 85 * sums.getOrElse(v, 0L) / 100)
      }.toMap
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
