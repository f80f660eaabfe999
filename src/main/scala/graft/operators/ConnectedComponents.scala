package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Fence.FenceOps

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

  /** Free the block-manager storage behind a superseded
    * `localCheckpoint` frame (Dataset.unpersist only consults the
    * CacheManager and is a silent no-op for local checkpoints). */
  private def free(df: DataFrame): Unit =
    org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(df): Unit

  /** Alternating large-star / small-star components — the
    * diameter-INDEPENDENT variant (public algorithm: Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14).
    * Each round rewires every node's neighborhood toward its minimum
    * neighbor:
    *
    *  - large-star: per node u with m = min(N(u) ∪ {u}), every
    *    neighbor v > u re-attaches as (v, m);
    *  - small-star: per node u, every neighbor v ≤ u re-attaches as
    *    (v, m), plus (u, m) keeping u linked to its own minimum.
    *
    * The edge set contracts toward per-component stars rooted at the
    * minimum id in O(log n) rounds REGARDLESS of graph diameter —
    * [[resolve]]'s plain label propagation needs diameter rounds, so
    * this is the variant for adversarial (long-chain) graphs at scale.
    * Per round: two grouped-min aggregations (partial-aggregable — a
    * high-degree hub combines map-side, never buffered the way a
    * window over its neighborhood would be) each joined back on the
    * already-partitioned key, nothing quadratic. Termination: the
    * canonical (undirected, deduped) edge set is unchanged — one
    * symmetric-difference probe (full-outer + limit-1), a single
    * Spark action per round; the star property then gives labels
    * directly. Superseded per-round checkpoints are unpersisted so
    * block-manager storage stays O(current edge set), not O(rounds).
    *
    * Equivalence with [[resolve]] is property-tested against a
    * union-find reference on random graphs. */
  def resolveAlternating(edges: DataFrame): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"edges must have exactly 2 columns, got ${cols.toSeq}")
    // canonical undirected form (lo < hi), deduped
    def canon(df: DataFrame): DataFrame =
      df.select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
        .where(col("lo") =!= col("hi")).distinct()
    // NOT fenced (r19): consumed exactly once, by the final label
    // join — a fence here paid a materialization job for zero reuse
    // (the callers' edge frames are themselves fenced, so the single
    // evaluation scans checkpoint blocks, not a live plan)
    val nodes = edges.select(col(cols(0)).as("id"))
      .union(edges.select(col(cols(1)).as("id"))).distinct()
    // fence + count ride ONE job (r19 optimization round,
    // Fence.withCount): the count was a second planned action per
    // frame whose answer the fence's materializing job had computed
    var (e, eCount) = graft.Fence.withCount(
      canon(edges.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))))
    var stable = false
    while (!stable) {
      // large-star over the bidirectional neighbor list: per-u minimum
      // via grouped agg (map-side combinable), joined back on the
      // group key — both sides arrive hash-partitioned on u
      val nbrs = e.select(col("lo").as("u"), col("hi").as("v"))
        .union(e.select(col("hi").as("u"), col("lo").as("v")))
      val mins = nbrs.groupBy(col("u"))
        .agg(min(least(col("v"), col("u"))).as("m"))
      val large = nbrs.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
      // NOT fenced, NOT pinned (r19 measured): a Fence.partitioned pin
      // over this LIVE join/distinct subtree would run it with AQE
      // off, losing runtime broadcast-join conversion (sort-merge
      // blowup far beyond the one exchange a pin saves); and the
      // plain fence paid a materialization job per round for reuse
      // the planner already provides — both small-star consumers of
      // this subtree reference the SAME canonical exchange under
      // canon's distinct, so within the round's single fenced plan it
      // materializes once (ReusedExchange; the post-exchange dedup
      // agg re-runs per consumer, a streaming pass over exchange
      // output that costs less than the fence job it replaces).
      val afterLarge = canon(large)
      // small-star over the contracted edges
      val nbrs2 = afterLarge.select(col("hi").as("u"), col("lo").as("v"))
      val mins2 = nbrs2.groupBy(col("u"))
        .agg(min(least(col("v"), col("u"))).as("m"))
      val withMin2 = nbrs2.join(mins2, "u")
      val small = withMin2
        .select(col("v").as("src"), col("m").as("dst"))
        .union(mins2.select(col("u").as("src"), col("m").as("dst")))
      // termination = symmetric difference empty. Count-gated: equal
      // cardinality is a NECESSARY condition for set equality, and
      // the count rides the round's fence job itself (withCount),
      // while the full probe (full-outer join with presence markers,
      // limit-1 scan for any one-sided row — exact because both sets
      // are canonical + deduped) shuffles the whole edge set. Rounds
      // that still contract (count changed) skip the join entirely;
      // only count-stable rounds pay for the exact check.
      val (next, nextCount) = graft.Fence.withCount(canon(small))
      stable = nextCount == eCount &&
        next.select(col("lo"), col("hi"), lit(1).as("in_next"))
          .join(e.select(col("lo"), col("hi"), lit(1).as("in_prev")),
            Seq("lo", "hi"), "full_outer")
          .where(col("in_next").isNull || col("in_prev").isNull)
          .isEmpty
      eCount = nextCount
      // Dataset.unpersist is a no-op on localCheckpoint frames — free
      // the superseded rounds' blocks through the bridge shim
      free(e)
      e = next
    }
    // star graphs: every hi links directly to its component minimum
    val labelled = e.select(col("hi").as("id"), col("lo").as("lbl"))
    nodes.join(labelled, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl"))
  }

  /** @param edges two columns (src, dst), undirected (either
    *              orientation; both are added internally)
    * @return (id, label) — one row per node appearing in any edge,
    *         label = min node id in its component */
  def resolve(edges: DataFrame): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"edges must have exactly 2 columns, got ${cols.toSeq}")
    val spark = edges.sparkSession
    val e = edges.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
    // both entry fences carry their row counts out of their own
    // materializing jobs (withCount, r19 optimization round) — the
    // ladder's two sizing counts were two extra planned actions
    val (bi0, biCount) = graft.Fence.withCount(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))))
    var (labels, nNodes) = graft.Fence.withCount(
      bi0.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl")))
    // broadcast-vs-planner ladder (the PageRank seam, r19): when the
    // label vector fits the broadcast budget, pin the edge table to
    // hashpartitioning(src) — the per-round broadcast probe preserves
    // it, groupBy(src) runs one-phase with ZERO exchanges, and each
    // round is exactly three jobs (two node-scale broadcast builds +
    // the fence). Both ladder counts are one trivial job each against
    // already-fenced frames; beyond the ceiling the planner keeps its
    // shuffle strategies on the unpinned frame (unchanged behavior).
    val small = nNodes <= PageRank.MaxBroadcastNodes
    val bi =
      if (small)
        graft.Fence.partitioned(bi0,
          PageRank.edgeParts(spark, biCount), col("src"))
      else bi0
    if (small) free(bi0) // superseded by the pinned copy (labels is
    // itself fenced eagerly, so nothing still derives from bi0)
    var changed = 1L
    while (changed > 0) {
      // convergence probe piggybacks on the fence materialization as
      // an accumulator bump (r19) instead of a separate aggregate
      // action (2 jobs/round under AQE). Accumulator exactness at the
      // ZERO boundary is all the loop needs: task retries can only
      // OVER-count (acc ≥ true moved-count), and when the true count
      // is 0 no task anywhere sees moved=1, so acc==0 ⟺ converged —
      // the iterate/stop decision is identical to the old sum(moved)
      // and the labels themselves never depend on the counter.
      val acc = spark.sparkContext.longAccumulator
      val bump = udf((m: Long) => { acc.add(m); m }).asNondeterministic()
      val l = if (small) broadcast(labels) else labels
      val nbrMin = bi.join(l, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("lbl")).as("nl"))
      val next = labels.join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("nxt"))
      val stepped = next.select(col("id"), col("nxt").as("lbl"),
        bump((col("nxt") =!= col("lbl")).cast("long")).as("moved"))
        .fenced()
      changed = acc.value
      free(labels) // superseded checkpoint — free its blocks
      labels = stepped.select(col("id"), col("lbl"))
    }
    labels
  }
}
