package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Fence.FenceOps

/** Deterministic hash-seeded random walks over an edge list (the
  * DeepWalk sequence-generation stage, Perozzi et al. KDD'14) in the
  * HUB-SAFE long-row form.
  *
  * The naive adjacency — `groupBy(src).agg(sort_array(collect_set(
  * dst)))` — materializes each node's ENTIRE neighbor list as one
  * array cell in one row. Degrees are modest on the bench graph, but
  * at 100 TB a hub node (a celebrity account, a stop word, a
  * boilerplate URL) has 10⁷⁺ neighbors: its row becomes a
  * multi-hundred-MB array and every step's join funnels that single
  * row through a single straggler task — the classic adjacency-list
  * skew killer. Here the adjacency never leaves long-row form:
  *
  *  - `(src, rank, dst)` with `rank = row_number() OVER (PARTITION BY
  *    src ORDER BY dst)` — one plain row per edge, so a hub's
  *    neighbors hash-spread across tasks like any other rows;
  *  - every adjacency row CARRIES its destination's degree, so a
  *    frontier row always knows its current node's degree, computes
  *    `rank = pmod(h, degree) + 1` locally, and each step is ONE
  *    equi-join on `(node = src, rank)` — the composite key spreads
  *    even a hub's rows across the full shuffle space, and skew
  *    beyond that is ordinary join skew (AQE/salting territory), not
  *    a structural single-row bottleneck.
  *
  * Determinism: `rank` order ≡ sorted-neighbor order (edges are
  * distinct, `row_number` over a total order is unique), so step t of
  * walk w lands on exactly `sorted_neighbors(cur)[h(w,t) mod
  * degree(cur)]` — the same element the array form's `element_at`
  * picked, and the same element a `list_sort(list(dst))[i]` oracle
  * replays. The one remaining per-node funnel is the `row_number`
  * window itself: all of a hub's edges sort within one task — a
  * SPILLABLE O(deg·log deg) sort of long rows, bounded by disk rather
  * than memory, paid once and fenced (vs the array form, which held
  * the whole list in one in-memory cell on every step).
  *
  * Scale shape: adjacency and degrees are each ONE corpus-scale
  * exchange, fenced and reused by every step; each step is two
  * frontier-sized equi-joins (degree lookup, then (src, rank) edge
  * lookup) against the static fenced sides — seed-scale recurring
  * cost, broadcast-or-shuffle by AQE as |seeds| grows. Walk length is
  * the fixed unroll.
  *
  * Reference: the walk corpus feeds `graft.operators.Sgns` exactly as
  * the reference's aggregate stages feed downstream consumers
  * (`database.clj:34-77` — derived frames, not materialized arrays).
  */
object RandomWalk {

  /** Long-row adjacency for [[walks]]: `(src, rank, dst)` with rank =
    * 1-based position of `dst` in the sorted neighbor list. `edges`
    * MUST be distinct (src, dst) pairs — duplicates would inflate
    * ranks past the sorted-set positions the hash stepping (and any
    * array/oracle twin) indexes. */
  def rankedAdjacency(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"),
      row_number()
        .over(Window.partitionBy(col("src")).orderBy(col("dst")))
        .cast("long").as("rank"))

  /** Shared fenced adjacency build: (adj, deg) where adj =
    * (node, rank, dst, dst_degree, dst_dead) and deg =
    * (node, degree). The edge build runs ONCE (degree and the
    * enriched rows both derive from the checkpoint — computing either
    * from the raw edges would re-run the corpus-scale edge build).
    *
    * DEAD-END nodes (reachable or seeded, but no out-edges) get a
    * synthetic SELF-LOOP row `(node, rank=1, dst=node, dst_degree=1,
    * dst_dead=true)` (r19): the step loop below is a single linear
    * chain of INNER joins that accumulates each walk's path in an
    * array column, and the self-loop keeps a finished walk's row
    * alive through the remaining steps WITHOUT appending (the `dead`
    * flag gates the append). The alternative — a LEFT join per step —
    * would pin the corpus-scale adjacency as the only broadcastable
    * side (BroadcastHashJoin LeftOuter builds right), exactly the
    * wrong side at 100 TB; the self-loop keeps every step an inner
    * equi-join whose frontier side stays the broadcast candidate.
    * Real rows pointing AT a dead node carry `dst_degree = 1` (never
    * null) + `dst_dead = true`, so `pmod(h, degree) + 1 = 1` always
    * matches and no row ever falls out of the chain. */
  private def buildAdjacency(edges: DataFrame,
      seeds: DataFrame): (DataFrame, Long, DataFrame) = {
    val raw = rankedAdjacency(edges)
      .select(col("src").as("node"), col("rank"), col("dst"))
      .fenced()
    val deg = raw.groupBy(col("node")).agg(max(col("rank")).as("degree"))
    // nodes a walk can STAND ON with no way out: any dst or seed node
    // that never occurs as a src — node-scale, computed once
    val dead = raw.select(col("dst").as("node"))
      .union(seeds.select(col("node"))).distinct()
      .join(deg.select(col("node")), Seq("node"), "left_anti")
    // the fence's own job also yields the adjacency row count that
    // drives the broadcast ladder (withCount, r19 optimization round)
    val (adj, nAdj) = graft.Fence.withCount(raw
      .join(deg.select(col("node").as("dst"), col("degree").as("dst_degree")),
        Seq("dst"), "left")
      .select(col("node"), col("rank"), col("dst"),
        coalesce(col("dst_degree"), lit(1L)).as("dst_degree"),
        col("dst_degree").isNull.as("dst_dead"))
      .union(dead.select(col("node"), lit(1L).as("rank"),
        col("node").as("dst"), lit(1L).as("dst_degree"),
        lit(true).as("dst_dead")))) // reused by every step
    (adj, nAdj, deg)
  }

  /** Per-step join-side decision, made ONCE per walk build — the
    * [[PageRank]] broadcast-vs-co-partition precedent, with a third
    * rung. The planner cannot make this choice well: the frontier's
    * row count is INVARIANT across steps (exactly one row per walk,
    * dead or alive — the self-loop design), but a join chain's
    * multiplicative cardinality estimates flip the build side
    * mid-chain (measured r19: static planning broadcast the
    * 2.4 M-row adjacency at steps 3..5 and the 100-row frontier at
    * steps 1..2 — five separate corpus-side builds). Measured ladder:
    *
    *  1. adjacency fits the broadcast budget → broadcast ADJ in every
    *     step: ONE build, reused by all steps (identical subtree), and
    *     each step streams only the frontier — per-step cost is a
    *     frontier-sized probe job. (Broadcasting the FRONTIER instead
    *     re-streams the whole adjacency per step: measured 3.3–6.8 s
    *     executor time per step at sf0.1.)
    *  2. adjacency too big, seed set fits → broadcast the frontier
    *     (the adjacency streams once per step — unavoidable once it
    *     cannot be resident).
    *  3. neither fits → leave the planner its shuffle strategies.
    *
    * Budgets: adjacency rows ≈ 5 longs (~40 B serialized) → 4 M rows
    * ≈ 160 MB, the [[PageRank.MaxBroadcastNodes]] ballpark; frontier
    * rows ≈ (4+len) longs against the same ~64 MB class budget. */
  private val MaxBroadcastAdjRows = 4000000L
  private def frontierFits(seeds: DataFrame, len: Int): Boolean =
    seeds.count() <= 8000000L / (len + 4)

  /** The walk corpus `(walk_id, step, node)`, step 0..len, one walk
    * per seed row.
    *
    * @param edges    distinct directed `(src, dst)` pairs
    * @param seeds    `(walk_id, node)` — step-0 positions
    * @param len      steps per walk (fixed unroll)
    * @param stepHash deterministic non-negative hash of
    *                 (walk_id column, step) — the RNG replacement;
    *                 step t moves to sorted-neighbor index
    *                 `stepHash(w, t) mod degree` */
  def walks(edges: DataFrame, seeds: DataFrame, len: Int,
      stepHash: (Column, Int) => Column): DataFrame = {
    // ONE linear join chain with an accumulated `path` array column,
    // exploded once at the end (r19) — the previous form emitted a
    // UNION of per-step frontiers, and union branches share no
    // subtrees: branch t re-planned and re-ran the whole t-join chain
    // (O(len²) joins / adjacency scans, plan size O(len²)). Here each
    // step is ONE inner equi-join on the fenced adjacency; finished
    // walks ride their self-loop row (see [[buildAdjacency]]) with
    // `dead` gating the append, so no LEFT join and no branch ever
    // enters the plan. The path column is ≤ len+1 longs per walk —
    // trivially small next to the join machinery it replaces.
    val (adj, nAdj, deg) = buildAdjacency(edges, seeds)
    val adjSmall = nAdj <= MaxBroadcastAdjRows
    val bcastFrontier = !adjSmall && frontierFits(seeds, len)
    val adjSide = if (adjSmall) broadcast(adj) else adj
    var frontier = seeds.select(col("walk_id"), col("node"))
      .join(deg, Seq("node"), "left")
      .select(col("walk_id"), col("node"),
        coalesce(col("degree"), lit(1L)).as("degree"),
        col("degree").isNull.as("dead"),
        array(col("node")).as("path"))
    for (st <- 1 to len) {
      val h = stepHash(col("walk_id"), st)
      val stepped = frontier
        .select(col("walk_id"), col("node"),
          (pmod(h, col("degree")) + 1L).as("rank"), col("dead"), col("path"))
      frontier = (if (bcastFrontier) broadcast(stepped) else stepped)
        .join(adjSide, Seq("node", "rank"))
        .select(col("walk_id"), col("dst").as("node"),
          col("dst_degree").as("degree"), col("dst_dead").as("dead"),
          when(col("dead"), col("path"))
            .otherwise(concat(col("path"), array(col("dst")))).as("path"))
    }
    frontier.select(col("walk_id"), posexplode(col("path")))
      .select(col("walk_id"), col("pos").cast("long").as("step"),
        col("col").as("node"))
  }

  /** SECOND-ORDER biased walks (node2vec, Grover & Leskovec KDD'16):
    * from state (prev, cur), neighbor x of cur draws unnormalized
    * search bias α = 1/p when x = prev (return), 1 when x ∈ N(prev)
    * (BFS-ish stay-close), 1/q otherwise (DFS-ish explore) — here as
    * the EXACT INTEGER weights `(wBack, wCommon, wFar)` (e.g. p=1/2,
    * q=2 → 4/2/1), so the cumulative-weight pick
    * `first neighbor with cum > stepHash(w,t) mod Σw` is pure integer
    * arithmetic and replays identically in any engine. Step 1 has no
    * prev and is the uniform first-order step.
    *
    * Scale shape: steps 2+ inherently touch ALL of cur's neighbors
    * (the bias normalizer Σw is degree-mass — node2vec's own cost,
    * not an implementation artifact): each step equi-joins the
    * frontier against the long-row adjacency on `node = cur`
    * (deg(cur) rows per walk), marks the return/common/far class by a
    * LEFT join on `(prev, dst)` edge membership, and resolves the
    * pick with a PER-WALK cumulative window — partitions are
    * walk-sized (one visit's neighbor list), so a hub visit costs
    * deg(hub) rows in one spillable per-walk partition, never the
    * whole frontier in one task. First-order [[walks]] stays the
    * O(1)-per-step form for p = q = 1.
    *
    * @return `(walk_id, step, node)`, step 0..len */
  def biasedWalks(edges: DataFrame, seeds: DataFrame, len: Int,
      stepHash: (Column, Int) => Column,
      wBack: Long = 4L, wCommon: Long = 2L, wFar: Long = 1L): DataFrame = {
    require(len >= 1 && wBack > 0 && wCommon > 0 && wFar > 0,
      s"len=$len weights=($wBack,$wCommon,$wFar)")
    // Same linear path-accumulator chain as [[walks]] (r19 — one plan,
    // no per-step union branches re-running their whole prefix chain);
    // finished walks ride the synthetic self-loop row as a single
    // always-picked candidate (cum = wtot = wt > r ≥ 0), `dead` gates
    // the append. The path column multiplies through the candidate
    // explode (deg(cur) copies of ≤ len+1 longs per visit) — bounded
    // by the walk length, small next to the candidate row itself.
    val (adj, nAdj, deg) = buildAdjacency(edges, seeds)
    val adjSmall = nAdj <= MaxBroadcastAdjRows
    val bcastFrontier = !adjSmall && frontierFits(seeds, len)
    def fr(df: DataFrame): DataFrame =
      if (bcastFrontier) broadcast(df) else df
    def adjSide(df: DataFrame): DataFrame =
      if (adjSmall) broadcast(df) else df
    // membership side for the α classes: is (prev → dst) an edge?
    // (synthetic self-loop rows ride along: they can only match a
    // candidate whose prev is a dead node, and a walk never MOVES out
    // of a dead node — its sole self-loop candidate hits the
    // dst === prev branch before is_common is consulted)
    val memb = adj.select(col("node").as("prev"), col("dst"),
      lit(true).as("is_common"))
    val seeded = seeds.select(col("walk_id"), col("node"))
      .join(deg, Seq("node"), "left")
    // step 1: uniform first-order (no prev yet — the node2vec start)
    val h1 = stepHash(col("walk_id"), 1)
    var frontier = fr(seeded
      .select(col("walk_id"), col("node"),
        (pmod(h1, coalesce(col("degree"), lit(1L))) + 1L).as("rank"),
        col("degree").isNull.as("dead"),
        array(col("node")).as("path")))
      .join(adjSide(adj), Seq("node", "rank"))
      .select(col("walk_id"), col("node").as("prev"), col("dst").as("node"),
        col("dst_dead").as("dead"),
        when(col("dead"), col("path"))
          .otherwise(concat(col("path"), array(col("dst")))).as("path"))
    for (st <- 2 to len) {
      val h = stepHash(col("walk_id"), st)
      val wt = when(col("dst") === col("prev"), wBack)
        .when(col("is_common"), wCommon)
        .otherwise(wFar)
      // both window expressions share ONE (partition, order) spec —
      // Spark then plans a single WindowExec with a single sort; the
      // total rides an unbounded frame over the same ordering (an
      // orderless spec would be a SECOND Window operator and a second
      // pass over every per-walk candidate partition, round 15)
      val wWalk = Window.partitionBy(col("walk_id")).orderBy(col("rank"))
      val cand = fr(frontier)
        .join(adjSide(adj.select(col("node").as("cnode"), col("rank"),
          col("dst"), col("dst_dead"))), col("node") === col("cnode"))
        .join(adjSide(memb), Seq("prev", "dst"), "left")
        .select(col("walk_id"), col("prev"), col("node"), col("rank"),
          col("dst"), col("dst_dead"), col("dead"), col("path"), wt.as("wt"))
      val picked = cand
        .withColumn("cum", sum(col("wt")).over(wWalk))
        .withColumn("wtot", sum(col("wt")).over(wWalk.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("r", pmod(h, col("wtot")))
        .where(col("cum") > col("r") && col("cum") - col("wt") <= col("r"))
      frontier = picked
        .select(col("walk_id"), col("node").as("prev"), col("dst").as("node"),
          col("dst_dead").as("dead"),
          when(col("dead"), col("path"))
            .otherwise(concat(col("path"), array(col("dst")))).as("path"))
    }
    frontier.select(col("walk_id"), posexplode(col("path")))
      .select(col("walk_id"), col("pos").cast("long").as("step"),
        col("col").as("node"))
  }
}
