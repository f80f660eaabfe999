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
    * (node, rank, dst, dst_degree) and deg = (node, degree). The edge
    * build runs ONCE (degree and the enriched rows both derive from
    * the checkpoint — computing either from the raw edges would
    * re-run the corpus-scale edge build). */
  private def buildAdjacency(edges: DataFrame): (DataFrame, DataFrame) = {
    val raw = rankedAdjacency(edges)
      .select(col("src").as("node"), col("rank"), col("dst"))
      .fenced()
    val deg = raw.groupBy(col("node")).agg(max(col("rank")).as("degree"))
    val adj = raw
      .join(deg.select(col("node").as("dst"), col("degree").as("dst_degree")),
        Seq("dst"), "left")
      .select(col("node"), col("rank"), col("dst"), col("dst_degree"))
      .fenced() // reused by every step
    (adj, deg)
  }

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
    val (adj, deg) = buildAdjacency(edges)
    var frontier = seeds.select(col("walk_id"), col("node"))
      .join(deg, Seq("node"), "left") // (walk_id, node, degree)
    val steps = Seq.newBuilder[DataFrame]
    steps += frontier.select(col("walk_id"), lit(0L).as("step"), col("node"))
    for (st <- 1 to len) {
      val h = stepHash(col("walk_id"), st)
      // dead ends (no out-edges → degree null) end their walk: the
      // arrival row above still emitted, no further steps
      frontier = frontier.where(col("degree").isNotNull)
        .select(col("walk_id"), col("node"),
          (pmod(h, col("degree")) + 1L).as("rank"))
        .join(adj, Seq("node", "rank"))
        .select(col("walk_id"), col("dst").as("node"),
          col("dst_degree").as("degree"))
      steps += frontier.select(col("walk_id"), lit(st.toLong).as("step"),
        col("node"))
    }
    steps.result().reduce(_ union _)
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
    val (adj, deg) = buildAdjacency(edges)
    // membership side for the α classes: is (prev → dst) an edge?
    val memb = adj.select(col("node").as("prev"), col("dst"),
      lit(true).as("is_common"))
    val steps = Seq.newBuilder[DataFrame]
    val seeded = seeds.select(col("walk_id"), col("node"))
      .join(deg, Seq("node"), "left")
    steps += seeded.select(col("walk_id"), lit(0L).as("step"), col("node"))
    // step 1: uniform first-order (no prev yet — the node2vec start)
    val h1 = stepHash(col("walk_id"), 1)
    var frontier = seeded.where(col("degree").isNotNull)
      .select(col("walk_id"), col("node"),
        (pmod(h1, col("degree")) + 1L).as("rank"))
      .join(adj, Seq("node", "rank"))
      .select(col("walk_id"), col("node").as("prev"), col("dst").as("node"))
    steps += frontier.select(col("walk_id"), lit(1L).as("step"), col("node"))
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
      val cand = frontier
        .join(adj.select(col("node").as("cnode"), col("rank"), col("dst")),
          col("node") === col("cnode"))
        .join(memb, Seq("prev", "dst"), "left")
        .select(col("walk_id"), col("prev"), col("node"), col("rank"),
          col("dst"), wt.as("wt"))
      val picked = cand
        .withColumn("cum", sum(col("wt")).over(wWalk))
        .withColumn("wtot", sum(col("wt")).over(wWalk.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("r", pmod(h, col("wtot")))
        .where(col("cum") > col("r") && col("cum") - col("wt") <= col("r"))
      frontier = picked
        .select(col("walk_id"), col("node").as("prev"), col("dst").as("node"))
      steps += frontier.select(col("walk_id"), lit(st.toLong).as("step"),
        col("node"))
    }
    steps.result().reduce(_ union _)
  }
}
