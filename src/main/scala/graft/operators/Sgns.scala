package graft.operators

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftExpressions, PortableHash}
import graft.Fence.FenceOps

/** Distributed SKIP-GRAM WITH NEGATIVE SAMPLING (word2vec SGNS,
  * Mikolov et al. NIPS'13) over a co-occurrence pair table — the
  * embedding-training stage that completes the DeepWalk recipe
  * (Perozzi et al. KDD'14) the graph family already generates inputs
  * for: `q_graph_walks` → `q_graph_walk_pairs` → THIS → the ANN/dedup
  * machinery consumes the vectors.
  *
  * Design point: the pair table is AGGREGATED ((center, context,
  * weight) with weight = co-occurrence count), so one epoch is
  * full-batch GD over weighted pairs rather than SGD over the raw
  * stream — the formulation that is (a) order-free, hence
  * deterministic under any partitioning, and (b) map-side combinable.
  * Negatives are k hash-derived vocabulary draws per pair
  * (`md5(center:context:k) mod V` over the SORTED vocabulary — the
  * q_shuffle_epoch stance: the portable digest replaces the RNG, so
  * "sampling" is a pure function and the whole run replays exactly).
  *
  * Scale shape per iteration (the KMeans/HashedLogReg contract —
  * executors hold nothing iterative, the driver holds only the
  * model):
  *
  *  - the pair table is fenced once; each iteration scans it,
  *    explodes k+1 (positive + k negative) examples per pair
  *    map-side, and joins the V-bounded model table BROADCAST (one
  *    relation, both sides as a struct — the second probe reuses the
  *    first's exchange);
  *  - the only exchange is the (node × side)-keyed gradient frame
  *    (dim components as columns), map-side combined;
  *  - the driver update is O(V·dim) doubles.
  *
  * Determinism is the exact-decimal discipline: model weights live on
  * the 6-decimal grid; scores are left-to-right double dots of grid
  * values (the shared [[GraftExpressions.dot_product]] kernel);
  * per-example errors round to 6 decimals into DECIMAL; gradient
  * contributions are DECIMAL products (error × grid weight × integer
  * pair count) summed as DECIMAL — order-independent — and the update
  * re-rounds to the grid. SgnsSpec pins `fit` EXACTLY against a
  * sequential in-memory reference, not to a tolerance.
  */
object Sgns {

  /** Hard vocabulary ceiling for [[fit]] (r13 verdict item 5 — the
    * itemsets-F₁-bound stance): the trainer's driver state is
    * 2·V·dim doubles and each iteration broadcasts both model tables,
    * so V is the one input dimension that can silently OOM the
    * driver. At the ceiling (2²⁰ nodes, dim 8) the raw vector payload
    * is 2·2²⁰·8·8 B = 128 MiB per iteration's broadcasts — the upper
    * edge of the graph-embedding regime this full-batch formulation
    * targets. A pathological pair table now fails LOUDLY with sizing
    * arithmetic instead of an executor-side OOM. */
  val MaxVocab: Int = 1 << 20

  /** `nodes` is the sorted vocabulary; `in(i)`/`out(i)` are the
    * center/context vectors of `nodes(i)`, on the 6-decimal grid. */
  case class Model(dim: Int, nodes: Array[Long],
      in: Array[Array[Double]], out: Array[Array[Double]]) {
    def vector(node: Long): Option[Array[Double]] = {
      val i = java.util.Arrays.binarySearch(nodes, node)
      if (i >= 0) Some(in(i)) else None
    }
  }

  /** Driver-side twin of the executor-side `round(x, 6)`. */
  def round6(x: Double): Double =
    new JBig(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  /** Deterministic init: component j of node n's in-vector is
    * `(md5(n:in:j) mod 1000 − 499.5) / 5000` — a ±0.1 grid value,
    * pure function of (node, side, dim index), identical on the
    * driver and in any reference implementation. */
  def initComponent(node: Long, side: String, j: Int): Double =
    round6((PortableHash.digest60(s"$node:$side:$j") % 1000L - 499.5) / 5000.0)

  /** Full-batch SGNS over an aggregated pair table.
    *
    * @param pairs (center, context, weight) — weight the integer
    *   co-occurrence count (e.g. `n_pairs` of q_graph_walk_pairs)
    * @param dim   embedding width
    * @param negK  hash-derived negatives per positive pair
    * @return trained model + per-iteration mean logistic loss
    *   (monitoring, computed before that iteration's update) */
  def fit(pairs: DataFrame, dim: Int, iters: Int = 15, negK: Int = 3,
      lr: Double = 1.0): (Model, Seq[Double]) = {
    require(dim >= 2 && iters >= 1 && negK >= 1, s"dim=$dim iters=$iters negK=$negK")
    val spark = pairs.sparkSession
    import spark.implicits._
    // NOT fenced (r19 optimization round): the iterations scan the
    // SKELETON fence below, and p0 itself is read only by the vocab
    // collect and the skeleton build — a cast projection evaluated
    // twice. Caller contract: `pairs` must be cheap to rescan (the
    // one caller, sgnsTrainAndSep, passes a fenced frame).
    val p0 = pairs.toDF("center", "context", "wt")
      .select(col("center").cast("long"), col("context").cast("long"),
        col("wt").cast("long"))
    // vocabulary: sorted distinct nodes — model-sized driver state
    // (the KMeans-centroid pattern)
    val nodes = p0.select(col("center").as("n"))
      .union(p0.select(col("context").as("n")))
      .distinct().as[Long].collect().sorted
    val v = nodes.length
    require(v >= 2, s"need at least 2 nodes, got $v")
    require(v <= MaxVocab,
      s"vocabulary $v exceeds MaxVocab=$MaxVocab: driver holds 2·V·dim " +
        s"doubles and every iteration broadcasts both model tables " +
        s"(~${2L * v * dim * 8 / (1 << 20)} MiB of raw vector payload at " +
        s"dim=$dim) — beyond this the full-batch-broadcast formulation is " +
        "the wrong tool; shard the model or train on a pair-table subset")
    // LocalRelation straight into the broadcast build — fencing a
    // driver-local V-sized seq cost a materialization job for nothing
    // (r19 optimization round)
    val idxDf = broadcast(nodes.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toSeq.toDF("nidx", "nnode"))
    var in = Array.tabulate(v, dim)((i, j) => initComponent(nodes(i), "in", j))
    var out = Array.tabulate(v, dim)((i, j) => initComponent(nodes(i), "out", j))
    // the example SKELETON (center, x, y, wt) — negatives are a pure
    // function of (center, context, k), so it is iteration-invariant
    // and built once
    val skeleton = p0
      .select(col("center"), col("context"), col("wt"),
        explode(sequence(lit(0), lit(negK))).as("k"))
      .withColumn("nidx",
        when(col("k") === 0, lit(null).cast("long")).otherwise(
          pmod(PortableHash.md5Long(concat(
            col("center").cast("string"), lit(":"),
            col("context").cast("string"), lit(":"),
            col("k").cast("string"))), lit(v.toLong))))
      .join(idxDf, Seq("nidx"), "left")
      .select(col("center"),
        when(col("k") === 0, col("context")).otherwise(col("nnode")).as("x"),
        when(col("k") === 0, 1.0).otherwise(0.0).as("y"), col("wt"))
      .fenced() // scanned every iteration
    // PER-NODE example mass — the update normalizer. Dividing each
    // node's gradient by ITS OWN weighted example count makes the
    // step a per-node MEAN gradient, so convergence speed is
    // corpus-size-free (a global-mass normalizer shrinks every step
    // as the corpus grows — the full-batch trap). Exact integers,
    // bounded driver state (V-sized, like the centroids).
    // Computed from ITERATION 1's gradient collect instead of its own
    // pre-loop action (r19 optimization round): the iteration agg
    // groups by exactly (side, gn) over the same fenced skeleton, so
    // an extra `sum(wt)` column IS the old mass aggregate — identical
    // exact-integer sums, one fewer corpus-frame action. Mass is only
    // CONSUMED after the collect (update normalization, loss
    // monitor), so first-iteration availability is sufficient.
    var massIn: Map[Long, Long] = null
    var massOut: Map[Long, Long] = null
    var nAll = 0.0
    val losses = Seq.newBuilder[Double]
    // The per-iteration plan is model-scale (the corpus-scale work is
    // fenced above): AQE's value here is nil — its per-exchange
    // re-plan + extra job dominate the tiny stages it would optimize —
    // so the training loop runs with AQE off and restores the session
    // setting after (r19; values are unaffected: every aggregate in
    // the loop is an order-free exact-decimal sum, and InvarianceProbe
    // pins the registry bit-identical across partitioning/AQE
    // changes). Scale note: the gradient exchange then lands on
    // spark.sql.shuffle.partitions as-configured instead of AQE
    // coalescing — at the 2²⁰-node cap that frame is ~2 M rows, fine
    // at any sane setting.
    val conf = spark.conf
    val aqeBefore = conf.get("spark.sql.adaptive.enabled", "true")
    val shufBefore = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "false")
    // With AQE off the gradient exchange lands on the static shuffle
    // partition count; size it from the MODEL (the only thing that
    // crosses it — 2·V groups of ~150 B), not from a constant: ~400 k
    // groups per partition ≈ 60 MB, so 1 partition locally and a
    // handful at the 2²⁰-node cap.
    conf.set("spark.sql.shuffle.partitions",
      math.max(1L, 2L * v / 400000L + 1).toString)
    try {
    for (_ <- 1 to iters) {
      // ZERO broadcast-exchange builds per iteration (r19, second
      // cut): the model reaches the examples as a
      // `SparkContext.broadcast` HashMap probed by a codegen'd
      // lookup expression ([[GraftExpressions.vec_lookup]]) instead
      // of a broadcast JOIN. The join cost one broadcast-build JOB
      // per iteration; the broadcast variable ships with the task
      // binary for free and each side is one hash probe per row. The
      // inner join it replaces matched every row (center/x are in the
      // vocabulary by construction), so the total-lookup expression
      // is row-for-row identical — and it THROWS on a miss rather
      // than training on a silent null. Both sides ride ONE map of
      // concatenated (in ++ out) vectors; each side is a `slice`.
      // The handle is destroyed right after the iteration's single
      // action so executor storage stays one model copy, not iters.
      val mmap = new java.util.HashMap[java.lang.Long, Array[Double]](2 * v)
      nodes.indices.foreach { i =>
        mmap.put(nodes(i), in(i) ++ out(i)): Unit
      }
      val mbc = spark.sparkContext.broadcast(mmap)
      val vio = (k: org.apache.spark.sql.Column) =>
        GraftExpressions.vec_lookup(k, mbc)
      val examples = skeleton
        .select(col("center"), col("x"), col("y"), col("wt"),
          slice(vio(col("center")), 1, dim).as("vin"),
          slice(vio(col("x")), dim + 1, dim).as("vout"))
      val m = GraftExpressions.dot_product(col("vin"), col("vout"))
      val prob = lit(1.0) / (lit(1.0) + exp(-m))
      val scored = examples
        .select(col("center"), col("x"), col("wt"), col("vin"), col("vout"),
          round(prob - col("y"), 6).cast("decimal(12,6)").as("e"),
          // monitoring only (decimal sum keeps it order-free too);
          // clamp keeps saturation finite
          ((-(col("y") * log(greatest(prob, lit(1e-12))) +
            (lit(1.0) - col("y")) * log(greatest(lit(1.0) - prob, lit(1e-12)))))
            * col("wt")).cast("decimal(38,12)").as("ll"))
      // gradient contribution: multiply (e × wt) FIRST — (12,6)×(12,0)
      // = (25,6), then ×(12,6) = (38,12), exactly the 38-precision
      // cap. The naive left-assoc (e×c)×wt hits (25,12)×(20,0) = 46
      // > 38 and Spark silently SHRINKS the scale to fit — off the
      // exact grid.
      // ONE action and ONE pass per iteration: both gradient sides
      // ride a 2-way struct explode off the same scored rows (a union
      // would recompute the scored subtree per branch), and the loss
      // piggybacks as a second aggregate emitted once per example
      // (side = in). The per-iteration wall is pure job overhead at
      // model scale, so actions are the cost unit. Gradient components
      // aggregate as dim COLUMNS over (side, gn) groups, not as a
      // posexplode to (side, gn, j) rows (r19): the addend set per
      // component is identical — (e × wt) × c_j in the same decimal
      // types, order-free — but the aggregate sees dim× fewer rows and
      // the exchange dim× fewer groups, and the decimal grid makes the
      // regrouping provably invisible.
      val gradCols = (0 until dim).map { j =>
        sum(((col("e") * col("wt").cast("decimal(12,0)"))
          * element_at(col("sx.vec"), j + 1).cast("decimal(12,6)"))
          .cast("decimal(38,12)")).as(s"g$j")
      } :+ sum(when(col("sx.side") === "in", col("ll"))).as("lp") :+
        sum(col("wt")).as("mw") // per-(side, gn) mass — see above
      val rows = scored
        .select(col("e"), col("wt"), col("ll"), explode(array(
          struct(lit("in").as("side"), col("center").as("gn"),
            col("vout").as("vec")),
          struct(lit("out").as("side"), col("x").as("gn"),
            col("vin").as("vec")))).as("sx"))
        .groupBy(col("sx.side").as("side"), col("sx.gn").as("gn"))
        .agg(gradCols.head, gradCols.tail: _*)
        .collect()
      mbc.destroy() // iteration's one action done; drop the model copy
      if (massIn == null) { // iteration-invariant — read once (iter 1)
        def massOf(tag: String) = rows.iterator
          .filter(_.getString(0) == tag)
          .map(r => r.getLong(1) -> r.getLong(2 + dim + 1)).toMap
        massIn = massOf("in")
        massOut = massOf("out")
        nAll = massIn.values.sum.toDouble
      }
      def side(tag: String) = rows.iterator
        .filter(_.getString(0) == tag)
        .flatMap { r =>
          val gn = r.getLong(1)
          (0 until dim).iterator.map(j => (gn, j) -> r.getDecimal(2 + j).doubleValue)
        }
        .toMap
      val (gIn, gOut) = (side("in"), side("out"))
      losses += rows.iterator
        .filter(r => r.getString(0) == "in" && !r.isNullAt(2 + dim))
        .map(_.getDecimal(2 + dim).doubleValue).sum / nAll
      in = Array.tabulate(v, dim)((i, j) =>
        round6(in(i)(j) - lr * gIn.getOrElse((nodes(i), j), 0.0)
          / massIn.getOrElse(nodes(i), 1L).toDouble))
      out = Array.tabulate(v, dim)((i, j) =>
        round6(out(i)(j) - lr * gOut.getOrElse((nodes(i), j), 0.0)
          / massOut.getOrElse(nodes(i), 1L).toDouble))
    }
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqeBefore)
      conf.set("spark.sql.shuffle.partitions", shufBefore)
    }
    (Model(dim, nodes, in, out), losses.result())
  }
}
