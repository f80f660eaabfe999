package graft.operators

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.Fence.FenceOps

/** Distributed trainer for the fasttext-style hashed linear quality
  * classifier whose serving shape is `q_quality_logreg` — the learned
  * quality gate of CCNet/RefinedWeb-class corpus pipelines (language
  * or domain filtering from a labeled slice). Features are hashed
  * bag-of-words with RAW SUMMED token counts per bucket ([[featurize]]
  * — integer-valued, not means); training is full-batch gradient
  * descent on logistic loss.
  *
  * Scale shape per iteration (the KMeans contract — nothing iterative
  * lives in executor memory, the driver holds only the model):
  *
  *  - the feature table is hash-partitioned by `doc_id` ONCE and
  *    checkpointed; every later corpus-scale operation reuses that
  *    partitioning, so no corpus-scale exchange recurs;
  *  - MARGINS: features ⋈ broadcast(weights) (dim-bounded build side —
  *    structural smallness, like the PQ LUTs) then a per-doc sum that
  *    satisfies its distribution from the standing partitioning: no
  *    exchange;
  *  - GRADIENT: the per-doc error joins back zero-exchange (both
  *    sides doc-partitioned) and the only data that ships is the
  *    (bucket, partial-sum) frame — `dim`-bounded, map-side combined;
  *  - the driver update is O(dim) doubles.
  *
  * Cross-engine/driver determinism is the exact-decimal discipline:
  * feature values and per-doc errors are rounded to 6 decimals and
  * summed as DECIMAL (order-independent), weights are kept on the
  * 6-decimal grid, and the only float ops (sigmoid, the lr step) are
  * pointwise on driver-reproducible inputs — so the whole training
  * run is bit-reproducible and HashedLogRegSpec pins `fit` EXACTLY
  * against a sequential in-memory reference, not to a tolerance.
  */
object HashedLogReg {

  case class Model(dim: Int, bias: Double, weights: Array[Double])

  /** Driver-side twin of the executor-side `round(x, 6)` (both are
    * HALF_UP over the exact double → decimal expansion). */
  def round6(x: Double): Double =
    new JBig(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  private def sigmoid(m: Double): Double = 1.0 / (1.0 + math.exp(-m))

  /** Hashed bag-of-words features: (doc_id, y, idx, v) with
    * idx = portable-digest(token) mod dim and v = the raw token count
    * as DECIMAL(18,6) — integer-valued, exactly the margin arithmetic
    * `q_quality_logreg` serves (raw summed counts, not means), which
    * keeps margins O(doc length) so full-batch GD separates quickly.
    * One corpus-scale exchange (the groupBy). */
  def featurize(docs: DataFrame, textCol: String, labelCol: String,
      dim: Int): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    docs
      .select(col("doc_id"), col(labelCol).cast("double").as("y"),
        explode(toks).as("w"))
      .select(col("doc_id"), col("y"),
        (PortableHash.md5Long(col("w")) % dim.toLong).as("idx"))
      .groupBy(col("doc_id"), col("y"), col("idx"))
      .agg(count(lit(1)).cast("decimal(18,6)").as("v"))
      .select(col("doc_id"), col("y"), col("idx"), col("v"))
  }

  /** Margin column: exact decimal Σ v·w per doc, to double, + bias. */
  private def margins(f: DataFrame, w: Array[Double], bias: Double)
      : DataFrame = {
    val spark = f.sparkSession
    import spark.implicits._
    val wDf = w.zipWithIndex
      .map { case (wv, i) => (i.toLong, new JBig(wv.toString)) }.toSeq
      .toDF("idx", "wv")
      .select(col("idx"), col("wv").cast("decimal(12,6)").as("wv"))
    f.join(broadcast(wDf), "idx")
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("v") * col("wv")).as("mdec"))
      .select(col("doc_id"), col("y"),
        (col("mdec").cast("double") + lit(bias)).as("m"))
  }

  /** Full-batch GD on logistic loss.
    * @param feats output of [[featurize]]
    * @return trained model + per-iteration mean log-loss (computed at
    *   the weights of that iteration, before its update) */
  def fit(feats: DataFrame, dim: Int, iters: Int = 15, lr: Double = 2.0)
      : (Model, Seq[Double]) = {
    require(iters >= 1 && dim >= 2, s"iters=$iters dim=$dim")
    val f = feats.repartition(col("doc_id")).fenced()
    val head = f.agg(countDistinct(col("doc_id")).as("n"),
      count(when(col("y") =!= 0.0 && col("y") =!= 1.0, 1)).as("bad")).first()
    val n = head.getLong(0)
    require(n > 0, "empty training set")
    // a mislabeled frame would otherwise train silently toward garbage
    require(head.getLong(1) == 0L, "labels must be exactly 0.0 or 1.0")
    var w = Array.fill(dim)(0.0)
    var bias = 0.0
    val losses = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-col("m")))
      val err = margins(f, w, bias)
        .select(col("doc_id"), col("y"),
          round(p - col("y"), 6).cast("decimal(12,6)").as("e"),
          // monitoring only (double sum): -[y ln p + (1-y) ln(1-p)],
          // p clamped so a saturated misclassification stays finite
          (-(col("y") * log(greatest(p, lit(1e-12))) +
            (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(1e-12)))))
            .as("ll"))
      // per-doc error joins back on the standing doc_id partitioning;
      // the only exchange is the dim-bounded (idx, partial) frame
      val grad = f.join(err.select(col("doc_id"), col("e")), "doc_id")
        .groupBy(col("idx")).agg(sum(col("v") * col("e")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue).toMap
      val Array(eSum, llSum) = err
        .agg(sum(col("e")).cast("double"), sum(col("ll")))
        .first().toSeq.map(_.asInstanceOf[Double]).toArray
      losses += llSum / n
      w = Array.tabulate(dim)(j =>
        round6(w(j) - lr * grad.getOrElse(j.toLong, 0.0) / n))
      bias = round6(bias - lr * eSum / n)
    }
    (Model(dim, bias, w), losses.result())
  }

  /** Apply: (doc_id, y, p, predicted) for accuracy measurement —
    * same zero-recurring-exchange plan as a training iteration. */
  def score(feats: DataFrame, model: Model): DataFrame =
    margins(feats.repartition(col("doc_id")), model.weights, model.bias)
      .select(col("doc_id"), col("y"),
        (lit(1.0) / (lit(1.0) + exp(-col("m")))).as("p"))
      .withColumn("predicted", (col("p") >= 0.5).cast("double"))
}
