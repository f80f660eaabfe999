package graft

import java.math.{BigDecimal => JBig, MathContext}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HashedLogReg

/** HashedLogReg.fit vs a sequential in-memory reference — EXACT
  * equality, not tolerance: the operator's exact-decimal discipline
  * (6-decimal feature/error grid, decimal sums, driver-reproducible
  * float steps) makes the whole training run bit-deterministic, so
  * any divergence is a real ordering/precision bug. */
class HashedLogRegSpec extends AnyFunSuite {
  import TestSpark.spark

  private val Dim = 512
  private val Iters = 15
  private val Lr = 0.05

  // The synthetic `lang` column is statistically independent of the
  // text (same vocabulary for every language), so the spec label is
  // text-DERIVED — a marker-imbalance gate (more "fast" than "slow"
  // tokens), learnable from the hashed bag-of-words by construction.
  private lazy val docs = {
    val ws = split(lower(col("text")), " ")
    def cnt(m: String) = size(filter(ws, w => w === m))
    Tables(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("text"),
        (cnt("fast") > cnt("slow")).cast("double").as("y"))
  }

  private lazy val feats =
    HashedLogReg.featurize(docs, "text", "y", Dim).localCheckpoint()

  /** (doc_id, y, idx, v) collected — v as the exact decimal. */
  private lazy val inMem: Seq[(Long, Double, Int, JBig)] = feats
    .collect()
    .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2).toInt,
      r.getDecimal(3)))
    .toSeq

  private def sigmoid(m: Double): Double = 1.0 / (1.0 + math.exp(-m))

  /** Sequential twin of fit: same decimal grid, same float steps. */
  private def referenceFit(): (Array[Double], Double, Seq[Double]) = {
    val byDoc = inMem.groupBy(_._1)
    val n = byDoc.size
    var w = Array.fill(Dim)(0.0)
    var bias = 0.0
    val losses = Seq.newBuilder[Double]
    (1 to Iters).foreach { _ =>
      // decimal weights exactly as the executor sees them
      val wDec = w.map(x => new JBig(x.toString))
      var gradSum = Array.fill(Dim)(JBig.ZERO)
      var eSum = JBig.ZERO
      var llSum = 0.0
      byDoc.foreach { case (_, rows) =>
        val y = rows.head._2
        val mDec = rows.foldLeft(JBig.ZERO) { case (acc, (_, _, idx, v)) =>
          acc.add(v.multiply(wDec(idx)))
        }
        val m = mDec.doubleValue + bias
        val p = sigmoid(m)
        val e = new JBig(HashedLogReg.round6(p - y).toString)
        llSum += -(y * math.log(math.max(p, 1e-12)) +
          (1.0 - y) * math.log(math.max(1.0 - p, 1e-12)))
        rows.foreach { case (_, _, idx, v) =>
          gradSum(idx) = gradSum(idx).add(v.multiply(e))
        }
        eSum = eSum.add(e)
      }
      losses += llSum / n
      w = Array.tabulate(Dim)(j =>
        HashedLogReg.round6(w(j) - Lr * gradSum(j).doubleValue / n))
      bias = HashedLogReg.round6(bias - Lr * eSum.doubleValue / n)
    }
    (w, bias, losses.result())
  }

  private lazy val fitted = HashedLogReg.fit(feats, Dim, Iters, Lr)

  test("weights and bias match the sequential reference EXACTLY") {
    val (model, _) = fitted
    val (refW, refBias, _) = referenceFit()
    assert(model.bias === refBias)
    val diff = model.weights.indices.filter(j => model.weights(j) != refW(j))
    assert(diff.isEmpty,
      s"weights diverge at buckets ${diff.take(5)}: " +
        diff.take(3).map(j => s"${model.weights(j)} vs ${refW(j)}").mkString(", "))
  }

  test("training reduces the loss") {
    val (_, losses) = fitted
    assert(losses.head > losses.last,
      s"loss did not improve: ${losses.head} -> ${losses.last}")
    assert(losses.forall(l => !l.isNaN && !l.isInfinite))
  }

  test("scoring reuses the doc_id partitioning: exactly one exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = HashedLogReg.score(feats, fitted._1)
    df.collect()
    def descend(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => descend(a.executedPlan)
      case qs: QueryStageExec => descend(qs.plan)
      case other => other.children.flatMap(descend)
    }) :+ p
    val shuffles = descend(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeExec => s }
    // the explicit repartition(doc_id) is the ONLY exchange: the
    // weights join is broadcast and the per-doc aggregation satisfies
    // its distribution from the standing partitioning
    assert(shuffles.length == 1,
      s"expected 1 exchange, got ${shuffles.length}:\n" +
        shuffles.map(_.outputPartitioning).mkString("\n"))
  }

  test("learned gate beats the majority-class baseline on train") {
    val (model, _) = fitted
    val scored = HashedLogReg.score(feats, model)
      .select(col("y"), col("predicted")).collect()
    val acc = scored.count(r => r.getDouble(0) == r.getDouble(1)).toDouble /
      scored.length
    val majority = {
      val ys = scored.map(_.getDouble(0))
      math.max(ys.count(_ == 1.0), ys.count(_ == 0.0)).toDouble / ys.length
    }
    assert(acc > majority, s"acc=$acc <= majority=$majority")
  }
}
