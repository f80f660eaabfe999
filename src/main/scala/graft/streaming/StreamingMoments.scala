package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MOMENTS — the online half of `q_ab_test`: per group
  * (event_type) the running (n, Σx, Σx²) on the SAME exact-decimal
  * grid the batch query sums on (value cast to DECIMAL(18,4), its
  * square to DECIMAL(27,8)), maintained by mapGroupsWithState. The
  * experimentation readout (Welch t between any two groups) is then
  * pure arithmetic over the emitted moment rows — the batch query's
  * own expression — so stream and batch CANNOT disagree: addition on
  * an exact decimal grid is associative, hence split-invariant, which
  * is the entire reason the batch query sums decimals rather than
  * doubles in the first place.
  *
  * State is three numbers per group — O(|groups|) total, the smallest
  * state class in the streaming family; no TTL needed. */
object StreamingMoments {

  /** Running exact moments of one group after a micro-batch. */
  case class Moments(event_type: String, n: Long, sx: JBigDecimal, sx2: JBigDecimal)

  /** Decimal grid for one observation. `JBigDecimal.valueOf` goes
    * through `Double.toString` (shortest decimal round-trip), which is
    * exactly how Spark's `Decimal(BigDecimal(d))` converts a double in
    * the batch `CAST(value AS DECIMAL(18,4))` path. `new JBigDecimal(v)`
    * would instead expand the exact binary value (2.00005 →
    * 2.0000499999…), rounding DOWN where the batch cast rounds UP at
    * representable boundary values — breaking the split-invariance
    * guarantee this module exists for. */
  private[graft] def gridX(v: Double): JBigDecimal =
    JBigDecimal.valueOf(v).setScale(4, RoundingMode.HALF_UP)

  private[graft] def gridX2(v: Double): JBigDecimal =
    JBigDecimal.valueOf(v * v).setScale(8, RoundingMode.HALF_UP)

  /** events: streaming (event_type, value) → one updated [[Moments]]
    * row per group per micro-batch (Update-mode semantics). */
  def moments(spark: SparkSession, events: DataFrame): Dataset[Moments] = {
    import spark.implicits._
    events
      .select(col("event_type").cast("string"), col("value").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (k: String, it: Iterator[(String, Double)],
            state: GroupState[(Long, String, String)]) => {
          val (n0, sx0, sx20) = state.getOption.getOrElse((0L, "0", "0"))
          var n = n0
          var sx = new JBigDecimal(sx0)
          var sx2 = new JBigDecimal(sx20)
          it.foreach { case (_, v) =>
            n += 1
            sx = sx.add(gridX(v))
            sx2 = sx2.add(gridX2(v))
          }
          state.update((n, sx.toPlainString, sx2.toPlainString))
          Moments(k, n, sx, sx2)
        })
  }

  /** The batch Welch-t arithmetic over two moment rows — shared with
    * the spec so streamed moments provably reproduce `q_ab_test`'s
    * statistic (identical operand order). */
  def welchT(a: Moments, b: Moments): Double = {
    def meanVar(m: Moments): (Double, Double) = {
      val n = m.n.toDouble
      val sx = m.sx.doubleValue
      val sx2 = m.sx2.doubleValue
      (sx / n, (n * sx2 - sx * sx) / (n * (m.n - 1).toDouble))
    }
    val (ma, va) = meanVar(a)
    val (mb, vb) = meanVar(b)
    (ma - mb) / math.sqrt(va / a.n.toDouble + vb / b.n.toDouble)
  }
}
