package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming POPULATION-STABILITY-INDEX drift gate — the incremental
  * form of `q_quality_psi`: the REFERENCE bin distribution is fixed
  * up front (the prior corpus's persisted stats — dimension-sized,
  * rides to the single stateful task like a broadcast model), the
  * arriving corpus accumulates per-bin counts, and after every
  * micro-batch the gate re-issues the PSI verdict over everything
  * seen so far (StreamingPsiGateSpec pins it against the shared
  * [[psi]] formula on every prefix).
  *
  * Unlike the batch query — which emits per-bin TERMS and leaves the
  * total to the consumer because a cross-bin float sum has no
  * deterministic order in SQL — the gate CAN emit the scalar: its
  * fold walks the bins in sorted order, so the sum order is frozen
  * and the verdict is reproducible bit-for-bit.
  *
  * State is the per-bin counter map — bounded by the BIN DOMAIN
  * (64-char length bins), never the stream (the [[StreamingKsGate]]
  * argument); merging states is entrywise addition. The heavy work
  * (per-bin partial counts) happens upstream as an ordinary
  * distributed per-batch aggregation; the stateful task folds
  * |domain|-sized deltas.
  */
object StreamingPsiGate {

  case class PsiVerdict(nRef: Long, nCur: Long, psi: Double, worstBin: Long)

  /** Shared PSI formula (the `q_quality_psi` construction: Laplace
    * +1-per-bin smoothing over n+B, (p−q)·ln(p/q) terms). The scalar
    * is the EXACT DECIMAL SUM of the 6 dp-rounded per-bin terms —
    * order-free (decimal addition is exact), so this verdict and the
    * batch query's `psi_total` column expose the IDENTICAL
    * alert-ready number from the same counts (r13 verdict item 7:
    * the batch surface used to defer the sum to the consumer because
    * a cross-bin float sum has no deterministic order; the decimal
    * fold over grid terms removes the order dependence on both
    * surfaces). Returns the verdict plus the per-bin terms (6 dp —
    * the batch query's emitted grain, so the two stay
    * cross-checkable). */
  def psi(ref: Map[Long, Long], cur: Map[Long, Long])
      : (PsiVerdict, Seq[(Long, Double)]) = {
    val bins = (ref.keySet ++ cur.keySet).toSeq.sorted
    val b = bins.size.toLong
    val nRef = ref.valuesIterator.sum
    val nCur = cur.valuesIterator.sum
    var total = BigDecimal(0)
    var worst = (-1L, -1.0)
    val terms = bins.map { bin =>
      val p = (ref.getOrElse(bin, 0L) + 1.0) / (nRef + b)
      val q = (cur.getOrElse(bin, 0L) + 1.0) / (nCur + b)
      val t = (p - q) * math.log(p / q)
      if (t > worst._2) worst = (bin, t)
      val r = BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      total += r
      bin -> r.toDouble
    }
    (PsiVerdict(nRef, nCur, total.toDouble, worst._1), terms)
  }

  /** rows: (bin, count) per-micro-batch partial counts of the
    * ARRIVING corpus. Emits one verdict per micro-batch (Update
    * semantics — the current drift reading vs the fixed reference). */
  def gate(spark: SparkSession, reference: Map[Long, Long],
      rows: Dataset[(Long, Long)]): Dataset[PsiVerdict] = {
    import spark.implicits._
    rows
      .groupByKey(_ => 0)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (_: Int, it: Iterator[(Long, Long)],
            state: GroupState[Map[Long, Long]]) => {
          var h = state.getOption.getOrElse(Map.empty[Long, Long])
          it.foreach { case (bin, c) => h += bin -> (h.getOrElse(bin, 0L) + c) }
          state.update(h)
          psi(reference, h)._1
        })
  }
}
