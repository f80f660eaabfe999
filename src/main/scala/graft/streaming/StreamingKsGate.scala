package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming two-sample Kolmogorov–Smirnov drift gate — the
  * incremental form of `q_quality_ks`: documents stream in tagged
  * focus/rest, and after every micro-batch the gate re-issues the KS
  * verdict over EVERYTHING seen so far, exactly equal to the batch
  * query run on that prefix (StreamingKsGateSpec pins it, including
  * the d_num integer numerator bit-for-bit).
  *
  * State is a MERGEABLE CDF: an exact per-value histogram
  * `x → (count_focus, count_rest)` — a pure counter map, so merging
  * two states is entrywise addition (the lossless-merge property the
  * KMV certification demonstrates for distinct-counts holds here by
  * construction). Its size is bounded by the VALUE DOMAIN (distinct
  * document lengths / quality scores — small integers), NOT by the
  * stream: a year of corpus never grows it past the domain. For a
  * genuinely continuous score, bin upstream (the histogram then
  * computes the binned KS exactly — the binning, not the gate, is the
  * approximation).
  *
  * Scale shape: the heavy work — per-value partial counts — happens
  * UPSTREAM as an ordinary distributed per-batch aggregation (same
  * contract as [[StreamingAnomaly]]); the gate's single stateful task
  * only folds |domain|-sized deltas and walks the sorted histogram
  * once per batch. The sup-gap maximization runs over the exact
  * integer numerators |ca·n_b − cb·n_a| like the batch query — no
  * float compare anywhere; D is one double division at the end.
  */
object StreamingKsGate {

  case class KsVerdict(nA: Long, nB: Long, dNum: Long, ksD: Double)

  /** Exact KS from a per-value (focus, rest) histogram — shared with
    * the spec's reference so the formula cannot drift. */
  def verdict(hist: Map[Long, (Long, Long)]): KsVerdict = {
    val nA = hist.valuesIterator.map(_._1).sum
    val nB = hist.valuesIterator.map(_._2).sum
    // BigInt sup-gap: Long `ca * nB - cb * nA` silently wraps once
    // nA·nB exceeds 2^63 (~3e9 rows per side) — exactly the scale the
    // gate claims to survive. The fold runs once per distinct value
    // per micro-batch over a domain-bounded histogram, so the BigInt
    // cost is negligible. dNum stays Long for spec/oracle parity with
    // the batch query; the require fails loudly (instead of emitting
    // a corrupted verdict) if a deployment ever crosses the bound —
    // q_quality_ks documents the same nA·nB < 2^63 limit.
    var ca, cb = 0L
    var best = BigInt(0)
    hist.toSeq.sortBy(_._1).foreach { case (_, (a, b)) =>
      ca += a; cb += b
      val g = (BigInt(ca) * nB - BigInt(cb) * nA).abs
      if (g > best) best = g
    }
    require(best.isValidLong, s"KS sup-gap $best exceeds Long — nA=$nA nB=$nB")
    val d =
      if (nA == 0 || nB == 0) 0.0
      else BigDecimal(best.toDouble / (nA.toDouble * nB.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    KsVerdict(nA, nB, best.toLong, d)
  }

  /** rows: (x, focusCount, restCount) per-micro-batch partial counts.
    * Emits ONE verdict per micro-batch (Update semantics — the
    * current gate reading over everything seen). */
  def gate(spark: SparkSession, rows: Dataset[(Long, Long, Long)])
      : Dataset[KsVerdict] = {
    import spark.implicits._
    rows
      .groupByKey(_ => 0)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (_: Int, it: Iterator[(Long, Long, Long)],
            state: GroupState[Map[Long, (Long, Long)]]) => {
          var h = state.getOption.getOrElse(Map.empty[Long, (Long, Long)])
          it.foreach { case (x, ca, cb) =>
            val (pa, pb) = h.getOrElse(x, (0L, 0L))
            h += x -> (pa + ca, pb + cb)
          }
          state.update(h)
          verdict(h)
        })
  }
}
