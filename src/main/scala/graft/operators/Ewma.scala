package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Dropwizard-style exponentially-weighted moving-average meter rates
  * — the reference's per-stage 1/5/15-minute throughput meters
  * (`/root/reference/src/dwds/livestream/metrics.clj:6-18` wraps
  * `com.codahale.metrics.Meter`; the reporter logs the three rates
  * once a minute, `metrics.clj:9-14`).
  *
  * Semantics mirrored exactly: the meter ticks every [[TickSeconds]]
  * seconds; at each tick the instantaneous per-second rate
  * `inst = n / TickSeconds` folds into each horizon's EWMA as
  * `m += α · (inst − m)` with `α = 1 − exp(−TickSeconds/60/minutes)`;
  * the FIRST tick initializes the rate to its own instantaneous rate.
  * Empty ticks participate with n = 0 (Dropwizard's `tickIfNecessary`
  * catch-up), which is what makes the rates decay when traffic stops.
  *
  * Scale shape: the recursion is sequential in TIME but parallel
  * across METER KEYS (per-stage meters, per-tenant meters…), so the
  * frame is hash-partitioned by key and sort-streamed — Spark's
  * spillable sort feeds [[rates]]' per-partition fold an ordered
  * iterator, and nothing is ever materialized per key. The sequential
  * dimension is TIME-bounded, not data-bounded: a year of 5-second
  * ticks is ~6.3 M rows per key regardless of whether the corpus is
  * 1 GB or 100 TB (the corpus-sized work is the upstream per-tick
  * COUNT, an ordinary distributed aggregation).
  */
object Ewma {

  /** Dropwizard Meter tick interval (seconds). */
  val TickSeconds = 5

  /** Dropwizard EWMA smoothing constant for an m-minute horizon. */
  def alpha(minutes: Int): Double =
    1.0 - math.exp(-TickSeconds / 60.0 / minutes)

  val A1: Double = alpha(1)
  val A5: Double = alpha(5)
  val A15: Double = alpha(15)

  /** One EWMA update — shared by the batch fold, the streaming meter
    * and the spec's scalar reference so the formula cannot drift. */
  def step(m: Double, a: Double, inst: Double): Double = m + a * (inst - m)

  /** Dense per-key tick counts in, per-tick meter readings out. */
  case class Tick(key: String, i: Long, n: Long)
  case class Reading(key: String, i: Long, n: Long,
      m1: Double, m5: Double, m15: Double)

  /** `ticks` must be DENSE per key (every tick index present, zero
    * counts included) and is re-ordered here; one [[Reading]] per
    * input tick. */
  def rates(ticks: DataFrame): Dataset[Reading] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.select(col("key"), col("i"), col("n")).as[Tick]
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("i"))
      .mapPartitions { it =>
        // per-partition fold over the sorted stream; state resets at
        // each key boundary (a partition carries whole keys)
        var key: String = null
        var init = false
        var m1, m5, m15 = 0.0
        it.map { t =>
          if (t.key != key) { key = t.key; init = false }
          val inst = t.n.toDouble / TickSeconds
          if (!init) { m1 = inst; m5 = inst; m15 = inst; init = true }
          else {
            m1 = step(m1, A1, inst)
            m5 = step(m5, A5, inst)
            m15 = step(m15, A15, inst)
          }
          Reading(t.key, t.i, t.n, m1, m5, m15)
        }
      }
  }
}
