package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Ewma

/** Streaming Dropwizard meter — the stateful form of `q_meter_ewma`
  * (reference `metrics.clj:6-18`): per-key tick counts stream in
  * (pre-aggregated per micro-batch, the same contract as
  * [[StreamingAnomaly]]), and every tick's 1/5/15-minute EWMA reading
  * is emitted as soon as the tick CLOSES (a strictly later tick
  * arrives for that key).
  *
  * State per key is O(1) and stream-length independent: the three
  * current rates, the still-open tick's accumulating count, and the
  * emitted-through watermark that makes every tick read EXACTLY ONCE
  * across micro-batch boundaries. Gap ticks with no arrivals are
  * synthesized with n = 0 when the next arrival closes them
  * (Dropwizard's `tickIfNecessary` catch-up) — including the LEADING
  * zeros from tick 0 for a key whose first event is late in the
  * window, so a closed tick's reading equals the batch query's row
  * for the same tick over any prefix (StreamingMeterSpec pins the
  * equivalence, including across arbitrary batch split points).
  * Counts arriving for a tick already read are REFUSED and counted
  * ([[MeterState.lateDropped]]), mirroring [[StreamingAnomaly]]:
  * consumed history is immutable.
  */
object StreamingMeter {

  /** `open` = still-accumulating tick (index, count); rates are the
    * meter state AFTER folding every tick < open tick. */
  case class MeterState(m1: Double, m5: Double, m15: Double,
      init: Boolean, openTick: Long, openN: Long, lateDropped: Long)

  case class MeterReading(key: String, i: Long, n: Long,
      m1: Double, m5: Double, m15: Double)

  /** ticks: (key, tickIndex, count) per-micro-batch partial counts. */
  def rates(spark: SparkSession, ticks: Dataset[(String, Long, Long)])
      : Dataset[MeterReading] = {
    import spark.implicits._
    ticks
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[(String, Long, Long)],
            state: GroupState[MeterState]) => {
          var st = state.getOption.getOrElse(
            MeterState(0, 0, 0, init = false, openTick = -1L, openN = 0L, 0L))
          val out = Vector.newBuilder[MeterReading]
          // fold one closed tick into the rates and emit its reading
          def close(i: Long, n: Long): Unit = {
            val inst = n.toDouble / Ewma.TickSeconds
            st =
              if (!st.init)
                st.copy(m1 = inst, m5 = inst, m15 = inst, init = true)
              else st.copy(
                m1 = Ewma.step(st.m1, Ewma.A1, inst),
                m5 = Ewma.step(st.m5, Ewma.A5, inst),
                m15 = Ewma.step(st.m15, Ewma.A15, inst))
            out += MeterReading(key, i, n, st.m1, st.m5, st.m15)
          }
          it.toSeq.sortBy(_._2).foreach { case (_, i, c) =>
            if (st.openTick >= 0 && i < st.openTick)
              st = st.copy(lateDropped = st.lateDropped + 1)
            else if (st.openTick < 0) {
              // first arrival ever: the grid starts at tick 0 — close
              // the leading empty ticks so prefixes match the batch grid
              (0L until i).foreach(g => close(g, 0L))
              st = st.copy(openTick = i, openN = c)
            } else if (i == st.openTick)
              st = st.copy(openN = st.openN + c)
            else { // i > openTick: close the open tick, then the gap
              close(st.openTick, st.openN)
              (st.openTick + 1 until i).foreach(g => close(g, 0L))
              st = st.copy(openTick = i, openN = c)
            }
          }
          state.update(st)
          out.result().iterator
        })
  }
}
