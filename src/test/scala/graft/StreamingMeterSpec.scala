package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ewma
import graft.streaming.StreamingMeter
import graft.streaming.StreamingMeter.MeterReading

class StreamingMeterSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Scalar reference of the q_meter_ewma recursion: dense grid from
    * tick 0 through the last tick present, per key. */
  private def batchReadings(series: Seq[(String, Long, Long)], ticks: Long)
      : Seq[MeterReading] =
    series.groupBy(_._1).toSeq.flatMap { case (key, rows) =>
      val byTick = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      var m1, m5, m15 = 0.0
      var init = false
      (0L until ticks).map { i =>
        val n = byTick.getOrElse(i, 0L)
        val inst = n.toDouble / Ewma.TickSeconds
        if (!init) { m1 = inst; m5 = inst; m15 = inst; init = true }
        else {
          m1 = Ewma.step(m1, Ewma.A1, inst)
          m5 = Ewma.step(m5, Ewma.A5, inst)
          m15 = Ewma.step(m15, Ewma.A15, inst)
        }
        MeterReading(key, i, n, m1, m5, m15)
      }
    }

  test("alpha constants are the Dropwizard Meter values") {
    // com.codahale.metrics.EWMA: alpha = 1 - exp(-interval/60/minutes),
    // interval = 5 s — the published constants for the three horizons
    assert(Ewma.A1 === 1.0 - math.exp(-1.0 / 12))
    assert(Ewma.A5 === 1.0 - math.exp(-1.0 / 60))
    assert(Ewma.A15 === 1.0 - math.exp(-1.0 / 180))
    // meter fixed point: constant traffic reads exactly its own rate
    var m = 10.0 / Ewma.TickSeconds
    (1 to 50).foreach(_ => m = Ewma.step(m, Ewma.A1, 10.0 / Ewma.TickSeconds))
    assert(m === 10.0 / Ewma.TickSeconds)
    // decay: one idle 1-min horizon tick retains exactly (1 - A1)
    assert(Ewma.step(1.0, Ewma.A1, 0.0) === 1.0 - Ewma.A1)
  }

  test("closed-tick readings equal the batch recursion across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    // bursty series with gaps and a key that starts late (leading
    // zeros must be synthesized); tick 9 split across two batches
    val a = Seq[(String, Long, Long)](
      ("parse", 0L, 4L), ("parse", 1L, 7L), ("parse", 2L, 0L),
      ("parse", 5L, 12L), ("parse", 9L, 2L), ("parse", 13L, 30L),
      ("emit", 6L, 3L), ("emit", 7L, 3L), ("emit", 12L, 9L))
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamingMeter.rates(spark, mem.toDS())
      .writeStream.format("memory").queryName("meter_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = a.partition(_._2 < 9L)
      mem.addData(b1 :+ (("parse", 9L, 1L)): _*)
      q.processAllAvailable()
      mem.addData(b2.map { case ("parse", 9L, _) => ("parse", 9L, 1L); case r => r }: _*)
      q.processAllAvailable()

      val got = spark.table("meter_stream").as[MeterReading].collect().toSeq
      // exactly-once per (key, tick)
      assert(got.map(r => (r.key, r.i)).distinct.length == got.length)
      // streaming emits every tick strictly BEFORE each key's open
      // (last) tick; the batch grid over that prefix must agree bitwise
      val expected = batchReadings(a, ticks = 14L).filter { r =>
        r.key match {
          case "parse" => r.i < 13L
          case _       => r.i < 12L
        }
      }
      assert(got.sortBy(r => (r.key, r.i)) ==
        expected.sortBy(r => (r.key, r.i)))
    } finally q.stop()
  }

  test("late counts for a closed tick are refused") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamingMeter.rates(spark, mem.toDS())
      .writeStream.format("memory").queryName("meter_late")
      .outputMode("append").start()
    try {
      mem.addData(("m", 0L, 5L), ("m", 1L, 5L), ("m", 4L, 5L))
      q.processAllAvailable()
      // ticks 0..3 are closed and read; a late count for tick 1 must
      // leave no trace in any subsequent reading
      mem.addData(("m", 1L, 100L))
      mem.addData(("m", 6L, 5L))
      q.processAllAvailable()
      val got = spark.table("meter_late").as[MeterReading].collect().toSeq
      assert(got.map(r => (r.key, r.i)).distinct.length == got.length)
      val expected = batchReadings(
        Seq(("m", 0L, 5L), ("m", 1L, 5L), ("m", 4L, 5L)), ticks = 6L)
      assert(got.sortBy(_.i) == expected.sortBy(_.i))
    } finally q.stop()
  }
}
