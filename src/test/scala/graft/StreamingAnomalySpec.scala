package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAnomaly
import graft.streaming.StreamingAnomaly.{AnomalyVerdict, MinHistory, Threshold, WindowHours}

class StreamingAnomalySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Batch reference: the q_anomaly formulation over an in-memory
    * hourly series — trailing-24 exact integer sums, sample stddev,
    * scored for every hour with >= MinHistory predecessors and a
    * successor (closed). */
  private def batchVerdicts(series: Seq[(String, Long, Long)])
      : Seq[AnomalyVerdict] =
    series.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val hours = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      hours.indices.dropRight(1).flatMap { i =>
        val (h, n) = hours(i)
        val trail = hours.slice(math.max(0, i - WindowHours), i)
        val k = trail.length
        if (k < MinHistory) None
        else {
          val s = trail.map(_._2).sum
          val sq = trail.map(t => t._2 * t._2).sum
          val mu = s.toDouble / k
          val sd = math.sqrt((sq.toDouble - s.toDouble * s / k) / (k - 1))
          if (sd <= 0) None
          else {
            val z = (n.toDouble - mu) / sd
            Some(AnomalyVerdict(tpe, h, n, mu, z, math.abs(z) > Threshold))
          }
        }
      }
    }

  test("streaming verdicts equal the batch scoring across batch splits, no re-emission") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic synthetic series: 40 quiet hours + one spike at
    // hour 30; a second type with a flat series (sd = 0 → no verdict)
    val spike = (0L until 40L).map { h =>
      val n = if (h == 30) 50L else 3L + (h % 3) // varying baseline
      ("clicks", h * 3600, n)
    }
    val flat = (0L until 20L).map(h => ("steady", h * 3600, 5L))
    val all = spike ++ flat

    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamingAnomaly.detect(spark, mem.toDS())
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append").start()
    try {
      // split mid-window AND mid-hour: hour 17's count arrives in two
      // pieces across the boundary (2 + the remainder)
      val (b1raw, b2raw) = all.partition { case (_, ts, _) => ts < 17L * 3600 }
      val cut = ("clicks", 17L * 3600, 1L)
      val rest = ("clicks", 17L * 3600, (3L + (17 % 3)) - 1L)
      mem.addData(b1raw :+ cut: _*)
      q.processAllAvailable()
      mem.addData(b2raw.filterNot(t => t._1 == "clicks" && t._2 == 17L * 3600) :+ rest: _*)
      q.processAllAvailable()

      val got = spark.table("anomaly_stream").as[AnomalyVerdict].collect().toSeq
      // exactly-once: no hour emitted twice
      assert(got.map(v => (v.eventType, v.hour)).distinct.length == got.length)
      val expected = batchVerdicts(all)
      assert(got.sortBy(v => (v.eventType, v.hour)) ==
        expected.sortBy(v => (v.eventType, v.hour)))
      // the spike is flagged, its quiet neighbours are not
      val spikeV = got.find(v => v.eventType == "clicks" && v.hour == 30L * 3600)
      assert(spikeV.exists(_.flagged), s"spike not flagged: $spikeV")
      assert(got.count(_.flagged) == got.count(v => v.eventType == "clicks" && v.flagged))
    } finally q.stop()
  }

  test("late counts for an already-scored hour are refused, not merged into history") {
    implicit val sqlCtx = spark.sqlContext
    val series = (0L until 40L).map(h => ("late_t", h * 3600, 3L + (h % 5)))
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamingAnomaly.detect(spark, mem.toDS())
      .writeStream.format("memory").queryName("anomaly_late")
      .outputMode("append").start()
    try {
      val (b1, b2) = series.partition(_._2 < 20L * 3600)
      mem.addData(b1: _*)
      q.processAllAvailable()
      // hour 5 closed and was consumed in batch 1 (scoredThrough is
      // hour 18); a violated in-order contract delivers more counts
      // for it now — they must NOT mutate the trailing history later
      // hours are z-scored against
      mem.addData(("late_t", 5L * 3600, 100L))
      mem.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("anomaly_late").as[AnomalyVerdict].collect().toSeq
      assert(got.map(v => (v.eventType, v.hour)).distinct.length == got.length)
      // verdicts equal the batch scoring of the ORIGINAL series — the
      // late row left no trace in any window
      val expected = batchVerdicts(series)
      assert(got.sortBy(_.hour) == expected.sortBy(_.hour))
    } finally q.stop()
  }
}
