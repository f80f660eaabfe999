package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSessionizer

/** The streaming sessionizer's emission over any in-order prefix must
  * equal the batch `q_sessionize` over the same rows — checked against
  * the real query on the real testdata, split across micro-batches at
  * arbitrary points. */
class StreamingSessionizeSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  test("streamed session ids equal the batch query across micro-batch splits") {
    val events = Tables(spark, Sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsu"))
      .as[(Long, Long, Long)].collect()
      .sortBy { case (_, eventId, ts) => (ts, eventId) }
    val expected = SparkEntry.queries("q_sessionize")(spark, Sf)
      .select("event_id", "sid").as[(Long, Long)].collect().toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val q = StreamingSessionizer.sessionize(spark, mem.toDS())
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("update").start()
    try {
      // three uneven splits — cross-batch state carry is the point
      val cuts = Seq(events.length / 3, 2 * events.length / 3, events.length)
      var from = 0
      cuts.foreach { to =>
        mem.addData(events.slice(from, to): _*)
        q.processAllAvailable()
        from = to
      }
      val streamed = spark.table("sess_stream")
        .as[StreamingSessionizer.SessionRow].collect()
        .map(r => r.event_id -> r.sid).toMap
      assert(streamed.size == expected.size)
      assert(streamed == expected)
    } finally q.stop()
  }
}
