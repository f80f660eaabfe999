package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Flagship
import graft.streaming.{RateSampler, StreamingFlagship}

class StreamingSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  private lazy val lines: Seq[String] =
    Flagship.synthLog(Tables(spark, Sf, "events")).as[String].collect().toSeq

  test("streaming flagship equals batch flagship on identical input") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val dim = Flagship.dimension(Tables(spark, Sf, "events"))
    val q = StreamingFlagship
      .enriched(mem.toDF.withColumnRenamed("value", "line"), dim)
      .writeStream.format("memory").queryName("flagship_stream")
      .outputMode("append").start()
    try {
      lines.grouped(2000).foreach { g => mem.addData(g); q.processAllAvailable() }
      val streamed = spark.table("flagship_stream")
        .select("lemma", "ts", "freq", "first_user")
      val batch = Flagship(spark, Sf)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    } finally q.stop()
  }

  test("watermarked minute counts emit closed windows (A2 analog)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = StreamingFlagship
      .minuteCounts(mem.toDF.toDF("ts", "lemma"))
      .writeStream.format("memory").queryName("meter")
      .outputMode("append").start()
    try {
      def t(m: Int, s: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")
      mem.addData((t(0, 10), "a"), (t(0, 40), "b"), (t(1, 5), "c"))
      q.processAllAvailable()
      // advance watermark far past the first windows
      mem.addData((t(30, 0), "z"))
      q.processAllAvailable()
      val rows = spark.table("meter").as[(Timestamp, Long)].collect().toMap
      assert(rows(Timestamp.valueOf("2024-01-01 10:00:00")) == 2L)
      assert(rows(Timestamp.valueOf("2024-01-01 10:01:00")) == 1L)
    } finally q.stop()
  }

  test("stateful throttle delivers at most one event per interval and drops the rest") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RateSampler.Keyed]
    val out = RateSampler.throttle(spark, mem.toDS(), epm = 6) // 10 s interval
    val q = out.writeStream.format("memory").queryName("throttled")
      .outputMode("append").start()
    try {
      def ev(s: Int, l: String) =
        RateSampler.Keyed("sub1", Timestamp.valueOf(f"2024-01-01 00:00:$s%02d"), l)
      mem.addData(ev(0, "a"), ev(3, "b"), ev(9, "c"), ev(10, "d"), ev(25, "e"))
      q.processAllAvailable()
      val got = spark.table("throttled").as[RateSampler.Keyed]
        .collect().map(_.lemma).toSeq.sorted
      // a at t=0 emits; b,c inside 10s dropped; d at t=10 emits; e at t=25 emits
      assert(got == Seq("a", "d", "e"))
    } finally q.stop()
  }

  test("observe() meters surface per-batch counts without touching the data plane (A2)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = StreamingFlagship
      .metered(mem.toDF.toDF("ts", "lemma"))
      .writeStream.format("memory").queryName("metered_out")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData((t0, "a"), (t0, "b"), (t0, "a"))
      q.processAllAvailable()
      val m = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("wb_page_requests"))).last
      assert(m.getAs[Long]("events") == 3L)
      assert(m.getAs[Long]("distinct_lemmata") == 2L)
      // the meter added no columns and dropped no rows
      assert(spark.table("metered_out").count() == 3)
    } finally q.stop()
  }

  test("streaming dedup drops duplicates within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = StreamingFlagship
      .dedupedRequests(mem.toDF.toDF("ts", "lemma"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      mem.addData((t0, "a"), (t0, "a"), (t0, "b"))
      q.processAllAvailable()
      mem.addData((t0, "a")) // still within horizon → dropped
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
    } finally q.stop()
  }

  test("streaming session windows close after the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val sessions = mem.toDF.toDF("ts", "user")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("session_window.start").as("start"), col("n"))
    val q = sessions.writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      // two events 10 min apart = one session; a third 2 hours later
      // both advances the watermark past the first session's gap
      // (closing it) and opens a new session
      mem.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), "u1"),
        (Timestamp.valueOf("2024-01-01 10:10:00"), "u1"))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2024-01-01 12:00:00"), "u1"))
      q.processAllAvailable()
      val closed = spark.table("sessions_stream")
        .as[(String, Timestamp, Long)].collect()
      assert(closed.toSeq == Seq(
        ("u1", Timestamp.valueOf("2024-01-01 10:00:00"), 2L)),
        s"exactly the first session must be emitted closed, got ${closed.toSeq}")
    } finally q.stop()
  }

  test("latest-event-wins bucket sampling keeps exactly one row per bucket") {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:01"), "a"),
      (Timestamp.valueOf("2024-01-01 00:00:59"), "b"),
      (Timestamp.valueOf("2024-01-01 00:01:30"), "c")).toDF("ts", "lemma")
    val out = RateSampler.lastPerBucket(df, epm = 1)
      .select("lemma").as[String].collect().toSet
    assert(out == Set("b", "c"))
  }
}
