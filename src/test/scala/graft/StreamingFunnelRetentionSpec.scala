package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingFunnel, StreamingRetention}

/** The streaming funnel/retention twins: swept results equal the
  * batch `q_funnel` / `q_retention` across micro-batch splits, the
  * equal-timestamp tie residue of the ordering contract is handled
  * exactly, and both recover exactly-once through a mid-stream kill +
  * checkpoint restart (the T6/T7 standard). */
class StreamingFunnelRetentionSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  private def funnelEvents: Seq[(Long, Long, String, Long)] =
    Tables(spark, Sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
      .as[(Long, Long, String, Long)].collect().toSeq
      .sortBy { case (_, eventId, _, ts) => (ts, eventId) }

  test("streamed funnel marks sweep to the batch q_funnel stages " +
      "across micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val events = funnelEvents
    val expected = SparkEntry.queries("q_funnel")(spark, Sf)
      .as[(String, Long)].collect().toSeq
    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = StreamingFunnel.marks(spark, mem.toDS())
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      val cuts = Seq(events.length / 3, 2 * events.length / 3, events.length)
      var from = 0
      cuts.foreach { to =>
        mem.addData(events.slice(from, to): _*)
        q.processAllAvailable()
        from = to
      }
      val swept = StreamingFunnel.sweep(spark.table("funnel_stream"))
        .as[(String, Long)].collect().toSeq
      assert(expected.nonEmpty && expected.head._2 > 0)
      assert(swept == expected,
        s"streamed funnel $swept != batch $expected")
    } finally q.stop()
  }

  test("equal-timestamp ties across batch boundaries: a click/purchase " +
      "in an EARLIER batch at exactly the anchor timestamp still " +
      "qualifies (the ts >= residue the ordering contract leaves open)") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: click then signup then purchase, ALL at ts 1000 — split
    //   between every pair, so both tie flags must survive in state
    // user 2: purchase, click, signup at ts 2000 — the purchase tie
    //   consulted transitively when the signup sets t1 AND t2
    // user 3: click strictly before its signup — must NOT count
    // user 4: stale purchase at 4999, then signup+click at 5000 — the
    //   tie flags must RESET when the timestamp advances
    val ev: Seq[(Long, Long, String, Long)] = Seq(
      (1L, 1L, "click", 1000L), (1L, 2L, "signup", 1000L),
      (1L, 3L, "purchase", 1000L),
      (2L, 4L, "purchase", 2000L), (2L, 5L, "click", 2000L),
      (2L, 6L, "signup", 2000L),
      (3L, 7L, "click", 3000L), (3L, 8L, "signup", 3001L),
      (4L, 9L, "purchase", 4999L), (4L, 10L, "signup", 5000L),
      (4L, 11L, "click", 5000L))
    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = StreamingFunnel.marks(spark, mem.toDS())
      .writeStream.format("memory").queryName("funnel_ties")
      .outputMode("update").start()
    try {
      // one event per micro-batch: every tie crosses a batch boundary
      ev.foreach { e => mem.addData(e); q.processAllAvailable() }
      val swept = StreamingFunnel.sweep(spark.table("funnel_ties"))
        .as[(String, Long)].collect().toSeq
      // batch semantics by hand: t1/t2/t3 are pure ts >= minima —
      // users 1,2 reach purchase; 4 reaches click; 3 signup only
      assert(swept == Seq(("1_signup", 4L), ("2_click", 3L),
        ("3_purchase", 2L)), s"tie handling diverged: $swept")
    } finally q.stop()
  }

  test("streamed retention marks sweep to the batch q_retention " +
      "matrix across micro-batch splits; state is day-cardinality") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, Sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsu"))
      .as[(Long, Long, Long)].collect().toSeq
      .sortBy { case (_, eventId, ts) => (ts, eventId) }
    val expected = SparkEntry.queries("q_retention")(spark, Sf)
      .as[(java.sql.Timestamp, Int, Long)].collect().toSeq
    val mem = MemoryStream[(Long, Long, Long)]
    val q = StreamingRetention.marks(spark, mem.toDS())
      .writeStream.format("memory").queryName("ret_stream")
      .outputMode("update").start()
    try {
      val cuts = Seq(events.length / 3, 2 * events.length / 3, events.length)
      var from = 0
      cuts.foreach { to =>
        mem.addData(events.slice(from, to): _*)
        q.processAllAvailable()
        from = to
      }
      val marks = spark.table("ret_stream")
      val swept = StreamingRetention.sweep(marks)
        .as[(java.sql.Timestamp, Int, Long)].collect().toSeq
      assert(expected.nonEmpty && swept == expected,
        "streamed retention matrix diverged from batch")
      // marks are per-(user, day) unique — the day-cardinality stance
      assert(marks.groupBy(col("user_id"), col("day_offset")).count()
        .where(col("count") > 1).isEmpty,
        "duplicate (user, day) marks — state did not dedupe")
    } finally q.stop()
  }

  test("kill mid-stream + checkpoint restart: both swept results still " +
      "equal batch (T6/T7 — funnel anchors and retention matrix " +
      "recover exactly-once)") {
    import java.nio.file.Files
    val events = funnelEvents
    // replayable ts-ordered source: 8 sequential range slices, one
    // file per trigger (appends get increasing mtimes, so the file
    // source replays them in ts order — the ordering contract)
    val srcDir = Files.createTempDirectory("fr_src").toString
    val slice = events.length / 8 + 1
    events.grouped(slice).foreach { g =>
      spark.createDataset(g.toSeq)
        .toDF("user_id", "event_id", "event_type", "tsu")
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val schema = spark.read.parquet(srcDir).schema
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("tsu"))
    val base = Files.createTempDirectory("fr_restart").toString

    def epochs(dir: String): Int =
      Option(new java.io.File(dir).listFiles()).toSeq.flatten
        .count(_.getName.startsWith("epoch="))

    // --- funnel leg ---
    def startFunnel() = StreamingFunnel.marks(spark,
        src.as[(Long, Long, String, Long)])
      .toDF().writeStream.outputMode("update")
      .option("checkpointLocation", s"$base/fckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], e: Long) =>
        b.write.mode("overwrite").parquet(s"$base/funnel/epoch=$e"): Unit
      }.start()
    val f1 = startFunnel()
    StreamKill.afterCommit(spark, f1, () => epochs(s"$base/funnel") >= 2)
    assert(epochs(s"$base/funnel") >= 1 && epochs(s"$base/funnel") < 8,
      s"funnel kill landed outside mid-stream (${epochs(s"$base/funnel")} epochs)")
    val f2 = startFunnel()
    try f2.processAllAvailable() finally f2.stop()
    val funnelSwept = StreamingFunnel.sweep(
        spark.read.parquet(s"$base/funnel"))
      .as[(String, Long)].collect().toSeq
    val funnelWant = SparkEntry.queries("q_funnel")(spark, Sf)
      .as[(String, Long)].collect().toSeq
    assert(funnelWant.nonEmpty && funnelSwept == funnelWant,
      "kill+restart funnel diverged from batch")

    // --- retention leg (same source files, own state/checkpoint) ---
    def startRet() = StreamingRetention.marks(spark,
        src.select(col("user_id"), col("event_id"), col("tsu"))
          .as[(Long, Long, Long)])
      .toDF().writeStream.outputMode("update")
      .option("checkpointLocation", s"$base/rckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], e: Long) =>
        b.write.mode("overwrite").parquet(s"$base/ret/epoch=$e"): Unit
      }.start()
    val r1 = startRet()
    StreamKill.afterCommit(spark, r1, () => epochs(s"$base/ret") >= 2)
    assert(epochs(s"$base/ret") >= 1 && epochs(s"$base/ret") < 8,
      s"retention kill landed outside mid-stream (${epochs(s"$base/ret")} epochs)")
    val r2 = startRet()
    try r2.processAllAvailable() finally r2.stop()
    val retSwept = StreamingRetention.sweep(spark.read.parquet(s"$base/ret"))
      .as[(java.sql.Timestamp, Int, Long)].collect().toSeq
    val retWant = SparkEntry.queries("q_retention")(spark, Sf)
      .as[(java.sql.Timestamp, Int, Long)].collect().toSeq
    assert(retWant.nonEmpty && retSwept == retWant,
      "kill+restart retention diverged from batch")
  }
}
