package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingJoin

/** Watermarked stream–stream interval join ≡ the batch
  * `q_join_interval` (one shared join tail): event-time-ordered
  * micro-batch splits accumulate exactly the batch rows, join state
  * is evicted behind the watermark, and a mid-stream kill + restart
  * recovers exactly-once. */
class StreamingJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private type Ev = (Long, Long, java.sql.Timestamp, String)

  /** All events, EVENT-TIME ordered — the in-order arrival that makes
    * stream ≡ batch provable for any watermark delay (see the
    * operator scaladoc). */
  private def events: Seq[Ev] =
    Tables(spark, TestSpark.Sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[Ev].collect().toSeq.sortBy(e => (e._3.getTime, e._1))

  private def batchRows: Seq[(Long, Long, Long)] =
    SparkEntry.queries("q_join_interval")(spark, TestSpark.Sf)
      .select(col("click_id"), col("view_id"), col("user_id"))
      .as[(Long, Long, Long)].collect().toSeq

  test("accumulated stream output equals the batch interval join across " +
      "micro-batch splits, and state is evicted behind the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[Ev]
    val viewsIn = MemoryStream[Ev]
    val joined = StreamingJoin.joined(
      clicksIn.toDF.toDF("event_id", "user_id", "ts", "event_type"),
      viewsIn.toDF.toDF("event_id", "user_id", "ts", "event_type"))
    val q = joined.writeStream.format("memory").queryName("sjoin")
      .outputMode("append").start()
    try {
      val d = events
      val groups = d.grouped(d.length / 3 + 1).toSeq
      assert(groups.size >= 3, "need several splits or the test is vacuous")
      groups.foreach { g =>
        clicksIn.addData(g: _*)
        viewsIn.addData(g: _*)
        q.processAllAvailable()
      }
      val got = spark.table("sjoin")
        .select(col("click_id"), col("view_id"), col("user_id"))
        .as[(Long, Long, Long)].collect().toSeq
      val want = batchRows
      assert(want.size >= 10, s"batch anchor too small (${want.size} rows)")
      assert(got.sorted == want.sorted,
        "streamed interval join diverged from the batch tail")
      assert(got.map(_._3).distinct.size >= 3,
        "a single-user match set proves nothing")
      // STATE BOUND: drive the watermark far past every event with
      // two sentinel batches (sentinels pass the type filters but use
      // users -1/-2, so they match nothing); eviction runs with the
      // PREVIOUS batch's watermark, hence two advances. What remains
      // must be sentinel-scale, not corpus-scale — the property that
      // makes unbounded streams joinable at all.
      val tMax = d.map(_._3.getTime).max
      def sentinel(off: Long): (Ev, Ev) = (
        (-1L, -1L, new java.sql.Timestamp(tMax + off), "click"),
        (-2L, -2L, new java.sql.Timestamp(tMax + off), "view"))
      for (day <- 1 to 2) {
        val (c, v) = sentinel(day * 86400000L)
        clicksIn.addData(c)
        viewsIn.addData(v)
        q.processAllAvailable()
      }
      val state = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      assert(state <= 8,
        s"$state state rows survive a watermark far past every event — " +
          "interval-bound eviction is not happening")
      // and the sentinels themselves joined nothing
      assert(spark.table("sjoin").count() == got.size.toLong,
        "a sentinel row produced a join match")
    } finally q.stop()
  }

  test("LEFT OUTER: unattributed clicks emit with a null view side only " +
      "after the watermark proves no in-window view can arrive, and the " +
      "accumulated result equals the batch left join") {
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[Ev]
    val viewsIn = MemoryStream[Ev]
    val joined = StreamingJoin.joined(
      clicksIn.toDF.toDF("event_id", "user_id", "ts", "event_type"),
      viewsIn.toDF.toDF("event_id", "user_id", "ts", "event_type"),
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("sjoin_left")
      .outputMode("append").start()
    try {
      val d = events
      val groups = d.grouped(d.length / 3 + 1).toSeq
      groups.foreach { g =>
        clicksIn.addData(g: _*)
        viewsIn.addData(g: _*)
        q.processAllAvailable()
      }
      def gotRows() = spark.table("sjoin_left")
        .select(col("click_id"), col("user_id"),
          coalesce(col("view_id"), lit(-1L)).as("view_id"))
        .as[(Long, Long, Long)].collect().toSeq
      val want = SparkEntry.queries("q_join_interval_left")(spark, TestSpark.Sf)
        .select(col("click_id"), col("user_id"),
          coalesce(col("view_id"), lit(-1L)).as("view_id"))
        .as[(Long, Long, Long)].collect().toSeq
      val wantNulls = want.count(_._3 == -1L)
      assert(wantNulls >= 5, s"batch anchor has $wantNulls unattributed " +
        "clicks — too few to prove the outer path")
      // BEFORE the watermark passes the tail of the data, the most
      // recent unattributed clicks cannot have emitted their null row
      // yet (emitting early would be a correctness bug: a view may
      // still arrive) — so the stream so far holds FEWER null rows
      // than the batch answer
      val nullsSoFar = gotRows().count(_._3 == -1L)
      assert(nullsSoFar < wantNulls,
        "every null row emitted before the watermark closed the " +
          "window — outer emission is not watermark-gated")
      // drive the watermark past everything (sentinels on both sides,
      // non-matching users; two advances — eviction/emission use the
      // previous batch's watermark)
      val tMax = d.map(_._3.getTime).max
      for (day <- 1 to 2) {
        clicksIn.addData((-1L, -1L,
          new java.sql.Timestamp(tMax + day * 86400000L), "click"))
        viewsIn.addData((-2L, -2L,
          new java.sql.Timestamp(tMax + day * 86400000L), "view"))
        q.processAllAvailable()
      }
      // now: accumulated ≡ batch left join, modulo the two sentinel
      // clicks (user -1, which the batch frame does not contain —
      // they emit their own null rows once the second sentinel's
      // watermark passes the first's window)
      val got = gotRows().filter(_._2 >= 0L)
      assert(got.sorted == want.sorted,
        "streamed left-outer join diverged from the batch tail")
    } finally q.stop()
  }

  test("FULL OUTER: both null classes (unattributed clicks AND unclicked " +
      "views) are watermark-gated from their own side, and the accumulated " +
      "result equals the batch full join") {
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[Ev]
    val viewsIn = MemoryStream[Ev]
    val joined = StreamingJoin.joined(
      clicksIn.toDF.toDF("event_id", "user_id", "ts", "event_type"),
      viewsIn.toDF.toDF("event_id", "user_id", "ts", "event_type"),
      joinType = "full_outer")
    val q = joined.writeStream.format("memory").queryName("sjoin_full")
      .outputMode("append").start()
    try {
      val d = events
      val groups = d.grouped(d.length / 3 + 1).toSeq
      groups.foreach { g =>
        clicksIn.addData(g: _*)
        viewsIn.addData(g: _*)
        q.processAllAvailable()
      }
      def gotRows() = spark.table("sjoin_full")
        .select(coalesce(col("click_id"), lit(-1L)).as("click_id"),
          col("user_id"),
          coalesce(col("view_id"), lit(-1L)).as("view_id"))
        .as[(Long, Long, Long)].collect().toSeq
      val want = SparkEntry.queries("q_join_interval_full")(spark, TestSpark.Sf)
        .select(coalesce(col("click_id"), lit(-1L)).as("click_id"),
          col("user_id"),
          coalesce(col("view_id"), lit(-1L)).as("view_id"))
        .as[(Long, Long, Long)].collect().toSeq
      val wantClickNulls = want.count(_._3 == -1L) // unattributed clicks
      val wantViewNulls = want.count(_._1 == -1L) // unclicked views
      assert(wantClickNulls >= 5 && wantViewNulls >= 5,
        s"batch anchor too thin to prove both outer paths " +
          s"($wantClickNulls click-nulls, $wantViewNulls view-nulls)")
      // BEFORE the watermark passes the data's tail, the most recent
      // rows of EACH null class cannot have emitted yet: a late view
      // could still attribute a recent click, and a late click could
      // still claim a recent view — early emission of either class
      // would be a correctness bug, not eagerness
      val soFar = gotRows()
      assert(soFar.count(_._3 == -1L) < wantClickNulls,
        "every unattributed click emitted before the watermark closed " +
          "its window — the click-side null gate is missing")
      assert(soFar.count(_._1 == -1L) < wantViewNulls,
        "every unclicked view emitted before the watermark closed " +
          "its window — the view-side null gate is missing")
      // drive the watermark past everything (two advances — eviction
      // and outer emission use the previous batch's watermark)
      val tMax = d.map(_._3.getTime).max
      for (day <- 1 to 2) {
        clicksIn.addData((-1L, -1L,
          new java.sql.Timestamp(tMax + day * 86400000L), "click"))
        viewsIn.addData((-2L, -2L,
          new java.sql.Timestamp(tMax + day * 86400000L), "view"))
        q.processAllAvailable()
      }
      // accumulated ≡ batch full join, modulo the sentinels' own null
      // rows (users -1/-2, absent from the batch frame)
      val got = gotRows().filter(_._2 >= 0L)
      assert(got.sorted == want.sorted,
        "streamed full-outer join diverged from the batch tail")
    } finally q.stop()
  }

  test("FULL OUTER kill mid-stream, restart from checkpoint: matches and " +
      "both null classes are exactly-once") {
    val d = events
    def file(typ: String): String = {
      val f = Files.createTempFile(s"sjoinf_$typ", ".tsv")
      Files.write(f, d.filter(_._4 == typ)
        .map { case (id, uid, ts, _) => s"$id\t$uid\t${ts.getTime * 1000L}" }
        .mkString("\n").getBytes("UTF-8"))
      f.toString
    }
    val (clickFile, viewFile) = (file("click"), file("view"))
    val base = Files.createTempDirectory("sjoinf_restart").toString
    def src(path: String) = {
      val lines = spark.readStream.format("graft.sources.ReplayLines")
        .option("path", path)
        .option("linesPerTrigger", "15")
        .load()
      lines.select(split(col("line"), "\t", -1).as("c"))
        .select(col("c").getItem(0).cast("long").as("event_id"),
          col("c").getItem(1).cast("long").as("user_id"),
          expr("timestamp_micros(CAST(c[2] AS LONG))").as("ts"))
        .withColumn("event_type",
          lit(if (path == clickFile) "click" else "view"))
    }
    def start() = graft.streaming.Sinks.appendParquet(
      StreamingJoin.joined(src(clickFile), src(viewFile),
        joinType = "full_outer"),
      s"$base/out", s"$base/ckpt")
    // the full-outer sink mixes inner matches with watermark-gated
    // null rows, so the mid-stream guards count the INNER rows
    // specifically — total row count can pass the inner anchor's size
    // while the drain is still mid-file
    def sunkInner(): Long =
      try spark.read.parquet(s"$base/out")
        .where(col("click_id").isNotNull && col("view_id").isNotNull)
        .count()
      catch { case _: Throwable => 0L }
    // the batch anchor: only the INNER rows plus null rows for events
    // the stream's final watermark has passed — the replay never
    // advances the watermark beyond the last event, so null rows for
    // the trailing window stay unemitted. Compare the inner subset
    // exactly (exactly-once is about duplication/loss, and every
    // inner row is emitted at match time) and null rows by distinctness.
    val wantInner = batchRows
    val q1 = start()
    StreamKill.afterCommit(spark, q1, () => sunkInner() >= 3)
    assert(sunkInner() > 0, "kill landed before any match committed")
    assert(sunkInner() < wantInner.size,
      "drain completed before the kill — slow the replay rate")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val full = spark.read.parquet(s"$base/out")
      .select(coalesce(col("click_id"), lit(-1L)).as("click_id"),
        col("user_id"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(full.distinct.length == full.length,
      "a row emitted twice — offsets or join state replayed")
    val gotInner = full.filter(r => r._1 != -1L && r._3 != -1L)
      .map(r => (r._1, r._3, r._2))
    assert(gotInner.sorted == wantInner.sorted,
      "restart lost or invented inner matches vs the batch join")
    assert(full.exists(_._1 == -1L) || full.exists(_._3 == -1L),
      "no null row of either class emitted — the outer path never ran")
  }

  test("kill mid-stream, restart from checkpoint: matches are exactly-once " +
      "across both sources (T6/T7 for the two-input state)") {
    // the two sides replay from separate files through separate
    // ReplayLines instances — the checkpoint must recover BOTH
    // sources' offsets and the two-sided join state: a lost view
    // state row silently loses matches, a replayed offset emits the
    // same match twice (the parquet-sink manifest would not dedup a
    // second batch id).
    val d = events
    def file(typ: String): String = {
      val f = Files.createTempFile(s"sjoin_$typ", ".tsv")
      Files.write(f, d.filter(_._4 == typ)
        .map { case (id, uid, ts, _) => s"$id\t$uid\t${ts.getTime * 1000L}" }
        .mkString("\n").getBytes("UTF-8"))
      f.toString
    }
    val (clickFile, viewFile) = (file("click"), file("view"))
    val base = Files.createTempDirectory("sjoin_restart").toString
    def src(path: String) = {
      val lines = spark.readStream.format("graft.sources.ReplayLines")
        .option("path", path)
        .option("linesPerTrigger", "15") // many batches — the kill lands between
        .load()
      lines.select(split(col("line"), "\t", -1).as("c"))
        .select(col("c").getItem(0).cast("long").as("event_id"),
          col("c").getItem(1).cast("long").as("user_id"),
          expr("timestamp_micros(CAST(c[2] AS LONG))").as("ts"))
        // ReplayLines carries no type column; the file IS the type
        // split, so re-tag for the shared clicksOf/viewsOf filters
        .withColumn("event_type",
          lit(if (path == clickFile) "click" else "view"))
    }
    def start() = graft.streaming.Sinks.appendParquet(
      StreamingJoin.joined(src(clickFile), src(viewFile)),
      s"$base/out", s"$base/ckpt")
    def sunk(): Long =
      try spark.read.parquet(s"$base/out").count() catch { case _: Throwable => 0L }
    val want = batchRows
    val q1 = start()
    StreamKill.afterCommit(spark, q1, () => sunk() >= 3)
    assert(sunk() > 0, "kill landed before any match committed")
    assert(sunk() < want.size,
      "drain completed before the kill — slow the replay rate")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$base/out")
      .select(col("click_id"), col("view_id"), col("user_id"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.distinct.length == got.length,
      "a match emitted twice — offsets or join state replayed")
    assert(got.sorted == want.sorted,
      "restart lost or invented matches vs the batch join")
  }
}
