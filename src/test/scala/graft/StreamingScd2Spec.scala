package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingScd2

/** Streaming SCD-2 closed-version stream ≡ a plain-Scala fold over
  * every prefix, exactly once, and grain-consistency against the
  * snapshot-grain batch query. */
class StreamingScd2Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // (event_id, ts-seconds, user_id, value), time-monotone like the feed
  private lazy val events: Seq[(Long, Long, Long, Double)] =
    Tables(spark, TestSpark.Sf, "events")
      .select(col("event_id").cast("long"),
        col("ts").cast("timestamp").cast("long"),
        col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)].collect().toSeq
      .sortBy(e => (e._2, e._1))

  /** Reference fold: closed versions over a prefix. */
  private def brute(rows: Seq[(Long, Long, Long, Double)])
      : Set[(Long, Int, Double, Long, Long)] = {
    val out = Seq.newBuilder[(Long, Int, Double, Long, Long)]
    val open = scala.collection.mutable.Map.empty[Long, (Double, Long, Int)]
    for ((id, _, uid, v) <- rows) open.get(uid) match {
      case None => open(uid) = (v, id, 1)
      case Some((ov, fid, ver)) if v != ov =>
        out += ((uid, ver, ov, fid, id))
        open(uid) = (v, id, ver + 1)
      case _ => ()
    }
    out.result().toSet
  }

  test("closed versions equal the reference fold over every prefix, exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val src = mem.toDF.toDF("event_id", "ts_s", "user_id", "value")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("value"))
    val q = StreamingScd2.versions(spark, src)
      .writeStream.format("memory").queryName("sscd2")
      .outputMode("append").start()
    try {
      val splits = events.grouped(events.size / 3 + 1).toSeq
      var fed = Seq.empty[(Long, Long, Long, Double)]
      for (batch <- splits) {
        mem.addData(batch: _*)
        q.processAllAvailable()
        fed = fed ++ batch
        val got = spark.table("sscd2")
          .select($"user_id", $"version", $"value", $"from_event", $"to_event")
          .as[(Long, Int, Double, Long, Long)].collect()
        assert(got.length == got.distinct.length, "a version was emitted twice")
        assert(got.toSet == brute(fed),
          s"prefix of ${fed.size} events: stream != reference fold")
      }
      assert(spark.table("sscd2").count() > 0, "no version ever closed — vacuous")
    } finally q.stop()
  }

  test("grain consistency: snapshot-grain versions embed in event-grain history") {
    // q_dim_scd2 snapshots at Jan 8/16/24: its version VALUES must
    // each equal the event-grain value in force at that cut — i.e.
    // the batch row (user, valid_from_snap -> value) is the last
    // event value before that cut.
    val cuts = Map(1L -> "2024-01-08", 2L -> "2024-01-16", 3L -> "2024-01-24")
      .map { case (k, d) =>
        k -> java.sql.Timestamp.valueOf(s"$d 00:00:00").getTime / 1000
      }
    val batch = SparkEntry.queries("q_dim_scd2")(spark, TestSpark.Sf)
      .select($"user_id", $"value", $"valid_from_snap")
      .as[(Long, Double, Long)].collect()
    assert(batch.nonEmpty)
    for ((uid, v, snap) <- batch) {
      val atCut = events.filter(e => e._3 == uid && e._2 < cuts(snap))
        .maxBy(e => (e._2, e._1))
      assert(atCut._4 == v,
        s"user $uid snap $snap: batch value $v != event-grain ${atCut._4}")
    }
  }

  test("kill mid-stream, restart from checkpoint: version closes are exactly-once") {
    // T6/T7 for the stateful version builder (the family standard):
    // the checkpoint must recover the committed offsets AND each
    // entity's OPEN version — a lost open version would re-seed as
    // version 1 after restart (wrong ordinals, missing closes), a
    // replayed epoch would close the same version twice.
    import java.nio.file.Files
    val rows = events.take(600) // time-monotone prefix
    val f = Files.createTempFile("sscd2", ".tsv")
    Files.write(f, rows.map { case (id, ts, uid, v) => s"$id\t$ts\t$uid\t$v" }
      .mkString("\n").getBytes("UTF-8"))
    val base = Files.createTempDirectory("sscd2_restart").toString
    def start() = {
      val lines = spark.readStream.format("graft.sources.ReplayLines")
        .option("path", f.toString)
        .option("linesPerTrigger", "20") // many batches — the kill lands between them
        .load()
      val parsed = lines
        .select(split(col("line"), "\t", -1).as("c"))
        .select(col("c").getItem(0).cast("long").as("event_id"),
          col("c").getItem(1).cast("long").cast("timestamp").as("ts"),
          col("c").getItem(2).cast("long").as("user_id"),
          col("c").getItem(3).cast("double").as("value"))
      graft.streaming.Sinks.appendParquet(
        StreamingScd2.versions(spark, parsed).toDF(),
        s"$base/out", s"$base/ckpt")
    }
    def sunk(): Long =
      try spark.read.parquet(s"$base/out").count() catch { case _: Throwable => 0L }
    val q1 = start()
    // kill deterministically on PROGRESS: the listener stops q1 at
    // the batch boundary where enough closes committed (r13 advice —
    // wall-clock pacing was host-timing-sensitive)
    StreamKill.afterCommit(spark, q1, () => sunk() >= 3)
    assert(sunk() > 0, "kill landed before any close committed")
    // the kill must land MID-stream or the restart never exercises
    // checkpoint recovery and the exactly-once assertions go vacuous
    assert(sunk() < brute(rows).size,
      "drain completed before the kill — slow the replay rate")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$base/out")
      .select($"user_id", $"version", $"value", $"from_event", $"to_event")
      .as[(Long, Int, Double, Long, Long)].collect().toSeq
    assert(got.distinct.length == got.length,
      "a version closed twice — open-version state lost or epoch replayed")
    assert(got.toSet == brute(rows))
  }
}
