package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Flagship
import graft.streaming.StreamingFlagship

class ReplaySourceSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  test("custom DSv2 replay source feeds the flagship pipeline in rate-bounded batches") {
    val lines = Flagship.synthLog(Tables(spark, Sf, "events")).as[String].collect()
    val f = Files.createTempFile("replay", ".log")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))

    val stream = spark.readStream
      .format("graft.sources.ReplayLines")
      .option("path", f.toString)
      .option("linesPerTrigger", "300")
      .load()
      .withColumnRenamed("value", "line")

    val dim = Flagship.dimension(Tables(spark, Sf, "events"))
    val q = StreamingFlagship.enriched(stream, dim)
      .writeStream.format("memory").queryName("replayed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("replayed").count()
      val batch = Flagship(spark, Sf).count()
      assert(streamed == batch)
      // rate bound respected: no micro-batch admitted more than 300 lines
      assert(q.recentProgress.forall(_.numInputRows <= 300))
      assert(q.recentProgress.map(_.numInputRows).sum == lines.length)
    } finally q.stop()
  }

  test("pacing rule: monotone, EOF-capped, trigger-capped, wall-clock-capped") {
    import graft.sources.ReplayLines.pacedTarget
    // unpaced: trigger cap only
    assert(pacedTarget(0, 0, 1000, 300, 0.0, 99.0) == 300)
    assert(pacedTarget(900, 0, 1000, 300, 0.0, 99.0) == 1000) // EOF cap
    // paced: base + elapsed*rate bounds admission
    assert(pacedTarget(0, 0, 1000, 300, 10.0, 5.0) == 50)    // 5s * 10/s
    assert(pacedTarget(0, 0, 1000, 300, 10.0, 60.0) == 300)  // trigger cap wins
    assert(pacedTarget(40, 0, 1000, 300, 10.0, 3.0) == 40)   // never backwards
    assert(pacedTarget(0, 0, 20, 300, 10.0, 60.0) == 20)     // EOF under pacing
    // checkpoint restart: cadence resumes from the committed offset,
    // not from line 0 (a base of 0 would stall 360s here)
    assert(pacedTarget(3600, 3600, 10000, 300, 10.0, 5.0) == 3650)
  }

  test("kill mid-stream, restart from checkpoint: sink is exactly-once") {
    // T6/T7 end to end: a stream killed between (or inside) epochs and
    // restarted from its checkpoint neither duplicates nor loses rows —
    // offsets replay from the WAL and the epoch-overwrite sink makes
    // the replayed epoch idempotent.
    val n = 200
    val f = Files.createTempFile("restart", ".log")
    Files.write(f, (1 to n).map(i => s"line$i").mkString("\n").getBytes("UTF-8"))
    val base = Files.createTempDirectory("restart").toString
    def start() = graft.streaming.Sinks.appendParquet(
      spark.readStream.format("graft.sources.ReplayLines")
        .option("path", f.toString)
        .option("linesPerTrigger", "20")
        .option("ratePerSecond", "150") // slow drain so the kill lands mid-run
        .load(),
      s"$base/out", s"$base/ckpt")
    def sunk(): Long =
      try spark.read.parquet(s"$base/out").count() catch { case _: Throwable => 0L }
    val q1 = start()
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (sunk() < 30 && System.nanoTime() < deadline) Thread.sleep(20)
    q1.stop() // kill with most of the file unprocessed
    val afterKill = sunk()
    assert(afterKill > 0, "kill landed before any epoch committed")
    // processAllAvailable alone cannot drain a RATE-PACED source: it
    // returns as soon as the source momentarily reports no new data,
    // and right after restart the elapsed-time allowance is ~0 — so
    // wait for the sink to catch up, then settle the final epoch
    val q2 = start()
    try {
      val dl2 = System.nanoTime() + 60L * 1000000000L
      while (sunk() < n && System.nanoTime() < dl2) Thread.sleep(50)
      q2.processAllAvailable()
    } finally q2.stop()
    val out = spark.read.parquet(s"$base/out").select("line").as[String].collect()
    assert(out.length == n, s"expected $n rows, got ${out.length} (afterKill=$afterKill)")
    assert(out.toSet == (1 to n).map(i => s"line$i").toSet)
  }

  test("rate-paced replay drains the whole file while honoring per-trigger caps") {
    val f = Files.createTempFile("paced", ".log")
    Files.write(f, (1 to 50).map(i => s"line$i").mkString("\n").getBytes("UTF-8"))
    val stream = spark.readStream
      .format("graft.sources.ReplayLines")
      .option("path", f.toString)
      .option("linesPerTrigger", "10")
      .option("ratePerSecond", "100000") // fast enough to not stall the test
      .load()
    val q = stream.writeStream.format("memory").queryName("paced")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("paced").count() == 50)
      assert(q.recentProgress.forall(_.numInputRows <= 10))
    } finally q.stop()
  }
}
