package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FileTailer

/** S1 shim: a literal appended (and rotated) log file feeds the
  * directory source via FileTailer, with complete-line and
  * exactly-once guarantees across the rotation. */
class FileTailerSpec extends AnyFunSuite {
  import TestSpark.spark

  private def append(p: java.nio.file.Path, s: String): Unit =
    Files.write(p, s.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND): Unit

  private def await(cond: => Boolean, ms: Long = 10000): Unit = {
    val deadline = System.nanoTime() + ms * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cond, "condition not reached in time")
  }

  test("appended lines spool exactly once, partial lines wait, rotation restarts") {
    val dir = Files.createTempDirectory("tailer")
    val log = dir.resolve("access.log")
    val spool = dir.resolve("spool")
    val t = FileTailer.start(log, spool, pollMillis = 50)
    try {
      append(log, "l1\nl2\n")
      await(FileTailer.spooledLines(spool) == Seq("l1", "l2"))
      // a write ending mid-line: the complete prefix spools, the tail waits
      append(log, "l3\nl4-partial")
      await(FileTailer.spooledLines(spool) == Seq("l1", "l2", "l3"))
      append(log, "-done\n")
      await(FileTailer.spooledLines(spool) == Seq("l1", "l2", "l3", "l4-partial-done"))
      // rotation: truncate-and-recreate — tailer restarts at offset 0
      Files.delete(log)
      append(log, "r1\nr2\n")
      await(FileTailer.spooledLines(spool) ==
        Seq("l1", "l2", "l3", "l4-partial-done", "r1", "r2"))
    } finally t.stop()
    // and the spool is exactly what readLines consumes (S1 end-to-end)
    val got = graft.streaming.StreamingFlagship.readLines(spark, spool.toString)
    val q = got.writeStream.format("memory").queryName("tailed_lines")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tailed_lines").collect().map(_.getString(0)).sorted.toSeq
      assert(rows == Seq("l1", "l2", "l3", "l4-partial-done", "r1", "r2"))
    } finally q.stop()
  }
}
