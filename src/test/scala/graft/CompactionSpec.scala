package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compaction

class CompactionSpec extends AnyFunSuite {
  import TestSpark.spark

  test("compacts a shattered dataset into disjoint range-laid-out files") {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    // shatter: 64 shuffled fragments of the events table
    val events = Tables(spark, TestSpark.Sf, "events")
    events.repartition(64).write.parquet(s"$base/in")
    val inFiles = spark.read.parquet(s"$base/in").inputFiles.length
    assert(inFiles >= 32, s"expected a shattered input, got $inFiles files")

    val target = {
      // aim for ~4 output files from whatever the fragments total
      val fs = new org.apache.hadoop.fs.Path(s"$base/in")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val total = spark.read.parquet(s"$base/in").inputFiles
        .map(f => fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
      total / 4
    }
    val stats = Compaction.compact(spark, s"$base/in", s"$base/out",
      target, Seq("event_id"))
    assert(stats.rows == events.count())
    assert(stats.outputFiles <= 6 && stats.outputFiles >= 3,
      s"expected ~4 output files, got ${stats.outputFiles}")
    // contents survive byte-for-byte (same rows, any order)
    assert(spark.read.parquet(s"$base/out").exceptAll(events).isEmpty)
    assert(events.exceptAll(spark.read.parquet(s"$base/out")).isEmpty)
    // range layout: per-file event_id intervals are pairwise disjoint,
    // so a key predicate prunes to a single file via min/max stats
    val ranges = Compaction.keyRanges(spark, s"$base/out", "event_id")
      .sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping file ranges: $ranges")
    }
  }
}
