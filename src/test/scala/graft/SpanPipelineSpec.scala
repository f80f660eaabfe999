package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSpanDedup

/** The two-phase span dedup WIRED AS ONE RUNNING PIPELINE — the
  * composition [[StreamingSpanDedupSpec]] pins only per phase:
  * documents stream in; the stateful mark leg appends covered gram
  * starts to a parquet covered-marks store (the file-sink exactly-once
  * log); the sweep leg's `foreachBatch` joins each arriving document
  * batch against that store and emits cleaned documents — documents
  * in, cleaned documents out, the mark-then-sweep shape every
  * incremental corpus pipeline deploys (and the way
  * ServerEndToEndSpec composed K1+S2 for the serving layer).
  *
  * Pinned: (1) every document is cleaned exactly once; (2) the
  * cleaned output equals the at-arrival batch twin (spanSweep over
  * the sequential reference's covered set) byte-for-byte including
  * clean_md5; (3) the output is identical across ≥3 different batch
  * splits (the covered set's batch-split invariance under id-monotone
  * delivery, surviving the full pipeline). */
class SpanPipelineSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private val SpanMin = 8

  private def docs: Seq[(Long, String)] = {
    import spark.implicits._
    Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1).take(150).toSeq
  }

  /** Sequential at-arrival covered reference (first copy survives). */
  private def refCovered(ds: Seq[(Long, String)]): Set[(Long, Int)] = {
    val occ = scala.collection.mutable.Map.empty[String, Int]
    val out = scala.collection.mutable.Set.empty[(Long, Int)]
    for ((id, text) <- ds.sortBy(_._1)) {
      val ws = text.toLowerCase.split(" ", -1)
      for (i <- 0 to ws.length - StreamingSpanDedup.Gram) {
        val g = ws.slice(i, i + StreamingSpanDedup.Gram).mkString(" ")
        val k = occ.getOrElse(g, 0)
        if (k >= 1) out += ((id, i + 1))
        occ(g) = k + 1
      }
    }
    out.toSet
  }

  private type Cleaned = (Long, Long, Long, Long, String, String)

  /** Drive the full mark→store→sweep pipeline over the given batch
    * splits; returns every cleaned row the sweep leg emitted. */
  private def runPipeline(splits: Seq[Seq[(Long, String)]]): Seq[Cleaned] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val docsDF = mem.toDF.toDF("doc_id", "text")
    val marksDir = java.nio.file.Files.createTempDirectory("span-marks").toString
    val ckptMark = java.nio.file.Files.createTempDirectory("span-ck-mark").toString
    val ckptSweep = java.nio.file.Files.createTempDirectory("span-ck-sweep").toString
    // mark leg: stateful covered-start stream → parquet store (the
    // file sink's commit log makes the store exactly-once)
    val markQ = StreamingSpanDedup.coveredStarts(spark, docsDF)
      .writeStream.format("parquet")
      .option("path", marksDir)
      .option("checkpointLocation", ckptMark)
      .outputMode("append").start()
    val out = new ConcurrentLinkedQueue[Cleaned]()
    // sweep leg: every arriving batch of documents joins the
    // covered-marks store and emits its cleaned form
    val sweepQ = docsDF.writeStream
      .option("checkpointLocation", ckptSweep)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the mark-before-sweep ordering a deployed two-phase pipeline
        // schedules: block until the mark leg has committed marks for
        // every document visible to this batch (both legs read the
        // same source, so mark-side processAllAvailable covers at
        // least this batch's documents; marks for documents outside
        // the batch are dropped by the sweep's doc-keyed joins)
        markQ.processAllAvailable()
        val marks = spark.read.schema("doc_id LONG, pos INT").parquet(marksDir)
        StreamingSpanDedup.clean(batch, marks, SpanMin)
          .select(col("doc_id"), col("n_before"), col("n_removed"),
            col("n_after"), col("clean_md5"), col("clean_text"))
          .as[Cleaned].collect().foreach(out.add)
      }
      .start()
    try {
      for (batch <- splits) {
        mem.addData(batch: _*)
        // marks land in the store first, then the sweep joins them —
        // the lag discipline a deployed two-phase pipeline schedules
        markQ.processAllAvailable()
        sweepQ.processAllAvailable()
      }
      out.asScala.toSeq
    } finally { sweepQ.stop(); markQ.stop() }
  }

  test("documents in, cleaned documents out — ≡ batch twin across 3 splits") {
    import spark.implicits._
    val d = docs
    // expected: the batch sweep over the sequential reference's
    // covered set (q_dedup_span's at-arrival twin)
    val want = StreamingSpanDedup.clean(
      d.toDF("doc_id", "text"),
      refCovered(d).toSeq.toDF("doc_id", "pos"), SpanMin)
      .select(col("doc_id"), col("n_before"), col("n_removed"),
        col("n_after"), col("clean_md5"), col("clean_text"))
      .as[Cleaned].collect().sortBy(_._1).toSeq
    assert(want.exists(_._3 > 0), "testdata should produce removed spans")
    val third = d.length / 3
    val splitsSet = Seq(
      Seq(d), // one batch
      Seq(d.take(third), d.slice(third, 2 * third), d.drop(2 * third)),
      Seq(d.take(1), d.slice(1, third + 5), d.slice(third + 5, third + 6),
        d.drop(third + 6))) // uneven, with singleton batches
    for (splits <- splitsSet) {
      val got = runPipeline(splits)
      // exactly-once: each document cleaned in exactly one sweep batch
      assert(got.map(_._1).sorted == d.map(_._1).sorted,
        s"${splits.length}-split run cleaned ${got.size} docs, want ${d.size}")
      assert(got.sortBy(_._1) == want,
        s"${splits.length}-split cleaned output diverged from the batch twin")
    }
  }
}
