package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPacker

class StreamingPackerSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Batch reference: concat-and-chunk over docId order — the same
    * floor(cumExclusive/budget) rule as q_pack_sequences. */
  private def batchPack(docs: Seq[(String, Long, Long)],
      budget: Long): Map[(String, Long), Long] =
    docs.groupBy(_._1).flatMap { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_._2).map { case (_, id, toks) =>
        val seqId = cum / budget
        cum += toks
        (shard, id) -> seqId
      }
    }

  test("streaming assignment across micro-batches equals the batch chunking") {
    implicit val sqlCtx = spark.sqlContext
    val budget = 100L
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamingPacker.pack(spark, mem.toDS(), budget)
      .writeStream.format("memory").queryName("pack_stream")
      .outputMode("append").start()
    // two shards, doc ids ordered ACROSS batches, ragged token counts
    // (one doc bigger than the whole budget)
    val batch1 = Seq(("a", 1L, 30L), ("a", 2L, 45L), ("b", 1L, 150L))
    val batch2 = Seq(("a", 3L, 40L), ("a", 4L, 10L), ("b", 2L, 20L), ("b", 3L, 90L))
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("pack_stream").as[StreamingPacker.PackedDoc]
        .collect().map(p => (p.shard, p.docId) -> p.seqId).toMap
      assert(got == batchPack(batch1 ++ batch2, budget))
      // state is one counter per shard: doc 3 of shard b continues
      // from cum=170 even though it arrived a batch later
      assert(got(("b", 3L)) == 1L)
    } finally q.stop()
  }

  test("out-of-order WITHIN one micro-batch is re-sorted by docId") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamingPacker.pack(spark, mem.toDS(), 50L)
      .writeStream.format("memory").queryName("pack_stream2")
      .outputMode("append").start()
    val docs = Seq(("s", 3L, 30L), ("s", 1L, 30L), ("s", 2L, 30L))
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("pack_stream2").as[StreamingPacker.PackedDoc]
        .collect().map(p => p.docId -> p.seqId).toMap
      assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    } finally q.stop()
  }
}
