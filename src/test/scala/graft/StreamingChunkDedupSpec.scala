package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingChunkDedup

/** Streaming keep-first passage dedup ≡ the batch `q_chunk_dedup`
  * keep/drop flags over any prefix. */
class StreamingChunkDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val ChunkSize = graft.queries.PipelineQueries.DedupChunk

  private val docs: Seq[(Long, String)] =
    Tables(spark, TestSpark.Sf, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1).take(80)

  /** Batch twin: the q_chunk_dedup keeper rule (min packed key per
    * passage digest) computed statically on a prefix. */
  private def batchFlags(rows: Seq[(Long, String)]): Set[(Long, Int, Boolean)] = {
    val ch = graft.queries.PipelineQueries
      .chunked(rows.toDF("doc_id", "text"), ChunkSize, ChunkSize)
      .withColumn("key", col("doc_id") * 100000L + col("chunk_ix"))
      .withColumn("h", xxhash64(col("chunk")))
    val keeper = ch.groupBy(col("h")).agg(min(col("key")).as("keep_key"))
    ch.join(keeper, "h")
      .select(col("doc_id"), col("chunk_ix"),
        (col("key") === col("keep_key")).as("keep"))
      .as[(Long, Int, Boolean)].collect().toSet
  }

  test("streamed keep/drop flags equal the batch keeper rule over any prefix") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingChunkDedup.flags(spark, mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("schunk")
      .outputMode("append").start()
    try {
      val (first, second) = docs.splitAt(40)
      mem.addData(first: _*)
      q.processAllAvailable()
      // prefix check: flags so far ≡ batch on the first 40 docs
      val afterFirst = spark.table("schunk")
        .select(col("doc_id"), col("chunk_ix"), col("keep"))
        .as[(Long, Int, Boolean)].collect().toSet
      assert(afterFirst == batchFlags(first))
      mem.addData(second: _*)
      q.processAllAvailable()
      val streamed = spark.table("schunk")
        .select(col("doc_id"), col("chunk_ix"), col("keep"))
        .as[(Long, Int, Boolean)].collect().toSet
      val batch = batchFlags(docs)
      assert(batch.exists(!_._3)) // corpus has duplicate passages; else vacuous
      assert(streamed == batch)
    } finally q.stop()
  }

  test("within one micro-batch the smallest packed key is the keeper") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingChunkDedup.flags(spark, mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("schunk_order")
      .outputMode("append").start()
    try {
      val text = "z" * ChunkSize
      // same single passage in three docs, sent out of id order in
      // ONE batch: doc 5 must keep (smallest packed key), 7/9 drop
      mem.addData((9L, text), (5L, text), (7L, text))
      q.processAllAvailable()
      val flags = spark.table("schunk_order")
        .select(col("doc_id"), col("keep")).as[(Long, Boolean)].collect().toMap
      assert(flags == Map(5L -> true, 7L -> false, 9L -> false))
    } finally q.stop()
  }

  test("a passage digest seen in an earlier batch drops on every later arrival") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingChunkDedup.flags(spark, mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("schunk_cross")
      .outputMode("append").start()
    try {
      val a = "a" * ChunkSize
      val b = "b" * ChunkSize
      mem.addData((1L, a + b)) // doc 1: chunks a, b — both keep
      q.processAllAvailable()
      mem.addData((2L, b + a)) // doc 2: both passages already claimed
      q.processAllAvailable()
      val flags = spark.table("schunk_cross")
        .select(col("doc_id"), col("chunk_ix"), col("keep"))
        .as[(Long, Int, Boolean)].collect().toSet
      assert(flags == Set((1L, 0, true), (1L, 1, true),
        (2L, 0, false), (2L, 1, false)))
    } finally q.stop()
  }
}
