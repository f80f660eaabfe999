package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup

/** Streaming LSH near-dup detection ≡ the batch banded self-join on
  * the same rows, plus the bounded-bucket drop semantics. */
class StreamingDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs: Seq[(Long, String)] =
    Tables(spark, TestSpark.Sf, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1).take(60)

  /** Batch twin: identical banding expressions, static self-join. */
  private def batchPairs(rows: Seq[(Long, String)]): Set[(Long, Long)] = {
    val banded = rows.toDF("doc_id", "text")
      .select(col("doc_id"), StreamingDedup.signature(col("text"), 3, 32).as("sig"))
      .select(col("doc_id"), explode(array((0 until 8).map { j =>
        md5(concat_ws(",", (0 until 4).map(r =>
          element_at(col("sig"), j * 4 + r + 1).cast("string")): _*)).as("bh")
      }.zipWithIndex.map { case (bh, j) =>
        struct(lit(j).as("band"), bh)
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
  }

  test("streamed candidate set equals the batch banded self-join on the same prefix") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.lshCandidates(spark, mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      val (first, second) = docs.splitAt(30)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(second: _*)
      q.processAllAvailable()
      val streamed = spark.table("sdedup")
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
      val batch = batchPairs(docs)
      assert(batch.nonEmpty) // corpus is near-dup dense; the test is vacuous otherwise
      assert(streamed == batch)
    } finally q.stop()
  }

  test("a re-sent document emits no self or duplicate candidates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.lshCandidates(spark, mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sdedup_re")
      .outputMode("append").start()
    try {
      mem.addData((1L, "a b c d e"), (2L, "a b c d e"))
      q.processAllAvailable()
      mem.addData((1L, "a b c d e")) // replay of a known doc
      q.processAllAvailable()
      val pairs = spark.table("sdedup_re")
        .select(col("a_id"), col("b_id")).distinct().as[(Long, Long)].collect().toSeq
      assert(pairs == Seq((1L, 2L)))
    } finally q.stop()
  }

  test("maxPerBucket caps state: overflow docs compare but are not stored") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedup.lshCandidates(spark, mem.toDF.toDF("doc_id", "text"),
      maxPerBucket = 1)
      .writeStream.format("memory").queryName("sdedup_cap")
      .outputMode("append").start()
    try {
      // identical texts → identical signatures → same buckets
      mem.addData((1L, "x y z w v"))
      q.processAllAvailable()
      mem.addData((2L, "x y z w v"))
      q.processAllAvailable()
      mem.addData((3L, "x y z w v"))
      q.processAllAvailable()
      val pairs = spark.table("sdedup_cap")
        .select(col("a_id"), col("b_id")).distinct().as[(Long, Long)].collect().toSet
      // doc 2 and 3 each compared against resident doc 1 only; (2,3)
      // never forms because neither was stored
      assert(pairs == Set((1L, 2L), (1L, 3L)))
    } finally q.stop()
  }
}
