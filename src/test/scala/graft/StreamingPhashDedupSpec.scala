package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaPipeline
import graft.streaming.StreamingPhashDedup

/** Streaming perceptual-hash dedup ≡ the batch `q_dedup_phash` pairs
  * on the same images, exactly once per pair, across micro-batch
  * splits; plus the bounded-bucket drop semantics. */
class StreamingPhashDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val ids: Seq[Long] =
    Tables(spark, TestSpark.Sf, "documents")
      .select(col("doc_id").cast("long")).as[Long].collect().toSeq.sorted

  private def media(ids: Seq[Long]): Seq[(Long, String, Array[Byte])] =
    ids.map(id => (id, "image/png", MediaPipeline.synthTexturedPng(id)))

  test("streamed pair set equals batch q_dedup_phash across micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Array[Byte])]
    val q = StreamingPhashDedup.pairs(spark,
        mem.toDF.toDF("doc_id", "mime", "content"))
      .writeStream.format("memory").queryName("sphash")
      .outputMode("append").start()
    try {
      val groups = ids.grouped(ids.length / 3 + 1).toSeq
      groups.foreach { g =>
        mem.addData(media(g): _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("sphash")
        .select(col("a_id"), col("b_id"), col("hamming"))
        .as[(Long, Long, Int)].collect().toSeq
      val batch = SparkEntry.queries("q_dedup_phash")(spark, TestSpark.Sf)
        .as[(Long, Long, Int)].collect().toSeq
      assert(batch.nonEmpty)
      // k-fold emission for k co-resident segments, deduped downstream
      // (the operator's documented contract): distinct sets equal
      assert(streamed.distinct.sorted == batch.sorted)
    } finally q.stop()
  }

  test("a re-sent image emits no self or duplicate pairs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Array[Byte])]
    val q = StreamingPhashDedup.pairs(spark,
        mem.toDF.toDF("doc_id", "mime", "content"))
      .writeStream.format("memory").queryName("sphash_re")
      .outputMode("append").start()
    try {
      // doc ids 4 and 5 share a base pattern (group 4/4..7, both light)
      mem.addData(media(Seq(4L, 5L)): _*)
      q.processAllAvailable()
      mem.addData(media(Seq(4L)): _*) // replay of a known image
      q.processAllAvailable()
      val pairs = spark.table("sphash_re")
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSeq
      assert(pairs.toSet == Set((4L, 5L))) // replay adds NO new pairs
    } finally q.stop()
  }

  test("maxPerBucket caps state: overflow images verify but are not stored") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Array[Byte])]
    val q = StreamingPhashDedup.pairs(spark,
        mem.toDF.toDF("doc_id", "mime", "content"), maxPerBucket = 1)
      .writeStream.format("memory").queryName("sphash_cap")
      .outputMode("append").start()
    try {
      // 4,5,6 are one planted near-dup group: with cap 1 only the
      // first-arriving member is resident per bucket, so later members
      // pair with IT but never with each other
      mem.addData(media(Seq(4L)): _*)
      q.processAllAvailable()
      mem.addData(media(Seq(5L)): _*)
      q.processAllAvailable()
      mem.addData(media(Seq(6L)): _*)
      q.processAllAvailable()
      val pairs = spark.table("sphash_cap")
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
      assert(pairs.contains((4L, 5L)) && pairs.contains((4L, 6L)))
      assert(!pairs.contains((5L, 6L)))
    } finally q.stop()
  }
}
