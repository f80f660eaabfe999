package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDoremi

/** Streaming DoReMi mixture planning ≡ the batch `q_mixture_doremi`:
  * documents stream in micro-batch splits, mark through the shared
  * scorer at arrival, and the shared sweep over the accumulated
  * domain stats reproduces the batch weights row-for-row. */
class StreamingDoremiSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("streamed marks + shared sweep equal the batch mixture weights " +
      "across micro-batch splits; state is domain-cardinality") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingDoremi.domainStats(
        StreamingDoremi.marks(mem.toDF.toDF("doc_id", "lang", "text")))
      .writeStream.format("memory").queryName("sdoremi")
      .outputMode("complete").start()
    try {
      val groups = docs.grouped(docs.length / 3 + 1).toSeq
      assert(groups.size >= 3, "need several splits or the test is vacuous")
      // mid-stream, the sweep is well-formed over partial data (the
      // live-monitoring property): weights exist and sum to ~1
      mem.addData(groups.head: _*)
      q.processAllAvailable()
      val partial = StreamingDoremi.sweep(spark.table("sdoremi"))
        .agg(sum(col("weight"))).as[Double].head()
      assert(math.abs(partial - 1.0) < 1e-3,
        s"mid-stream weights sum to $partial, not ~1")
      groups.tail.foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      // state is the domain grain — one row per language, never more
      val langs = docs.map(_._2).distinct.size
      assert(spark.table("sdoremi").count() == langs.toLong)
      // swept weights ≡ the batch query (same stats, same tail — any
      // divergence is the streaming aggregation state drifting)
      val got = StreamingDoremi.sweep(spark.table("sdoremi"))
        .as[(String, Long, Double, Double)].collect().toSeq
      val want = SparkEntry.queries("q_mixture_doremi")(spark, TestSpark.Sf)
        .as[(String, Long, Double, Double)].collect().toSeq
      assert(want.size == langs && got == want,
        "streamed mixture weights diverged from the batch plan")
    } finally q.stop()
  }
}
