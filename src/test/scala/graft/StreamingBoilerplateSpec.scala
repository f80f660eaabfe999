package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingBoilerplate

/** Streaming boilerplate detector ≡ the batch `q_text_boilerplate`
  * pass-1 over any prefix, exactly-once emission per digest, and the
  * final set reproduces the batch cleaned output. */
class StreamingBoilerplateSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val MinDocs = graft.queries.TextQueries.BoilerMinDocs

  private val docs: Seq[(Long, String)] =
    Tables(spark, TestSpark.Sf, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

  /** Batch pass-1 on a prefix: digests of lines in ≥ MinDocs docs —
    * through the SAME shared column derivation the stream uses. */
  private def batchSet(rows: Seq[(Long, String)]): Set[Long] =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(array_distinct(
          StreamingBoilerplate.lines(split(col("text"), " ")))).as("line"))
      .select(col("doc_id"),
        graft.functions.PortableHash.md5Long(col("line")).as("dg"))
      .groupBy(col("dg")).agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= MinDocs)
      .select(col("dg")).as[Long].collect().toSet

  test("cumulative emissions equal batch pass-1 over every prefix, exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingBoilerplate.hits(spark, mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sboiler")
      .outputMode("append").start()
    try {
      val splits = docs.grouped(170).toSeq // 3 uneven micro-batches
      var fed = Seq.empty[(Long, String)]
      for (batch <- splits) {
        mem.addData(batch: _*)
        q.processAllAvailable()
        fed = fed ++ batch
        val emitted = spark.table("sboiler").select(col("dg")).as[Long].collect()
        assert(emitted.length == emitted.distinct.length,
          "a digest was emitted more than once")
        assert(emitted.toSet == batchSet(fed),
          s"prefix of ${fed.size} docs: stream set != batch set")
      }
      assert(spark.table("sboiler").count() > 0, "no boilerplate — vacuous")
    } finally q.stop()
  }

  test("final emitted set reproduces the batch cleaned output") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingBoilerplate.hits(spark, mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sboiler_clean")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val live = spark.table("sboiler_clean").select(col("dg")).as[Long].collect()
      // removal pass-2 against the LIVE set — the serving-side
      // projection the batch query runs against its own pass-1
      val bset = sort_array(lit(live.sorted))
      val lines = StreamingBoilerplate.lines(split(col("text"), " "))
      val cleanedLive = docs.toDF("doc_id", "text")
        .select(col("doc_id"),
          array_join(filter(lines, l => !array_contains(bset,
            graft.functions.PortableHash.md5Long(l))), " ").as("cleaned"))
        .as[(Long, String)].collect().toMap
      val batch = SparkEntry.queries("q_text_boilerplate")(spark, TestSpark.Sf)
        .select(col("doc_id"), col("cleaned")).as[(Long, String)].collect().toMap
      assert(cleanedLive == batch)
    } finally q.stop()
  }

  test("a doc's repeated internal line counts once per document") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingBoilerplate.hits(spark, mem.toDF.toDF("doc_id", "text"), minDocs = 2)
      .writeStream.format("memory").queryName("sboiler_dup")
      .outputMode("append").start()
    try {
      val line = "aa bb cc dd"
      // doc 1 contains the line TWICE: must count as one document
      mem.addData((1L, s"$line $line"))
      q.processAllAvailable()
      assert(spark.table("sboiler_dup").count() == 0,
        "intra-doc repetition crossed the distinct-doc threshold")
      mem.addData((2L, line))
      q.processAllAvailable()
      val hits = spark.table("sboiler_dup")
        .select(col("dg"), col("ndocs")).as[(Long, Int)].collect()
      assert(hits.length == 1 && hits.head._2 == 2)
    } finally q.stop()
  }
}
