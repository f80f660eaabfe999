package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPplBand

/** Streaming perplexity banding ≡ batch `q_text_ppl_band`: documents
  * stream in micro-batch splits, score at arrival against the fixed
  * prior-corpus LM (mark), and the shared banding sweep over the
  * marked store reproduces the batch terciles row-for-row. */
class StreamingPplBandSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs: Seq[(Long, String, String)] =
    Tables(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)

  test("streamed marks + shared sweep equal q_text_ppl_band across " +
      "micro-batch splits; bigram-less docs never mark") {
    implicit val sqlCtx = spark.sqlContext
    val model = StreamingPplBand.model(spark, TestSpark.Sf)
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingPplBand.scores(spark,
        mem.toDF.toDF("doc_id", "lang", "text"), model)
      .writeStream.format("memory").queryName("sppl")
      .outputMode("append").start()
    try {
      val d = docs
      val groups = d.grouped(d.length / 3 + 1).toSeq
      assert(groups.size >= 3, "need several splits or the test is vacuous")
      groups.foreach { g =>
        mem.addData(g: _*)
        q.processAllAvailable()
      }
      // the marked store holds every ≥2-word document exactly once
      val marked = spark.table("sppl")
      assert(marked.groupBy(col("doc_id")).count()
        .where(col("count") > 1).isEmpty, "a document marked twice")
      // swept bands ≡ the batch terciles row-for-row (same banding
      // tail, so any divergence is the SCORER drifting off the batch
      // arithmetic)
      val swept = StreamingPplBand.sweep(spark, marked)
        .as[(Long, String, Double, String)].collect().toSeq
      val batch = SparkEntry.queries("q_text_ppl_band")(spark, TestSpark.Sf)
        .as[(Long, String, Double, String)].collect().toSeq
      assert(batch.nonEmpty)
      assert(swept == batch)
      assert(swept.map(_._4).distinct.toSet == Set("head", "middle", "tail"),
        "a degenerate banding proves nothing")
      // a bigram-less arrival (single word — the batch result omits
      // such docs) never marks
      val before = marked.count()
      mem.addData((-1L, "en", "solitary"))
      q.processAllAvailable()
      assert(spark.table("sppl").count() == before,
        "a 1-word document produced a mark")
    } finally q.stop()
  }
}
