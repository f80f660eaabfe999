package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Flagship
import graft.streaming.{Collector, StreamingFlagship}

class CollectorSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Wire fixtures use the reference's hyphenated keys (§1.2d). */
  private val wire = Seq(
    """{"timestamp":"2024-12-08T23:00:18Z","lemma":"obskur","lemma-type":"AR_G","form-type":"Hauptform","article-type":"Vollartikel","source":"WDG","date":"1974-01-01"}""",
    """{"timestamp":"2024-12-08T23:00:19Z","lemma":"Haus","hidx":2,"article-type":"Vollartikel","source":"DWB","date":"1854-01-01"}""",
    """{"timestamp":"2024-12-08T23:00:20Z","lemma":"nur-lemma"}""",
    """not json at all""",
    s"""{"timestamp":"2024-12-08T23:00:21Z","lemma":"${"x" * 200}"}""")

  test("decode + db projection match the reference's event->db semantics") {
    val rows = Collector.toDbRows(Collector.decode(wire.toDF("value")))
      .orderBy("ts").collect()
    // malformed line and the >128-char lemma are dropped
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("lemma") == "obskur")
    assert(rows(0).getAs[String]("article_type") == "Vollartikel")
    assert(rows(0).getAs[java.sql.Date]("article_date").toString == "1974-01-01")
    // homograph index folds into the lemma key
    assert(rows(1).getAs[String]("lemma") == "Haus#2")
    // unenriched event keeps nulls for article columns
    assert(rows(2).getAs[String]("lemma") == "nur-lemma")
    assert(rows(2).isNullAt(rows(2).fieldIndex("article_type")))
  }

  test("server wire → collector decode round-trips enrichment VALUES (§3.1→§3.2 seam)") {
    val enriched = Flagship(spark, TestSpark.Sf)
    val nEnriched = enriched.where(col("freq").isNotNull).count()
    // shape the flagship output as the reference wire record
    val wireDf = enriched.select(
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("timestamp"),
      col("lemma"),
      when(col("freq").isNotNull, lit("Vollartikel")).as("article-type"),
      when(col("freq").isNotNull, lit("WDG")).as("source"),
      when(col("freq").isNotNull, lit("1974-01-01")).as("date"))
    val jsonl = StreamingFlagship.toJsonl(wireDf)
    val decoded = Collector.decode(jsonl)
    assert(decoded.count() == enriched.count())
    // enrichment fields survive the wire with their values
    assert(decoded.where(col("article_type") === "Vollartikel").count() == nEnriched)
    assert(decoded.where(col("source") === "WDG").count() == nEnriched)
    // unenriched events carry ONLY {timestamp, lemma} on the wire —
    // to_json omits nulls like the reference omits absent keys
    assert(jsonl.where(!col("value").contains("article-type")).count() ==
      enriched.count() - nEnriched)
    // and the db projection parses the date all the way through
    val db = Collector.toDbRows(decoded)
    assert(db.where(col("article_date").isNotNull).count() == nEnriched)
    val sse = StreamingFlagship.toSse(wireDf).head().getAs[String]("frame")
    assert(sse.startsWith("data: {") && sse.endsWith("\n\n"))
  }

  test("end-to-end: stream of JSONL into the epoch-idempotent fact sink") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("collector").toString
    val mem = MemoryStream[String]
    val q = Collector.start(Collector.decode(mem.toDF.toDF("value")),
      s"$base/out", s"$base/ckpt")
    try {
      mem.addData(wire: _*)
      q.processAllAvailable()
      assert(spark.read.parquet(s"$base/out").count() == 3)
    } finally q.stop()
  }
}
