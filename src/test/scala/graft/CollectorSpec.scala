package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Collector

class CollectorSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val wire = Seq(
    """{"timestamp":"2024-12-08T23:00:18Z","lemma":"obskur","lemma_type":"AR_G","form_type":"Hauptform","article_type":"Vollartikel","source":"WDG","date":"1974-01-01"}""",
    """{"timestamp":"2024-12-08T23:00:19Z","lemma":"Haus","hidx":2,"article_type":"Vollartikel","source":"DWB","date":"1854-01-01"}""",
    """{"timestamp":"2024-12-08T23:00:20Z","lemma":"nur-lemma"}""",
    """not json at all""",
    s"""{"timestamp":"2024-12-08T23:00:21Z","lemma":"${"x" * 200}"}""")

  test("decode + db projection match the reference's event->db semantics") {
    val rows = Collector.toDbRows(Collector.decode(wire.toDF("value")))
      .orderBy("ts").collect()
    // malformed line and the >128-char lemma are dropped
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("lemma") == "obskur")
    assert(rows(0).getAs[java.sql.Date]("article_date").toString == "1974-01-01")
    // homograph index folds into the lemma key
    assert(rows(1).getAs[String]("lemma") == "Haus#2")
    // unenriched event keeps nulls for article columns
    assert(rows(2).getAs[String]("lemma") == "nur-lemma")
    assert(rows(2).isNullAt(rows(2).fieldIndex("article_type")))
  }

  test("server wire → collector decode round-trips (the §3.1→§3.2 seam)") {
    import graft.pipeline.Flagship
    import graft.streaming.StreamingFlagship
    import org.apache.spark.sql.functions._
    val enriched = Flagship(spark, TestSpark.Sf)
      .withColumnRenamed("ts", "timestamp") // wire field name (§1.2d)
      .withColumn("timestamp", date_format(col("timestamp"),
        "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    val wire = StreamingFlagship.toJsonl(enriched)
    val decoded = Collector.decode(wire)
    assert(decoded.count() == enriched.count())
    // unenriched events keep only {timestamp, lemma} on the wire —
    // to_json omits nulls like the reference omits absent keys
    val bare = wire.where(!col("value").contains("freq"))
    assert(bare.count() > 0)
    val sse = StreamingFlagship.toSse(enriched).head().getAs[String]("frame")
    assert(sse.startsWith("data: {") && sse.endsWith("\n\n"))
  }

  test("end-to-end: stream of JSONL into the parquet fact sink") {
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
