package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingQualityEval

/** Streaming classifier evaluation ≡ batch `q_quality_auc` /
  * `q_quality_calibration`: documents stream in micro-batch splits,
  * mark through the shared scorer at arrival, and the shared sweeps
  * over the accumulated histogram / marked store reproduce both
  * batch verdicts row-for-row. */
class StreamingQualityEvalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs: Seq[(Long, String, String)] =
    Tables(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)

  test("streamed marks + shared sweeps equal both batch eval queries " +
      "across micro-batch splits; histogram state is margin-domain") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val marked = StreamingQualityEval.marks(
      mem.toDF.toDF("doc_id", "lang", "text"))
    // two consumers of one mark stream: the histogram AGGREGATION
    // (complete mode — its state IS the per-(lang, margin) counts)
    // and the per-doc marked store (append) for the decile sweep
    val qHist = StreamingQualityEval.histogram(marked)
      .writeStream.format("memory").queryName("sqe_hist")
      .outputMode("complete").start()
    val qMarks = marked.writeStream.format("memory").queryName("sqe_marks")
      .outputMode("append").start()
    try {
      val d = docs
      val groups = d.grouped(d.length / 3 + 1).toSeq
      assert(groups.size >= 3, "need several splits or the test is vacuous")
      groups.foreach { g =>
        mem.addData(g: _*)
        qHist.processAllAvailable()
        qMarks.processAllAvailable()
      }
      // every document marked exactly once
      val markedTbl = spark.table("sqe_marks")
      assert(markedTbl.count() == d.size.toLong)
      assert(markedTbl.groupBy(col("doc_id")).count()
        .where(col("count") > 1).isEmpty, "a document marked twice")
      // swept AUC ≡ the batch per-language verdicts (same rank tail,
      // so any divergence is the histogram state drifting)
      val aucGot = StreamingQualityEval.sweepAuc(spark, spark.table("sqe_hist"))
        .as[(String, Long, Long, Double)].collect().toSeq
      val aucWant = SparkEntry.queries("q_quality_auc")(spark, TestSpark.Sf)
        .as[(String, Long, Long, Double)].collect().toSeq
      assert(aucWant.nonEmpty && aucGot == aucWant,
        "streamed AUC diverged from the batch evaluation")
      // swept deciles ≡ the batch reliability table
      val calGot =
        StreamingQualityEval.sweepCalibration(spark, markedTbl)
          .as[(Int, Long, Long, Double)].collect().toSeq
      val calWant =
        SparkEntry.queries("q_quality_calibration")(spark, TestSpark.Sf)
          .as[(Int, Long, Long, Double)].collect().toSeq
      assert(calWant.size == 10 && calGot == calWant,
        "streamed calibration diverged from the batch deciles")
      // the AUC state is the histogram grain: one row per
      // (lang, margin) pair — exactly the batch grouping's
      // cardinality, by construction never more
      val histRows = spark.table("sqe_hist").count()
      val pairCnt = markedTbl.select(col("lang"), col("margin_num"))
        .distinct().count()
      assert(histRows == pairCnt,
        s"histogram state $histRows rows != $pairCnt distinct pairs")
    } finally { qHist.stop(); qMarks.stop() }
  }

  test("kill mid-stream, restart from checkpoint: the durable histogram " +
      "store and marked store recover exactly-once and both swept " +
      "verdicts equal batch (T6/T7 for the eval state)") {
    import java.nio.file.Files
    val d = docs
    // replay source: the documents split across many parquet files,
    // streamed one file per trigger — many batch boundaries for the
    // kill to land between (text can carry tabs/newlines, so a
    // line-based replay would need escaping; the parquet file source
    // checkpoint-recovers its processed-file set just like offsets)
    val srcDir = Files.createTempDirectory("sqe_src").toString
    spark.createDataset(d).toDF("doc_id", "lang", "text")
      .repartition(12).write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val base = Files.createTempDirectory("sqe_restart").toString
    val histDir = s"$base/hist"

    // --- histogram leg: durable complete-mode replace store ---
    def startHist() = StreamingQualityEval.attachHistogram(
      StreamingQualityEval.marks(src), histDir, s"$base/hckpt")
    def histDocs(): Long =
      try StreamingQualityEval.readHistogram(spark, histDir)
        .agg(sum(col("nt"))).as[Long].head()
      catch { case _: Throwable => 0L }
    val h1 = startHist()
    StreamKill.afterCommit(spark, h1, () => histDocs() >= 3)
    assert(histDocs() > 0, "kill landed before any histogram commit")
    assert(histDocs() < d.size.toLong,
      "drain completed before the kill — raise the file split count")
    val h2 = startHist()
    try h2.processAllAvailable() finally h2.stop()
    // the recovered accumulation covers every document exactly once
    assert(histDocs() == d.size.toLong,
      "restart lost or double-counted documents in the histogram state")
    val aucGot = StreamingQualityEval.sweepAuc(spark,
        StreamingQualityEval.readHistogram(spark, histDir))
      .as[(String, Long, Long, Double)].collect().toSeq
    val aucWant = SparkEntry.queries("q_quality_auc")(spark, TestSpark.Sf)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(aucWant.nonEmpty && aucGot == aucWant,
      "restarted AUC sweep diverged from the batch evaluation")

    // --- marked-store leg: epoch-idempotent append, same kill ---
    def startMarks() = graft.streaming.Sinks.appendParquet(
      StreamingQualityEval.marks(src), s"$base/marks", s"$base/mckpt")
    def sunkMarks(): Long =
      try spark.read.parquet(s"$base/marks").count()
      catch { case _: Throwable => 0L }
    val m1 = startMarks()
    StreamKill.afterCommit(spark, m1, () => sunkMarks() >= 3)
    assert(sunkMarks() > 0 && sunkMarks() < d.size.toLong,
      "marks kill landed outside mid-stream")
    val m2 = startMarks()
    try m2.processAllAvailable() finally m2.stop()
    val markedTbl = spark.read.parquet(s"$base/marks")
    assert(markedTbl.count() == d.size.toLong &&
      markedTbl.groupBy(col("doc_id")).count()
        .where(col("count") > 1).isEmpty,
      "restart lost or duplicated marked documents")
    val calGot = StreamingQualityEval.sweepCalibration(spark, markedTbl)
      .as[(Int, Long, Long, Double)].collect().toSeq
    val calWant = SparkEntry.queries("q_quality_calibration")(spark, TestSpark.Sf)
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(calWant.size == 10 && calGot == calWant,
      "restarted calibration sweep diverged from the batch deciles")
  }
}
