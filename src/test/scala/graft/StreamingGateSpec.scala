package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Streaming twin of the FULL fused quality gate: all five signals
  * (length window, language markers, repetition, PII, logreg margin)
  * and the 5-bit failure-reason bitmask of `q_quality_gate` are
  * stateless per-row work over one shared tokenization, so the SAME
  * `gateBitmask` projection must run unchanged under readStream
  * (append mode, no watermark, no state) and emit the identical
  * (doc_id, n_words, reasons, keep) rows across ARBITRARY micro-batch
  * splits — batch ≡ stream by construction, on the admission path a
  * production corpus filter deploys (gating documents as they
  * arrive). Extends StreamingLogregSpec's single-signal pin to the
  * complete bitmask. */
class StreamingGateSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  private def runSplit(cuts: Seq[Int], queryName: String): Unit = {
    val docs = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val expected = SparkEntry.queries("q_quality_gate")(spark, Sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getBoolean(3)))
      .toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val gated = TextQueries.gateBitmask(
      mem.toDS().toDF("doc_id", "source", "text"))
    val q = gated.writeStream.format("memory").queryName(queryName)
      .outputMode("append").start()
    try {
      var from = 0
      cuts.foreach { to =>
        mem.addData(docs.slice(from, to).toIndexedSeq: _*)
        q.processAllAvailable()
        from = to
      }
      val streamed = spark.table(queryName).collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getBoolean(3)))
        .toMap
      assert(streamed.size === expected.size)
      assert(streamed === expected)
      // every reason bit must actually fire somewhere in the corpus,
      // or the equivalence would vacuously pass on an all-keep slice
      val firedBits = streamed.values.map(_._2).reduce(_ | _)
      assert(firedBits === 31,
        s"corpus does not exercise all 5 reason bits (got $firedBits)")
    } finally q.stop()
  }

  test("full 5-bit gate bitmask streamed equals q_quality_gate (even thirds)") {
    val n = Tables(spark, Sf, "documents").count().toInt
    runSplit(Seq(n / 3, 2 * n / 3, n), "gate_stream_thirds")
  }

  test("full 5-bit gate bitmask streamed equals q_quality_gate (skewed: 1-row batch first)") {
    val n = Tables(spark, Sf, "documents").count().toInt
    runSplit(Seq(1, math.max(2, n / 10), n), "gate_stream_skewed")
  }
}
