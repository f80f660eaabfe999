package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** The learned quality gate is a stateless per-row projection, so the
  * SAME function that defines `q_quality_logreg` must run unchanged
  * under readStream (append mode, no watermark, no state) and emit
  * row-identical scores across arbitrary micro-batch splits — the
  * batch ≡ stream by construction stance, on the serving path a
  * production filter would actually deploy (scoring documents as they
  * arrive). */
class StreamingLogregSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  test("streamed scores equal the batch query across micro-batch splits") {
    val docs = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    val expected = SparkEntry.queries("q_quality_logreg")(spark, Sf)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getBoolean(5))).toMap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val scored = TextQueries.logregScore(
      mem.toDS().toDF("doc_id", "lang", "text"))
    val q = scored.writeStream.format("memory").queryName("logreg_stream")
      .outputMode("append").start()
    try {
      val cuts = Seq(docs.length / 3, 2 * docs.length / 3, docs.length)
      var from = 0
      cuts.foreach { to =>
        mem.addData(docs.slice(from, to).toIndexedSeq: _*)
        q.processAllAvailable()
        from = to
      }
      val streamed = spark.table("logreg_stream").collect()
        .map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3),
            r.getDouble(4), r.getBoolean(5))).toMap
      assert(streamed.size === expected.size)
      assert(streamed === expected)
    } finally q.stop()
  }
}
