package graft

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.PipelineQueries
import graft.streaming.StreamingRerank

/** The streamed retrieve-then-rerank ≡ the batch `q_rag_rerank`
  * (oracle-checked) for every prefix of the query stream — the
  * serving twin's contract: same shared derivation, static index,
  * per-query independence. */
class StreamingRerankSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private type Out = (String, Int, Long, Int, Double, Double)

  private def key(r: Row): Out =
    (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3),
      r.getDouble(4), r.getDouble(5))

  test("streamed rerank equals batch q_rag_rerank per prefix") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batchAll = SparkEntry.queries("q_rag_rerank")(spark, Sf)
      .collect().map(key).toSeq
    assert(batchAll.nonEmpty)
    val mem = MemoryStream[(String, String)]
    val got = mutable.ArrayBuffer.empty[Out]
    val ckpt = java.nio.file.Files.createTempDirectory("srerank").toString
    val q = StreamingRerank.start(spark, mem.toDF.toDF("qid", "term"), Sf, ckpt) {
      df => got.synchronized { got ++= df.collect().map(key) }: Unit
    }
    try {
      // three prefixes: qa alone, then qb+qc together, then nothing new
      val byQid = PipelineQueries.RagQueries.groupBy(_._1)
      mem.addData(byQid("qa"): _*)
      q.processAllAvailable()
      val afterQa = got.synchronized(got.toSeq)
      assert(afterQa.sorted == batchAll.filter(_._1 == "qa").sorted,
        "prefix {qa} diverged from batch")
      mem.addData((byQid("qb") ++ byQid("qc")): _*)
      q.processAllAvailable()
      val afterAll = got.synchronized(got.toSeq)
      assert(afterAll.sorted == batchAll.sorted,
        "full query set diverged from batch")
      // empty micro-batch: no spurious output
      q.processAllAvailable()
      assert(got.synchronized(got.size) == afterAll.size)
    } finally q.stop()
  }
}
