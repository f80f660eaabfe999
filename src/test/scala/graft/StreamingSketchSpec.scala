package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash
import graft.streaming.StreamingSketch

class StreamingSketchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Batch reference: KMV estimate over the full value set. */
  private def batchKmv(values: Seq[Long], k: Int): Double = {
    val hs = values.map(v => PortableHash.digestOf(v.toString)).distinct.sorted
    if (hs.size < k) hs.size.toDouble
    else (k - 1).toDouble * PortableHash.P / hs(k - 1)
  }

  test("streaming KMV over two micro-batches equals the batch sketch on the union") {
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val mem = MemoryStream[(String, Long)]
    val q = StreamingSketch.kmvDistinct(spark, mem.toDS(), k)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    try {
      val batch1 = (1L to 40L).map(("a", _)) ++ (1L to 5L).map(("b", _))
      val batch2 = (30L to 80L).map(("a", _)) ++ (3L to 9L).map(("b", _))
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // last emitted estimate per key == batch KMV over the union
      val all = spark.table("kmv_stream")
        .as[StreamingSketch.KmvEstimate].collect()
      // no timeout → no evictions → every estimate is full-history
      assert(all.forall(_.generation == 0))
      val last = all
        .groupBy(_.key).map { case (key, rows) => key -> rows.last.est }
      assert(last("a") == batchKmv((1L to 80L), k))
      // 'b' has 9 distinct values (> k): estimator path
      assert(last("b") == batchKmv((1L to 9L), k))
      // sanity: the estimate is in a plausible range of the true count
      assert(last("a") > 20 && last("a") < 320)
    } finally q.stop()
  }

  test("below-k groups report the exact distinct count") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = StreamingSketch.kmvDistinct(spark, mem.toDS(), k = 16)
      .writeStream.format("memory").queryName("kmv_small")
      .outputMode("update").start()
    try {
      mem.addData(("x", 1L), ("x", 2L), ("x", 2L), ("x", 3L))
      q.processAllAvailable()
      val rows = spark.table("kmv_small")
        .as[StreamingSketch.KmvEstimate].collect()
      assert(rows.last.est == 3.0 && rows.last.nSeen == 3)
    } finally q.stop()
  }
}
