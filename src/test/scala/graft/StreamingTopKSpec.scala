package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingTopK

class StreamingTopKSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Batch reference: count + (count desc, lemma) rank, exactly the
    * q_flagship_hourly_top formulation. */
  private def batchTopK(events: Seq[(Long, String)],
      k: Int): Set[(Long, String, Long, Int)] =
    events.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((h, lemma), n) => (h, lemma, n) }
      .groupBy(_._1)
      .flatMap { case (_, rows) =>
        rows.sortBy { case (_, lemma, n) => (-n, lemma) }
          .take(k).zipWithIndex
          .map { case ((h, lemma, n), i) => (h, lemma, n, i + 1) }
      }.toSet

  test("final leaderboard across micro-batches equals the batch top-k") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingTopK.topK(spark, mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("update").start()
    // hour 0: counts split across the two batches (b accumulates 1+2);
    // hour 1 appears only in batch 2; ties broken by lemma asc
    val batch1 = Seq((0L, "a"), (0L, "a"), (0L, "b"), (0L, "c"), (0L, "d"))
    val batch2 = Seq((0L, "b"), (0L, "b"), (0L, "c"), (1L, "x"), (1L, "y"), (1L, "x"))
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // last emission per hour = rows of the final micro-batch that
      // touched it; collect the latest rn<=k set per hour
      val all = spark.table("topk_stream").as[StreamingTopK.TopEntry].collect()
      val latest = all.groupBy(_.hour).flatMap { case (h, rows) =>
        // emissions are append-logged; the final state of an hour is
        // its LAST k-block — identify it by taking rows from the end
        // until rn repeats
        rows.reverse.takeWhile(r => r.rn <= 3).groupBy(_.rn)
          .map { case (_, rs) => rs.head } // first from the end per rn
      }.map(r => (r.hour, r.lemma, r.n, r.rn)).toSet
      assert(latest == batchTopK(batch1 ++ batch2, 3))
    } finally q.stop()
  }
}
