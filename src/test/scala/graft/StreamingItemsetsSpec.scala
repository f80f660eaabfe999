package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ItemsetQueries
import graft.streaming.StreamingItemsets

/** Streaming frequent-pair miner ≡ absolute-threshold batch mining
  * over every prefix, exactly-once emission per pair, and — when the
  * threshold equals the batch query's data-derived minsup — the final
  * emitted set ≡ `q_itemsets_pairs`. */
class StreamingItemsetsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val B = ItemsetQueries.PackBase

  private lazy val dict: Map[String, Long] =
    ItemsetQueries.rankDict(spark, TestSpark.Sf)

  private lazy val docs: Seq[(Long, String)] =
    Tables(spark, TestSpark.Sf, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

  /** minsup the batch query derives at this SF: ceil(0.10 · n). */
  private lazy val minsup: Int = math.ceil(docs.size * 0.10).toInt

  /** Reference mining on a prefix with an ABSOLUTE threshold — plain
    * Scala, no Spark, no shared derivation. */
  private def brute(rows: Seq[(Long, String)], t: Int): Map[Long, Int] =
    rows.flatMap { case (_, text) =>
      val rs = text.toLowerCase(java.util.Locale.ROOT)
        .split(" ", -1).distinct.toIndexedSeq.flatMap(dict.get).sorted
      for { i <- rs.indices; j <- (i + 1) until rs.length }
        yield rs(i) * B + rs(j)
    }.groupBy(identity).map { case (pk, xs) => pk -> xs.size }
      .filter(_._2 >= t)

  test("cumulative emissions equal absolute-threshold mining over every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingItemsets.hits(spark, mem.toDF.toDF("doc_id", "text"),
        dict, minsup)
      .writeStream.format("memory").queryName("sitems")
      .outputMode("append").start()
    try {
      val splits = docs.grouped(17).toSeq // uneven micro-batches
      var fed = Seq.empty[(Long, String)]
      for (batch <- splits) {
        mem.addData(batch: _*)
        q.processAllAvailable()
        fed = fed ++ batch
        val emitted = spark.table("sitems").select($"pk").as[Long].collect()
        assert(emitted.length == emitted.distinct.length,
          "a pair was emitted more than once")
        assert(emitted.toSet == brute(fed, minsup).keySet,
          s"prefix of ${fed.size} docs: stream set != brute-force set")
      }
      assert(spark.table("sitems").count() > 0, "no frequent pairs — vacuous")
    } finally q.stop()
  }

  test("final set at the batch minsup equals q_itemsets_pairs, decoded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingItemsets.hits(spark, mem.toDF.toDF("doc_id", "text"),
        dict, minsup)
      .writeStream.format("memory").queryName("sitems_final")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val back = dict.map(_.swap)
      val streamed = spark.table("sitems_final").select($"pk").as[Long].collect()
        .map(pk => (back(pk >> 20), back(pk % B))).toSet
      val batch = SparkEntry.queries("q_itemsets_pairs")(spark, TestSpark.Sf)
        .select($"item_a", $"item_b").as[(String, String)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("emitted support is exactly the crossing value") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingItemsets.hits(spark, mem.toDF.toDF("doc_id", "text"),
        dict, minsup)
      .writeStream.format("memory").queryName("sitems_sup")
      .outputMode("append").start()
    try {
      // one document per micro-batch: every crossing lands exactly AT
      // the threshold, so any support > minsup is a double count
      for (d <- docs.take(math.min(docs.size, 3 * minsup))) {
        mem.addData(d)
        q.processAllAvailable()
      }
      val sups = spark.table("sitems_sup").select($"support").as[Int].collect()
      assert(sups.nonEmpty && sups.forall(_ == minsup))
    } finally q.stop()
  }

  test("kill mid-stream, restart from checkpoint: pair emission is exactly-once") {
    // T6/T7 for the stateful miner (the family standard the ER/embed
    // twins already meet): a stream killed between epochs and
    // restarted from its checkpoint recovers BOTH the committed
    // offsets and the per-pair count state — the resumed run must
    // neither re-emit pairs the dead run already committed (that
    // would be resurrected state double-crossing the threshold) nor
    // miss pairs whose support spans the kill point (lost counts).
    import java.nio.file.Files
    assert(docs.forall(!_._2.contains('\t')))
    val f = Files.createTempFile("sitems", ".tsv")
    Files.write(f, docs.map { case (id, t) => s"$id\t$t" }
      .mkString("\n").getBytes("UTF-8"))
    val base = Files.createTempDirectory("sitems_restart").toString
    def start() = {
      val lines = spark.readStream.format("graft.sources.ReplayLines")
        .option("path", f.toString)
        .option("linesPerTrigger", "5") // many batches — the kill lands between them
        .load()
      val parsed = lines
        .select(split(col("line"), "\t", 2).as("c"))
        .select(col("c").getItem(0).cast("long").as("doc_id"),
          col("c").getItem(1).as("text"))
      graft.streaming.Sinks.appendParquet(
        StreamingItemsets.hits(spark, parsed, dict, minsup).toDF(),
        s"$base/out", s"$base/ckpt")
    }
    def sunk(): Long =
      try spark.read.parquet(s"$base/out").count() catch { case _: Throwable => 0L }
    val q1 = start()
    // kill deterministically on PROGRESS: the listener stops q1 at
    // the batch boundary where the first crossing committed (r13
    // advice — wall-clock pacing was host-timing-sensitive)
    StreamKill.afterCommit(spark, q1, () => sunk() >= 1)
    assert(sunk() > 0, "kill landed before any crossing committed")
    // the kill must land MID-stream or the restart never exercises
    // checkpoint recovery and the exactly-once assertions go vacuous
    assert(sunk() < brute(docs, minsup).size,
      "drain completed before the kill — slow the replay rate")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$base/out")
      .select($"pk", $"support").as[(Long, Int)].collect().toSeq
    assert(got.map(_._1).distinct.length == got.length,
      "a pair crossed the threshold twice — state lost or epoch replayed")
    assert(got.map(_._1).toSet == brute(docs, minsup).keySet)
    assert(got.forall(_._2 >= minsup))
  }
}
