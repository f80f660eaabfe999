package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingEntityResolution

/** Streaming record linkage ≡ the batch `q_entity_resolution` match
  * graph (ids AND 4-decimal scores) on the same listings under
  * monotone-id ingest, across micro-batch splits; plus replay
  * idempotence and the bounded W-deep block state. */
class StreamingEntityResolutionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def listings: Seq[(Long, String, String, String, Int)] =
    queries.EntityQueries.listings(spark, TestSpark.Sf)
      .select(col("id"), col("name"), col("brand"), col("typ"), col("size"))
      .as[(Long, String, String, String, Int)].collect().toSeq.sortBy(_._1)

  test("streamed match pairs equal the batch match graph across micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Int)]
    val q = StreamingEntityResolution.pairs(spark,
        mem.toDF.toDF("id", "name", "brand", "typ", "size"))
      .writeStream.format("memory").queryName("ser")
      .outputMode("append").start()
    try {
      val l = listings
      // uneven splits incl. a singleton batch — the contract is
      // monotone ids ACROSS batches, nothing about batch sizing
      val splits = Seq(l.take(1), l.slice(1, l.length / 3),
        l.slice(l.length / 3, l.length / 3 + 1),
        l.drop(l.length / 3 + 1))
      splits.foreach { g =>
        if (g.nonEmpty) { mem.addData(g: _*); q.processAllAvailable() }
      }
      val streamed = spark.table("ser")
        .select(col("ai"), col("bi"), col("score"))
        .as[(Long, Long, Double)].collect().toSeq
      val batch = queries.EntityQueries.matchPairs(spark, TestSpark.Sf)
        .select(col("ai"), col("bi"), col("score"))
        .as[(Long, Long, Double)].collect().toSeq
      assert(batch.nonEmpty)
      // two-leg emission for pairs sharing both blocks, deduped
      // downstream (the operator's documented contract): distinct
      // sets equal, scores included — same jaroWinklerOf kernel, same
      // left-to-right composite, same HALF_UP valueOf grid
      assert(streamed.distinct.sorted == batch.distinct.sorted)
    } finally q.stop()
  }

  test("kill mid-stream, restart from checkpoint: linkage is exactly-once") {
    // T6/T7 for the stateful linkage operator: a stream killed between
    // epochs and restarted from its checkpoint recovers BOTH the
    // committed offsets and the per-block state store — the resumed
    // run must neither re-emit pairs the dead run already committed
    // (duplicates would mean lost state) nor miss pairs spanning the
    // kill point (lost residents).
    import java.nio.file.Files
    val l = listings.take(400) // monotone-id prefix of the corpus
    val f = Files.createTempFile("serl", ".tsv")
    Files.write(f, l.map { case (id, n, b, t, sz) => s"$id\t$n\t$b\t$t\t$sz" }
      .mkString("\n").getBytes("UTF-8"))
    val base = Files.createTempDirectory("ser_restart").toString
    def start() = {
      val lines = spark.readStream.format("graft.sources.ReplayLines")
        .option("path", f.toString)
        .option("linesPerTrigger", "40") // many batches — the kill lands between them
        .load()
      val parsed = lines
        .select(split(col("line"), "\t", -1).as("c"))
        .select(col("c").getItem(0).cast("long").as("id"),
          col("c").getItem(1).as("name"), col("c").getItem(2).as("brand"),
          col("c").getItem(3).as("typ"),
          col("c").getItem(4).cast("int").as("size"))
      graft.streaming.Sinks.appendParquet(
        StreamingEntityResolution.pairs(spark, parsed).toDF(),
        s"$base/out", s"$base/ckpt")
    }
    def sunk(): Long =
      try spark.read.parquet(s"$base/out").count() catch { case _: Throwable => 0L }
    val q1 = start()
    // kill deterministically on PROGRESS: the listener stops q1 at
    // the batch boundary where enough pairs committed (r13 advice —
    // wall-clock pacing was host-timing-sensitive)
    StreamKill.afterCommit(spark, q1, () => sunk() >= 5)
    assert(sunk() > 0, "kill landed before any epoch committed")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val raw = spark.read.parquet(s"$base/out")
      .select(col("ai"), col("bi"), col("score"))
      .as[(Long, Long, Double)].collect().toSeq
    // per-(pair, score) multiplicity <= 2: once per shared blocking
    // leg — a 3rd copy would be a replayed epoch or resurrected state
    raw.groupBy(identity).foreach { case (p, occ) =>
      assert(occ.size <= 2, s"pair $p emitted ${occ.size}x")
    }
    // and the distinct set equals the batch match graph on the same prefix
    val ids = l.map(_._1).toSet
    val batch = queries.EntityQueries.matchPairs(spark, TestSpark.Sf)
      .select(col("ai"), col("bi"), col("score"))
      .as[(Long, Long, Double)].collect().toSeq
      .filter { case (a, b, _) => ids(a) && ids(b) }
    assert(raw.distinct.sorted == batch.distinct.sorted)
  }

  test("a re-sent listing emits no duplicate pairs; block state stays W-deep") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Int)]
    val q = StreamingEntityResolution.pairs(spark,
        mem.toDF.toDF("id", "name", "brand", "typ", "size"), w = 3)
      .writeStream.format("memory").queryName("ser_re")
      .outputMode("append").start()
    try {
      // five identical listings in one block, W = 3: listing k pairs
      // with min(k, 3) predecessors — the window caps the fanout
      val rows = (1L to 5L).map(i => (i, "red widget", "Brand#1", "ECONOMY", 7))
      mem.addData(rows: _*); q.processAllAvailable()
      // replay an IN-WINDOW listing: recognized resident, no re-link.
      // (A replay older than the W-deep window would re-link — the
      // windowed-state retention caveat; upstream id-dedup owns that.)
      mem.addData(rows.last); q.processAllAvailable()
      val got = spark.table("ser_re")
        .select(col("ai"), col("bi")).as[(Long, Long)].collect().toSeq
      val want = (for {
        b <- 1L to 5L; a <- math.max(1L, b - 3) until b
      } yield (a, b)).toSeq
      // each pair appears once per shared blocking leg (both legs
      // here: identical records share A and B blocks) — distinct is
      // the contract; the replay must add nothing
      assert(got.distinct.sorted == want.sorted)
    } finally q.stop()
  }

  test("NULL fields: no block collision, no NPE, batch null algebra mirrored") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Option[String], String, Option[String], Option[Int])]
    val q = StreamingEntityResolution.pairs(spark,
        mem.toDF.toDF("id", "name", "brand", "typ", "size"))
      .writeStream.format("memory").queryName("ser_null")
      .outputMode("append").start()
    try {
      mem.addData(
        // which-field-is-NULL must stay distinguishable: with naive
        // concat_ws these two collide into one attribute block (the
        // separator vanishes with the null) — batch partitionBy keys
        // them apart, so the stream must too
        (1L, Some("widget alpha"), "B1", None, Some(7)),
        (2L, Some("widget alpha"), "B1", Some("7"), None),
        // NULL name: batch JW is null → composite null → threshold
        // filter drops; the stream must not throw, must not match
        (3L, None, "B2", Some("x"), Some(1)),
        (4L, None, "B2", Some("x"), Some(1)),
        // control: a genuine duplicate still links
        (5L, Some("blue gadget"), "B3", Some("STANDARD"), Some(3)),
        (6L, Some("blue gadget"), "B3", Some("STANDARD"), Some(3)))
      q.processAllAvailable()
      val got = spark.table("ser_null")
        .select(col("ai"), col("bi")).as[(Long, Long)].collect().toSeq
      assert(got.distinct.toSet == Set((5L, 6L)),
        s"only the control pair may link: got $got")
    } finally q.stop()
  }
}
