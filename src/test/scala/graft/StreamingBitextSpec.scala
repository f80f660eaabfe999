package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityQueries
import graft.streaming.StreamingBitext

/** Streaming bitext mining ≡ batch `q_mine_bitext`: the at-arrival
  * candidate set (ids AND unrounded cosines) equals the batch
  * cross-language same-cluster score table across micro-batch splits,
  * and the shared margin sweep over the marked candidates reproduces
  * the batch result row-for-row. */
class StreamingBitextSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def vecs: Seq[(Long, Int, Array[Double])] =
    Tables(spark, TestSpark.Sf, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>"))
      .as[(Long, Int, Array[Double])].collect().toSeq.sortBy(_._1)

  test("streamed candidates + shared sweep equal q_mine_bitext across " +
      "micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val model = SimilarityQueries.bitextModel(spark, TestSpark.Sf)
    val mem = MemoryStream[(Long, Int, Array[Double])]
    val q = StreamingBitext.candidates(spark,
        mem.toDF.toDF("vec_id", "label", "embedding"), model)
      .writeStream.format("memory").queryName("sbitext")
      .outputMode("append").start()
    try {
      val v = vecs
      val groups = v.grouped(v.length / 3 + 1).toSeq
      assert(groups.size >= 3, "need several splits or the test is vacuous")
      groups.foreach { g =>
        mem.addData(g: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("sbitext")
        .select(col("ai"), col("bi"), col("cos"))
        .as[(Long, Long, Double)].collect().toSeq
      // each cross-language pair emits exactly once, the moment its
      // second member arrives
      assert(streamed.map(p => (p._1, p._2)).distinct.length == streamed.length,
        "a candidate pair emitted twice")
      // candidate set ≡ the batch score table (UNROUNDED cosines —
      // the Scala l→r dot must be bit-identical to the batch kernel)
      val batchSc = SimilarityQueries.bitextScores(spark, TestSpark.Sf)
        .as[(Long, Long, Double)].collect().toSeq
      assert(batchSc.nonEmpty)
      assert(streamed.sorted == batchSc.sorted)
      // swept result ≡ q_mine_bitext row-for-row (same sweep code,
      // same marked candidates)
      val swept = StreamingBitext.sweep(spark.table("sbitext"))
        .orderBy(col("a_id"))
        .as[(Long, Long, Double, Double)].collect().toSeq
      val batch = SparkEntry.queries("q_mine_bitext")(spark, TestSpark.Sf)
        .as[(Long, Long, Double, Double)].collect().toSeq
      assert(batch.nonEmpty)
      assert(swept == batch)
    } finally q.stop()
  }

  test("assignment in the streaming key function is batch-exact for every " +
      "corpus vector") {
    val model = SimilarityQueries.bitextModel(spark, TestSpark.Sf)
    val want = SimilarityQueries.semAssigned(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    val got = vecs.map { case (id, _, v) =>
      id -> StreamingBitext.assign(model._1, model._2, model._3, v)
    }.toMap
    assert(got == want)
  }

  test("kill mid-stream, restart from checkpoint: candidate emission is " +
      "exactly-once (the family standard, deterministic kill on progress)") {
    import java.nio.file.Files
    val model = SimilarityQueries.bitextModel(spark, TestSpark.Sf)
    val f = Files.createTempFile("sbitext", ".tsv")
    Files.write(f, vecs.map { case (id, lb, v) =>
      s"$id\t$lb\t${v.mkString(",")}" }.mkString("\n").getBytes("UTF-8"))
    val base = Files.createTempDirectory("sbitext_restart").toString
    def start() = {
      val lines = spark.readStream.format("graft.sources.ReplayLines")
        .option("path", f.toString)
        .option("linesPerTrigger", "40") // many batches — the kill lands between them
        .load()
      val parsed = lines
        .select(split(col("line"), "\t", 3).as("c"))
        .select(col("c").getItem(0).cast("long").as("vec_id"),
          col("c").getItem(1).cast("int").as("label"),
          split(col("c").getItem(2), ",").cast("array<double>").as("embedding"))
      graft.streaming.Sinks.appendParquet(
        StreamingBitext.candidates(spark, parsed, model).toDF(),
        s"$base/out", s"$base/ckpt")
    }
    def sunk(): Long =
      try spark.read.parquet(s"$base/out").count() catch { case _: Throwable => 0L }
    val q1 = start()
    StreamKill.afterCommit(spark, q1, () => sunk() >= 1)
    assert(sunk() > 0, "kill landed before any candidate committed")
    val batchSc = SimilarityQueries.bitextScores(spark, TestSpark.Sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(sunk() < batchSc.size,
      "drain completed before the kill — the restart proves nothing")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$base/out")
      .select($"ai", $"bi", $"cos").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length,
      "a candidate emitted twice — state lost or epoch replayed")
    assert(got.sorted == batchSc.sorted)
  }

  test("a re-sent vector emits no self or duplicate candidates") {
    implicit val sqlCtx = spark.sqlContext
    val model = SimilarityQueries.bitextModel(spark, TestSpark.Sf)
    val mem = MemoryStream[(Long, Int, Array[Double])]
    val q = StreamingBitext.candidates(spark,
        mem.toDF.toDF("vec_id", "label", "embedding"), model)
      .writeStream.format("memory").queryName("sbitext_re")
      .outputMode("append").start()
    try {
      val Seq(a, b) = vecs.filter(r => (r._2 & 1) == 0).take(1) ++
        vecs.filter(r => (r._2 & 1) == 1).take(1)
      mem.addData(a, b)
      q.processAllAvailable()
      val before = spark.table("sbitext_re").count()
      mem.addData(a) // replay of a known vector
      q.processAllAvailable()
      assert(spark.table("sbitext_re").count() == before,
        "replay emitted new candidates")
    } finally q.stop()
  }

  test("maxPerCluster overflow is OBSERVABLE: the drop counter reports " +
      "every vector the cap silently excluded from future pairing (r15)") {
    implicit val sqlCtx = spark.sqlContext
    val model = SimilarityQueries.bitextModel(spark, TestSpark.Sf)
    val mem = MemoryStream[(Long, Int, Array[Double])]
    // cap 1: of n same-cluster arrivals, all but the first drop
    val (ds, dropped) = StreamingBitext.candidatesCounted(spark,
      mem.toDF.toDF("vec_id", "label", "embedding"), model, maxPerCluster = 1)
    val q = ds.writeStream.format("memory").queryName("sbitext_drop")
      .outputMode("append").start()
    try {
      // all vectors of ONE quantizer cluster — they key to one group
      val (bits, buckets, roots) = model
      val byCluster = vecs.groupBy(r => StreamingBitext.assign(bits, buckets, roots, r._3))
      val (_, members) = byCluster.maxBy(_._2.size)
      assert(members.size >= 3, "need an over-cap cluster or the test is vacuous")
      mem.addData(members: _*)
      q.processAllAvailable()
      assert(dropped.value == members.size - 1,
        s"expected ${members.size - 1} drops at cap 1, counter read ${dropped.value}")
      // healthy path stays silent: re-run uncapped
      val mem2 = MemoryStream[(Long, Int, Array[Double])]
      val (ds2, dropped2) = StreamingBitext.candidatesCounted(spark,
        mem2.toDF.toDF("vec_id", "label", "embedding"), model)
      val q2 = ds2.writeStream.format("memory").queryName("sbitext_nodrop")
        .outputMode("append").start()
      try {
        mem2.addData(members: _*)
        q2.processAllAvailable()
        assert(dropped2.value == 0,
          s"uncapped run counted ${dropped2.value} drops")
      } finally q2.stop()
    } finally q.stop()
  }
}
