package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingEmbedDedup

/** Streaming embedding near-dup detection ≡ the batch
  * `q_dedup_embed_lsh` pairs (ids AND 4-decimal sims) on the same
  * vectors, across micro-batch splits; plus replay idempotence and
  * the bounded-bucket drop semantics. */
class StreamingEmbedDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def vecs: Seq[(Long, Int, Array[Double])] =
    Tables(spark, TestSpark.Sf, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>"))
      .as[(Long, Int, Array[Double])].collect().toSeq.sortBy(_._1)

  test("streamed pair set equals batch q_dedup_embed_lsh across micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Int, Array[Double])]
    val q = StreamingEmbedDedup.pairs(spark,
        mem.toDF.toDF("vec_id", "label", "embedding"))
      .writeStream.format("memory").queryName("sembed")
      .outputMode("append").start()
    try {
      val v = vecs
      val groups = v.grouped(v.length / 3 + 1).toSeq
      groups.foreach { g =>
        mem.addData(g: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("sembed")
        .select(col("a_id"), col("b_id"), col("sim"))
        .as[(Long, Long, Double)].collect().toSeq
      val batch = SparkEntry.queries("q_dedup_embed_lsh")(spark, TestSpark.Sf)
        .as[(Long, Long, Double)].collect().toSeq
      assert(batch.nonEmpty)
      // k-fold emission for k shared bands, deduped downstream (the
      // operator's documented contract): distinct sets equal, sims
      // included — the stream's l→r cosine + HALF_UP rounding must
      // match the batch kernel exactly
      assert(streamed.distinct.sorted == batch.sorted)
    } finally q.stop()
  }

  test("a re-sent vector emits no self or duplicate pairs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Int, Array[Double])]
    val q = StreamingEmbedDedup.pairs(spark,
        mem.toDF.toDF("vec_id", "label", "embedding"))
      .writeStream.format("memory").queryName("sembed_re")
      .outputMode("append").start()
    try {
      val a = (1L, 0, Array.fill(64)(1.0))
      val b = (2L, 0, Array.fill(64)(1.0)) // identical → cos 1.0
      mem.addData(a, b)
      q.processAllAvailable()
      mem.addData(a) // replay of a known vector
      q.processAllAvailable()
      val pairs = spark.table("sembed_re")
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSeq
      assert(pairs.distinct == Seq((1L, 2L))) // replay adds NO new pairs
    } finally q.stop()
  }

  test("maxPerBucket caps state: overflow vectors verify but are not stored") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Int, Array[Double])]
    val q = StreamingEmbedDedup.pairs(spark,
        mem.toDF.toDF("vec_id", "label", "embedding"), maxPerBucket = 1)
      .writeStream.format("memory").queryName("sembed_cap")
      .outputMode("append").start()
    try {
      // three identical vectors land in the same buckets; with cap 1
      // only the first-arriving is resident, so later ones pair with
      // IT but never with each other
      def ident(id: Long) = (id, 0, Array.fill(64)(1.0))
      mem.addData(ident(1))
      q.processAllAvailable()
      mem.addData(ident(2))
      q.processAllAvailable()
      mem.addData(ident(3))
      q.processAllAvailable()
      val pairs = spark.table("sembed_cap")
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSeq
      assert(pairs.distinct.toSet == Set((1L, 2L), (1L, 3L)),
        s"cap=1 must drop (2,3): got $pairs")
    } finally q.stop()
  }

  test("streaming cos is bit-identical to the CosineSim kernel, incl. unequal lengths") {
    // the stream/batch sim equality is load-bearing (pairs dedup on
    // the rounded sim), so pin the two loops to each other directly —
    // any accumulation-order or length-stance drift fails here before
    // it can show up as a .00005-grid divergence in the pair sets
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(200)((
      Array.fill(1 + rnd.nextInt(64))(rnd.nextDouble() * 2 - 1),
      Array.fill(1 + rnd.nextInt(64))(rnd.nextDouble() * 2 - 1)))
    cases.foreach { case (a, b) =>
      val viaExpr = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.GraftExpressions.cosine_sim(col("a"), col("b")))
        .as[Double].head()
      val viaStream = StreamingEmbedDedup.cos(a, b)
      assert(java.lang.Double.doubleToRawLongBits(viaExpr) ==
        java.lang.Double.doubleToRawLongBits(viaStream),
        s"cos drift: expr=$viaExpr stream=$viaStream lens=${a.length}/${b.length}")
    }
  }

  test("a NULL embedding is dropped in the stateless prefix, not a query killer") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Int, Option[Array[Double]])]
    val q = StreamingEmbedDedup.pairs(spark,
        mem.toDF.toDF("vec_id", "label", "embedding"))
      .writeStream.format("memory").queryName("sembed_null")
      .outputMode("append").start()
    try {
      val v = Array.fill(64)(0.5)
      mem.addData((1L, 0, Some(v)), (2L, 0, None), (3L, 0, Some(v)))
      q.processAllAvailable()
      val pairs = spark.table("sembed_null")
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSeq
      assert(pairs.distinct.toSet == Set((1L, 3L)),
        s"null embedding must drop silently (batch-twin semantics): got $pairs")
    } finally q.stop()
  }
}
