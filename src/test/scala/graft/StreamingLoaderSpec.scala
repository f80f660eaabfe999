package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash
import graft.queries.{PipelineQueries, TextQueries}
import graft.streaming.StreamingPacker

/** Streaming twin of the composed `q_loader_pipeline` (gate →
  * epoch-shuffle → pack): the gate is stateless per-row work
  * (StreamingGateSpec's projection), the epoch-shuffle manifest is a
  * pure function of doc_id (seeded portable hash — computed ahead of
  * the epoch, exactly as a training run materializes its shuffle
  * before the loader consumes it), and the packer carries one long of
  * state per shard (StreamingPacker). This spec pins the COMPOSITION:
  * documents streamed through the gate, then consumed in the
  * manifest's permuted per-shard order across arbitrary micro-batch
  * splits, roll up to the identical (shard, seq_id, n_docs, n_tokens)
  * table as the batch query. */
class StreamingLoaderSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  test("gate -> shuffle manifest -> streamed pack equals q_loader_pipeline") {
    val expected = SparkEntry.queries("q_loader_pipeline")(spark, Sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    // ----- stage 1: the gate, STREAMED (same projection as the batch)
    val docs = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    implicit val sqlCtx = spark.sqlContext
    val gateIn = MemoryStream[(Long, String, String)]
    val gated = TextQueries.gateBitmask(
      gateIn.toDS().toDF("doc_id", "source", "text"))
    val gq = gated.writeStream.format("memory").queryName("loader_gate")
      .outputMode("append").start()
    val keptStreamed =
      try {
        val cuts = Seq(docs.length / 2, docs.length)
        var from = 0
        cuts.foreach { to =>
          gateIn.addData(docs.slice(from, to).toIndexedSeq: _*)
          gq.processAllAvailable()
          from = to
        }
        spark.table("loader_gate").where(col("keep"))
          .select("doc_id").as[Long].collect().toSet
      } finally gq.stop()

    // batch keep-set twin (the composed query's own gate)
    val docsDf = Tables(spark, Sf, "documents")
      .withColumn("toks", size(split(col("text"), "\\s+")).cast("long"))
    val keptBatch = TextQueries.gateSignals(docsDf, carry = Seq("toks"))
      .where(col("len_ok") && col("marker_ok") && col("rep_ok") &&
        col("pii_ok") && col("lr_ok"))
      .select(col("doc_id"), col("toks"))
      .as[(Long, Long)].collect()
    assert(keptStreamed === keptBatch.map(_._1).toSet)

    // ----- stage 2: the epoch-shuffle manifest — a pure per-row
    // function of doc_id, materialized ahead like a real epoch plan
    val hv = PortableHash.md5Long(
      concat(lit(s"${PipelineQueries.EpochSeed}:"), col("doc_id").cast("string")))
    val manifest = keptBatch.toSeq.toDF("doc_id", "toks")
      .withColumn("hv", hv)
      .withColumn("shard", (col("hv") % PipelineQueries.EpochShards).cast("int"))
      .select("shard", "hv", "doc_id", "toks")
      .as[(Int, Long, Long, Long)].collect()
      .sortBy { case (sh, h, id, _) => (sh, h, id) }
    // per-shard consumption rank — the loader's read order
    val ranked = manifest.groupBy(_._1).toSeq.flatMap { case (sh, rows) =>
      rows.zipWithIndex.map { case ((_, _, id, toks), r) =>
        (sh.toString, r.toLong, toks, id)
      }
    }
    // global feed order: rank-major so every shard's delivery is
    // ordered across batches (the packer's documented requirement)
    val feed = ranked.sortBy { case (sh, r, _, _) => (r, sh) }

    // ----- stage 3: the packer, STREAMED across 3 uneven batches
    val packIn = MemoryStream[(String, Long, Long)]
    val packed = StreamingPacker.pack(spark,
      packIn.toDS(), PipelineQueries.SeqBudget.toLong)
    val pq = packed.writeStream.format("memory").queryName("loader_pack")
      .outputMode("append").start()
    val streamed =
      try {
        val cuts = Seq(1, feed.length / 3, feed.length)
        var from = 0
        cuts.foreach { to =>
          packIn.addData(feed.slice(from, to).map(t => (t._1, t._2, t._3)): _*)
          pq.processAllAvailable()
          from = to
        }
        spark.table("loader_pack")
          .groupBy(col("shard"), col("seqId"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
          .collect()
          .map(r => (r.getString(0).toInt, r.getLong(1)) ->
            (r.getLong(2), r.getLong(3)))
          .toMap
      } finally pq.stop()

    assert(streamed.size === expected.size)
    assert(streamed === expected)
  }
}
