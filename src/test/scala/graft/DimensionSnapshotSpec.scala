package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DimensionSnapshot

/** T5 — the pinned-snapshot consistency guarantee (`wbdb.clj:51-67`):
  * a version is materialized before publication (no lazy re-read of
  * the mutable source), the swap is atomic, and every streaming
  * micro-batch joins exactly one dimension version. */
class DimensionSnapshotSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("a published version is immune to source mutation until refresh") {
    var source = Seq(("a", 1L), ("b", 2L))
    val snap = new DimensionSnapshot(() => source.toDF("lemma", "freq"))
    val v0 = snap.pinned
    source = Seq(("a", 10L), ("b", 20L), ("c", 30L))
    // v0 was materialized with truncated lineage: still the old rows
    assert(v0.select("lemma", "freq").as[(String, Long)].collect().toSet ==
      Set(("a", 1L), ("b", 2L)))
    assert(snap.version == 0L)
    assert(snap.refresh() == 1L)
    assert(snap.pinned.count() == 3)
    assert(snap.pinned.select(max(col("dim_version"))).head().getLong(0) == 1L)
    // the superseded version stays usable through the grace window
    assert(v0.count() == 2)
  }

  test("superseded versions release their blocks (not just a CacheManager no-op)") {
    var n = 1L
    val snap = new DimensionSnapshot(() => {
      n += 1; Seq(("a", n)).toDF("lemma", "freq")
    })
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 5).foreach(_ => snap.refresh())
    // live = current + one grace-window version; everything older must
    // have been unpersisted through the bridge (Dataset.unpersist
    // alone would leave all 6 versions pinned)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 2, s"leaked checkpoint blocks: $before -> $after")
  }

  test("load failure during refresh keeps the working version") {
    var fail = false
    var rows = Seq(("a", 1L))
    val snap = new DimensionSnapshot(() => {
      if (fail) sys.error("dimension db down")
      rows.toDF("lemma", "freq")
    })
    fail = true
    intercept[RuntimeException](snap.refresh())
    assert(snap.version == 0L && snap.pinned.count() == 1) // old version intact
    fail = false; rows = Seq(("a", 1L), ("b", 2L))
    assert(snap.refresh() == 1L && snap.pinned.count() == 2)
  }

  test("streaming: each micro-batch joins exactly one dimension version") {
    implicit val sqlCtx = spark.sqlContext
    var freq = 1L
    val snap = new DimensionSnapshot(() =>
      Seq(("Haus", freq), ("Baum", freq + 1)).toDF("lemma", "freq"))
    val base = java.nio.file.Files.createTempDirectory("dimsnap").toString
    val mem = MemoryStream[String]
    val q = snap.enrichTo(mem.toDF.toDF("lemma"), s"$base/out", s"$base/ckpt")
    try {
      mem.addData("Haus", "Baum", "Haus")
      q.processAllAvailable()
      freq = 100L
      snap.refresh() // swap BETWEEN batches
      mem.addData("Baum", "anderes")
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
      // no epoch mixes versions
      val perEpoch = out.groupBy(col("epoch"))
        .agg(countDistinct(col("dim_version")).as("nv"),
          max(col("dim_version")).as("v"))
        .collect().map(r => (r.getAs[Long]("nv"), r.getAs[Long]("v"))).toSeq
      assert(perEpoch.forall(_._1 == 1L))
      assert(perEpoch.map(_._2).toSet == Set(0L, 1L))
      // and the enrichment values come from the pinned version
      assert(out.where(col("dim_version") === 0 && col("lemma") === "Haus")
        .select("freq").as[Long].collect().forall(_ == 1L))
      assert(out.where(col("dim_version") === 1 && col("lemma") === "Baum")
        .select("freq").as[Long].collect().forall(_ == 101L))
      // left join: the unknown lemma survives with null enrichment
      assert(out.where(col("lemma") === "anderes").count() == 1)
    } finally q.stop()
  }
}
