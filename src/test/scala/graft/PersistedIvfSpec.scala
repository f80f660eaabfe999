package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityQueries

/** The persisted IVF index: durable partitioned posting lists whose
  * serving scan reads ONLY the probed cells, returning the identical
  * rows to the in-memory trained-IVF plan. */
class PersistedIvfSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("persisted-index serving equals the in-memory trained-IVF plan " +
      "row-for-row (same model, same probe rule, same rerank)") {
    val persisted = SimilarityQueries.knnIvfPersisted(spark, TestSpark.Sf)
      .as[(Long, Long, Int, Double)].collect().toSeq
    val inMemory = SimilarityQueries.knnIvfTrained(spark, TestSpark.Sf)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(persisted.nonEmpty)
    assert(persisted == inMemory)
  }

  test("the serving scan partition-prunes to the probed cells: a " +
      "nonempty PartitionFilters on the store scan, and the store " +
      "layout is one directory per cell") {
    val df = SimilarityQueries.knnIvfPersisted(spark, TestSpark.Sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // the store scan must carry the literal cell filter as a PARTITION
    // filter (pruned at file listing), not only a data filter
    assert(plan.contains("PartitionFilters: ["),
      "no PartitionFilters on any scan — the store is not partitioned")
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      "no nonempty PartitionFilters — the cell filter did not prune")
    // layout: the newest store version has one list=<cell> directory
    // per trained cell
    val root = new java.io.File(
      graft.operators.DedupManifest.path(spark, "ivf", TestSpark.Sf))
    val newest = root.listFiles().filter(_.isDirectory)
      .filter(_.getName.matches("v\\d+"))
      .maxBy(_.getName.drop(1).toLong)
    val cellDirs = newest.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("list=")).toSeq
    assert(cellDirs.nonEmpty && cellDirs.size <= 16,
      s"unexpected cell layout: $cellDirs")
  }

  test("incremental base+delta: the stores partition the corpus (base = " +
      "prior ids, delta = new ids on frozen centroids), BOTH serving " +
      "scans prune, and a rebuild serves identically") {
    import graft.operators.DedupManifest
    val r1 = SimilarityQueries.knnIvfIncremental(spark, TestSpark.Sf)
      .as[(Long, Long, Int, Double)].collect().toSeq
    val df2 = SimilarityQueries.knnIvfIncremental(spark, TestSpark.Sf)
    val r2 = df2.as[(Long, Long, Int, Double)].collect().toSeq
    assert(r1.nonEmpty && r1 == r2,
      "a rebuild (fresh store versions) changed the served answers")
    // both the base and the delta scan carry a nonempty partition filter
    val plan = df2.queryExecution.executedPlan.toString
    val pruned = "PartitionFilters: \\[[^\\]]".r.findAllIn(plan).size
    assert(pruned >= 2, s"expected both stores pruned, found $pruned:\n$plan")
    // store contents: base holds exactly the prior ids, delta exactly
    // the new batch, disjoint, covering the corpus
    val all = Tables(spark, TestSpark.Sf, "embeddings")
      .select(col("vec_id")).as[Long].collect().toSet
    val split = (4L * all.size + 4L) / 5L
    val baseIds = DedupManifest.read(spark,
        DedupManifest.path(spark, "ivfbase", TestSpark.Sf))
      .select(col("vec_id")).as[Long].collect().toSet
    val deltaIds = DedupManifest.read(spark,
        DedupManifest.path(spark, "ivfdelta", TestSpark.Sf))
      .select(col("vec_id")).as[Long].collect().toSet
    assert(baseIds == all.filter(_ < split), "base != prior corpus")
    assert(deltaIds == all.filter(_ >= split), "delta != new batch")
    // new vectors are actually retrievable through the incremental
    // index: serving with the delta REMOVED must lose at least one
    // answer (the index didn't silently ignore the new batch)
    assert(r1.exists { case (_, nId, _, _) => deltaIds.contains(nId) },
      "no served neighbor comes from the delta — the new batch is " +
        "invisible to queries (weak corpus? widen the check)")
  }

  test("compaction is invisible to serving: base ∪ delta re-persisted " +
      "as ONE store answers identically to the live base+delta union") {
    import graft.operators.DedupManifest
    val live = SimilarityQueries.knnIvfIncremental(spark, TestSpark.Sf)
      .as[(Long, Long, Int, Double)].collect().toSeq
    // cell membership is final at assignment time, so compaction is
    // the same persist call over the union — file movement only
    def cells(tag: String) = DedupManifest.read(spark,
        DedupManifest.path(spark, tag, TestSpark.Sf))
      .select(col("list").cast("int").as("list"), col("vec_id"), col("v"))
    val compacted = DedupManifest.persistPartitioned(
        cells("ivfbase").union(cells("ivfdelta")),
        DedupManifest.path(spark, "ivfcompact", TestSpark.Sf), Seq("list"))
      .select(col("list").cast("int").as("list"), col("vec_id"), col("v"))
    // frozen centroids: re-derive the prior-trained model exactly as
    // the incremental build does (KMeans is deterministic)
    val split = (4L * Tables(spark, TestSpark.Sf, "embeddings").count() + 4L) / 5L
    val prior = SimilarityQueries.vectors(spark, TestSpark.Sf)
      .where(col("vec_id") < split)
    val (_, cents, _) = graft.operators.KMeans.fit(
      prior.select(col("vec_id"), col("v")), k = 16, maxIter = 5)
    val served = SimilarityQueries.ivfServe(compacted, cents,
        SimilarityQueries.ivfQueries(spark, TestSpark.Sf))
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(live.nonEmpty && served == live,
      "compaction changed served answers")
  }

  test("STREAMED serving over the persisted index equals the batch " +
      "query across micro-batch splits (per-query independence — the " +
      "StreamingRerank stance)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val batch = SimilarityQueries.knnIvfPersisted(spark, TestSpark.Sf)
      .as[(Long, Long, Int, Double)].collect().toSeq
    val qs = SimilarityQueries.ivfQueries(spark, TestSpark.Sf).toSeq
    assert(qs.size >= 3, "need several queries or the split is vacuous")
    val mem = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Double)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sivf").toString
    val q = graft.streaming.StreamingIvf.start(spark,
        mem.toDF.toDF("vec_id", "v"), TestSpark.Sf, ckpt) { out =>
      got ++= out.as[(Long, Long, Int, Double)].collect()
    }
    try {
      qs.grouped(qs.size / 3 + 1).foreach { g =>
        mem.addData(g: _*)
        q.processAllAvailable()
      }
      assert(got.sortBy(r => (r._1, r._3)).toSeq ==
        batch.sortBy(r => (r._1, r._3)),
        "streamed serving diverged from the batch index answers")
    } finally q.stop()
  }
}
