package graft

import org.scalatest.funsuite.AnyFunSuite

/** The materialization fence (graft.Fence) must be a pure
  * mode-selection seam: `reliable` (cluster-survivable
  * `Dataset.checkpoint`) and the default `local`
  * (`localCheckpoint`) produce bit-identical results on
  * representative fence-heavy queries — iterative rank loops,
  * inverted-index builds, sketch cuts, and the ER match graph. The
  * executor-loss behavior difference the seam exists for is
  * demonstrated on a real multi-JVM cluster by ChaosProbe. */
class FenceSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private val Queries =
    Seq("q_pagerank", "q_dedup_pipeline", "q_sketch_kmv_intersect",
      "q_entity_resolution")

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, Sf).collect()
      .map(_.toString).sorted.toIndexedSeq

  test("reliable checkpoints == local checkpoints, bit for bit") {
    val local = Queries.map(q => q -> run(q)).toMap
    spark.conf.set("spark.graft.fence", "reliable")
    try Queries.foreach { q =>
      assert(run(q) == local(q), s"$q diverged between fence modes")
    } finally spark.conf.unset("spark.graft.fence")
    // and the reliable mode actually wrote through the checkpoint dir
    val dir = spark.sparkContext.getCheckpointDir
    assert(dir.isDefined, "reliable mode never set a checkpoint dir")
    val files = new java.io.File(new java.net.URI(dir.get).getPath).listFiles()
    assert(files != null && files.nonEmpty, s"no checkpoint data under $dir")
  }

  test("freeing a superseded reliable fence deletes its checkpoint files") {
    import graft.Fence.FenceOps
    spark.conf.set("spark.graft.fence", "reliable")
    try {
      val fenced = spark.range(0, 1000).toDF("id").fenced()
      assert(fenced.count() == 1000)
      val ckptDirs = fenced.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
      }.flatMap(_.getCheckpointFile)
      assert(ckptDirs.nonEmpty, "reliable fence left no checkpoint file")
      val paths = ckptDirs.map(d => new java.io.File(new java.net.URI(d).getPath))
      assert(paths.forall(_.exists))
      // iterative operators reclaim superseded rounds through this —
      // for a reliable fence it must delete the FILES, not just
      // unpersist blocks (the unbounded-checkpoint-FS-growth bug)
      org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(fenced)
      assert(paths.forall(!_.exists()), "checkpoint files leaked after free")
    } finally spark.conf.unset("spark.graft.fence")
  }
}
