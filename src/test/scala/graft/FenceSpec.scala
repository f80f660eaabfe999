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

  test("withCount: frame ≡ plain fence, count exact, in BOTH modes") {
    import graft.Fence.FenceOps
    import org.apache.spark.sql.functions._
    // a frame with a shuffle + filter so the fenced plan is not a
    // trivial scan (the shape the iterative operators fence)
    def frame() = spark.range(0, 1000).toDF("id")
      .select(col("id"), pmod(col("id") * 37, lit(101)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .where(col("k") % 2 === 0)
    val expectRows = frame().collect().map(_.toString).sorted.toIndexedSeq
    for (mode <- Seq("local", "reliable")) {
      spark.conf.set("spark.graft.fence", mode)
      try {
        val (fenced, n) = Fence.withCount(frame())
        assert(n == expectRows.length.toLong,
          s"$mode: withCount count $n != ${expectRows.length}")
        val got = fenced.collect().map(_.toString).sorted.toIndexedSeq
        assert(got == expectRows, s"$mode: withCount frame diverged")
        // the frame is a real fence: lineage cut to a LogicalRDD leaf,
        // reusable and freeable like any .fenced() output
        val rdds = fenced.queryExecution.analyzed.collect {
          case r: org.apache.spark.sql.execution.LogicalRDD => r
        }
        assert(rdds.nonEmpty, s"$mode: withCount did not produce a LogicalRDD")
        assert(fenced.schema == frame().schema, s"$mode: schema changed")
        org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(fenced)
      } finally spark.conf.unset("spark.graft.fence")
    }
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
