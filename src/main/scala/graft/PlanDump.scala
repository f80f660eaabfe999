package graft

/** Dev tool: write `.explain("formatted")` output for named queries to
  * files — `runMain graft.PlanDump <outDir> <suffix> q_a,q_b [sfDir]`.
  * Writes `<outDir>/<query>_<suffix>.txt` per query; `all` dumps the
  * whole registry. The optimization-round evidence files under
  * `plans/rNN/` are produced by this main. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names =
      if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    val d = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local("8", "ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir)): Unit
    names.foreach { n =>
      val txt =
        try SparkEntry.queries(n)(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
