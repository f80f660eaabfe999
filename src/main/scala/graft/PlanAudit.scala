package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: one-line plan-shape summary per query (exchanges,
  * broadcasts, scan column widths) — the scale audit from SURVEY.
  * Usage: runMain graft.PlanAudit [sfDir] [name1,name2,...]
  * (dir defaults to sf0.01; the name filter lets a single family be
  * re-audited at another SF, e.g. TPC-H at sf0.1 to see which joins
  * the size-based broadcast choice keeps without hints). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(p).length
        val exch = c("Exchange (hash|range)partitioning")
        val bcast = c("BroadcastExchange")
        val scans = c("Scan parquet")
        val pushed = c("PushedFilters: \\[[^\\]]")
        println(f"AUDIT $name%-26s scans=$scans pushedScans=$pushed shuffles=$exch broadcasts=$bcast")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
