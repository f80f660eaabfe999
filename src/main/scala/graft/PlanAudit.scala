package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: one-line plan-shape summary per query (exchanges,
  * broadcasts, scan column widths) — the scale audit from SURVEY. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "ERROR")
    val d = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
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
