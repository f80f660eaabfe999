package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev tool: run one query and print the executed plan's per-operator
  * metrics (the SQL-tab view, headless) — `runMain graft.QMetrics
  * <sfDir> <name>`. Prints every operator with its numOutputRows and
  * any time-valued metrics, so "which operator is eating the wall"
  * has a measured answer instead of a guess. */
object QMetrics {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = Sessions.local(logLevel = "ERROR")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm-up
    val df = fn(spark, sfDir)
    val t0 = System.nanoTime()
    df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"QMETRICS $name wall=$wall%.2fs")
    def walk(p: SparkPlan, depth: Int): Unit = {
      val finalP = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val ms = finalP.metrics.toSeq
        .filter { case (_, m) => m.value > 0 }
        .sortBy(_._1)
        .map { case (k, m) =>
          val v = if (m.metricType == "nsTiming") s"${m.value / 1000000}ms"
            else if (m.metricType == "timing") s"${m.value}ms"
            else m.value.toString
          s"$k=$v"
        }.mkString(" ")
      println("  " * depth + finalP.nodeName + " " + ms)
      finalP.children.foreach(walk(_, depth + 1))
      finalP.subqueries.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
