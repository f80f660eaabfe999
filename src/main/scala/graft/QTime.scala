package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries. Usage:
  * `runMain graft.QTime <sfDir> <name> [name...]` — each query runs
  * twice (warm-up + timed). */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.local(logLevel = "ERROR")
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"QTIME $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
