package graft

/** Dev tool: run one registry query and print its rows. Usage:
  * `runMain graft.RunQuery <sfDir> <name> [maxRows]` */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val maxRows = if (args.length > 2) args(2).toInt else 50
    val spark = Sessions.local(logLevel = "ERROR")
    SparkEntry.queries(name)(spark, sfDir).show(maxRows, truncate = false)
    spark.stop()
  }
}
