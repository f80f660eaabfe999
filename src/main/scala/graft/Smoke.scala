package graft

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke: `entry` must return rows
  * on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, truncate = false)
    println("QUERIES=" + SparkEntry.queries.size +
      " ORACLES=" + SparkEntry.oracleSql.size)
    val lines = graft.pipeline.Flagship.synthLog(
      Tables(spark, "/root/testdata/sf0.001", "events"))
    println("KEPT=" + graft.pipeline.Flagship.logToRequests(lines).count() +
      " REJECTED=" + graft.pipeline.Flagship.rejectedLines(lines).count() +
      " TOTAL=" + lines.count())
    spark.stop()
  }
}
