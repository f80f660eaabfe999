package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted physical plans for plan-shape audits. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "ERROR")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    args.headOption match {
      case Some(names) => names.split(",").foreach { n =>
        println(s"===== $n =====")
        println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      case None => ()
    }
    spark.stop()
  }
}
