package graft
import org.apache.spark.sql.functions._
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "ERROR")
    val df = graft.pipeline.Flagship.logToRequests(
      graft.pipeline.Flagship.synthLog(Tables(spark, "/root/testdata/sf0.001", "events")))
    val plan = df.queryExecution.executedPlan.toString
    println("CLFPARSE_COUNT=" + "clfparse".r.findAllIn(plan.toLowerCase).length)
    println("URILEMMA_COUNT=" + "urilemma".r.findAllIn(plan.toLowerCase).length)
    println("MEMORLIKE_COUNT=" + "memorlike".r.findAllIn(plan.toLowerCase).length)
    spark.stop()
  }
}
