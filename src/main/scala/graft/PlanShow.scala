package graft

/** Dev tool: print the physical plan of named engine queries —
  * `runMain graft.PlanShow q_a,q_b [sfDir]`. Companion to PlanAudit's
  * one-line counts when a claim needs the actual operator tree
  * (WindowGroupLimit, TakeOrdered, join strategies). */
object PlanShow {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "ERROR")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.01")
    args.headOption.toSeq.flatMap(_.split(",")).foreach { n =>
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
