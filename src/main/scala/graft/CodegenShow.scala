package graft

/** Dev tool: print whole-stage-codegen structure and generated method
  * sizes for a named query (JIT refuses methods > 8000 bytecode — a
  * fused stage past that runs interpreted and is SLOWER than a split
  * one). Usage: runMain graft.CodegenShow <query> [sfDir]
  */
object CodegenShow {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_flagship")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local(logLevel = "ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // execute THIS queryExecution's plan (df.count() would build a
    // new one, leaving this AQE tree unmaterialized and codegen-less)
    df.queryExecution.executedPlan.executeCollect(): Unit
    // full descent through AQE wrappers — they report children = Nil
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def descend(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => descend(a.executedPlan)
      case qs: QueryStageExec => descend(qs.plan)
      case other => other.children.flatMap(descend)
    }) :+ p
    val all = descend(df.queryExecution.executedPlan)
    val wscg = all.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    println(s"CODEGEN ${wscg.length} WholeStageCodegen stages; " +
      s"plan nodes: ${all.map(_.nodeName).distinct.mkString(", ")}")
    wscg.foreach { w =>
      val (_, code) = w.doCodeGen()
      val size = try org.apache.spark.sql.catalyst.expressions.codegen
        .CodeGenerator.compile(code)._2 catch { case e: Throwable => -1 }
      println(s"CODEGEN stage#${w.codegenStageId} maxMethodCodeSize=$size " +
        w.child.toString.linesIterator.next().take(100))
    }
    spark.stop()
  }
}
