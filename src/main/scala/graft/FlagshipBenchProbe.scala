package graft

/** Dev tool: isolated repeated-run timing for the bench queries whose
  * round-4→5 driver numbers drifted with NO code change (q_flagship
  * 1.19→1.68 s; driver-side q_topk_per_group / q_token_budget swings
  * the repo snapshot did not reproduce). Runs each query N times warm
  * in a FRESH session doing nothing else — if isolated times sit at
  * the round-4 level while the 164-query bench reads higher, the
  * delta is harness pressure (JIT/codegen cache + block-manager churn
  * across ~380 query executions per bench JVM), not a plan
  * regression. Results recorded in PLANS.md.
  * Usage: runMain graft.FlagshipBenchProbe [sfDir] [n] [query...]
  * (query names default to the round-5 drift trio; pass names to
  * adjudicate any BenchGate flag in isolation)
  */
object FlagshipBenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.local(logLevel = "ERROR")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("q_flagship", "q_flagship_hidx", "q_pagerank")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.001").count(): Unit // JIT/codegen warm
      val times = (1 to n).map { _ =>
        val priorRdds = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        fn(spark, sfDir).count(): Unit
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => priorRdds.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
        t
      }
      println(f"FLAGSHIPBENCH $name%-18s n=$n min=${times.min}%5.2f " +
        f"median=${times.sorted.apply(n / 2)}%5.2f max=${times.max}%5.2f " +
        times.map(t => f"$t%4.2f").mkString("runs=[", ",", "]"))
    }
    spark.stop()
  }
}
