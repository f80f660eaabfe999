package graft
object JobFloor {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(logLevel = "ERROR")
    val sc = spark.sparkContext
    val rdd = sc.parallelize(1 to 2, 1)
    (1 to 20).foreach(_ => rdd.count())
    var t0 = System.nanoTime()
    (1 to 100).foreach(_ => rdd.count())
    println(f"pure RDD 1-task job: ${(System.nanoTime()-t0)/1e9/100*1000}%.2f ms/job")
    val rdd32 = sc.parallelize(1 to 64, 32)
    (1 to 20).foreach(_ => rdd32.count())
    t0 = System.nanoTime()
    (1 to 100).foreach(_ => rdd32.count())
    println(f"pure RDD 32-task job: ${(System.nanoTime()-t0)/1e9/100*1000}%.2f ms/job")
    import spark.implicits._
    val df = spark.range(2)
    df.count()
    t0 = System.nanoTime()
    (1 to 50).foreach(_ => df.count())
    println(f"same-DF re-count (replans): ${(System.nanoTime()-t0)/1e9/50*1000}%.2f ms")
    // cached plan: execute the same physical plan's RDD directly
    val plan = df.queryExecution.executedPlan
    t0 = System.nanoTime()
    (1 to 50).foreach(_ => plan.execute().count())
    println(f"pre-planned execute().count: ${(System.nanoTime()-t0)/1e9/50*1000}%.2f ms")
    spark.stop()
  }
}
