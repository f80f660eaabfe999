package graft

import org.apache.spark.sql.functions._

/** Dev probe: does a fenced (localCheckpoint'd) frame keep its
  * HashPartitioning through LogicalRDD in this Spark version, and
  * does AQE coalescing interfere? Prints the physical plan of a
  * groupBy over a repartitioned-then-fenced frame under several
  * settings. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "ERROR")
    import spark.implicits._
    val df = (1 to 100000).map(i => (i % 997L, i.toLong)).toDF("k", "v")

    def probe(tag: String): Unit = {
      val fenced = df.repartition(col("k")).localCheckpoint()
      val agg = fenced.groupBy(col("k")).agg(sum(col("v")))
      val plan = agg.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      println(s"PARTPROBE $tag exchanges=$nEx " +
        s"scanPart=${fenced.queryExecution.optimizedPlan.collectFirst {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.outputPartitioning
        }.getOrElse("?")}")
    }

    probe("default")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    probe("aqe-off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    probe("aqe-on-nocoalesce")
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")

    // fence under AQE-off, consume under AQE-on — the split the
    // operators would actually use
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val fenced = df.repartition(col("k")).localCheckpoint()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val agg = fenced.groupBy(col("k")).agg(sum(col("v")))
    agg.write.format("noop").mode("overwrite").save()
    val plan = agg.queryExecution.executedPlan.toString
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    println(s"PARTPROBE split-fence exchanges=$nEx")
    spark.stop()
  }
}
