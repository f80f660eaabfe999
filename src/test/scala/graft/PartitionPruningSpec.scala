package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** At 100 TB the events table is laid out partitioned by date; a
  * time-bounded query must touch only the matching directories. This
  * pins that property: the physical plan carries the day predicate as
  * a PartitionFilter and the scan reads only that partition's files.
  */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  test("date-partitioned layout prunes non-matching partitions at the scan") {
    val dir = Files.createTempDirectory("events_bydate").toString
    try {
      Tables(spark, Sf, "events")
        .withColumn("day", to_date(col("ts")))
        .write.partitionBy("day").mode("overwrite").parquet(dir)

      val all = spark.read.parquet(dir)
      val days = all.select("day").distinct().count()
      assert(days > 1, "need multiple partitions for the test to mean anything")

      val firstDay = all.agg(min(col("day"))).head().getDate(0)
      val q = spark.read.parquet(dir).where(col("day") === lit(firstDay))

      // the predicate must appear INSIDE the partition-filter list
      // (an empty "PartitionFilters: []" must not satisfy the check)
      val plan = q.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(plan).isDefined,
        s"day predicate missing from PartitionFilters in:\n$plan")

      // execute the PROBED plan instance itself (q.count() would build
      // a separate QueryExecution whose metrics we can't reach), then
      // read its scan metrics: pruning is physical — strictly fewer
      // files than the layout holds. (DataFrame.inputFiles is
      // pre-pruning, so it cannot serve as the probe.)
      val exec = q.queryExecution.executedPlan
      val rows = exec.executeCollect().length
      val expected = Tables(spark, Sf, "events")
        .where(to_date(col("ts")) === lit(firstDay)).count()
      assert(rows == expected)
      import org.apache.spark.sql.execution.FileSourceScanExec
      val scan = exec.collect { case f: FileSourceScanExec => f }.head
      val filesRead = scan.metrics("numFiles").value
      assert(filesRead > 0 && filesRead < all.inputFiles.length,
        s"pruned scan read $filesRead files of ${all.inputFiles.length}")
    } finally {
      def rm(f: java.io.File): Unit = {
        val children = f.listFiles()
        if (children != null) children.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("dim-filtered join prunes fact partitions dynamically (DPP)") {
    val q = SparkEntry.queries("q_join_dpp")(spark, Sf)
    // the surviving years are only knowable from the dim's rows, so
    // the fact scan's partition filter must be a runtime one
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamicpruningexpression in fact scan plan:\n$plan")
    // physical check: execute the probed plan instance and confirm the
    // scan touched fewer partition directories than the layout holds
    val exec = q.queryExecution.executedPlan
    val rows = exec.executeCollect().length
    import org.apache.spark.sql.functions.{col, year}
    val expected = Tables(spark, Sf, "orders")
      .where(year(col("o_orderdate")).isin(1995, 1996)).count()
    assert(rows == expected && rows > 0)
    // AQE hides materialized subtrees behind AdaptiveSparkPlanExec and
    // QueryStageExec (both children = Nil), so descend through them
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case qs: QueryStageExec => allScans(qs.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    // select by partition schema — the metadata map always carries a
    // "PartitionFilters" key (rendered "[]" when empty), so a
    // string-nonEmpty check would match every scan including the
    // unpartitioned orders scan feeding the dim
    val factScan = allScans(exec)
      .filter(_.relation.partitionSchema.nonEmpty)
    assert(factScan.nonEmpty, "no partitioned fact scan found")
    val totalYears = spark.table(graft.operators.Bucketing.datasetTable("pq_orders", Sf))
      .select("o_year").distinct().count()
    val readPartitions = factScan.head.metrics.get("numPartitions")
      .map(_.value).getOrElse(-1L)
    assert(readPartitions > 0 && readPartitions < totalYears,
      s"DPP read $readPartitions of $totalYears partitions")
  }
}
