package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** At 100 TB the events table is laid out partitioned by date; a
  * time-bounded query must touch only the matching directories. This
  * pins that property: the physical plan carries the predicate as a
  * PartitionFilter and the scan reads only the selected partition's
  * rows.
  */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  test("date-partitioned layout prunes non-matching partitions at the scan") {
    val dir = Files.createTempDirectory("events_bydate").toString
    Tables(spark, Sf, "events")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(dir)

    val days = spark.read.parquet(dir).select("day").distinct().count()
    assert(days > 1, "need multiple partitions for the test to mean anything")

    val firstDay = spark.read.parquet(dir)
      .agg(min(col("day"))).head().getDate(0)
    val q = spark.read.parquet(dir).where(col("day") === lit(firstDay))

    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["),
      "scan must carry the day predicate as a partition filter")
    assert(!plan.replaceAll("(?s)PartitionFilters: \\[[^\\]]*\\]", "")
      .contains("PushedFilters: [IsNotNull(day)"),
      "day predicate must not degrade to a data filter")

    // the pruned read returns exactly that day's rows
    val expected = Tables(spark, Sf, "events")
      .where(to_date(col("ts")) === lit(firstDay)).count()
    assert(q.count() == expected)
  }
}
