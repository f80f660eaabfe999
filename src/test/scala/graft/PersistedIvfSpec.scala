package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityQueries

/** The persisted IVF index: durable partitioned posting lists whose
  * serving scan reads ONLY the probed cells, returning the identical
  * rows to the in-memory trained-IVF plan. */
class PersistedIvfSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("persisted-index serving equals the in-memory trained-IVF plan " +
      "row-for-row (same model, same probe rule, same rerank)") {
    val persisted = SimilarityQueries.knnIvfPersisted(spark, TestSpark.Sf)
      .as[(Long, Long, Int, Double)].collect().toSeq
    val inMemory = SimilarityQueries.knnIvfTrained(spark, TestSpark.Sf)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(persisted.nonEmpty)
    assert(persisted == inMemory)
  }

  test("the serving scan partition-prunes to the probed cells: a " +
      "nonempty PartitionFilters on the store scan, and the store " +
      "layout is one directory per cell") {
    val df = SimilarityQueries.knnIvfPersisted(spark, TestSpark.Sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // the store scan must carry the literal cell filter as a PARTITION
    // filter (pruned at file listing), not only a data filter
    assert(plan.contains("PartitionFilters: ["),
      "no PartitionFilters on any scan — the store is not partitioned")
    assert("PartitionFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      "no nonempty PartitionFilters — the cell filter did not prune")
    // layout: the newest store version has one list=<cell> directory
    // per trained cell
    val root = new java.io.File(
      graft.operators.DedupManifest.path(spark, "ivf", TestSpark.Sf))
    val newest = root.listFiles().filter(_.isDirectory)
      .filter(_.getName.matches("v\\d+"))
      .maxBy(_.getName.drop(1).toLong)
    val cellDirs = newest.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("list=")).toSeq
    assert(cellDirs.nonEmpty && cellDirs.size <= 16,
      s"unexpected cell layout: $cellDirs")
  }
}
