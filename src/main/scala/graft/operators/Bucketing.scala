package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the pre-shuffle technique for the
  * joins that recur at 100 TB.
  *
  * A fact table that is repeatedly joined on the same key (lineitem ⋈
  * orders on orderkey; events ⋈ events-derived dims) should be
  * *written* hash-bucketed on that key: both sides then arrive
  * pre-partitioned and pre-sorted, and Catalyst plans a sort-merge
  * join with ZERO exchanges — the shuffle is paid once at write time,
  * amortized over every subsequent join. (Parquet path + Hive-style
  * bucket metadata via `saveAsTable`; plain `save()` cannot carry
  * bucket info.)
  */
object Bucketing {

  /** Drop any prior managed table AND its warehouse directory: a
    * managed-table location left by a previous session (whose
    * in-memory catalog is gone) would otherwise fail the write with
    * LOCATION_ALREADY_EXISTS. */
  private def dropManaged(spark: SparkSession, table: String): Unit = {
    // the {warehouse.dir}/{name} location derivation below only holds
    // for unqualified names in the default database — a qualified
    // name would delete the wrong path before saveAsTable
    require(!table.contains("."),
      s"managed-table helpers require an unqualified default-database name, got '$table'")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // Hadoop Path handles unencoded/odd warehouse URIs and recursive
    // delete without the java.io null-listing pitfalls.
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
  }

  /** Dataset-scoped managed-table name: `base` plus the sanitized last
    * path segment of `dir`, so building the same query for two
    * datasets (or concurrently from two suites) never aliases one
    * managed table — a second build would otherwise silently repoint
    * the first build's lazy DataFrame at rewritten data. */
  def datasetTable(base: String, dir: String): String =
    base + "_" +
      new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_").toLowerCase

  /** Write `df` as a bucketed managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    writeBucketedMulti(df, table, Seq(key), buckets)

  /** Write `df` as a managed table hash-bucketed by `bucketKeys` and
    * sorted by `sortKeys` (which must extend `bucketKeys`) — the
    * layout for joins whose equi-keys extend the bucket key:
    * HashPartitioning on a PREFIX of the join keys still satisfies
    * the join's clustered distribution, so the bucketed side joins
    * with zero exchange while the other side shuffles to match. The
    * sort order covering the full join key keeps per-file min/max
    * stats tight (the merge-join still re-sorts partition-locally:
    * stock Spark distrusts bucket sort order unless the legacy
    * bucketedTableScan.outputOrdering flag is on). The pre-write
    * `repartition(buckets, bucketKeys)` makes each write task hold
    * exactly one bucket (repartition and bucketBy share the murmur3
    * `pmod` bucket function), so every bucket is ONE file — fewest
    * read tasks, and the layout the legacy ordering flag could
    * exploit. With `append = true` the rows
    * ADD to an existing table of the identical spec — the
    * incremental-manifest growth path: bucket-aligned file appends,
    * no table rewrite (buckets go multi-file, so appends trade the
    * sort elision away while keeping the zero-exchange property). */
  def writeBucketedMulti(df: DataFrame, table: String, bucketKeys: Seq[String],
      buckets: Int, sortKeys: Seq[String] = Nil,
      append: Boolean = false): Unit = {
    val sk = if (sortKeys.isEmpty) bucketKeys else sortKeys
    require(sk.startsWith(bucketKeys),
      s"sortKeys $sk must extend bucketKeys $bucketKeys")
    if (!append) dropManaged(df.sparkSession, table)
    df.repartition(buckets, bucketKeys.map(org.apache.spark.sql.functions.col): _*)
      .write
      .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(sk.head, sk.tail: _*)
      .mode(if (append) "append" else "overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write `df` as a Hive-partitioned managed table (one directory per
    * value of `part`) — the layout that makes partition pruning,
    * static AND dynamic, possible at all. The catalog preserves the
    * declared partition-column type (a plain `spark.read.parquet`
    * would re-infer it from directory names). */
  def writePartitioned(df: DataFrame, table: String, part: String): Unit = {
    dropManaged(df.sparkSession, table)
    df.write
      .partitionBy(part)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — exchange-free
    * when bucket counts match. The merge hint keeps the planner on
    * sort-merge (a broadcast pick would ignore the bucketing and hide
    * the zero-exchange property this operator exists for). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), key)
}
