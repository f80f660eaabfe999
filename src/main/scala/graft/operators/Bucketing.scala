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

  /** Write `df` as a bucketed managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — exchange-free
    * when bucket counts match. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
