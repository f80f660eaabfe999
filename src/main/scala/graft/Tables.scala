package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read parquet
  * from it — scans are vectorized, column-pruned and filter-pushed by
  * Catalyst, so the same code path works unchanged from sf0.001 to a
  * 100 TB lake (partition count follows file splits via
  * `spark.sql.files.maxPartitionBytes`).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTimestamps(load(spark, dir, name))

  /** The engine must not depend on the parquet writer's physical
    * timestamp annotation (isAdjustedToUTC true/false, µs/ns unit):
    * the same logical testdata has shipped as TIMESTAMP(NANOS),
    * TIMESTAMP(MICROS, adjusted) and TIMESTAMP(MICROS, naive) across
    * generator versions. Every query computes on session-TZ
    * TimestampType, so cast any TIMESTAMP_NTZ column up front — the
    * session TZ is pinned to UTC, making the cast a pure annotation
    * change (identical micros), and time functions like `unix_micros`
    * that reject NTZ analyze cleanly. */
  private def normalizeTimestamps(df: DataFrame): DataFrame =
    if (!df.schema.exists(_.dataType == TimestampNTZType)) df
    else df.select(df.schema.fields.map { f =>
      if (f.dataType == TimestampNTZType)
        col(f.name).cast(TimestampType).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
      // read as a timestamp. Read the raw int64 nanos and rebase to a
      // µs TimestampType — floor division, bit-identical to DuckDB's
      // `ts::TIMESTAMP` truncation that every oracle uses. (Guarded on
      // the actual type so µs-timestamp replicas load unchanged.)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
