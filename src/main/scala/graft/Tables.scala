package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType, TimestampNTZType, TimestampType}

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
    * TimestampType, so cast any TIMESTAMP_NTZ column — including ones
    * nested in struct/array/map — up front. The NTZ→TZ cast is
    * instant-preserving ONLY when the session TZ is UTC (it
    * reinterprets the naive micros in the session zone), so that
    * precondition is asserted, not assumed. */
  private def normalizeTimestamps(df: DataFrame): DataFrame = {
    def stripNtz(dt: DataType): DataType = dt match {
      case TimestampNTZType => TimestampType
      case s: StructType =>
        StructType(s.fields.map(f => f.copy(dataType = stripNtz(f.dataType))))
      case a: ArrayType => a.copy(elementType = stripNtz(a.elementType))
      case m: MapType =>
        m.copy(keyType = stripNtz(m.keyType), valueType = stripNtz(m.valueType))
      case other => other
    }
    if (df.schema.fields.forall(f => stripNtz(f.dataType) == f.dataType)) df
    else {
      val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"TIMESTAMP_NTZ normalization requires session TZ UTC (got $tz): " +
          "the NTZ->TZ cast would shift instants in any other zone")
      df.select(df.schema.fields.map { f =>
        val target = stripNtz(f.dataType)
        if (target == f.dataType) col(f.name)
        else col(f.name).cast(target).as(f.name)
      }.toIndexedSeq: _*)
    }
  }

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
