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

  /** Wire schema of an enriched event — field names exactly as the
    * reference serializes them (hyphenated keyword keys, observed
    * live shape in SURVEY.md §1.2d: `lemma-type`, `form-type`,
    * `article-type`). Absent keys surface as nulls. */
  val WireSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("lemma", StringType),
    StructField("hidx", IntegerType),
    StructField("lemma-type", StringType),
    StructField("form-type", StringType),
    StructField("article-type", StringType),
    StructField("source", StringType),
    StructField("date", StringType)))

  /** JSONL line column → typed event columns, renamed to the engine's
    * underscore convention. PERMISSIVE semantics: malformed JSON
    * yields a row of all-null fields, so the required-field checks on
    * timestamp/lemma are what actually drop it (F10). */
  def decode(jsonl: DataFrame, lineCol: String = "value"): DataFrame =
    jsonl
      .select(from_json(col(lineCol), WireSchema).as("e"))
      .where(col("e.timestamp").isNotNull && col("e.lemma").isNotNull)
      .select(
        col("e.timestamp").as("timestamp"),
        col("e.lemma").as("lemma"),
        col("e.hidx").as("hidx"),
        col("e.`lemma-type`").as("lemma_type"),
        col("e.`form-type`").as("form_type"),
        col("e.`article-type`").as("article_type"),
        col("e.source").as("source"),
        col("e.date").as("date"))

  /** The `event->db` projection (`collector.clj:79-88`): ISO instant →
    * timestamp, `lemma#hidx` concat when a homograph index is present,
    * date parse, and the F11 column-width guard. */
  def toDbRows(events: DataFrame): DataFrame = {
    val lemmaKey = when(col("hidx").isNotNull,
      concat(col("lemma"), lit("#"), col("hidx").cast("string")))
      .otherwise(col("lemma"))
    // try_* forms: under ANSI mode plain casts THROW on a malformed
    // wire value, taking down the stream — F10 demands drop-not-fail
    // (same hazard class as Clf.parse).
    events.select(
      try_to_timestamp(col("timestamp")).as("ts"),
      lemmaKey.as("lemma"),
      col("article_type"),
      col("source").as("article_source"),
      expr("try_cast(date AS DATE)").as("article_date"))
      .where(col("ts").isNotNull && length(col("lemma")) < 128)
  }

  /** K3 — the epoch-idempotent append sink (shared, see Sinks). */
  def start(decoded: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    Sinks.appendParquet(toDbRows(decoded), outDir, checkpoint)
}
