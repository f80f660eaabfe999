package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** S3/K3 — the REAL JDBC edges of the pipeline, matching the
  * reference's database contract:
  *
  *  - dimension scan: the reference streams `lemma ⋈ article` over one
  *    JDBC cursor with fetch-size 1024 (`wbdb.clj:30-37`);
  *  - fact sink: the collector inserts `wb_page_request` rows in
  *    128-row transactions with SQLException-retry
  *    (`collector.clj:97-124`, batch-size at `collector.clj:95`).
  *
  * Spark mapping: `spark.read.jdbc` with `fetchsize` for the scan —
  * one partition is the reference-faithful shape (the dimension stays
  * ~10⁵–10⁶ rows at any fact scale; see [[graft.dim.Dimension]]), and
  * `partitionColumn` bounds are exposed for a genuinely large
  * dimension. `df.write.jdbc` with `batchsize` for the sink — Spark
  * groups `addBatch`/`executeBatch` in one transaction per partition
  * and re-runs the task on SQLException, which is the engine's form of
  * the reference's retry loop; [[appendJdbc]] adds the epoch column +
  * delete-before-insert that turns foreachBatch's at-least-once into
  * exactly-once (the JDBC twin of `Sinks.appendParquet`).
  */
object WbJdbc {

  /** Spark's built-in DerbyDialect maps StringType → CLOB, which makes
    * the writer call `setNull(Types.CLOB)` for null string fields —
    * Derby rejects that against the reference's VARCHAR columns. This
    * dialect (registered once, takes precedence) restores VARCHAR
    * semantics; other types fall back to the common JDBC mapping,
    * which matches Derby for everything the fact/dimension schemas
    * use (TIMESTAMP, DATE, INTEGER, BIGINT). */
  private object DerbyVarcharDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType)
        : Option[org.apache.spark.sql.jdbc.JdbcType] = dt match {
      case org.apache.spark.sql.types.StringType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(127)", java.sql.Types.VARCHAR))
      case _ => None
    }
  }
  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyVarcharDialect)

  /** `wbdb.clj:34` — rows per round-trip on the dimension cursor. */
  val FetchSize = 1024

  /** `collector.clj:95` — rows per insert transaction. */
  val BatchSize = 128

  /** S3: dimension scan over a real JDBC connection. `table` may be a
    * table name or a derived-table subquery (the reference's
    * `lemma ⋈ article` join is pushed to the database the same way:
    * `"(SELECT ...) d"`).
    *
    * @param partitionOn optional (column, lower, upper, numPartitions)
    *                    for a parallel scan of a large dimension; the
    *                    default single cursor is the reference shape */
  def readDimension(spark: SparkSession, url: String, table: String,
      partitionOn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("fetchsize", FetchSize.toString)
    partitionOn.fold(base) { case (c, lo, hi, n) =>
      base.option("partitionColumn", c)
        .option("lowerBound", lo.toString)
        .option("upperBound", hi.toString)
        .option("numPartitions", n.toString)
    }.load()
  }

  /** K3: batch fact insert — 128-row statement batches, one
    * transaction per partition, task-retry on SQLException. The target
    * table should pre-exist with the reference schema (VARCHAR(127)
    * lemma — the F11 width guard in `Collector.toDbRows` exists
    * precisely because of that column). */
  def writeFacts(facts: DataFrame, url: String, table: String): Unit =
    facts.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", BatchSize.toString)
      .option("isolationLevel", "READ_COMMITTED")
      .mode(SaveMode.Append)
      .save()

  /** K3 streaming: epoch-idempotent JDBC append. Each micro-batch
    * first deletes its own `epoch` rows then re-inserts, so a retried
    * epoch (foreachBatch is at-least-once) replaces its previous
    * partial output instead of duplicating it — the JDBC counterpart
    * of `Sinks.appendParquet`'s per-epoch directory overwrite. The
    * delete runs on the driver (one statement); the insert is the
    * distributed 128-row-batch write above. */
  def appendJdbc(df: DataFrame, url: String, table: String,
      checkpoint: String, trigger: Option[Trigger] = None): StreamingQuery = {
    val w = df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.prepareStatement(s"DELETE FROM $table WHERE epoch = ?")
          try { st.setLong(1, epochId); st.executeUpdate(): Unit }
          finally st.close()
        } finally conn.close()
        writeFacts(batch.withColumn("epoch", lit(epochId)), url, table)
      }
    trigger.fold(w)(w.trigger).start()
  }
}
