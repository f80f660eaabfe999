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

  // ------------------------------------------------- schema migration

  /** `collector.clj:22-24` — the applied-migrations ledger table. */
  val MigrationsTable = "migrations_graft_collector"

  /** One ordered migration: an id (recorded in the ledger) and the
    * DDL it applies. */
  final case class Migration(id: String, statements: Seq[String])

  /** The collector sink's schema as the reference ships it — its
    * `001-create-wb-page-request.up.sql` re-expressed for the target
    * database (Derby here: `SERIAL` → `GENERATED ALWAYS AS IDENTITY`,
    * and no `IF NOT EXISTS` — idempotence comes from the ledger, as
    * with ragtime, not from the DDL dialect). */
  def collectorMigrations: Seq[Migration] = Seq(
    Migration("001-create-wb-page-request", Seq(
      """CREATE TABLE wb_page_request (
        |  id INTEGER GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
        |  ts TIMESTAMP NOT NULL,
        |  lemma VARCHAR(128) NOT NULL,
        |  article_type VARCHAR(64),
        |  article_source VARCHAR(64),
        |  article_date DATE)""".stripMargin,
      "CREATE INDEX wb_page_request_ts ON wb_page_request (ts)",
      "CREATE INDEX wb_page_request_lemma ON wb_page_request (lemma)",
      "CREATE INDEX wb_page_request_source ON wb_page_request (article_source)")))

  /** `collector.clj:25-30` (`init-db!`, ragtime) — idempotent schema
    * migration. A ledger table records each applied migration id;
    * `migrate` applies, IN ORDER, only ids absent from the ledger,
    * one transaction per migration (the DDL and its ledger row commit
    * together, so a failed migration neither half-applies nor marks
    * itself done — Derby DDL is transactional). Re-running the whole
    * call is a no-op, which is what lets every process start
    * unconditionally `init-db!` the way the reference does.
    *
    * @return the ids applied by THIS call (empty on a no-op re-run —
    *         JdbcRoundTripSpec pins that contract) */
  /** Concurrent-safe since round 14 (reference ragtime's datastore
    * has table-level locking semantics, so two simultaneous
    * `init-db!` calls degrade to one applier + one no-op — this must
    * too): ledger creation swallows Derby's already-exists SQLState
    * (X0Y32 — the loser of a create race no-ops), and each migration
    * transaction takes an EXCLUSIVE ledger lock then re-reads the
    * ledger INSIDE the transaction before applying, so a concurrent
    * initializer blocks on the lock and then sees the winner's ledger
    * row instead of crashing on duplicate DDL. */
  def migrate(url: String,
      migrations: Seq[Migration] = collectorMigrations): Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val tables = conn.getMetaData.getTables(
        null, null, MigrationsTable.toUpperCase, null)
      val ledgerExists = try tables.next() finally tables.close()
      if (!ledgerExists) {
        val st = conn.createStatement()
        try st.executeUpdate(s"CREATE TABLE $MigrationsTable (" +
          "id VARCHAR(255) PRIMARY KEY, applied_at TIMESTAMP NOT NULL)"): Unit
        catch {
          // lost a concurrent-create race: X0Y32 = already exists
          case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
        }
        finally st.close()
      }
      conn.setAutoCommit(false)
      def isApplied(id: String): Boolean = {
        val q = conn.prepareStatement(
          s"SELECT 1 FROM $MigrationsTable WHERE id = ?")
        try {
          q.setString(1, id)
          val rs = q.executeQuery()
          try rs.next() finally rs.close()
        } finally q.close()
      }
      val applied = Seq.newBuilder[String]
      migrations.foreach { m =>
        try {
          // serialize initializers: the lock holds until this
          // migration's commit/rollback, and the re-read happens
          // INSIDE the locked transaction — a concurrent migrate
          // blocks here, then sees the winner's ledger row and no-ops
          val lk = conn.createStatement()
          try lk.execute(
            s"LOCK TABLE $MigrationsTable IN EXCLUSIVE MODE"): Unit
          finally lk.close()
          if (!isApplied(m.id)) {
            m.statements.foreach { sql =>
              val st = conn.createStatement()
              try st.executeUpdate(sql): Unit
              finally st.close()
            }
            val ins = conn.prepareStatement(s"INSERT INTO $MigrationsTable " +
              "(id, applied_at) VALUES (?, CURRENT_TIMESTAMP)")
            try { ins.setString(1, m.id); ins.executeUpdate(): Unit }
            finally ins.close()
            applied += m.id
          }
          conn.commit() // releases the ledger lock either way
        } catch { case e: Throwable => conn.rollback(); throw e }
      }
      applied.result()
    } finally conn.close()
  }

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
