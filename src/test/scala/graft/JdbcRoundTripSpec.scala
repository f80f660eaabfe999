package graft

import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dim.Dimension
import graft.sources.WbJdbc
import graft.streaming.Collector

/** S3/K3 over a REAL JDBC driver (embedded Derby, which ships with
  * Spark): dimension scan with fetch-size 1024 (`wbdb.clj:30-37`),
  * fact batch-insert with batch-size 128 (`collector.clj:95-124`),
  * `lemma#hidx` persistence (`collector.clj:84`), and the
  * epoch-idempotent streaming sink. */
class JdbcRoundTripSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val dbDir =
    java.nio.file.Files.createTempDirectory("derby").toString + "/wb"
  private val url = s"jdbc:derby:$dbDir;create=true"

  private def exec(sqls: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try sqls.foreach { s =>
      val st = conn.createStatement(); try st.execute(s): Unit finally st.close()
    } finally conn.close()
  }

  private def queryLong(sql: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try { val rs = st.executeQuery(sql); rs.next(); rs.getLong(1) }
      finally st.close()
    } finally conn.close()
  }

  // the reference fact-table schema (`collector.clj:76-88`): lemma is
  // VARCHAR(127) — the very column width behind the F11 guard
  exec(
    """CREATE TABLE wb_page_request (
      |  ts TIMESTAMP, lemma VARCHAR(127), article_type VARCHAR(32),
      |  article_source VARCHAR(32), article_date DATE)""".stripMargin,
    """CREATE TABLE wb_page_request_epoch (
      |  ts TIMESTAMP, lemma VARCHAR(127), article_type VARCHAR(32),
      |  article_source VARCHAR(32), article_date DATE, epoch BIGINT)""".stripMargin,
    """CREATE TABLE lemma (
      |  lemma VARCHAR(127), hidx INT, lemma_type VARCHAR(16),
      |  article_type VARCHAR(32))""".stripMargin,
    "INSERT INTO lemma VALUES ('Haus', 2, 'AR_G', 'Vollartikel')",
    "INSERT INTO lemma VALUES ('Haus', 1, 'AR_G', 'Minimalartikel')",
    "INSERT INTO lemma VALUES ('Haus', NULL, 'AR_G', 'Basisartikel')",
    "INSERT INTO lemma VALUES ('obskur', NULL, 'AR_G', 'Vollartikel')")

  private val wire = Seq(
    """{"timestamp":"2024-12-08T23:00:18Z","lemma":"obskur","article-type":"Vollartikel","source":"WDG","date":"1974-01-01"}""",
    """{"timestamp":"2024-12-08T23:00:19Z","lemma":"Haus","hidx":2,"article-type":"Vollartikel","source":"DWB","date":"1854-01-01"}""",
    s"""{"timestamp":"2024-12-08T23:00:21Z","lemma":"${"x" * 200}"}""")

  test("S3: dimension scan via spark.read.jdbc, argmin homograph dedup downstream") {
    val dim = WbJdbc.readDimension(spark, url, "lemma")
    assert(dim.count() == 4)
    assert(dim.schema.fieldNames.map(_.toLowerCase).toSet ==
      Set("lemma", "hidx", "lemma_type", "article_type"))
    // wbdb.clj's first-homograph reduction: NULL hidx ranks as 0
    val first = Dimension.dedupBy(dim, "LEMMA", "HIDX")
    val haus = first.where(col("LEMMA") === "Haus").head()
    assert(haus.isNullAt(haus.fieldIndex("HIDX"))) // null ≙ 0 wins over 1,2
    assert(first.count() == 2)
    // a derived-table scan pushes the dimension join to the database
    val sub = WbJdbc.readDimension(spark, url,
      "(SELECT lemma, hidx FROM lemma WHERE article_type = 'Vollartikel') d")
    assert(sub.count() == 2)
  }

  test("K3: fact batch-insert persists lemma#hidx through a real driver") {
    val facts = Collector.toDbRows(Collector.decode(wire.toDF("value")))
    WbJdbc.writeFacts(facts, url, "wb_page_request")
    assert(queryLong("SELECT COUNT(*) FROM wb_page_request") == 2) // F11 drops the 200-char lemma
    assert(queryLong(
      "SELECT COUNT(*) FROM wb_page_request WHERE lemma = 'Haus#2'") == 1)
    // idempotent task-retry semantics are Spark's (re-run partition →
    // duplicate append), which is why the streaming path below keys
    // epochs; the batch path here is the reference's one-shot insert
  }

  test("K3 streaming: epoch-keyed JDBC sink deletes-then-inserts per epoch") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("jdbc-ckpt").toString
    val mem = MemoryStream[String]
    val q = WbJdbc.appendJdbc(
      Collector.toDbRows(Collector.decode(mem.toDF.toDF("value"))),
      url, "wb_page_request_epoch", ckpt)
    try {
      mem.addData(wire: _*)
      q.processAllAvailable()
      assert(queryLong("SELECT COUNT(*) FROM wb_page_request_epoch") == 2)
      // simulate a crashed partial write of the NEXT epoch, then let
      // the epoch actually run: delete-before-insert must replace the
      // partial rows, not append to them
      val partial = Collector.toDbRows(Collector.decode(wire.toDF("value")))
      WbJdbc.writeFacts(partial.withColumn("epoch", lit(1L)),
        url, "wb_page_request_epoch")
      assert(queryLong(
        "SELECT COUNT(*) FROM wb_page_request_epoch WHERE epoch = 1") == 2)
      mem.addData(wire.head)
      q.processAllAvailable()
      assert(queryLong(
        "SELECT COUNT(*) FROM wb_page_request_epoch WHERE epoch = 1") == 1)
      assert(queryLong("SELECT COUNT(*) FROM wb_page_request_epoch") == 3)
    } finally q.stop()
  }

  test("init-db!: schema migration applies once, re-run is a no-op, " +
      "insert works against the migrated schema (collector.clj:25-30)") {
    // fresh database — the suite-level db pre-creates these tables
    val dir = java.nio.file.Files.createTempDirectory("derby-mig").toString + "/wb"
    val mUrl = s"jdbc:derby:$dir;create=true"
    def count(sql: String): Long = {
      val conn = DriverManager.getConnection(mUrl)
      try {
        val st = conn.createStatement()
        try { val rs = st.executeQuery(sql); rs.next(); rs.getLong(1) }
        finally st.close()
      } finally conn.close()
    }
    assert(WbJdbc.migrate(mUrl) == Seq("001-create-wb-page-request"))
    // second run: no-op — nothing applied, ledger unchanged
    assert(WbJdbc.migrate(mUrl).isEmpty)
    assert(count(s"SELECT COUNT(*) FROM ${WbJdbc.MigrationsTable}") == 1)
    // the migrated schema takes the collector's insert path (the id
    // identity column must not collide with Spark's append)
    val facts = Seq(("2024-12-08 23:00:18", "Haus", "Vollartikel", "DWDS", "2024-01-01"))
      .toDF("ts", "lemma", "article_type", "article_source", "article_date")
      .select(col("ts").cast("timestamp").as("ts"), col("lemma"),
        col("article_type"), col("article_source"),
        col("article_date").cast("date").as("article_date"))
    WbJdbc.writeFacts(facts, mUrl, "wb_page_request")
    assert(count("SELECT COUNT(*) FROM wb_page_request WHERE lemma = 'Haus'") == 1)
  }

  test("init-db!: CONCURRENT initializers on a fresh database degrade to " +
      "one applier + no-ops, never a crash (ragtime's locking semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("derby-race").toString + "/wb"
    val mUrl = s"jdbc:derby:$dir;create=true"
    val workers = 4
    val gate = new java.util.concurrent.CountDownLatch(workers)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
    try {
      val futures = (1 to workers).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Seq[String]] {
          def call(): Seq[String] = {
            gate.countDown(); gate.await() // all start at once
            WbJdbc.migrate(mUrl)
          }
        })
      }
      // every call returns (no duplicate-DDL / duplicate-PK crash)…
      val results = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      // …exactly one applied the migration set, the rest no-oped
      assert(results.count(_.nonEmpty) == 1,
        s"expected exactly one applier, got $results")
      assert(results.flatten == Seq("001-create-wb-page-request"))
      // the ledger holds one row and the schema is usable
      val conn = DriverManager.getConnection(mUrl)
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(
            s"SELECT COUNT(*) FROM ${WbJdbc.MigrationsTable}")
          rs.next()
          assert(rs.getLong(1) == 1)
        } finally st.close()
      } finally conn.close()
    } finally pool.shutdownNow()
  }
}
