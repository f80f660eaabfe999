package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.DriverManager
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WbJdbc
import graft.streaming.Collector

/** The reference's WHOLE collector process (`collector.clj`), wired
  * with REAL transports on both ends: HTTP long-poll JSONL in
  * (`collector.clj:39-74` ≙ graft.sources.HttpLines against a stub
  * server), wire decode + event→db projection (`collector.clj:79-88`
  * ≙ Collector.decode/toDbRows), 128-row-batch JDBC out with epoch
  * idempotence (`collector.clj:97-124` ≙ WbJdbc.appendJdbc into
  * embedded Derby). One spec, zero parquet analogs. */
class CollectorEndToEndSpec extends AnyFunSuite {
  import TestSpark.spark

  private val wire = Seq(
    """{"timestamp":"2024-12-08T23:00:18Z","lemma":"obskur","article-type":"Vollartikel","source":"WDG","date":"1974-01-01"}""",
    """{"timestamp":"2024-12-08T23:00:19Z","lemma":"Haus","hidx":2,"article-type":"Vollartikel","source":"DWB","date":"1854-01-01"}""",
    """not json at all""",
    """{"timestamp":"2024-12-08T23:00:20Z","lemma":"nur-lemma"}""")

  test("HTTP JSONL in, decode, lemma#hidx JDBC out — across a reconnect") {
    // stub long-poll server: two connections' worth of events (EOF in
    // between exercises the reconnect path mid-collection)
    val batches = Seq(wire.take(2), wire.drop(2))
    val conns = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/events", (x: HttpExchange) => {
      val n = conns.getAndIncrement()
      if (n >= batches.length) { x.sendResponseHeaders(500, -1); x.close() }
      else {
        val bytes = batches(n).map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(200, bytes.length.toLong)
        x.getResponseBody.write(bytes)
        x.close()
      }
    })
    server.start()
    val dbDir = java.nio.file.Files.createTempDirectory("derby-e2e").toString + "/wb"
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(
        """CREATE TABLE wb_page_request (
          |  ts TIMESTAMP, lemma VARCHAR(127), article_type VARCHAR(32),
          |  article_source VARCHAR(32), article_date DATE, epoch BIGINT)""".stripMargin): Unit
      finally st.close()
    } finally conn.close()
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("e2e-ckpt").toString
      val lines = spark.readStream.format("graft.sources.HttpLines")
        .option("url", s"http://127.0.0.1:${server.getAddress.getPort}/events")
        .option("linesPerTrigger", "2")
        .option("limit", wire.size.toString)
        .option("backoffBaseMs", "10")
        .load()
      val q = WbJdbc.appendJdbc(
        Collector.toDbRows(Collector.decode(lines, lineCol = "line")),
        url, "wb_page_request", ckpt)
      def count(sql: String): Long = {
        val c = DriverManager.getConnection(url)
        try {
          val st = c.createStatement()
          try { val rs = st.executeQuery(sql); rs.next(); rs.getLong(1) }
          finally st.close()
        } finally c.close()
      }
      try {
        val deadline = System.nanoTime() + 30L * 1000000000L
        while (count("SELECT COUNT(*) FROM wb_page_request") < 3 &&
          System.nanoTime() < deadline) {
          q.processAllAvailable(); Thread.sleep(25)
        }
        // 4 wire lines: 1 malformed dropped by decode → 3 facts
        assert(count("SELECT COUNT(*) FROM wb_page_request") == 3)
        assert(count(
          "SELECT COUNT(*) FROM wb_page_request WHERE lemma = 'Haus#2'") == 1)
        assert(count(
          "SELECT COUNT(*) FROM wb_page_request WHERE lemma = 'nur-lemma' AND article_type IS NULL") == 1)
        assert(conns.get() >= 2) // the EOF between batches forced a reconnect
      } finally q.stop()
    } finally server.stop(0)
  }
}
