package graft

import java.io.{BufferedReader, InputStreamReader}
import java.net.{HttpURLConnection, Socket, URI}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Collector, EventServer}

/** K1 end to end: the reference's full serving surface over REAL
  * sockets (`http.clj:74-148`) — SSE and JSONL endpoints with
  * per-subscriber 1-slot latest-wins buffers and `?epm=` throttles,
  * fed by a live Structured Streaming pipeline, with the collector
  * process (`collector.clj` ≙ HttpLines + Collector) subscribing to
  * the JSONL endpoint — the server→collector loop the reference
  * deploys, closed inside one spec. */
class ServerEndToEndSpec extends AnyFunSuite {
  import TestSpark.spark

  private def event(i: Int): String =
    s"""{"timestamp":"2024-12-08T23:00:${"%02d".format(i % 60)}Z","lemma":"w$i"}"""

  /** Background reader draining an endpoint into a queue of raw
    * received frames (HttpURLConnection decodes the chunking). */
  private final class Client(port: Int, path: String) {
    val chunks = new ConcurrentLinkedQueue[String]()
    @volatile var contentType: String = _
    @volatile private var closed = false
    private val thread = new Thread(() => {
      val conn = new URI(s"http://127.0.0.1:$port$path").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(2000)
      conn.setReadTimeout(30000)
      contentType = conn.getContentType
      val in = conn.getInputStream
      val buf = new Array[Byte](8192)
      try {
        var n = in.read(buf)
        while (n >= 0 && !closed) {
          if (n > 0) chunks.add(new String(buf, 0, n, StandardCharsets.UTF_8))
          n = in.read(buf)
        }
      } catch { case _: Throwable => () }
      finally conn.disconnect()
    })
    thread.setDaemon(true)
    thread.start()
    def received: String = chunks.asScala.mkString
    def close(): Unit = { closed = true }
  }

  private def awaitSubs(es: EventServer, n: Int): Unit = {
    val deadline = System.nanoTime() + 10L * 1000000000L
    while (es.subscriberCount < n && System.nanoTime() < deadline) Thread.sleep(20)
    assert(es.subscriberCount >= n, s"subscribers never reached $n")
  }

  test("SSE endpoint: correct headers and data-frame per event, in order") {
    val es = EventServer.start()
    try {
      val c = new Client(es.port, "/api/events")
      awaitSubs(es, 1)
      for (i <- 1 to 20) {
        val before = es.broadcasts
        es.publish(event(i))
        // serialize: wait for this event's delivery so none is
        // overwritten (latest-wins) — makes the all-20 assert exact
        val deadline = System.nanoTime() + 5L * 1000000000L
        while (es.broadcasts == before && System.nanoTime() < deadline) Thread.sleep(5)
      }
      assert(c.contentType.startsWith("text/event-stream"))
      val deadline = System.nanoTime() + 5L * 1000000000L
      while (!c.received.contains(event(20)) && System.nanoTime() < deadline)
        Thread.sleep(20)
      val expect = (1 to 20).map(i => s"data: ${event(i)}\n\n").mkString
      // idle keepalive comments may interleave on a slow run — strip
      // them (they are exactly what every SSE client ignores)
      assert(c.received.replace(": keepalive\n\n", "") == expect)
      c.close()
    } finally es.stop()
  }

  test("two concurrent subscribers at different epm rates sample correctly") {
    val es = EventServer.start()
    try {
      val fast = new Client(es.port, "/api/jsonl?epm=6000") // 10 ms interval
      val slow = new Client(es.port, "/api/jsonl?epm=60")   // 1 s interval
      awaitSubs(es, 2)
      val t0 = System.nanoTime()
      val published = (1 to 150).map { i =>
        es.publish(event(i)); Thread.sleep(20); event(i)
      }
      // let both writers drain their final token
      Thread.sleep(1200)
      val elapsedMin = (System.nanoTime() - t0) / 60e9
      def lines(c: Client): Seq[String] =
        c.received.split("\n").toSeq.filter(_.nonEmpty)
          .filterNot(_.startsWith(":")) // idle keepalives
      val fastL = lines(fast); val slowL = lines(slow)
      assert(fast.contentType.startsWith("text/jsonl"))
      // both received something; the slow one strictly less
      assert(fastL.nonEmpty && slowL.nonEmpty)
      assert(slowL.size < fastL.size,
        s"slow=${slowL.size} fast=${fastL.size}")
      // epm is an upper bound on delivery rate (+1 for the leading token)
      assert(slowL.size <= 60 * elapsedMin + 1,
        s"slow got ${slowL.size} in $elapsedMin min")
      // every delivered line is a published event, and each
      // subscriber sees them in publish order (drop-only, no
      // reorder, no duplication — the sliding-buffer contract)
      val pubIdx = published.zipWithIndex.toMap
      for (l <- Seq(fastL, slowL)) {
        assert(l.forall(pubIdx.contains), s"unknown lines: ${l.filterNot(pubIdx.contains)}")
        val idx = l.map(pubIdx)
        assert(idx == idx.sorted && idx.distinct == idx)
      }
      fast.close(); slow.close()
    } finally es.stop()
  }

  test("ten concurrent subscribers all receive the stream; all reaped on stop") {
    val es = EventServer.start()
    try {
      val clients = (1 to 10).map(i =>
        new Client(es.port, if (i % 2 == 0) "/api/jsonl" else "/api/events"))
      try {
        awaitSubs(es, 10)
        for (i <- 1 to 10) {
          val before = es.broadcasts
          es.publish(event(i))
          // each publish fans to all 10
          val deadline = System.nanoTime() + 5L * 1000000000L
          while (es.broadcasts < before + 10 && System.nanoTime() < deadline)
            Thread.sleep(10)
        }
        assert(es.broadcasts >= 100, s"expected 100 fan-out writes, got ${es.broadcasts}")
        // server-side flush ≠ client-side delivery: wait for each
        // reader thread to drain the socket before asserting
        clients.foreach { c =>
          val deadline = System.nanoTime() + 5L * 1000000000L
          while (!c.received.contains(event(10)) && System.nanoTime() < deadline)
            Thread.sleep(20)
          assert(c.received.contains(event(10)),
            "every subscriber sees the latest event")
        }
      } finally clients.foreach(_.close())
    } finally es.stop()
    // after stop every writer loop exits; nothing is left subscribed
    val deadline = System.nanoTime() + 5L * 1000000000L
    while (es.subscriberCount > 0 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(es.subscriberCount == 0)
  }

  test("epm validation: non-positive or malformed → 400") {
    val es = EventServer.start()
    try {
      for (bad <- Seq("0", "-3", "abc")) {
        val conn = new URI(s"http://127.0.0.1:${es.port}/api/events?epm=$bad")
          .toURL.openConnection().asInstanceOf[HttpURLConnection]
        conn.setConnectTimeout(2000); conn.setReadTimeout(2000)
        assert(conn.getResponseCode == 400, s"epm=$bad")
        conn.disconnect()
      }
    } finally es.stop()
  }

  test("a disconnected subscriber is reaped on a QUIET stream (keepalive liveness)") {
    val es = EventServer.start()
    try {
      val c = new Client(es.port, "/api/events")
      awaitSubs(es, 1)
      // deliver one event so the connection is fully established
      es.publish(event(1))
      val d0 = System.nanoTime() + 5L * 1000000000L
      while (es.broadcasts == 0 && System.nanoTime() < d0) Thread.sleep(10)
      // client goes away; NO further events are published — without
      // the idle keepalive the writer would never touch the socket
      // and the subscription would leak forever
      c.close()
      Thread.sleep(100) // let the reader thread disconnect
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (es.subscriberCount > 0 && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(es.subscriberCount == 0,
        "silent disconnect on a quiet stream was never detected")
    } finally es.stop()
  }

  test("a stalled subscriber never blocks or slows the publish path") {
    val es = EventServer.start()
    try {
      // baseline: publish cost with no subscribers
      def timePublish(n: Int): Double = {
        val t0 = System.nanoTime()
        var i = 0
        while (i < n) { es.publish(event(i)); i += 1 }
        (System.nanoTime() - t0) / 1e9
      }
      timePublish(50000): Unit // warm
      val free = timePublish(200000)
      // a subscriber that connects and never reads: its writer thread
      // blocks once the socket buffer fills; the hub must not care
      val sock = new Socket("127.0.0.1", es.port)
      sock.getOutputStream.write(
        "GET /api/events HTTP/1.1\r\nHost: localhost\r\n\r\n"
          .getBytes(StandardCharsets.UTF_8))
      sock.getOutputStream.flush()
      awaitSubs(es, 1)
      val stalled = timePublish(200000)
      // publish is one AtomicReference swap per subscriber — allow
      // generous noise but catch any accidental blocking/queueing
      assert(stalled < math.max(free * 5, 1.0),
        f"stalled publish $stalled%.3fs vs free $free%.3fs")
      // and a live subscriber still gets the latest event afterwards
      val live = new Client(es.port, "/api/jsonl")
      awaitSubs(es, 2)
      es.publish("""{"probe":true}""")
      val deadline = System.nanoTime() + 5L * 1000000000L
      while (!live.received.contains("probe") && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(live.received.contains("probe"))
      live.close(); sock.close()
    } finally es.stop()
  }

  test("engine subscribes to its own SSE endpoint: HttpLines sse=true decodes frames") {
    import spark.implicits._
    val es = EventServer.start()
    try {
      val lines = spark.readStream.format("graft.sources.HttpLines")
        .option("url", s"http://127.0.0.1:${es.port}/api/events")
        .option("sse", "true")
        .option("linesPerTrigger", "8")
        .option("backoffBaseMs", "50")
        .load()
      val q = lines.writeStream.format("memory").queryName("srv_sse")
        .outputMode("append").start()
      try {
        awaitSubs(es, 1)
        for (i <- 1 to 5) {
          val before = es.broadcasts
          es.publish(event(i))
          val deadline = System.nanoTime() + 5L * 1000000000L
          while (es.broadcasts == before && System.nanoTime() < deadline)
            Thread.sleep(10)
        }
        val deadline = System.nanoTime() + 30L * 1000000000L
        def got(): Seq[String] = {
          q.processAllAvailable()
          spark.table("srv_sse").as[String].collect().toSeq
        }
        while (got().size < 5 && System.nanoTime() < deadline) Thread.sleep(50)
        // frames decode back to the exact published JSON payloads
        assert(got().sorted == (1 to 5).map(event).sorted)
      } finally q.stop()
    } finally es.stop()
  }

  test("server→collector loop: pipeline → JSONL endpoint → HttpLines → decode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val es = EventServer.start()
    val ckptA = java.nio.file.Files.createTempDirectory("srv-attach").toString
    val mem = MemoryStream[String]
    // upstream pipeline: a streaming frame of JSONL payloads attached
    // to the hub (foreachBatch → publish)
    val attachQ = es.attach(mem.toDF.toDF("value"), ckptA,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
    try {
      // collector leg: HttpLines subscribes to the live JSONL endpoint
      val lines = spark.readStream.format("graft.sources.HttpLines")
        .option("url", s"http://127.0.0.1:${es.port}/api/jsonl")
        .option("linesPerTrigger", "16")
        .option("backoffBaseMs", "50")
        .load()
      val collQ = Collector.decode(lines, lineCol = "line")
        .writeStream.format("memory").queryName("srv_collector")
        .outputMode("append").start()
      try {
        awaitSubs(es, 1) // the HttpLines fetcher is connected
        val wire = Seq(
          """{"timestamp":"2024-12-08T23:00:18Z","lemma":"obskur","article-type":"Vollartikel","source":"WDG","date":"1974-01-01"}""",
          """{"timestamp":"2024-12-08T23:00:19Z","lemma":"Haus","hidx":2}""",
          """not json at all""",
          """{"timestamp":"2024-12-08T23:00:20Z","lemma":"nur-lemma"}""")
        // publish one at a time, waiting for the broadcast so the
        // 1-slot buffer never overwrites (the collector must see all)
        for (w <- wire) {
          val before = es.broadcasts
          mem.addData(w)
          attachQ.processAllAvailable()
          val deadline = System.nanoTime() + 5L * 1000000000L
          while (es.broadcasts == before && System.nanoTime() < deadline)
            Thread.sleep(10)
        }
        val deadline = System.nanoTime() + 30L * 1000000000L
        def got(): Seq[(String, String)] = {
          collQ.processAllAvailable()
          spark.table("srv_collector")
            .select("lemma", "timestamp").as[(String, String)].collect().toSeq
        }
        while (got().size < 3 && System.nanoTime() < deadline) Thread.sleep(50)
        val rows = got().sortBy(_._2)
        // 4 wire lines: 1 malformed dropped by decode → 3 events
        assert(rows.map(_._1) == Seq("obskur", "Haus", "nur-lemma"))
      } finally collQ.stop()
    } finally {
      attachQ.stop()
      es.stop()
    }
  }

  test("attach batch guard: a micro-batch past the ceiling fails LOUDLY " +
      "naming the knob, and a bounded batch still publishes (r16 item 5)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val es = EventServer.start()
    try {
      val mem = MemoryStream[String]
      val q = es.attach(mem.toDF.toDF("value"),
        java.nio.file.Files.createTempDirectory("srv-guard").toString,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"),
        maxBatchEvents = 3)
      try {
        // a bounded batch flows
        mem.addData((1 to 2).map(event): _*)
        q.processAllAvailable()
        assert(es.published >= 2L)
        // a corpus-sized batch trips the guard with the knob's name
        mem.addData((3 to 20).map(event): _*)
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        def root(t: Throwable): Throwable =
          if (t.getCause == null || (t.getCause eq t)) t else root(t.getCause)
        val msg = root(e).getMessage
        assert(msg.contains("MaxBatchEvents"),
          s"guard failure does not name the knob: $msg")
      } finally q.stop()
    } finally es.stop()
  }
}
