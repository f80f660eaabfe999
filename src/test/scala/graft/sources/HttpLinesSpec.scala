package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S2 transport semantics against a local stub HTTP server
  * (`collector.clj:39-74`): reconnect on orderly EOF, exponential
  * backoff on IOException, the `limit` option, and the micro-batch
  * admission path end-to-end. */
class HttpLinesSpec extends AnyFunSuite {
  import TestSpark.spark

  /** Stub long-poll server: each connection serves one batch of lines
    * then closes (EOF); batches beyond `batches` yield HTTP 500 (the
    * IOException path client-side). */
  private def withServer(batches: Seq[Seq[String]], failFirst: Int = 0)(
      body: (String, AtomicInteger) => Unit): Unit = {
    val conns = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/events", (x: HttpExchange) => {
      val n = conns.getAndIncrement()
      if (n < failFirst || n - failFirst >= batches.length) {
        x.sendResponseHeaders(500, -1)
        x.close()
      } else {
        val bytes = batches(n - failFirst).map(_ + "\n").mkString
          .getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(200, bytes.length.toLong)
        x.getResponseBody.write(bytes)
        x.close()
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/events", conns)
    finally server.stop(0)
  }

  private def cfg(url: String, limit: Long = 0L): HttpConfig =
    HttpConfig(url, linesPerTrigger = 2, limit = limit,
      connectTimeoutMs = 5000, readTimeoutMs = 5000,
      backoffBaseMs = 10L, backoffMaxMs = 80L)

  private def awaitAvailable(f: HttpFetcher, n: Long, ms: Long = 20000): Unit = {
    val deadline = System.nanoTime() + ms * 1000000L
    while (f.available < n && System.nanoTime() < deadline) Thread.sleep(20)
    assert(f.available >= n, s"timed out waiting for $n lines")
  }

  test("backoff schedule is delay-exp 3s doubling to the 60s cap") {
    val d = (1 to 7).map(HttpLines.backoffMs(_, 3000L, 60000L))
    assert(d == Seq(3000L, 6000L, 12000L, 24000L, 48000L, 60000L, 60000L))
  }

  test("reconnects on orderly EOF and keeps the line sequence") {
    withServer(Seq(Seq("a", "b"), Seq("c"), Seq("d", "e"))) { (url, conns) =>
      val f = new HttpFetcher(cfg(url))
      try {
        awaitAvailable(f, 5)
        assert(f.slice(0, 5).toSeq == Seq("a", "b", "c", "d", "e"))
        assert(conns.get() >= 3) // one per batch: EOF → reconnect
        // committed prefix is freed, later slices still line up
        f.prune(3)
        assert(f.slice(3, 5).toSeq == Seq("d", "e"))
      } finally f.stop()
    }
  }

  test("IOException path: exponential backoff retries, then recovery") {
    withServer(Seq(Seq("x", "y")), failFirst = 3) { (url, _) =>
      val f = new HttpFetcher(cfg(url))
      try {
        awaitAvailable(f, 2)
        assert(f.retries >= 3) // the three 500s before first success
        assert(f.slice(0, 2).toSeq == Seq("x", "y"))
      } finally f.stop()
    }
  }

  test("limit stops the poll after N lines like the reference's take") {
    withServer(Seq(Seq("1", "2", "3"), Seq("4", "5", "6"))) { (url, conns) =>
      val f = new HttpFetcher(cfg(url, limit = 4))
      try {
        awaitAvailable(f, 4)
        Thread.sleep(150) // would keep polling if limit were ignored
        assert(f.available == 4)
        assert(conns.get() <= 2) // never opened a third connection
      } finally f.stop()
    }
  }

  test("rebase continues the committed offset sequence after restart") {
    withServer(Seq(Seq("p", "q"))) { (url, _) =>
      val f = new HttpFetcher(cfg(url))
      try {
        // engine restarts from committed offset 7; fresh lines continue
        f.rebase(7)
        awaitAvailable(f, 9)
        assert(f.slice(7, 9).toSeq == Seq("p", "q"))
      } finally f.stop()
    }
  }

  test("end-to-end micro-batch read with admission control") {
    val batches = Seq(Seq("e1", "e2", "e3"), Seq("e4", "e5"))
    withServer(batches) { (url, _) =>
      val q = spark.readStream.format("graft.sources.HttpLines")
        .option("url", url)
        .option("linesPerTrigger", "2")
        .option("limit", "5")
        .option("backoffBaseMs", "10")
        .load()
        .writeStream.format("memory").queryName("http_lines").start()
      try {
        val deadline = System.nanoTime() + 20L * 1000000000L
        def got(): Long = spark.table("http_lines").count()
        while (got() < 5 && System.nanoTime() < deadline) {
          q.processAllAvailable(); Thread.sleep(20)
        }
        assert(got() == 5)
        import spark.implicits._
        assert(spark.table("http_lines").as[String].collect().sorted.toSeq ==
          Seq("e1", "e2", "e3", "e4", "e5"))
        // admission: 2 lines/trigger over 5 lines ⇒ at least 3 batches
        assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
      } finally q.stop()
    }
  }

  test("SSE decoder: data frames, multi-line data, ignored fields") {
    import HttpLines.{sseFeed, SseState}
    def feedAll(lines: Seq[String]): Seq[String] =
      lines.foldLeft((SseState(), Vector.empty[String])) {
        case ((st, out), l) =>
          val (st2, p) = sseFeed(st, l)
          (st2, out ++ p)
      }._2
    // the reference's framing: data: {json} + blank line
    assert(feedAll(Seq("data: {\"a\":1}", "", "data: {\"b\":2}", "")) ==
      Seq("""{"a":1}""", """{"b":2}"""))
    // optional single space after the colon is stripped; a second
    // space belongs to the payload; "data:" with no space works too
    assert(feedAll(Seq("data:  x", "", "data:y", "")) == Seq(" x", "y"))
    // multi-line data joins with \n (SSE spec)
    assert(feedAll(Seq("data: l1", "data: l2", "")) == Seq("l1\nl2"))
    // event:/id:/retry:/comments are ignored; blank line without
    // pending data dispatches nothing
    assert(feedAll(Seq(": keepalive", "event: tick", "id: 7", "retry: 100",
      "", "data: z", "")) == Seq("z"))
  }
}
