package graft

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventServer, ServingProbe}

/** The serving layer's documented scale-out story, PROVEN instead of
  * asserted (EventServer scaladoc: "the scale-out path for many
  * subscribers is many gateway replicas each consuming the JSONL
  * endpoint — the reference's own collector pattern"): a REPLICA
  * EventServer whose upstream is not the pipeline but the primary's
  * own `/api/jsonl` endpoint via HttpLines — the exact composition a
  * deployment would run, one hop of which the reference itself
  * deploys as its collector (`collector.clj:50-57`). End to end over
  * real sockets: pipeline → primary hub → JSONL wire → HttpLines →
  * replica hub → two subscribers with independent epm states.
  *
  * Plus the round-12 serving-latency observability: publish→write
  * percentiles recorded by the hub's latency ring
  * ([[EventServer.latencySince]]) and summarized by
  * [[ServingProbe.percentileMs]] into the bench artifact. */
class GatewayChainSpec extends AnyFunSuite {
  import TestSpark.spark

  private def event(i: Int): String =
    s"""{"timestamp":"2024-12-08T23:01:${"%02d".format(i % 60)}Z","lemma":"g$i"}"""

  /** Background reader draining an endpoint into received text. */
  private final class Client(port: Int, path: String) {
    private val chunks = new ConcurrentLinkedQueue[String]()
    @volatile private var closed = false
    private val thread = new Thread(() => {
      val conn = new URI(s"http://127.0.0.1:$port$path").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(2000)
      conn.setReadTimeout(30000)
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

  test("chained gateway: pipeline → primary → JSONL wire → replica → subscribers") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val primary = EventServer.start()
    val replica = EventServer.start()
    val mem = MemoryStream[String]
    val ckptA = java.nio.file.Files.createTempDirectory("gw-primary").toString
    val ckptB = java.nio.file.Files.createTempDirectory("gw-replica").toString
    // leg 1: the pipeline feeds the PRIMARY hub
    val attachA = primary.attach(mem.toDF.toDF("value"), ckptA,
      Trigger.ProcessingTime("50 milliseconds"))
    // leg 2: the REPLICA's upstream is the primary's own JSONL
    // endpoint — HttpLines consuming the live wire, re-attached as
    // the replica hub's pipeline (gateway chaining; no code the
    // engine doesn't already ship)
    val wireIn = spark.readStream.format("graft.sources.HttpLines")
      .option("url", s"http://127.0.0.1:${primary.port}/api/jsonl")
      .option("linesPerTrigger", "64")
      .option("backoffBaseMs", "50")
      .load()
    val attachB = replica.attach(wireIn, ckptB,
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      awaitSubs(primary, 1) // the replica's HttpLines fetcher is live
      // two replica subscribers with independent delivery state:
      // an unthrottled one (sees everything) and an epm-throttled one
      val full = new Client(replica.port, "/api/jsonl")
      val throttled = new Client(replica.port, "/api/jsonl?epm=60")
      awaitSubs(replica, 2)
      val t0 = System.nanoTime()
      def fullLines(): Seq[String] =
        full.received.split("\n").toSeq.filter(_.nonEmpty)
      val published = (1 to 12).map { i =>
        mem.addData(event(i))
        attachA.processAllAvailable()
        // serialize on the FULL subscriber's client-side receipt: the
        // event must cross both hops and land before the next publish,
        // so no 1-slot buffer on either hop ever overwrites (waiting
        // on replica.broadcasts alone would race — the throttled
        // subscriber's deliveries advance that counter too)
        val deadline = System.nanoTime() + 15L * 1000000000L
        while (!fullLines().contains(event(i)) && System.nanoTime() < deadline)
          Thread.sleep(10)
        event(i)
      }
      val elapsedMin = (System.nanoTime() - t0) / 60e9
      // the unthrottled replica subscriber saw every event, in order,
      // byte-identical across both hops
      assert(fullLines() == published, s"full subscriber saw ${fullLines()}")
      // the throttled one saw a strict, ordered, rate-bounded subsample
      val thrLines = throttled.received.split("\n").toSeq.filter(_.nonEmpty)
      assert(thrLines.nonEmpty, "throttled subscriber starved")
      assert(thrLines.size <= 60 * elapsedMin + 1,
        s"epm=60 delivered ${thrLines.size} in $elapsedMin min")
      val pubIdx = published.zipWithIndex.toMap
      assert(thrLines.forall(pubIdx.contains))
      val idx = thrLines.map(pubIdx)
      assert(idx == idx.sorted && idx.distinct == idx,
        "throttled delivery must be drop-only, ordered, duplicate-free")
      // the chain did not leak backpressure upstream: the primary
      // delivered every event to its one subscriber (the wire)
      assert(primary.broadcasts >= 12)
      full.close(); throttled.close()
    } finally {
      try attachB.stop() catch { case _: IOException => () }
      attachA.stop()
      replica.stop()
      primary.stop()
    }
  }

  test("latency ring: delivered frames record publish→write nanos; percentiles summarize") {
    val es = EventServer.start()
    try {
      val c = new Client(es.port, "/api/jsonl")
      awaitSubs(es, 1)
      val mark = es.latencyMark
      for (i <- 1 to 8) {
        val before = es.broadcasts
        es.publish(event(i))
        val deadline = System.nanoTime() + 5L * 1000000000L
        while (es.broadcasts == before && System.nanoTime() < deadline)
          Thread.sleep(5)
      }
      val lat = es.latencySince(mark)
      assert(lat.length == 8, s"expected 8 samples, got ${lat.length}")
      assert(lat.forall(_ > 0), "latencies must be positive")
      // in-process publish→write sits far under a second
      assert(lat.forall(_ < 1000000000L), s"implausible latency: ${lat.max}")
      val p50 = ServingProbe.percentileMs(lat, 0.50)
      val p99 = ServingProbe.percentileMs(lat, 0.99)
      assert(p50 > 0 && p99 >= p50, s"p50=$p50 p99=$p99")
      c.close()
    } finally es.stop()
  }

  test("percentileMs: nearest-rank on knowns; empty = unmeasured (-1)") {
    val ms = (1 to 100).map(_ * 1000000L).toArray // 1..100 ms
    assert(ServingProbe.percentileMs(ms, 0.50) === 50.0)
    assert(ServingProbe.percentileMs(ms, 0.99) === 99.0)
    assert(ServingProbe.percentileMs(ms, 1.00) === 100.0)
    assert(ServingProbe.percentileMs(Array(7000000L), 0.99) === 7.0)
    assert(ServingProbe.percentileMs(Array.empty[Long], 0.5) === -1.0)
  }
}
