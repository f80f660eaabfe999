package graft.sources

import java.io.{BufferedReader, IOException, InputStreamReader}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S2 — HTTP long-poll JSONL source with the reference's transport
  * semantics (`collector.clj:39-74`):
  *
  *  - 5 s connect/read timeouts and a client User-Agent
  *    (`collector.clj:41-45`);
  *  - on orderly EOF the server closed the long poll → reconnect
  *    immediately (`collector.clj:60-68`, the outer loop);
  *  - on IOException retry with exponential backoff, 3 s base doubling
  *    to a 60 s cap (`collector.clj:47-53`), reset after a successful
  *    read;
  *  - optional `limit`: stop after N lines total (`collector.clj:57`).
  *
  * Architecture = the reference's: ONE driver-side reader thread feeds
  * a bounded buffer (its core.async channel), and consumers drain it.
  * Here the consumer is the micro-batch engine: offsets are cumulative
  * line counts, each trigger admits at most `linesPerTrigger` buffered
  * lines (T3 admission control), and committed prefixes are freed.
  * Admitted lines ship INSIDE the InputPartition: an HTTP long-poll
  * cannot seek back, so executors must not re-fetch — the per-trigger
  * cap bounds partition payload. Within a run the offset log gives
  * exactly-once; across a cold restart an un-buffered long poll is
  * at-most-once, exactly like the reference's sliding-buffer channel
  * (`collector.clj:128`, drop-not-queue under backpressure).
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.HttpLines")
  *   .option("url", "http://host:port/events")
  *   .option("linesPerTrigger", "500")
  *   .option("limit", "10000")          // optional
  *   .option("sse", "true")             // optional: decode text/event-stream
  *   .load()
  * }}}
  *
  * With `sse=true` the transport consumes a `text/event-stream`
  * response (the reference's OTHER wire format, the one the viz
  * client subscribes to): `data:` frames are decoded to payload rows
  * ([[HttpLines.sseFeed]]), so the engine can subscribe to either
  * endpoint of a reference-shaped server — including its own
  * [[graft.streaming.EventServer]].
  */
class HttpLines extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpLines.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new HttpTable(HttpConfig(
      url = opts.get("url"),
      linesPerTrigger = opts.getInt("linesPerTrigger", 1000),
      limit = opts.getLong("limit", 0L),
      connectTimeoutMs = opts.getInt("connectTimeoutMs", 5000),
      readTimeoutMs = opts.getInt("readTimeoutMs", 5000),
      backoffBaseMs = opts.getLong("backoffBaseMs", 3000L),
      backoffMaxMs = opts.getLong("backoffMaxMs", 60000L),
      sse = opts.getBoolean("sse", false)))
  }
}

object HttpLines {
  val Schema: StructType = StructType(Seq(StructField("line", StringType)))

  /** Incremental SSE decoder state: the current event's accumulated
    * `data:` lines (reverse order). */
  final case class SseState(parts: List[String] = Nil)

  /** Feed one raw line of a `text/event-stream` response →
    * (next state, completed event payload?). Per the SSE wire format
    * (and the reference's `data: {json}\n\n` framing,
    * `http.clj:96-97`): `data:` lines accumulate with one optional
    * leading space stripped; a blank line dispatches the event
    * (multi-line data joined by \n); every other field (`event:`,
    * `id:`, `retry:`, `:` comments) is ignored. Pure — unit-tested
    * independently of the transport. */
  def sseFeed(st: SseState, line: String): (SseState, Option[String]) =
    if (line.isEmpty) {
      if (st.parts.isEmpty) (st, None)
      else (SseState(), Some(st.parts.reverse.mkString("\n")))
    } else if (line.startsWith("data:"))
      (SseState(line.drop(5).stripPrefix(" ") :: st.parts), None)
    else (st, None)

  /** `collector.clj:53` (`delay-exp 3000` capped at 60000): delay
    * before retry n (1-based) — base·2ⁿ⁻¹, capped. Pure, unit-tested:
    * 3 s, 6 s, 12 s, 24 s, 48 s, 60 s, 60 s, … */
  def backoffMs(attempt: Int, baseMs: Long, maxMs: Long): Long =
    math.min(maxMs, baseMs * (1L << math.min(attempt - 1, 30)))
}

private[sources] case class HttpConfig(url: String, linesPerTrigger: Int,
    limit: Long, connectTimeoutMs: Int, readTimeoutMs: Int,
    backoffBaseMs: Long, backoffMaxMs: Long, sse: Boolean = false) {
  require(url != null, "option 'url' is required")
}

private[sources] class HttpTable(cfg: HttpConfig) extends Table with SupportsRead {
  override def name(): String = s"httpLines(${cfg.url})"
  override def schema(): StructType = HttpLines.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = HttpLines.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new HttpMicroBatchStream(cfg)
      }
    }
}

/** The reference's reader thread (`retrieve-page-requests`): connect,
  * drain lines, reconnect on EOF, back off on IOException, honor the
  * line limit. Buffered lines are indexed by CUMULATIVE position;
  * committed prefixes are dropped so memory is O(un-committed). */
private[sources] final class HttpFetcher(cfg: HttpConfig) {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
  private var baseIdx = 0L      // cumulative index of buf(0)
  private var fetchedCount = 0L // total lines ever buffered
  @volatile private var stopped = false
  @volatile private var fatal: Throwable = _
  /** connections opened (observable in tests: reconnect-on-EOF). */
  @volatile var connections: Int = 0
  /** IOException retries performed (observable in tests: backoff). */
  @volatile var retries: Int = 0

  private def limitReached: Boolean =
    cfg.limit > 0 && fetchedCount >= cfg.limit

  private val thread = new Thread(() => run(), s"http-lines(${cfg.url})")
  thread.setDaemon(true)
  thread.start()

  private def run(): Unit = {
    var attempt = 0
    try {
      while (!stopped && !limitReached) {
        try {
          val conn = URI.create(cfg.url).toURL.openConnection()
            .asInstanceOf[HttpURLConnection]
          conn.setConnectTimeout(cfg.connectTimeoutMs)
          conn.setReadTimeout(cfg.readTimeoutMs)
          conn.setRequestProperty("User-Agent", "graft-collector/0.0.0")
          val reader = new BufferedReader(new InputStreamReader(
            conn.getInputStream, StandardCharsets.UTF_8))
          connections += 1
          try {
            // SSE mode: decode `data:` frames to payload lines; a
            // partial frame at disconnect is dropped (at-most-once,
            // same stance as the long-poll restart)
            var sse = HttpLines.SseState()
            var line = reader.readLine()
            while (line != null && !stopped && !limitReached) {
              attempt = 0 // a delivered line proves the link — reset backoff
              if (cfg.sse) {
                val (st, payload) = HttpLines.sseFeed(sse, line)
                sse = st
                payload.foreach { p =>
                  synchronized { buf += p; fetchedCount += 1 }
                }
              } else synchronized { buf += line; fetchedCount += 1 }
              line = reader.readLine()
            }
          } finally {
            reader.close()
            conn.disconnect()
          }
          // orderly EOF → loop reconnects immediately (collector.clj:66-68)
        } catch {
          case _: IOException if !stopped =>
            attempt += 1
            retries += 1
            Thread.sleep(HttpLines.backoffMs(attempt,
              cfg.backoffBaseMs, cfg.backoffMaxMs))
        }
      }
    } catch {
      case _: InterruptedException => () // stop() during backoff sleep
      case t: Throwable => fatal = t
    }
  }

  /** Re-anchor buffer position 0 at cumulative offset `to` — called
    * once with the engine's first start offset, so that after a
    * checkpoint restart the fresh connection's lines continue the
    * committed offset sequence instead of aliasing offsets 0..n (the
    * long poll cannot replay history; this is the reference's
    * at-most-once restart, `collector.clj:128`). */
  def rebase(to: Long): Unit = synchronized {
    // lines already buffered (the thread starts at construction)
    // simply re-index to to..to+n — they are fresh data continuing
    // the committed sequence
    if (to > baseIdx) baseIdx = to
  }

  /** Total lines available (cumulative offset space). */
  def available: Long = synchronized {
    if (fatal != null) throw new IllegalStateException("http fetcher died", fatal)
    baseIdx + buf.length
  }

  /** Cumulative slice [from, until) — offsets below the rebased
    * window yield what fresh lines exist there (a replayed
    * pre-restart batch maps onto fresh data, the documented
    * at-most-once restart), never an aliased raw index. */
  def slice(from: Long, until: Long): Array[String] = synchronized {
    val lo = math.max(0L, from - baseIdx).toInt
    val hi = math.max(0L, until - baseIdx).toInt
    buf.slice(lo, hi).toArray
  }

  /** Free committed prefix (clamped: a replayed commit may reference
    * offsets beyond what the fresh connection has buffered). */
  def prune(upTo: Long): Unit = synchronized {
    if (upTo > baseIdx) {
      buf.dropInPlace(math.min((upTo - baseIdx).toInt, buf.length))
      baseIdx = upTo
    }
  }

  def stop(): Unit = { stopped = true; thread.interrupt() }
}

private[sources] case class HttpSlice(lines: Array[String]) extends InputPartition

private[sources] class HttpMicroBatchStream(cfg: HttpConfig)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val fetcher = new HttpFetcher(cfg)

  override def initialOffset(): Offset = LineOffset(0L)
  override def deserializeOffset(json: String): Offset = LineOffset(json.toLong)
  override def commit(end: Offset): Unit =
    fetcher.prune(end.asInstanceOf[LineOffset].line)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(cfg.linesPerTrigger)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LineOffset].line
    if (!rebased) { fetcher.rebase(s); rebased = true }
    LineOffset(math.max(s,
      math.min(fetcher.available, s + cfg.linesPerTrigger)))
  }
  @volatile private var rebased = false

  override def reportLatestOffset(): Offset = LineOffset(fetcher.available)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LineOffset].line
    // after a restart the engine may REPLAY a pending uncommitted
    // batch before ever calling latestOffset — anchor the fresh
    // buffer at that batch's start so its lines (and the commit that
    // follows) line up with the replayed offsets instead of pruning
    // unseen data
    if (!rebased) { fetcher.rebase(s); rebased = true }
    val e = end.asInstanceOf[LineOffset].line
    if (e <= s) Array.empty
    else Array(HttpSlice(fetcher.slice(s, e)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val lines = partition.asInstanceOf[HttpSlice].lines
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < lines.length }
        override def get(): InternalRow =
          InternalRow(UTF8String.fromString(lines(i)))
        override def close(): Unit = ()
      }
    }

  override def stop(): Unit = fetcher.stop()
}
