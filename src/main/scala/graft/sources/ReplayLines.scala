package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
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

/** S2/S5 analog — a custom DataSource V2 micro-batch source that
  * replays a line file at a bounded rate.
  *
  * The reference has two custom sources Spark lacks: an HTTP long-poll
  * JSONL reader (`collector.clj:39-74`) and a fixture replay
  * (`dev/user.clj:14-26`), both "pull N more items, remember where you
  * were". This connector implements that contract against the DSv2
  * `MicroBatchStream` API: the offset is a line number, each trigger
  * admits at most `linesPerTrigger` lines (T3 admission control), and
  * recovery replays from the committed offset (the property the
  * reference approximates with retry/backoff, `collector.clj:48-53`).
  * Swapping the file for a socket/HTTP cursor changes only the
  * partition reader.
  *
  * With `ratePerSecond` set, admission is additionally paced against
  * the wall clock — the reference's fixture replay cadence
  * (`dev/user.clj:14-26` replays 1 line/s via `util.clj:6-11`): a
  * trigger may only admit up to ⌊elapsed·rate⌋ lines since stream
  * start, so a fast trigger loop idles instead of draining the file.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.ReplayLines")
  *   .option("path", file).option("linesPerTrigger", "500")
  *   .option("ratePerSecond", "100")   // optional wall-clock pacing
  *   .load()
  * }}}
  */
class ReplayLines extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplayLines.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ReplayTable(opts.get("path"),
      opts.getInt("linesPerTrigger", 1000),
      opts.getDouble("ratePerSecond", 0.0))
  }
}

object ReplayLines {
  val Schema: StructType = StructType(Seq(StructField("line", StringType)))

  /** Pure pacing rule (unit-tested without a clock): the next end
    * offset given the engine's start offset, the PACING BASE (the
    * offset the stream instance started from — after a checkpoint
    * restart that is the committed offset, so the cadence resumes
    * there instead of stalling start/rate seconds against line 0),
    * the file size, the per-trigger cap, the pacing rate (≤ 0 =
    * unpaced), and elapsed wall seconds. Never moves backwards; never
    * passes EOF. */
  def pacedTarget(start: Long, base: Long, total: Long, linesPerTrigger: Int,
      ratePerSecond: Double, elapsedSec: Double): Long = {
    val byTrigger = start + linesPerTrigger
    val byRate =
      if (ratePerSecond <= 0) Long.MaxValue
      else base + math.floor(elapsedSec * ratePerSecond).toLong
    math.min(total, math.max(start, math.min(byTrigger, byRate)))
  }
}

private[sources] class ReplayTable(path: String, linesPerTrigger: Int,
    ratePerSecond: Double)
    extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  override def name(): String = s"replay($path)"
  override def schema(): StructType = ReplayLines.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ReplayLines.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ReplayMicroBatchStream(path, linesPerTrigger, ratePerSecond)
      }
    }
}

private[sources] case class LineOffset(line: Long) extends Offset {
  override def json(): String = line.toString
}

private[sources] case class LineRange(path: String, start: Long, end: Long,
    byteStart: Long) extends InputPartition

private[sources] class ReplayMicroBatchStream(path: String, linesPerTrigger: Int,
    ratePerSecond: Double = 0.0)
    extends MicroBatchStream with SupportsAdmissionControl {

  /** Wall-clock epoch for pacing — set when the stream is created —
    * and the offset the cadence is measured FROM (the first start
    * offset the engine hands us, i.e. the committed offset after a
    * checkpoint restart). */
  private val startNanos: Long = System.nanoTime()
  @volatile private var paceBase: Long = -1L

  /** Byte offset of each line start (one O(n) scan at stream start) —
    * partition readers seek directly instead of re-reading the file
    * from line 0 every batch, which would make a full replay
    * O(n²/linesPerTrigger). */
  private lazy val lineStarts: Array[Long] = {
    val starts = scala.collection.mutable.ArrayBuffer(0L)
    val in = new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(path)), 1 << 16)
    try {
      var pos = 0L
      var b = in.read()
      while (b >= 0) {
        pos += 1
        if (b == '\n') starts += pos
        b = in.read()
      }
      // drop the phantom start after a trailing newline
      if (starts.last == pos && pos > 0) starts.dropRightInPlace(1)
    } finally in.close()
    starts.toArray
  }

  private lazy val total: Long = lineStarts.length.toLong

  override def initialOffset(): Offset = LineOffset(0L)
  override def deserializeOffset(json: String): Offset = LineOffset(json.toLong)
  override def commit(end: Offset): Unit = ()

  /** T3 admission control, engine-coordinated: each trigger admits at
    * most linesPerTrigger lines past the engine's own start offset
    * (self-tracking the committed position would race the engine's
    * offset log). */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(linesPerTrigger)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LineOffset].line
    if (paceBase < 0) paceBase = s
    LineOffset(ReplayLines.pacedTarget(s, paceBase, total, linesPerTrigger,
      ratePerSecond, (System.nanoTime() - startNanos) / 1e9))
  }

  override def reportLatestOffset(): Offset = LineOffset(total)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LineOffset].line
    val e = end.asInstanceOf[LineOffset].line
    if (e <= s) Array.empty
    // one partition per admitted slice, carrying its byte position so
    // the reader seeks instead of scanning from the top of the file
    else Array(LineRange(path, s, e, lineStarts(s.toInt)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val LineRange(p, s, e, byteStart) = partition.asInstanceOf[LineRange]
      new PartitionReader[InternalRow] {
        private val channel = java.nio.channels.FileChannel
          .open(Paths.get(p), java.nio.file.StandardOpenOption.READ)
        channel.position(byteStart): Unit
        private val reader = new java.io.BufferedReader(
          java.nio.channels.Channels.newReader(channel, StandardCharsets.UTF_8),
          1 << 16)
        private var pos = s
        private var current: String = _
        override def next(): Boolean = {
          if (pos >= e) false
          else {
            current = reader.readLine()
            pos += 1
            current != null
          }
        }
        override def get(): InternalRow =
          InternalRow(UTF8String.fromString(current))
        override def close(): Unit = reader.close()
      }
    }

  override def stop(): Unit = ()
}
