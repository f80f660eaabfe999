package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries heavy-hitters summary as a native
  * [[TypedImperativeAggregate]] — the second UDAF extension point
  * (SURVEY.md §2.11) after the `Aggregator`-based [[CountMin]],
  * demonstrated one layer lower: an imperative Catalyst aggregate
  * holding an arbitrary JVM object between rows, hand-serialized only
  * at partial-output boundaries (the `ObjectHashAggregate` path —
  * what Spark's own `ApproximatePercentile`/`CountMinSketchAgg` use).
  *
  * Algorithm (Misra–Gries '82 with batched compaction; merge rule of
  * Agarwal et al., "Mergeable Summaries", PODS'12): keep up to 2m
  * counters; past that, subtract the (m+1)-th largest count t from
  * every counter and drop the non-positive — err grows by t while at
  * least (m+1)·t of tracked mass is removed, so after any sequence of
  * updates AND arbitrary-order merges:
  *
  *  - `est(x) ≤ true(x)`                      (counts only shrink);
  *  - `true(x) ≤ est(x) + err`                (absent ⇒ est = 0);
  *  - `err ≤ n / (m+1)`                       (mass argument above);
  *  - any x with `true(x) > n/(m+1)` is present.
  *
  * The first two and the last hold for EVERY merge order even though
  * the summary's exact contents don't — which is what makes the
  * sketch oracle-checkable through its guarantees (`q_sketch_heavy`)
  * while the raw contents stay spec-pinned (HeavyHittersSpec).
  *
  * Scale shape: the heavy-hitter query this powers needs NO
  * vocabulary-cardinality exchange — per-partition summaries are
  * ≤ 2m counters, the shuffle carries one serialized summary per
  * partition, and the driver merge is m-bounded. Compare the exact
  * top-k it replaces: a full groupBy over the (at 100 TB, billions
  * of) distinct keys.
  */
object HeavyHitters {

  /** The aggregation state: open-addressed enough for our purposes —
    * a string→count map plus the accumulated subtraction error. */
  final class Summary(val counts: mutable.HashMap[String, Long], var err: Long) {
    def mass: Long = counts.valuesIterator.sum + err
  }

  /** Subtract the (m+1)-th largest count from all entries and drop
    * the non-positive, leaving ≤ m entries. Deterministic without
    * tie-breaks: entries strictly above the threshold survive. */
  private[graft] def compact(s: Summary, m: Int): Unit =
    if (s.counts.size > m) {
      val vals = s.counts.values.toArray
      java.util.Arrays.sort(vals)
      val t = vals(vals.length - m - 1)
      s.counts.filterInPlace((_, c) => c > t)
      s.counts.mapValuesInPlace((_, c) => c - t)
      s.err += t
    }

  private[graft] def insert(s: Summary, key: String, weight: Long, cap: Int, m: Int): Unit = {
    val c = s.counts.getOrElse(key, 0L)
    s.counts.update(key, c + weight)
    if (s.counts.size > cap) compact(s, m)
  }

  private[graft] def mergeInto(a: Summary, b: Summary, m: Int): Summary = {
    b.counts.foreach { case (k, c) =>
      a.counts.update(k, a.counts.getOrElse(k, 0L) + c)
    }
    a.err += b.err
    compact(a, m)
    a
  }

  /** `struct<items: map<string,bigint>, err: bigint>` — the finished
    * summary. Keys are emitted in sorted order so the eval output is
    * a deterministic function of the summary contents. */
  val OutType: StructType = StructType(Seq(
    StructField("items", MapType(StringType, LongType, valueContainsNull = false),
      nullable = false),
    StructField("err", LongType, nullable = false)))

  case class HeavyHittersAgg(
      child: Expression,
      m: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Summary]
    with UnaryLike[Expression] {

    require(m >= 1, s"heavy_hitters capacity must be >= 1, got $m")
    private def cap = 2 * m

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters requires a STRING key, got ${child.dataType.catalogString}")
    override def dataType: DataType = OutType
    override def nullable: Boolean = false
    override def prettyName: String = "heavy_hitters"

    override def createAggregationBuffer(): Summary =
      new Summary(mutable.HashMap.empty, 0L)

    override def update(buf: Summary, input: InternalRow): Summary = {
      val v = child.eval(input)
      if (v != null)
        insert(buf, v.asInstanceOf[UTF8String].toString, 1L, cap, m)
      buf
    }

    override def merge(buf: Summary, other: Summary): Summary =
      mergeInto(buf, other, m)

    override def eval(buf: Summary): Any = {
      val entries = buf.counts.toArray.sortBy(_._1)
      val keys = new GenericArrayData(
        entries.map(e => UTF8String.fromString(e._1)).asInstanceOf[Array[Any]])
      val vals = new GenericArrayData(
        entries.map(e => java.lang.Long.valueOf(e._2)).asInstanceOf[Array[Any]])
      new GenericInternalRow(Array[Any](new ArrayBasedMapData(keys, vals), buf.err))
    }

    override def serialize(buf: Summary): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.counts.size)
      buf.counts.foreach { case (k, c) =>
        val b = k.getBytes(StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b); out.writeLong(c)
      }
      out.writeLong(buf.err)
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Summary = {
      val in = ByteBuffer.wrap(bytes)
      val n = in.getInt
      val map = mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < n) {
        val len = in.getInt
        val b = new Array[Byte](len); in.get(b)
        map.update(new String(b, StandardCharsets.UTF_8), in.getLong)
        i += 1
      }
      new Summary(map, in.getLong)
    }

    override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
      copy(child = newChild)
  }

  /** Column wrapper: `heavy_hitters(key, m)` aggregate. */
  def sketch(key: Column, m: Int): Column =
    bridge.column(HeavyHittersAgg(bridge.expression(key), m).toAggregateExpression())
}
