package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.Fence.FenceOps

/** Distributed order-preserving prefix sum — the classic two-phase
  * scan (Blelloch, "Prefix Sums and Their Applications", CMU-CS-90-190)
  * expressed on Spark:
  *
  *  1. range-partition on the order key, so partition *i* holds a
  *     contiguous key range entirely below partition *i+1*;
  *  2. one `mapPartitions` pass computes each partition's LOCAL
  *     running sum (per-partition imperative logic — the documented
  *     exception where `mapPartitions` beats declarative ops, since a
  *     global-ORDER-BY window would serialize the whole table through
  *     a single window partition);
  *  3. the per-partition totals (numPartitions rows — the ONLY
  *     driver-side data) become broadcast prefix offsets added back
  *     with a map-side join.
  *
  * Cost at scale: ONE shuffle (the range partitioning), one tiny agg,
  * one broadcast join. A naive `sum().over(Window.orderBy(k))` is a
  * single-task bottleneck at any scale — Spark even warns
  * "No Partition Defined for Window operation".
  *
  * Used by the sequence-packing operator (`q_pack_sequences`):
  * concat-and-chunk token budgeting needs the global running token
  * count in document order.
  */
object PrefixSum {

  /** Append inclusive running sum of `valueCol` (any numeric; summed
    * as Long) in ascending `orderCol` order as column `out`.
    * `orderCol` must be a total order (unique) for the result to be
    * deterministic. */
  def cumsum(df: DataFrame, orderCol: String, valueCol: String,
      numPartitions: Int, out: String): DataFrame =
    cumsumBy(df, Seq(orderCol), valueCol, numPartitions, out)

  /** [[cumsum]] over a composite (lexicographic) order key — the
    * ordering the epoch-shuffle shard construction needs, where the
    * leading key (shard) is LOW-cardinality: range partitioning on
    * the full composite splits a big leading-key group across many
    * partitions, so parallelism is independent of that key's
    * cardinality (a `row_number` window partitioned by it would
    * funnel each group through one task). The key tuple must be a
    * total order (unique) for determinism. */
  def cumsumBy(df: DataFrame, orderCols: Seq[String], valueCol: String,
      numPartitions: Int, out: String): DataFrame = {
    require(orderCols.nonEmpty, "cumsumBy needs at least one order column")
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(numPartitions, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val valueIdx = ranged.schema.fieldIndex(valueCol)
    val schema = ranged.schema.add("__pid", IntegerType).add(out, LongType)
    // localCheckpoint: the scanned+summed rows feed BOTH the totals
    // agg and the final join — without the pin the expensive pass
    // (and the nondeterministic partition ids) would recompute.
    val local = ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var run = 0L
      it.map { r =>
        run += r.getAs[Number](valueIdx).longValue()
        Row.fromSeq(r.toSeq :+ pid :+ run)
      }
    }(Encoders.row(schema)).fenced()
    val totals = local.groupBy(col("__pid"))
      .agg(max(col(out)).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).init).toSeq
    val offDf = spark.createDataFrame(offsets).toDF("__pid", "__off")
    local.join(broadcast(offDf), "__pid")
      .withColumn(out, col(out) + col("__off"))
      .drop("__pid", "__off")
  }
}
