package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum
import graft.Fence.FenceOps

/** Dev probe: distributed two-phase prefix sum vs the naive global
  * window, on synthetic (id, toks) tables — the scale evidence for
  * q_pack_sequences (results recorded in PLANS.md). The naive form
  * `sum().over(Window.orderBy(id))` funnels the whole table through
  * ONE window partition; PrefixSum keeps all partitions busy and only
  * moves numPartitions longs through the driver. */
object PackScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32", "ERROR")
    import spark.implicits._
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq(10000000L, 50000000L, 100000000L)) {
      val df = spark.range(n).select(col("id"),
        (col("id") % 997 + 1).as("toks")).fenced()
      val distributed = time {
        PrefixSum.cumsum(df.toDF(), "id", "toks", 64, "cum")
          .agg(max(col("cum"))).head()
      }
      val naive = time {
        df.withColumn("cum",
          sum(col("toks")).over(Window.orderBy(col("id"))))
          .agg(max(col("cum"))).head()
      }
      println(f"PROBE n=$n%,d distributed=$distributed%.1fs naiveGlobalWindow=$naive%.1fs")
    }
    spark.stop()
  }
}
