package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream–stream equi-join with event-time bounds — a capability the
  * reference lacks entirely (SURVEY §2.10 "Absent") but a session
  * analytics deployment needs: match each click to its impression
  * within an attribution window. Both sides are watermarked and the
  * join carries a time-range predicate, so state for either side is
  * bounded and expired rows are dropped — the property that keeps the
  * operator viable on unbounded streams.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("watermarked stream-stream join attributes clicks to impressions in-window") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]

    val imp = impressions.toDF.toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "10 minutes")
    val clk = clicks.toDF.toDF("clk_ts", "ad_c")
      .withWatermark("clk_ts", "10 minutes")

    val joined = imp.join(clk,
      col("ad") === col("ad_c") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") <= col("imp_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("ad"), col("imp_ts"), col("clk_ts"))

    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      impressions.addData((t(0), 1L), (t(5), 2L))
      clicks.addData((t(10), 1L))   // in-window for ad 1
      q.processAllAvailable()
      clicks.addData((t(50), 2L))   // 45 min after ad 2's impression → out of window
      clicks.addData((t(20), 1L))   // second in-window click for ad 1
      q.processAllAvailable()
      val rows = spark.table("attributed")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(rows == Set(
        (1L, t(0), t(10)),
        (1L, t(0), t(20))),
        s"exactly the in-window clicks must match, got $rows")
    } finally q.stop()
  }
}
