package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingMoments

/** Streamed exact moments ≡ the batch decimal sums over any prefix,
  * and the Welch t computed from them ≡ `q_ab_test`'s statistic. */
class StreamingMomentsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val events: Seq[(Long, String, Double)] =
    Tables(spark, TestSpark.Sf, "events")
      .select(col("event_id").cast("long"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)

  private def batchMoments(rows: Seq[(Long, String, Double)])
      : Map[String, (Long, String, String)] =
    rows.map(r => (r._2, r._3)).toDF("event_type", "value")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).as("sx"),
        sum((col("value") * col("value")).cast(DecimalType(27, 8))).as("sx2"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        r.getDecimal(2).stripTrailingZeros.toPlainString,
        r.getDecimal(3).stripTrailingZeros.toPlainString))
      .toMap

  test("streamed moments equal the batch decimal sums over every prefix") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = StreamingMoments.moments(spark, mem.toDF.toDF("event_type", "value"))
      .writeStream.format("memory").queryName("smoments")
      .outputMode("update").start()
    try {
      val splits = events.map(e => (e._2, e._3)).grouped(4000).toSeq
      var fed = Seq.empty[(Long, String, Double)]
      var i = 0
      for (batch <- splits) {
        mem.addData(batch: _*)
        q.processAllAvailable()
        fed = events.take(fed.size + batch.size)
        // latest emission per group = the one with the largest n
        val streamed = spark.table("smoments")
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("event_type")).orderBy(col("n").desc)))
          .where(col("rn") === 1)
          .select(col("event_type"), col("n"), col("sx"), col("sx2"))
          .collect()
          .map(r => r.getString(0) -> (r.getLong(1),
            r.getDecimal(2).stripTrailingZeros.toPlainString,
            r.getDecimal(3).stripTrailingZeros.toPlainString))
          .toMap
        assert(streamed == batchMoments(fed), s"prefix ${fed.size} (split $i)")
        i += 1
      }
    } finally q.stop()
  }

  test("grid matches Spark's double→decimal cast at boundary values") {
    // 2.00005's binary value is 2.0000499999…: an exact-binary-expansion
    // grid (new JBigDecimal(v)) rounds it DOWN to 2.0000 while Spark's
    // Decimal(BigDecimal(d)) cast — Double.toString semantics — rounds
    // UP to 2.0001. The grid must follow the cast, else streamed sums
    // diverge from batch at representable boundaries.
    val boundary = Seq(2.00005, 0.12345, -2.00005, 1.00005, 3.141592653589793)
    val viaCast = boundary.toDF("value")
      .select(col("value").cast(DecimalType(18, 4)).as("x"),
        (col("value") * col("value")).cast(DecimalType(27, 8)).as("x2"))
      .collect()
      .map(r => (r.getDecimal(0).stripTrailingZeros.toPlainString,
        r.getDecimal(1).stripTrailingZeros.toPlainString))
    val viaGrid = boundary.map(v =>
      (StreamingMoments.gridX(v).stripTrailingZeros.toPlainString,
        StreamingMoments.gridX2(v).stripTrailingZeros.toPlainString))
    assert(viaGrid == viaCast.toSeq)
  }

  test("Welch t from streamed moments matches q_ab_test") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = StreamingMoments.moments(spark, mem.toDF.toDF("event_type", "value"))
      .writeStream.format("memory").queryName("smoments_t")
      .outputMode("update").start()
    try {
      mem.addData(events.map(e => (e._2, e._3)): _*)
      q.processAllAvailable()
      val m = spark.table("smoments_t")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("n").desc)))
        .where(col("rn") === 1)
        .as[StreamingMoments.Moments].collect()
        .map(x => x.event_type -> x).toMap
      val expect = SparkEntry.queries("q_ab_test")(spark, TestSpark.Sf)
        .select(col("ta"), col("tb"), col("t")).as[(String, String, Double)]
        .collect()
      assert(expect.nonEmpty)
      expect.foreach { case (ta, tb, t) =>
        val got = StreamingMoments.welchT(m(ta), m(tb))
        assert(math.abs(BigDecimal(got).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble - t) == 0.0,
          s"($ta, $tb): streamed t=$got batch t=$t")
      }
    } finally q.stop()
  }
}
