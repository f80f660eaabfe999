package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PrefixSum
import graft.streaming.StreamingKsGate
import graft.streaming.StreamingKsGate.KsVerdict

/** Pins the streaming KS gate to the BATCH q_quality_ks plan run over
  * every prefix: same integer sup-gap numerator bit-for-bit, same
  * rounded D, across arbitrary micro-batch splits. */
class StreamingKsGateSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** The q_quality_ks core (per-value counts → PrefixSum CDFs →
    * integer sup-gap) over an in-memory (x, isFocus) prefix. */
  private def batchKs(rows: Seq[(Long, Boolean)]): KsVerdict = {
    val tagged = rows.toDF("x", "f").select(col("x"),
      when(col("f"), 1L).otherwise(0L).as("ia"),
      when(col("f"), 0L).otherwise(1L).as("ib"))
    val per = tagged.groupBy(col("x"))
      .agg(sum(col("ia")).as("cnt_a"), sum(col("ib")).as("cnt_b"))
    val withCa = PrefixSum.cumsum(per, "x", "cnt_a", 4, "ca")
    val withCb = PrefixSum.cumsum(withCa, "x", "cnt_b", 4, "cb")
    val tot = tagged.agg(sum(col("ia")).cast("long").as("n_a"),
      sum(col("ib")).cast("long").as("n_b"))
    val r = withCb.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        abs(col("ca") * col("n_b") - col("cb") * col("n_a")).as("g"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("g")).cast("long").as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        round(col("d_num").cast("double") / (col("n_a") * col("n_b")), 6)
          .as("ks_d"))
      .collect()(0)
    KsVerdict(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("per-batch verdicts equal the batch KS over each prefix") {
    implicit val sqlCtx = spark.sqlContext
    // focus distribution drifts long in the last chunk; duplicate
    // values and values unique to one side are both exercised
    val chunks: Seq[Seq[(Long, Boolean)]] = Seq(
      Seq((10L, true), (12L, false), (10L, false), (14L, true), (12L, true)),
      Seq((11L, false), (10L, true), (16L, false), (12L, false), (12L, true)),
      Seq((40L, true), (44L, true), (41L, true), (12L, false), (47L, true)))
    val mem = MemoryStream[(Long, Long, Long)]
    val q = StreamingKsGate.gate(spark, mem.toDS())
      .writeStream.format("memory").queryName("ks_gate")
      .outputMode("update").start()
    try {
      var prefix = Seq.empty[(Long, Boolean)]
      for (chunk <- chunks) {
        prefix ++= chunk
        // pre-aggregate the chunk per value — the upstream distributed
        // combine the gate's contract expects
        val perValue = chunk.groupBy(_._1).toSeq.map { case (x, rs) =>
          (x, rs.count(_._2).toLong, rs.count(!_._2).toLong) }
        mem.addData(perValue: _*)
        q.processAllAvailable()
        val got = spark.table("ks_gate").as[KsVerdict].collect().last
        val want = batchKs(prefix)
        assert(got == want, s"prefix of ${prefix.size}")
        // and the shared scalar kernel agrees with the plan-level batch
        val hist = prefix.groupBy(_._1).map { case (x, rs) =>
          x -> (rs.count(_._2).toLong, rs.count(!_._2).toLong) }
        assert(StreamingKsGate.verdict(hist) == want)
      }
      // the drift chunk must actually move the statistic up
      val all = spark.table("ks_gate").as[KsVerdict].collect()
      assert(all.last.ksD > all.head.ksD)
    } finally q.stop()
  }
}
