package graft

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.ShardSummary

/** The streamed `q_sketch_heavy` stance: summary CONTENTS may depend
  * on arrival order and micro-batch splits, the Misra–Gries theorems
  * may not — so the spec feeds the same stream under different splits
  * and asserts the guarantees (never the contents) against exact
  * counts, plus the bounded-state property that justifies the
  * operator on unbounded input. */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val M = 8
  private val Shards = 4

  private def items: Seq[String] = {
    val rnd = new Random(41)
    rnd.shuffle(
      Seq.fill(500)("hot") ++ Seq.fill(250)("warm") ++ Seq.fill(120)("mild") ++
        (1 to 1500).map(_ => s"cold${rnd.nextInt(400)}"))
  }

  /** Run the stream with the given batch sizes; return the LAST
    * summary per shard. */
  private def run(name: String, splits: Seq[Int]): Map[Int, ShardSummary] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingHeavyHitters.heavyHitters(spark, mem.toDS(), M, Shards)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      var rest = items
      splits.foreach { n =>
        val (batch, tail) = rest.splitAt(n)
        rest = tail
        if (batch.nonEmpty) { mem.addData(batch: _*); q.processAllAvailable() }
      }
      if (rest.nonEmpty) { mem.addData(rest: _*); q.processAllAvailable() }
      spark.table(name).as[ShardSummary].collect()
        .groupBy(_.shard).map { case (s, rows) => s -> rows.last }
    } finally q.stop()
  }

  private def checkGuarantees(byShard: Map[Int, ShardSummary]): Unit = {
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val shardMass = items.groupBy(StreamingHeavyHitters.shardOf(_, Shards))
      .view.mapValues(_.size.toLong).toMap
    // mass conservation across shards
    assert(byShard.values.map(_.mass).sum == items.size.toLong)
    byShard.foreach { case (s, sum) =>
      assert(sum.items.size <= 2 * M, s"shard $s state above cap")
      assert(sum.mass == shardMass(s))
      assert(sum.err <= sum.mass / (M + 1), s"shard $s err above mass bound")
    }
    truth.foreach { case (k, t) =>
      val s = StreamingHeavyHitters.shardOf(k, Shards)
      val sum = byShard(s)
      val est = sum.items.getOrElse(k, 0L)
      assert(est <= t, s"$k: est $est above true $t")
      assert(t <= est + sum.err, s"$k: true $t above est $est + err ${sum.err}")
      if (t > shardMass(s) / (M + 1))
        assert(est > 0, s"heavy key $k (true $t) evicted from shard $s")
    }
  }

  test("guarantees hold streamed in one batch and in many micro-batches") {
    checkGuarantees(run("hh_one", Seq(Int.MaxValue)))
    checkGuarantees(run("hh_many", Seq(97, 311, 13, 700, 450)))
  }

  test("restart continuity: state carries counts across batches") {
    // a key heavy ONLY in aggregate across batches must survive:
    // 60 per batch over 5 batches; shard mass small, so it's tracked
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingHeavyHitters.heavyHitters(spark, mem.toDS(), M, 1)
      .writeStream.format("memory").queryName("hh_carry")
      .outputMode("update").start()
    try {
      (1 to 5).foreach { i =>
        mem.addData(Seq.fill(60)("slowburn") ++ (1 to 30).map(j => s"b${i}_$j"): _*)
        q.processAllAvailable()
      }
      val last = spark.table("hh_carry").as[ShardSummary].collect().last
      val est = last.items.getOrElse("slowburn", 0L)
      assert(est > 0 && est <= 300)
      assert(300L <= est + last.err)
    } finally q.stop()
  }
}
