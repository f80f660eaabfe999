package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: PLAN-SHAPE INVARIANCE — shuffle-partition count and AQE
  * are deployment knobs, not semantics. A 1000-executor deployment
  * runs `spark.sql.shuffle.partitions` in the thousands and AQE
  * re-plans exchanges at runtime; `local[32]` testing runs 32 with
  * whatever AQE coalesces. Any operator whose output depends on HOW
  * the data was split — float accumulation order across different
  * merge trees, per-partition tie-breaks, partition-id leakage —
  * produces one answer in CI and another in production, and no
  * single-configuration correctness gate can see it.
  *
  * The engine's discipline says results are partitioning-independent
  * by construction: integer/fixed-point/decimal aggregation wherever
  * an order-dependent float sum could drift, portable value-keyed
  * hashing (never `hash(partition)`), explicit total-order ORDER BY
  * in every query, no `spark_partition_id()`/`monotonically_
  * increasing_id()` on any result path. This probe TESTS that claim
  * over the ENTIRE registry instead of asserting it:
  *
  *  - every query runs once at the bench configuration
  *    (shuffle.partitions = [[Sessions.cpus]], AQE ON — the setting
  *    every canonical hash was ever computed at) and once at a
  *    deliberately hostile one (shuffle.partitions = 5, AQE OFF —
  *    different exchange fan-in, different merge orders, no runtime
  *    coalescing), in the same session via runtime conf;
  *  - the two results must be BIT-IDENTICAL row-for-row (canonical
  *    sort of `Row.toString`);
  *  - a NEGATIVE CONTROL — an aggregate keyed on
  *    `spark_partition_id()` after a shuffle — must come out UNEQUAL
  *    between the two configurations, proving the comparator can
  *    detect partitioning leakage, so the green rows are evidence,
  *    not vacuity.
  *
  * Exclusions mirror ChaosProbe: `q_sketch_heavy`'s Misra–Gries
  * summary CONTENTS are merge-order-dependent by design (its
  * guarantees, which its own oracle row asserts, are not).
  *
  * Results recorded in PLANS.md. Usage:
  * `sbt "runMain graft.InvarianceProbe [sfDir] [query ...]"`
  * (no queries = full registry).
  */
object InvarianceProbe {

  /** Outputs whose bytes are merge-order-dependent by design. */
  private val BitUnstable = Set("q_sketch_heavy")

  private def canonical(spark: SparkSession, name: String, dir: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(_.toString).sorted.toIndexedSeq

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val queries: Seq[String] = args.drop(1).toSeq match {
      case Seq() => SparkEntry.queries.keys.toSeq.sorted.filterNot(BitUnstable)
      case names => names
    }
    val spark = Sessions.local()
    val benchPartitions = Sessions.cpus
    // hostile partition count must DIFFER from the bench one, or the
    // negative control below compares equal and aborts the probe with
    // a misleading "comparator is vacuous" (e.g. SPARK_GRAFT_CPUS=5)
    val hostilePartitions = if (benchPartitions == "5") "7" else "5"

    def atBench[A](f: => A): A = {
      spark.conf.set("spark.sql.shuffle.partitions", benchPartitions)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      f
    }
    def atHostile[A](f: => A): A = {
      spark.conf.set("spark.sql.shuffle.partitions", hostilePartitions)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try f
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", benchPartitions)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }

    // negative control FIRST: the comparator must be able to fail.
    // spark_partition_id() after a shuffle reads the exchange's
    // partition count directly — 5 vs 32 output partitions.
    val leaky = () => spark.range(0, 100000, 1, 16)
      .selectExpr("id % 1000 as k")
      .repartition(org.apache.spark.sql.functions.col("k"))
      .selectExpr("spark_partition_id() as p")
      .groupBy("p").count()
      .collect().map(_.toString).sorted.toIndexedSeq
    require(atBench(leaky()) != atHostile(leaky()),
      "negative control: partition-id aggregate compared EQUAL — comparator is vacuous")
    println("INVARIANCE negative-control: spark_partition_id() aggregate " +
      "detected as partitioning-dependent")

    var allOk = true
    val diverged = scala.collection.mutable.ArrayBuffer[String]()
    for (name <- queries) {
      val bench = atBench(canonical(spark, name, sfDir))
      val hostile = atHostile(canonical(spark, name, sfDir))
      val same = bench == hostile
      allOk &&= same
      println(f"INVARIANCE $name%-26s rows=${bench.size}%6d " +
        f"${if (same) "BIT-IDENTICAL" else "*** DIVERGED ***"}")
      if (!same) {
        diverged += name
        hostile.diff(bench).take(3).foreach(r => println(s"  hostile-only: $r"))
        bench.diff(hostile).take(3).foreach(r => println(s"  bench-only:   $r"))
      }
    }
    require(allOk, s"diverged under partitioning change: ${diverged.mkString(", ")}")
    println(s"INVARIANCE all ${queries.size} queries bit-identical across " +
      s"(partitions=$benchPartitions, AQE on) vs (partitions=$hostilePartitions, AQE off)")
    spark.stop()
  }
}
