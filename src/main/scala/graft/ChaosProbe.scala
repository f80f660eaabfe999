package graft

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorAdded, SparkListenerExecutorRemoved, SparkListenerSpeculativeTaskSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Dev tool: DETERMINISM UNDER TASK RETRY AND SPECULATION — the
  * failure mode a 1000-executor run hits hourly and `local[32]` never
  * does. On a real cluster, tasks are retried after executor loss and
  * duplicated by speculative execution; any operator whose output
  * depends on attempt identity, partial-result order, or wall clock
  * silently corrupts results under retries — the corruption no
  * correctness gate on a healthy run can see.
  *
  * The engine's design claim is that every query is a pure function
  * of its input data — integer fixed-point iteration, portable-hash
  * sampling/sketching, no RNG, no clock, no attempt-dependent state.
  * This probe TESTS that claim instead of asserting it:
  *
  *  - session runs `local-cluster[4, 8, 2048]` — four REAL worker
  *    JVMs, so results cross genuine serialization boundaries and the
  *    chaos expression deserializes on executors exactly as on a
  *    cluster — with 4 task attempts and aggressive SPECULATION
  *    (multiplier 1.0, quantile 0.5; Spark hard-disables speculation
  *    in `local[]` mode, which is itself a reason local-mode-only
  *    testing under-covers cluster behavior);
  *  - a user-provided optimizer rule wraps EVERY v1 scan in a
  *    `Filter(ChaosOk, scan)` whose predicate THROWS on the first row
  *    of every task's attempt 0 (the rule runs after the main
  *    optimizer batches, so pushdown/pruning have already happened and
  *    the rest of the plan is production-shaped) — every non-empty
  *    scan task DIES once and must recover through retry;
  *  - each probed query runs once clean (chaos disarmed) and once
  *    under fault injection, and the two results must be
  *    BIT-IDENTICAL row-for-row (canonical sort of `Row.toString`);
  *    the run REQUIRES failed-task count > 0 — a probe where no task
  *    actually died proves nothing;
  *  - a NEGATIVE CONTROL (an `rand()`-keyed aggregate) must come out
  *    UNEQUAL between two runs — proving the comparator can detect
  *    nondeterminism, so the green rows are evidence, not vacuity.
  *
  * Probed queries span the structure classes where retry bugs hide:
  * iterative fixed-point (pagerank, CC-star, k-means-trained IVF),
  * multi-stage banded dedup (pipeline, semantic), window+CC composite
  * (entity resolution), hash sampling, and exact-decimal TPC-H
  * aggregation. Deliberately EXCLUDED: `q_sketch_heavy` — Misra–Gries
  * summary CONTENTS are merge-order-dependent by design (its oracle
  * asserts the sketch guarantees, not bytes), so bit-comparison is
  * the wrong instrument for it; its guarantee columns are what its
  * own oracle row checks.
  *
  * Results recorded in PLANS.md. Usage:
  * `SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 sbt
  *  "runMain graft.ChaosProbe [sfDir]"` (the two env vars feed the
  * in-process executor-launch command builder; without the second,
  * the launcher — which normally gets it from load-spark-env.sh —
  * dies with "Cannot find any build directories").
  */
object ChaosProbe {

  @volatile private var armed = false

  /** Boolean predicate that throws on the first evaluated row of
    * EVERY scan task's attempt 0 while armed — so every non-empty scan
    * task in every stage dies once and must recover through retry.
    * (A partition-id-keyed rule is placement-dependent: Spark splits
    * small files into per-core byte ranges but all parquet rows live
    * in one row group, so only ONE split produces rows and its
    * partition id is an accident of file size.) Nondeterministic so it
    * can neither be constant-folded away nor reordered below the scan
    * it guards; CodegenFallback is fine — a fault injector is not a
    * hot path. */
  private case class ChaosOk(live: Boolean) extends LeafExpression
      with Nondeterministic with CodegenFallback {
    override def nullable: Boolean = false
    override def dataType: DataType = BooleanType
    override protected def initializeInternal(partitionIndex: Int): Unit = {}
    override protected def evalInternal(input: InternalRow): Any = {
      // `live` is BAKED IN at injection time and travels with the
      // serialized plan — executors are separate JVMs here, so a
      // driver-side mutable flag would read false on every executor
      val tc = TaskContext.get()
      if (live && tc != null && tc.attemptNumber() == 0)
        throw new RuntimeException(
          s"graft-chaos: injected fault, partition ${tc.partitionId()}")
      true
    }
  }

  /** Wraps every v1 relation scan in the chaos predicate. The
    * user-rule batch is a FixedPoint — a transform alone would stack
    * one wrapper per re-run (transformUp cannot prune beneath an
    * already-wrapped node), so idempotence is a whole-plan guard. */
  private object InjectChaos extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (plan.exists { case Filter(ChaosOk(_), _) => true; case _ => false })
        plan
      else plan.transformUp {
        case r: LogicalRelation => Filter(ChaosOk(armed), r)
      }
  }

  private final class FailureCount extends SparkListener {
    val failed = new java.util.concurrent.atomic.AtomicLong(0)
    val speculative = new java.util.concurrent.atomic.AtomicLong(0)
    val live = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    override def onTaskEnd(ev: SparkListenerTaskEnd): Unit =
      if (ev.reason != org.apache.spark.Success) failed.incrementAndGet(): Unit
    override def onSpeculativeTaskSubmitted(
        ev: SparkListenerSpeculativeTaskSubmitted): Unit =
      speculative.incrementAndGet(): Unit
    override def onExecutorAdded(ev: SparkListenerExecutorAdded): Unit =
      live.add(ev.executorId): Unit
    override def onExecutorRemoved(ev: SparkListenerExecutorRemoved): Unit =
      live.remove(ev.executorId): Unit
  }

  private val DefaultQueries = Seq(
    "q_pagerank", "q_dedup_cc_star", "q_knn_ivf_trained",
    "q_dedup_pipeline", "q_dedup_semantic", "q_entity_resolution",
    "q_sample_hash", "q_tpch_q9", "q_meter_ewma", "q_dedup_edit")

  /** Excluded from the `--all` sweep: outputs whose BYTES are
    * merge-order-dependent by design while their semantics are
    * order-free — their own oracles assert the guarantees instead. */
  private val BitUnstable = Set(
    "q_sketch_heavy" // Misra–Gries summary contents
  )

  private def canonical(spark: SparkSession, name: String, dir: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(_.toString).sorted.toIndexedSeq

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // remaining args select queries; `--all` sweeps the ENTIRE
    // registry (minus BitUnstable) — the blanket claim that every
    // query in the engine is a pure function of its input under
    // task retry
    val Queries: Seq[String] = args.drop(1).toSeq match {
      case Seq("--all") =>
        SparkEntry.queries.keys.toSeq.sorted.filterNot(BitUnstable)
      case Seq() => DefaultQueries
      case names => names
    }
    // local-cluster worker JVMs resolve the executor launch command
    // through this (no full distribution on the executor side otherwise)
    sys.props("spark.test.home") = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    val spark = SparkSession.builder()
      // REAL multi-executor topology: 4 worker JVMs x 8 cores — task
      // retries AND speculation live (Spark hard-disables speculation
      // in local[] mode: TaskSchedulerImpl guards the speculation
      // scheduler with !isLocal), results cross real serialization
      // boundaries, and the chaos expression deserializes on real
      // executors exactly as it would on a cluster
      .master("local-cluster[4, 8, 2048]")
      .config("spark.task.maxFailures", "4")
      .config("spark.executor.extraClassPath",
        sys.props.getOrElse("java.class.path", ""))
      .config("spark.sql.shuffle.partitions", Sessions.cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.speculation", "true")
      .config("spark.speculation.multiplier", "1.0")
      .config("spark.speculation.quantile", "0.5")
      .config("spark.speculation.interval", "50ms")
      // the 3.4+ efficiency gate needs live task metrics that only
      // arrive with 10 s executor heartbeats — a 2 s straggler would
      // never qualify; the duration criterion alone is the classic
      // speculation semantics this probe exercises
      .config("spark.speculation.efficiency.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ InjectChaos

    val counter = new FailureCount
    spark.sparkContext.addSparkListener(counter)

    // negative control FIRST: the comparator must be able to fail
    val nd = () => spark.range(0, 1000000, 1, 32)
      .selectExpr("cast(rand() * 1000 as long) as r")
      .selectExpr("sum(r) as s")
      .collect().map(_.toString).sorted.toIndexedSeq
    require(nd() != nd(),
      "negative control: rand() aggregate compared EQUAL — comparator is vacuous")
    println("CHAOS negative-control: rand() aggregate detected as nondeterministic")

    // task-end events are delivered async — settle before reading
    def settled(): Long = {
      var prev = -1L
      while (counter.failed.get != prev) {
        prev = counter.failed.get; Thread.sleep(300)
      }
      prev
    }

    var allOk = true
    for (name <- Queries) {
      armed = false
      val clean = canonical(spark, name, sfDir)
      val before = settled()
      armed = true
      val chaos =
        try canonical(spark, name, sfDir)
        finally armed = false
      val injected = settled() - before
      val same = clean == chaos
      allOk &&= same
      println(f"CHAOS $name%-22s rows=${clean.size}%6d injected_failures=$injected%4d " +
        f"spec_submitted=${counter.speculative.get}%4d ${if (same) "BIT-IDENTICAL" else "*** DIVERGED ***"}")
      // a query whose plan reads no v1 scan (synthesized input) has no
      // injection point — its comparison still ran, flag it instead of
      // failing the sweep
      if (injected == 0) println(s"CHAOS $name: no scan task failed (no v1 scan in plan)")
      if (!same) {
        chaos.diff(clean).take(3).foreach(r => println(s"  chaos-only: $r"))
        clean.diff(chaos).take(3).foreach(r => println(s"  clean-only: $r"))
      }
    }
    require(allOk, "at least one query diverged under task retry")

    // Speculation demonstrator: the probed queries' tasks finish in
    // milliseconds at this SF, so the speculation thread never fires
    // on them — force it explicitly with a straggler partition that
    // sleeps past the stage median. The scheduler must MARK the
    // straggler and submit a speculative copy (the
    // SpeculativeTaskSubmitted event). Placement note: Spark never
    // RUNS a speculative copy on the same host as the original
    // (dequeueSpeculativeTask excludes hosts with a live attempt), and
    // every local-cluster worker shares this host — so the submit is
    // as far as one box can take it; the duplicate-EXECUTION path
    // itself is already exercised by every injected retry above, and
    // the result must be exact regardless of which attempt commits.
    armed = false
    val specSum = spark.range(0, 3200, 1, 32).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (pid == 0) Thread.sleep(2000)
        it
      }.map(_.toDouble).sum()
    require(specSum == (3200L * 3199 / 2).toDouble,
      s"straggler-race sum wrong: $specSum")
    // task-end delivery is async; give the straggler's event time
    var waited = 0
    while (counter.speculative.get == 0 && waited < 5000) {
      Thread.sleep(250); waited += 250
    }
    require(counter.speculative.get > 0,
      "speculation never submitted — the scheduler path was not exercised")
    println(s"CHAOS speculation: straggler stage exact; scheduler submitted " +
      s"${counter.speculative.get} speculative cop(ies) " +
      "(same-host placement keeps them queued — see scaladoc)")
    println(s"CHAOS all ${Queries.size} queries bit-identical under " +
      s"scan-fault retries (total failed tasks ${counter.failed.get}, " +
      s"speculative submissions ${counter.speculative.get})")

    // Executor-LOSS demonstration — the reason graft.Fence exists.
    // localCheckpoint stores blocks only on the executors that
    // computed them AND truncates lineage: kill one of the four
    // executor JVMs and a fenced frame becomes partially unreadable,
    // unrecoverably (no lineage to recompute from) — the failure mode
    // a 1000-executor run hits routinely. The reliable fence writes
    // through the checkpoint filesystem and survives the same kill.
    import graft.Fence.FenceOps
    def lossDemo(fenceMode: String): Either[String, Long] = {
      spark.conf.set("spark.graft.fence", fenceMode)
      try {
        // wait for the standalone master to restore the executor pool
        val dl = System.nanoTime() + 60L * 1000000000L
        while (counter.live.size < 2 && System.nanoTime() < dl) Thread.sleep(250)
        require(counter.live.size >= 2, "executor pool never recovered")
        val fenced = spark.range(0, 3200000L, 1, 32)
          .selectExpr("id", "id * 2 as v").fenced()
        val victim = counter.live.iterator().next()
        spark.sparkContext.killExecutors(Seq(victim)): Unit
        val dl2 = System.nanoTime() + 30L * 1000000000L
        while (counter.live.contains(victim) && System.nanoTime() < dl2)
          Thread.sleep(250)
        try Right(fenced.selectExpr("sum(v)").collect()(0).getLong(0))
        catch { case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(140)) }
      } finally spark.conf.unset("spark.graft.fence")
    }
    val localLoss = lossDemo("local")
    val reliableLoss = lossDemo("reliable")
    val wantSum = 3199999L * 3200000L // sum of 2*id for id < 3200000
    localLoss match {
      case Left(msg) => println(
        s"CHAOS fence=local: executor killed -> JOB LOST (expected: " +
        s"lineage-truncated blocks are unrecoverable) [${msg.takeWhile(_ != '\n')}]")
      case Right(v) => println(
        s"CHAOS fence=local: executor killed but count survived ($v) — " +
        "all live blocks dodged the victim this run")
    }
    reliableLoss match {
      case Right(v) =>
        require(v == wantSum, s"reliable fence returned wrong sum $v")
        println(s"CHAOS fence=reliable: executor killed -> result exact " +
          s"($v) through the checkpoint filesystem")
      case Left(msg) =>
        throw new IllegalStateException(
          s"reliable fence did not survive executor loss: $msg")
    }

    // Capstone: a FULL query survives losing an executor MID-FLIGHT.
    // The kill lands while the ER pipeline is running, so whatever the
    // executor held dies with it — shuffle map outputs (recovered by
    // FetchFailed -> stage resubmission, the OTHER retry path, which
    // task-level chaos above never exercises) and, under the reliable
    // fence, the match-graph checkpoint reads from the checkpoint FS
    // instead of dying with the executor. The result must still be
    // BIT-IDENTICAL to the healthy run.
    spark.conf.set("spark.graft.fence", "reliable")
    try {
      val dl3 = System.nanoTime() + 60L * 1000000000L
      while (counter.live.size < 2 && System.nanoTime() < dl3) Thread.sleep(250)
      // same guard as lossDemo: with 0 live executors the victim pick
      // throws NoSuchElementException and with exactly 1 the kill
      // takes the whole pool — either way the probe would report a
      // confusing downstream failure instead of the real condition
      require(counter.live.size >= 2,
        "executor pool never recovered before the mid-flight kill")
      val clean = canonical(spark, "q_entity_resolution", sfDir)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fut = Future(canonical(spark, "q_entity_resolution", sfDir))
      Thread.sleep(2500) // let the pipeline get airborne
      val victim = counter.live.iterator().next()
      spark.sparkContext.killExecutors(Seq(victim)): Unit
      val survived = Await.result(fut, 180.seconds)
      require(survived == clean,
        "mid-flight executor loss changed the ER result")
      println(s"CHAOS mid-flight loss: executor $victim killed while " +
        s"q_entity_resolution ran (fence=reliable) -> BIT-IDENTICAL " +
        s"(${survived.size} rows)")
    } finally spark.conf.unset("spark.graft.fence")
    spark.stop()
  }
}
