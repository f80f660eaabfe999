package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Dev tool: event-analytics scale validation for `q_sessionize` and
  * `q_anomaly` (the round-4 additions), pinning the claims their
  * scaladocs make:
  *
  *  - q_sessionize: both windows (lag + running sum) share ONE
  *    `user_id` hash exchange — the probe counts hash-partitioned
  *    shuffles in the executed plan (the only other exchange is the
  *    oracle's final range sort);
  *  - q_anomaly: the only fact-sized exchange is the hourly pre-agg,
  *    MAP-SIDE COMBINED so its shuffle carries |types|·|hours|-order
  *    rows (≤ partitions × cells), and the skew-prone per-type window
  *    exchange carries exactly the tiny hourly-cell series, never
  *    events — both pinned from the exchanges' own
  *    shuffleRecordsWritten metrics;
  *  - the streaming twin's state is O(1) per key: a long synthetic
  *    series (3 types × thousands of hours, several micro-batches)
  *    must end with state rows == |types|, stream-length independent.
  *
  * Timings at sf0.01 → sf0.1 show the 10× data step; per-SF output
  * lines are recorded in PLANS.md.
  * Usage: runMain graft.EventScaleProbe [dir...]
  */
object EventScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(logLevel = "ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

    def descend(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => descend(a.executedPlan)
      case qs: QueryStageExec => descend(qs.plan)
      case other => other.children.flatMap(descend)
    }) :+ p

    def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
      descend(p).collect { case s: ShuffleExchangeExec => s }

    for (dir <- dirs) {
      val nEvents = Tables(spark, dir, "events").count()

      // ---- q_sessionize: one shared user_id hash exchange
      val sess = SparkEntry.queries("q_sessionize")(spark, dir)
      val sExec = sess.queryExecution.executedPlan
      var t0 = System.nanoTime()
      val sRows = sExec.executeCollect().length
      val sSecs = (System.nanoTime() - t0) / 1e9
      val sHash = shuffles(sExec)
        .filter(_.outputPartitioning.toString.contains("hashpartitioning"))
      require(sHash.length == 1,
        s"q_sessionize expected exactly 1 hash exchange, got ${sHash.length}")
      println(f"EVSCALE q_sessionize dir=$dir%-24s events=$nEvents%7d rows=$sRows%7d " +
        f"hash_exchanges=${sHash.length} time=$sSecs%5.2f s")

      // ---- q_anomaly: map-side-combined pre-agg, cell-sized window shuffle
      val cells = Tables(spark, dir, "events")
        .groupBy(org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.date_trunc("hour",
            org.apache.spark.sql.functions.col("ts")))
        .count().count()
      val anom = SparkEntry.queries("q_anomaly")(spark, dir)
      val aExec = anom.queryExecution.executedPlan
      t0 = System.nanoTime()
      val aRows = aExec.executeCollect().length
      val aSecs = (System.nanoTime() - t0) / 1e9
      val aHash = shuffles(aExec)
        .filter(_.outputPartitioning.toString.contains("hashpartitioning"))
      require(aHash.length == 2,
        s"q_anomaly expected 2 hash exchanges (pre-agg + window), got ${aHash.length}")
      // written records: partial-agg shuffle is combine-bounded, the
      // window shuffle is exactly the hourly cell series
      val recs = aHash.map(_.metrics("shuffleRecordsWritten").value).sorted
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toLong
      require(recs.last <= parts * cells && recs.last < nEvents,
        s"pre-agg shuffle not map-side combined: ${recs.last} records for $cells cells")
      require(recs.head == cells,
        s"window shuffle carries ${recs.head}, expected the $cells hourly cells")
      println(f"EVSCALE q_anomaly    dir=$dir%-24s events=$nEvents%7d rows=$aRows%7d " +
        f"cells=$cells%5d preagg_recs=${recs.last}%6d window_recs=${recs.head}%5d " +
        f"time=$aSecs%5.2f s")
    }

    // ---- streaming twin: state rows == |types| regardless of stream length
    {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val types = Seq("click", "view", "error")
      val hours = 3000
      val mem = MemoryStream[(String, Long, Long)]
      val q = graft.streaming.StreamingAnomaly.detect(spark, mem.toDS())
        .writeStream.format("memory").queryName("anomaly_scale")
        .outputMode("append").start()
      try {
        for (chunk <- (0 until hours).grouped(hours / 5)) {
          mem.addData(for { h <- chunk; t <- types }
            yield (t, h.toLong * 3600, 3L + h % 7))
          q.processAllAvailable()
        }
        val state = q.lastProgress.stateOperators(0)
        require(state.numRowsTotal == types.length,
          s"state grew beyond O(types): ${state.numRowsTotal} rows")
        val emitted = spark.table("anomaly_scale").count()
        println(f"EVSCALE streaming_anomaly hours=$hours types=${types.length} " +
          f"state_rows=${state.numRowsTotal} emitted=$emitted")
      } finally q.stop()
    }
    spark.stop()
  }
}
