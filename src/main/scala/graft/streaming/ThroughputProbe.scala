package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Flagship

/** Measured streaming throughput of the flagship pipeline — the
  * reference's implicit SLO is ~100 events/s sustained on one JVM
  * (`README.md:6-7`); this probe measures the engine's actual
  * sustained lines/s through the SAME parse → filter cascade →
  * broadcast-enrich plan running as a stream, so the bench JSON
  * carries a measured `streaming_eps` instead of one inferred from
  * batch numbers.
  *
  * Shape: a `rate-micro-batch` source (deterministic rows per batch,
  * back-to-back triggers) synthesizes CLF lines ON THE EXECUTORS via
  * the same expression as the batch flagship ([[Flagship.synthLog]]),
  * feeds [[StreamingFlagship.enriched]], and lands in the `noop`
  * sink — no driver materialization anywhere. Throughput is read from
  * the query's own progress stream (input rows / trigger-execution
  * time), with the first batches dropped as JIT/codegen warm-up.
  */
object ThroughputProbe {

  def linesPerSecond(spark: SparkSession, sfDir: String,
      rowsPerBatch: Long = 200000L, batches: Int = 12, warmup: Int = 3)
      : Double = {
    val dim = Flagship.dimension(Tables(spark, sfDir, "events"))
    val types = array(Seq("click", "view", "signup", "error", "purchase").map(lit): _*)
    val rate = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("numPartitions", "32")
      .load()
    val synthIn = rate.select(
      col("value").as("event_id"),
      pmod(col("value"), lit(977)).as("user_id"),
      element_at(types, (pmod(col("value"), lit(5)) + 1).cast("int")).as("event_type"),
      col("timestamp").as("ts"))
    val out = StreamingFlagship.enriched(Flagship.synthLog(synthIn), dim)
    val q = out.writeStream.format("noop").start()
    try {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (q.recentProgress.count(_.numInputRows > 0) < warmup + batches
          && System.nanoTime() < deadline)
        Thread.sleep(200)
      val ps = q.recentProgress.filter(_.numInputRows > 0).drop(warmup)
      val rows = ps.map(_.numInputRows).sum
      val ms = ps.map(_.durationMs.get("triggerExecution").toLong).sum
      if (ms <= 0) 0.0 else rows * 1000.0 / ms
    } finally q.stop()
  }
}
