package graft

/** Dev tool: run the streaming steady-state throughput probe
  * standalone ([[graft.streaming.ThroughputProbe]]), outside the
  * bench JVM — so a depressed bench-embedded number can be attributed
  * (dirty JVM / host contention vs a genuine plan regression) by
  * comparing against a clean-JVM run of the SAME protocol. Prints the
  * median/min/max and the full per-window series.
  *
  * Usage: runMain graft.ThroughputProbeMain [sfDir] [warmupSec] [measureSec]
  */
object ThroughputProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val warmup = if (args.length > 1) args(1).toInt else 10
    val measure = if (args.length > 2) args(2).toInt else 30
    val spark = Sessions.local(logLevel = "ERROR")
    val r = graft.streaming.ThroughputProbe.steadyState(
      spark, sfDir, warmupSec = warmup, measureSec = measure)
    println(f"[throughput] median=${r.eps}%.0f min=${r.epsMin}%.0f " +
      f"max=${r.epsMax}%.0f windows=${r.windows.size} series=${r.seriesJson}")
    spark.stop()
  }
}
