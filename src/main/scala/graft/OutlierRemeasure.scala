package graft

/** Round-17 adjudication tool for the round-16 driver-run outlier
  * cluster (VERDICT r16 "What's wrong" item 1): re-measure ONLY the
  * flagged queries under the canonical Bench protocol — sf0.001
  * warm-up, two timed passes, min per query — bracketed by the three
  * calibration scalars, on a quiet host. A quiet-window reading at
  * canonical magnitude adjudicates the driver sample as host
  * contention (memory-domain, per calib_mem 47.0→55.0); a reading at
  * driver-sample magnitude would confirm a real regression.
  *
  * Usage: `runMain graft.OutlierRemeasure <sfDir> <name> [name...]`
  */
object OutlierRemeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = Sessions.local(logLevel = "ERROR")
    val calibCpu = CalibProbe.ms()
    val calibPar = CalibProbe.msParallel()
    val calibMem = CalibProbe.msMem()
    println(f"CALIB cpu=$calibCpu%.1f par=$calibPar%.1f mem=$calibMem%.1f ms")
    // Warm-up at the smallest SF (JIT + codegen), as Bench does.
    names.foreach { n =>
      try { SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count(): Unit }
      catch { case _: Throwable => }
    }
    def pass(): Map[String, Double] = names.map { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      n -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val p1 = pass(); val p2 = pass()
    names.foreach { n =>
      println(f"REMEASURE $n%-24s min=${math.min(p1(n), p2(n))}%6.2f s  (p1=${p1(n)}%6.2f p2=${p2(n)}%6.2f)")
    }
    val calibCpu2 = CalibProbe.ms()
    val calibPar2 = CalibProbe.msParallel()
    val calibMem2 = CalibProbe.msMem()
    println(f"CALIB cpu=$calibCpu2%.1f par=$calibPar2%.1f mem=$calibMem2%.1f ms (post)")
    spark.stop()
  }
}
