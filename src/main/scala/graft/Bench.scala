package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // ERROR-level logging: the driver parses the final stdout line as
    // JSON, so nothing may print after it (shutdown WARNs included).
    val spark = Sessions.local(logLevel = "ERROR")
    // Warm-up pass at the smallest SF: absorbs JIT + codegen compile
    // so the timed pass measures steady-state throughput.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1") {
      val warmDir = "/root/testdata/sf0.001"
      SparkEntry.queries.foreach { case (_, fn) =>
        try { fn(spark, warmDir).count(): Unit } catch { case _: Throwable => }
      }
    }
    var failed = List.empty[String]
    // Two timed passes, min per query: this machine shows ~40%
    // run-to-run noise (scheduler/cache interference), and the min of
    // two runs is a far better estimate of the engine's actual cost
    // than any single sample. A pass records (seconds, succeeded) so a
    // fast FAILURE can never undercut a genuine success measurement —
    // the min is taken over successful passes when any exist.
    def pass(): Map[String, (Double, Boolean)] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            if (!failed.contains(name)) failed ::= name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        name -> ((System.nanoTime() - t0) / 1e9, ok)
      }
    val p1 = pass()
    val p2 = pass()
    val results = p1.map { case (k, (t1, ok1)) =>
      val (t2, ok2) = p2.getOrElse(k, (t1, ok1))
      val best = (ok1, ok2) match {
        case (true, false) => t1
        case (false, true) => t2
        case _             => math.min(t1, t2)
      }
      k -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val errs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
