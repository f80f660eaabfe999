package graft

import org.apache.spark.sql.functions._

/** Dev tool: per-stage timing of the flagship pipeline at sfDir —
  * where does the wall go? Each stage is measured warm (min of n)
  * with a count() action so codegen fusing matches the bench shape.
  * Usage: runMain graft.FlagshipStageProbe [sfDir] [n]
  */
object FlagshipStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(logLevel = "ERROR")
    import graft.pipeline.Flagship

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count(): Unit // warm
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        mk.count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      println(f"FLAGSTAGE $name%-22s min=${ts.min}%5.2f runs=" +
        ts.map(t => f"$t%4.2f").mkString("[", ",", "]"))
    }

    val events = Tables(spark, sfDir, "events")
    time("scan_events")(events)
    time("synth")(Flagship.synthLog(events))
    time("parse_only")(Flagship.synthLog(events)
      .where(graft.parse.Clf.prefilter(col("line")))
      .transform(graft.parse.Clf.parse(_)))
    time("requests")(Flagship.logToRequests(Flagship.synthLog(events)))
    time("dimension")(Flagship.dimension(events))
    time("joined_no_sort")(Flagship.enrich(
      Flagship.logToRequests(Flagship.synthLog(events)),
      Flagship.dimension(events)))
    time("full_with_sort")(Flagship(spark, sfDir))
    spark.stop()
  }
}
