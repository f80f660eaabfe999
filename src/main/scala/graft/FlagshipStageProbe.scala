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
    // count() lets ColumnPruning drop a TERMINAL projection's
    // deterministic expressions wholesale — a parse stage timed bare
    // measures scan+filter only. The hash filter consumes every
    // field, so the parse work survives the optimizer while the
    // stage still ends in the probe's uniform count().
    def forced(df: org.apache.spark.sql.DataFrame) =
      df.where(xxhash64(df.columns.map(col): _*) =!= lit(0L))
    time("scan_events")(events)
    time("synth")(Flagship.synthLog(events))
    time("parse_only")(forced(Flagship.synthLog(events)
      .where(graft.parse.Clf.prefilter(col("line")))
      .transform(graft.parse.Clf.parse(_))))
    // the form ClfParse exists to beat (SURVEY §7.1 makes the kernel
    // conditional on measurement): one regexp_extract PER FIELD over
    // the shared pattern — 8 compiled matchers re-matching the line
    // per field vs the kernel's single match per line
    val P = graft.parse.Clf.Pattern
    time("parse_regex8")(forced(Flagship.synthLog(events)
      .where(graft.parse.Clf.prefilter(col("line")))
      .select(col("line") +:
        (1 to 8).map(g => regexp_extract(col("line"), P, g).as(s"g$g")): _*)
      .select(col("g1").as("ip"),
        try_to_timestamp(col("g2"), lit(graft.parse.Clf.TsFormat)).as("ts"),
        col("g3").as("method"), col("g4").as("uri"), col("g5").as("status"),
        expr("try_cast(g6 AS BIGINT)").as("size"),
        col("g7").as("referrer"), col("g8").as("user_agent"))))
    time("requests")(Flagship.logToRequests(Flagship.synthLog(events)))
    time("dimension")(Flagship.dimension(events))
    time("joined_no_sort")(Flagship.enrich(
      Flagship.logToRequests(Flagship.synthLog(events)),
      Flagship.dimension(events)))
    time("full_with_sort")(Flagship(spark, sfDir))
    spark.stop()
  }
}
