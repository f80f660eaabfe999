package graft

import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage flagship cost at sf0.1. */
object FlagProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(logLevel = "ERROR")
    val d = "/root/testdata/sf0.1"
    val events = Tables(spark, d, "events")
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    import graft.pipeline.Flagship._
    time("synth")(synthLog(events).count())
    time("synth+prefilter")(synthLog(events).where(graft.parse.Clf.prefilter(col("line"))).count())
    time("synth+pref+parse")(graft.parse.Clf.parse(
      synthLog(events).where(graft.parse.Clf.prefilter(col("line")))).count())
    locally {
      import graft.filters.LogFilters._
      import graft.parse.Clf
      val parsed = Clf.parse(synthLog(events).where(Clf.prefilter(col("line"))))
      time("parse+forcefields")(parsed.where(col("status").isNotNull &&
        col("uri").isNotNull && col("user_agent").isNotNull).count())
      time("parse+ts")(parsed.where(col("ts").isNotNull).count())
      time("parse+status")(parsed.where(ok(col("status"))).count())
      val u = parsed.withColumn("_u", graft.functions.GraftExpressions.uri_lemma(col("uri")))
      time("parse+urilemma")(u.where(col("_u.lemma").isNotNull).count())
      time("parse+bot")(parsed.where(!isBot(col("user_agent"))).count())
    }
    time("logToRequests")(logToRequests(synthLog(events)).count())
    time("full flagship")(graft.pipeline.Flagship(spark, d).count())
    spark.stop()
  }
}
