package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Flagship
import graft.streaming.StreamingFlagship

class ReplaySourceSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  test("custom DSv2 replay source feeds the flagship pipeline in rate-bounded batches") {
    val lines = Flagship.synthLog(Tables(spark, Sf, "events")).as[String].collect()
    val f = Files.createTempFile("replay", ".log")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))

    val stream = spark.readStream
      .format("graft.sources.ReplayLines")
      .option("path", f.toString)
      .option("linesPerTrigger", "300")
      .load()
      .withColumnRenamed("value", "line")

    val dim = Flagship.dimension(Tables(spark, Sf, "events"))
    val q = StreamingFlagship.enriched(stream, dim)
      .writeStream.format("memory").queryName("replayed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("replayed").count()
      val batch = Flagship(spark, Sf).count()
      assert(streamed == batch)
      // rate bound respected: no micro-batch admitted more than 300 lines
      assert(q.recentProgress.forall(_.numInputRows <= 300))
      assert(q.recentProgress.map(_.numInputRows).sum == lines.length)
    } finally q.stop()
  }
}
