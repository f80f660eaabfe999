package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.pipeline.Flagship
import graft.streaming.StreamingFlagship

/** End-to-end streaming drive (verification aid): synthesizes the
  * sf0.001 access log into text files (simulating log rotation), runs
  * the streaming flagship over the directory with a parquet
  * foreachBatch sink, then compares row count with the batch result.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "ERROR")
    import spark.implicits._

    val sf = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("graft-stream").toString
    val logDir = s"$base/logs"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(logDir))

    // "log rotation": three files appearing in the watched directory
    val lines = Flagship.synthLog(Tables(spark, sf, "events")).as[String].collect()
    lines.grouped(400).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(Paths.get(s"$logDir/access.log.$i"),
        chunk.mkString("\n").getBytes("UTF-8"))
    }

    val dim = Flagship.dimension(Tables(spark, sf, "events"))
    val q = StreamingFlagship.startParquetSink(
      StreamingFlagship.enriched(StreamingFlagship.readLines(spark, logDir, 1), dim),
      outDir, ckpt)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(outDir).count()
    val batch = Flagship(spark, sf).count()
    println(s"STREAMED_ROWS=$streamed BATCH_ROWS=$batch MATCH=${streamed == batch}")

    // Second drive: the custom DSv2 replay source (graft.sources) at a
    // bounded rate through the same pipeline into a memory sink.
    val one = s"$base/all.log"
    Files.write(Paths.get(one), lines.mkString("\n").getBytes("UTF-8"))
    val rq = StreamingFlagship.enriched(
      spark.readStream.format("graft.sources.ReplayLines")
        .option("path", one).option("linesPerTrigger", "250").load()
        .withColumnRenamed("value", "line"),
      dim)
      .writeStream.format("memory").queryName("replay_demo")
      .outputMode("append").start()
    rq.processAllAvailable()
    val replayed = spark.table("replay_demo").count()
    val batches = rq.recentProgress.length
    rq.stop()
    println(s"REPLAYED_ROWS=$replayed OVER_BATCHES=$batches MATCH=${replayed == batch}")
    spark.stop()
  }
}
