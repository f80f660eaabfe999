package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.Flagship

/** Dev tool: scale-up validation. Runs the flagship pipeline against
  * two events datasets (the sf directory and a larger replica) and
  * reports throughput, to confirm fixed overheads amortize and the
  * plan holds as data grows.
  * Usage: runMain graft.ScaleProbe <smallDir> <bigDir>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(logLevel = "ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m") // keep cores busy on small files
    args.foreach { dir =>
      val ev = Tables(spark, dir, "events")
      val n = ev.count()
      def run(): Long =
        Flagship.enrich(Flagship.logToRequests(Flagship.synthLog(ev)),
          Flagship.dimension(ev)).count()
      run() // warm
      val t0 = System.nanoTime()
      val kept = run()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCALE dir=$dir%-28s events=$n%9d kept=$kept%9d " +
        f"time=$secs%6.2f s rate=${n / secs}%,.0f lines/s")
    }
    spark.stop()
  }
}
