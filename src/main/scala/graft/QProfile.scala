package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: time individual queries WITH a per-job breakdown
  * attributed to call sites, to tell scheduler/planning overhead apart
  * from real compute. Usage:
  * `runMain graft.QProfile <sfDir> <name> [name...]` — each query runs
  * once warm-up then once timed; the timed run reports wall seconds,
  * job/stage/task counts, summed executor run time, and the top jobs
  * by wall with their call sites. Wall >> executor-time/cores with
  * many tiny jobs = overhead-bound; the fix is fewer actions/stages,
  * not faster expressions. */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.local(logLevel = "ERROR")
    val jobStart = new ConcurrentHashMap[Int, (Long, String, Int)]() // id -> (t0, site, nStages)
    val jobDone = new ConcurrentLinkedQueue[(Int, Long, String, Int)]() // (id, wallMs, site, nStages)
    val stages = new ConcurrentLinkedQueue[(Int, Int, Long, Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobStart.put(j.jobId, (j.time, site, j.stageInfos.size)): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobStart.get(j.jobId)).foreach { case (t0, site, n) =>
          jobDone.add((j.jobId, j.time - t0, site, n)): Unit
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val wall = (for {
          a <- info.completionTime; b <- info.submissionTime
        } yield a - b).getOrElse(0L)
        stages.add((info.stageId, info.numTasks,
          info.taskMetrics.executorRunTime, wall, info.name.take(60))): Unit
      }
    }
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm-up
      spark.sparkContext.addSparkListener(listener)
      jobStart.clear(); jobDone.clear(); stages.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; drain before reading
      org.apache.spark.graft.scbridge.drainListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val st = stages.asScala.toSeq
      val jb = jobDone.asScala.toSeq
      val nTasks = st.map(_._2).sum
      val execMs = st.map(_._3).sum
      println(f"QPROF $name%-26s wall=$wall%7.2fs jobs=${jb.size}%3d " +
        f"stages=${st.size}%3d tasks=$nTasks%5d execRun=${execMs / 1000.0}%7.2fs rows=$n")
      jb.sortBy(-_._2).take(10).foreach { case (id, w, site, ns) =>
        println(f"        job=$id%4d wall=${w / 1000.0}%6.2fs stages=$ns%3d  $site")
      }
      st.sortBy(-_._3).take(10).foreach { case (id, t, e, w, nm) =>
        println(f"        stage=$id%4d tasks=$t%4d execRun=${e / 1000.0}%6.2fs wall=${w / 1000.0}%6.2fs  $nm")
      }
    }
    spark.stop()
  }
}
