package graft

import org.apache.spark.sql.SparkSession

/** Single place for local session construction — Bench/Verify/tools
  * must run identical configs or the oracle comparison and the bench
  * numbers stop describing the same engine. */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** The flagship's fused scan→parse→filter stage generates a ~8.2 KB
    * method — past HotSpot's 8 KB `DontCompileHugeMethods` cutoff, so
    * without `-XX:-DontCompileHugeMethods` (build.sbt sets it for
    * every sbt-forked JVM) the hottest stage would run INTERPRETED
    * bytecode forever. Guard for JVMs we don't launch (a user's
    * cluster `spark-submit` without the flag): detect the flag at
    * runtime, and when absent lower `spark.sql.codegen.hugeMethodLimit`
    * to the JIT cutoff so Spark itself falls back to the Volcano path
    * for just that stage — per-expression codegen'd and JIT-compiled,
    * which beats a never-JIT'd monolith. */
  private[graft] def jitCompilesHugeMethods: Boolean = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.contains("-XX:-DontCompileHugeMethods")
  }

  def local(threads: String = cpus, logLevel: String = "WARN"): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (!jitCompilesHugeMethods)
      b.config("spark.sql.codegen.hugeMethodLimit", "8000"): Unit
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    s
  }
}
