package graft

import org.apache.spark.sql.functions._
import graft.Fence.FenceOps

/** Dev tool: connected-components scale validation.
  *
  *  - adversarial chain (diameter = n): alternating star only — plain
  *    label propagation would need n rounds;
  *  - sparse random graph (diameter ~ log n): both variants, outputs
  *    compared for equality.
  */
object CcScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(logLevel = "ERROR")
    import graft.operators.ConnectedComponents._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CCSCALE $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val chainN = 100000
    val chain = spark.range(chainN).select(
      (col("id") + 1).as("src"), col("id").as("dst"))
    val chainLabels = timed(s"alternating chain n=$chainN") {
      resolveAlternating(chain).agg(max(col("lbl")), count(lit(1))).head()
    }
    println(s"CCSCALE chain maxLabel=${chainLabels.getLong(0)} nodes=${chainLabels.getLong(1)}" +
      s" ok=${chainLabels.getLong(0) == 0 && chainLabels.getLong(1) == chainN + 1}")

    val n = 200000L
    val m = 300000
    // deterministic pseudo-random sparse graph (no RNG: portable hash)
    val rand = spark.range(m).select(
      (graft.functions.PortableHash.md5Long(col("id").cast("string")) % n).as("src"),
      (graft.functions.PortableHash.md5Long(concat(col("id").cast("string"), lit("x"))) % n).as("dst"))
      .where(col("src") =!= col("dst"))
      .fenced()
    // materialize the full label assignment INSIDE the timer — without
    // the checkpoint the final nodes⋈labels join would lazily run in
    // the untimed comparison counts and skew the variant comparison
    val a = timed(s"alternating random n=$n m=$m")(
      resolveAlternating(rand).withColumnRenamed("lbl", "la").fenced())
    val b = timed(s"propagation random n=$n m=$m")(
      resolve(rand).withColumnRenamed("lbl", "lb").fenced())
    // full-outer: a node missing from either side counts as a diff
    val diff = a.join(b, Seq("id"), "full_outer")
      .where(col("la").isNull || col("lb").isNull || col("la") =!= col("lb"))
      .count()
    val comps = a.select(col("la")).distinct().count()
    println(s"CCSCALE random components=$comps labelDiffs=$diff ok=${diff == 0}")
    spark.stop()
  }
}
