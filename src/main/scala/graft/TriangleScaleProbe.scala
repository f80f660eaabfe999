package graft

import org.apache.spark.sql.functions._
import graft.Fence.FenceOps

/** Dev tool: triangle-counting scale validation on the adversarial
  * hub topology (one vertex adjacent to everything + a ring over the
  * leaves — the wheel graph).
  *
  *  - naive per-vertex wedge enumeration pays deg(hub)² ≈ n²/2 wedges
  *    at the hub alone;
  *  - degree-ordered orientation points every hub edge AT the hub
  *    (highest degree), so the hub contributes ZERO wedges and total
  *    wedge work is O(n) — the asymmetry the orientation exists for.
  *
  * Both variants are run on the same small wheel (counts must agree:
  * n triangles exactly — each ring edge closes with the hub), then the
  * oriented path alone on a 40× larger wheel to show the wedge volume
  * stays linear where naive would be 1600× its small-graph cost.
  */
object TriangleScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(logLevel = "ERROR")
    import graft.operators.Triangles

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TRISCALE $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    /** Wheel graph: hub = n, leaves 0..n-1 in a ring. */
    def wheel(n: Int) = {
      val spokes = spark.range(n).select(col("id").as("u"), lit(n).cast("long").as("v"))
      val ring = spark.range(n).select(
        least(col("id"), (col("id") + 1) % n).as("u"),
        greatest(col("id"), (col("id") + 1) % n).as("v"))
      spokes.union(ring).distinct().fenced()
    }

    val small = 5000
    val g1 = wheel(small)
    val a = timed(s"naive    wheel n=$small")(
      Triangles.naiveCount(g1).head())
    val b = timed(s"oriented wheel n=$small")(
      Triangles.orientedCount(g1).head())
    println(s"TRISCALE small naive=${a.getLong(2)} oriented=${b.getLong(2)}" +
      s" expected=$small agree=${a.getLong(2) == b.getLong(2) && b.getLong(2) == small}")

    val big = 200000
    val g2 = wheel(big)
    val c = timed(s"oriented wheel n=$big")(
      Triangles.orientedCount(g2).head())
    println(s"TRISCALE big oriented=${c.getLong(2)} expected=$big" +
      s" ok=${c.getLong(2) == big}")

    spark.stop()
  }
}
