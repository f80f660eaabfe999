package graft

/** Dev tool: print the three CalibProbe host-load scalars
  * (single-thread / 32-way / memory-bandwidth spin wall ms) without
  * starting Spark — the 5-second check the record-refusal discipline
  * needs before trusting any bench sample (PLANS.md host-epoch
  * notes: quiet ≈ calib_par 182 ms / calib_mem 47–55 ms; readings
  * far above are a contended window, not a code signal). */
object CalibMain {
  def main(args: Array[String]): Unit = {
    println(s"calib_ms=${CalibProbe.ms()} " +
      s"calib_par_ms=${CalibProbe.msParallel()} " +
      s"calib_mem_ms=${CalibProbe.msMem()}")
  }
}
