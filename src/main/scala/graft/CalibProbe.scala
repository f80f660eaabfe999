package graft

/** Single-threaded CPU calibration — the INDEPENDENT host-load signal
  * BenchGate's contention normalization corroborates against (r13
  * advice): inferring contention from the victim measurements alone
  * cannot distinguish uniform host contention from a uniform code
  * regression, because both produce the same 1.1–1.5× median
  * inflation signature. This workload can: it is a fixed-length
  * splitmix64 spin loop — pure ALU, no allocation, no I/O, and no
  * dependence on ANY engine code — so its wall time moves only with
  * host load. On an oversubscribed host the lone calibration thread
  * gets a fraction of a core and slows with the runnable/cores ratio,
  * the same force that inflates the 32-way bench; after a code
  * regression it reads exactly canonical.
  *
  * [[ms]] takes the MIN of `reps` runs (the classic noise-floor
  * estimator — the min is the least-contended moment, so a LOW value
  * is trustworthy evidence of a quiet host, which is the direction
  * the gate uses it in: refuse to normalize when calibration says
  * quiet). The folded result is published so the JIT cannot elide the
  * loop. */
object CalibProbe {

  /** ~10⁸ splitmix64 steps ≈ 100–300 ms single-threaded. */
  private val Steps = 100000000L

  /** One timed spin. */
  private def once(): (Double, Long) = {
    var x = 0x9e3779b97f4a7c15L
    var acc = 0L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < Steps) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      acc ^= z ^ (z >>> 31)
      i += 1
    }
    ((System.nanoTime() - t0) / 1e6, acc)
  }

  /** Min-of-`reps` calibration wall time in ms (first rep additionally
    * discarded as JIT warm-up). */
  def ms(reps: Int = 3): Double = {
    once() // warm-up: let C2 compile the loop before timing counts
    var best = Double.MaxValue
    var fold = 0L
    for (_ <- 1 to reps) {
      val (t, a) = once()
      if (t < best) best = t
      fold ^= a
    }
    // publish the fold so the whole computation is observably live
    if (fold == 42L) System.err.println("[calib] improbable fold")
    best
  }
}
