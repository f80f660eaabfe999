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

  /** One timed spin. `seed` varies per thread in the parallel probe so
    * the JIT cannot share/specialize across threads in a way a lone
    * spin wouldn't see. */
  private def once(seed: Long = 0x9e3779b97f4a7c15L): (Double, Long) = {
    var x = seed
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

  /** One parallel spin section: `threads` concurrent [[once]] loops,
    * wall time from first start to last join. */
  private def oncePar(threads: Int): Double = {
    val folds = new Array[Long](threads)
    val ts = (0 until threads).map { i =>
      new Thread(() => folds(i) = once(0x9e3779b97f4a7c15L * (i + 1)) ._2)
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start())
    ts.foreach(_.join())
    val t = (System.nanoTime() - t0) / 1e6
    if (folds.foldLeft(0L)(_ ^ _) == 42L)
      System.err.println("[calib] improbable fold")
    t
  }

  /** Min-of-`reps` PARALLEL calibration wall time in ms — `threads`
    * concurrent spins (default = available cores, mimicking the
    * 32-way bench's own parallelism).
    *
    * The round-14 verdict's live gap: a SINGLE spin thread on a
    * partially-contended host (competitor load < cores) still gets a
    * full core and reads quiet (r14 driver run: query median 1.099×
    * with 1-thread calib 1.01×), so BenchGate refused to corroborate
    * real contention. A cores-wide spin section is subject to the
    * same runnable/cores ratio as the bench itself: any competitor
    * load pushes total runnable past the core count and the section
    * wall inflates proportionally — partial-core load now moves the
    * independent signal. The 1-thread [[ms]] stays published for
    * continuity/diagnosis; the gate keys on this scalar when both
    * artifacts carry it. */
  def msParallel(threads: Int = Runtime.getRuntime.availableProcessors(),
      reps: Int = 3): Double = {
    require(threads >= 1, s"threads=$threads")
    oncePar(threads) // warm-up: JIT + thread-pool page-in
    var best = Double.MaxValue
    for (_ <- 1 to reps) best = math.min(best, oncePar(threads))
    best
  }

  /** 64 MiB of longs per streamer thread — far past any LLC, so every
    * pass streams from DRAM (cache-defeating by footprint, which is
    * the property that matters for a BANDWIDTH probe; a prefetch-
    * friendly stride is fine and even desirable — peak streaming is
    * exactly what a bandwidth competitor degrades). */
  private val MemWords = 1 << 23

  /** Passes per timed section, sized so a section lands in the same
    * ~100–300 ms window as the ALU spins. */
  private val MemPasses = 12

  /** One streaming pass set over `buf`: one load + one store per
    * cache line (stride 8 longs = 64 B), xor-chained so the JIT can
    * elide nothing — per 64 B of traffic the loop does ONE xor and
    * ONE add, so wall time is memory-bound, not ALU-bound: the
    * complement of [[once]], which never leaves registers. */
  private def onceMem(buf: Array[Long], seed: Long): (Double, Long) = {
    var acc = seed
    val n = buf.length
    val t0 = System.nanoTime()
    var pass = 0
    while (pass < MemPasses) {
      var i = 0
      while (i < n) {
        acc ^= buf(i)
        buf(i) = acc // dirty the line: write-back traffic too
        i += 8
      }
      pass += 1
    }
    ((System.nanoTime() - t0) / 1e6, acc)
  }

  /** Min-of-`reps` MEMORY-BANDWIDTH calibration wall time in ms —
    * `threads` concurrent DRAM streamers over private 64 MiB buffers,
    * wall from first start to last join.
    *
    * The round-15 driver run's blind spot (r15 verdict item 1): query
    * median 1.148× with an outlier cluster and a sunk stall ratio
    * while BOTH ALU spins read quiet (calib_par 1.007) — a host
    * disturbance in the memory/IO domain that no amount of ALU
    * spinning can see, which BenchGate would therefore misread as an
    * uncorroborated (= real) regression. This probe lives in that
    * domain: a few streamer threads approach DRAM saturation, so any
    * bandwidth competitor (another JVM's shuffle spill, a host
    * neighbor's memcpy storm) directly stretches the section wall
    * while leaving the register-resident spins untouched.
    * BenchGateSpec's LIVE mem case pins exactly that separation.
    *
    * Default 4 threads: enough to approach the socket's streaming
    * bandwidth (single-core streaming is typically 3–8× below it —
    * an undersubscribed probe would leave headroom that absorbs the
    * competitor instead of revealing it) while staying far below
    * core count so CPU scheduling pressure does not masquerade as
    * bandwidth pressure. */
  def msMem(threads: Int = math.min(4, Runtime.getRuntime.availableProcessors()),
      reps: Int = 3): Double = {
    require(threads >= 1, s"threads=$threads")
    // init pass doubles as page-in (the arrays are written once here,
    // so the timed sections never fault)
    val bufs = Array.fill(threads)(Array.fill(MemWords)(0x9e3779b97f4a7c15L))
    def section(): Double = {
      val folds = new Array[Long](threads)
      val ts = (0 until threads).map { i =>
        new Thread(() => folds(i) = onceMem(bufs(i), i + 1L)._2)
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start())
      ts.foreach(_.join())
      val t = (System.nanoTime() - t0) / 1e6
      if (folds.foldLeft(0L)(_ ^ _) == 42L)
        System.err.println("[calib] improbable fold")
      t
    }
    section() // warm-up: JIT the streaming loop
    var best = Double.MaxValue
    for (_ <- 1 to reps) best = math.min(best, section())
    best
  }
}
