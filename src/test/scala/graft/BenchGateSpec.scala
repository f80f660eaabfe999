package graft

import org.scalatest.funsuite.AnyFunSuite

/** The regression gate's comparison semantics: ratio AND absolute
  * floor must both trip; new/removed queries never flag. */
class BenchGateSpec extends AnyFunSuite {

  test("flags only ratio>1.5 with >0.3s absolute slowdown, worst first") {
    val canonical = Map(
      "q_fast" -> 0.10, // 3x but +0.2s — under the absolute floor
      "q_slow" -> 2.00, // 1.4x — under the ratio gate
      "q_bad" -> 1.00, // 2.0x and +1.0s — flagged
      "q_worse" -> 1.00, // 3.0x and +2.0s — flagged, ranks first
      "q_gone" -> 1.00) // absent from latest — ignored
    val latest = Map(
      "q_fast" -> 0.30,
      "q_slow" -> 2.80,
      "q_bad" -> 2.00,
      "q_worse" -> 3.00,
      "q_new" -> 9.99) // no canonical — informational, not a flag
    val flags = BenchGate.regressions(canonical, latest)
    assert(flags.map(_.name) == Seq("q_worse", "q_bad"))
    assert(flags.head.ratio === 3.0)
  }

  test("threshold boundaries (binary-exact values) behave as documented") {
    // exactly 1.5x (not >) — no flag (1.0 * 1.5 is exact in binary)
    assert(BenchGate.regressions(Map("q" -> 1.0), Map("q" -> 1.5)).isEmpty)
    // 2x but only +0.25s — under the absolute floor
    assert(BenchGate.regressions(Map("q" -> 0.25), Map("q" -> 0.5)).isEmpty)
    // 4x and +0.75s — flags
    assert(BenchGate.regressions(Map("q" -> 0.25), Map("q" -> 1.0)).nonEmpty)
  }

  private val healthy = Map("streaming_eps" -> 448000.0,
    "serving_eps_free" -> 29000.0,
    "serving_stall_ratio" -> 1.00, "serving_latency_p99_ms" -> 0.02)

  test("streaming/serving floors: breach below, green at-or-above, missing = breach") {
    // canonical-grade numbers — green
    assert(BenchGate.floorBreaches(healthy).isEmpty)
    // exactly at the floors — green (floor is inclusive)
    assert(BenchGate.floorBreaches(healthy +
      ("streaming_eps" -> BenchGate.StreamingEpsFloor) +
      ("serving_eps_free" -> BenchGate.ServingEpsFreeFloor) +
      ("serving_stall_ratio" -> BenchGate.StallRatioFloor)).isEmpty)
    // eps collapse — one breach, names the field
    val epsBreach = BenchGate.floorBreaches(healthy + ("streaming_eps" -> 120000.0))
    assert(epsBreach.size == 1 && epsBreach.head.contains("streaming_eps"))
    // serving fan-out collapse (r15 — previously unguarded)
    val servBreach = BenchGate.floorBreaches(healthy + ("serving_eps_free" -> 5000.0))
    assert(servBreach.size == 1 && servBreach.head.contains("serving_eps_free"))
    // stall ratio sunk — the drop-oldest guarantee broke
    val stallBreach = BenchGate.floorBreaches(healthy + ("serving_stall_ratio" -> 0.42))
    assert(stallBreach.size == 1 && stallBreach.head.contains("serving_stall_ratio"))
    // probe never ran → missing fields must not read as green
    assert(BenchGate.floorBreaches(Map.empty).size == 4)
  }

  test("serving p99 ceiling: blocking delivery or unmeasured probe breaches") {
    // at the ceiling — green (ceiling is inclusive)
    assert(BenchGate.floorBreaches(healthy +
      ("serving_latency_p99_ms" -> BenchGate.ServingP99CeilingMs)).isEmpty)
    // delivery started blocking
    val slow = BenchGate.floorBreaches(healthy + ("serving_latency_p99_ms" -> 45.0))
    assert(slow.size == 1 && slow.head.contains("serving_latency_p99_ms"))
    // -1 = probe recorded no samples — must not read as green
    val unmeasured = BenchGate.floorBreaches(healthy + ("serving_latency_p99_ms" -> -1.0))
    assert(unmeasured.size == 1 && unmeasured.head.contains("no latency samples"))
  }

  test("contention normalization: a uniformly inflated sample passes the eps " +
      "floor, a genuinely regressed one fails (the r12 driver-window shape)") {
    val canonical = (1 to 30).map(i => s"q$i" -> 1.0).toMap
    val inflated = canonical.map { case (k, v) => k -> v * 1.26 } // r12's driver sample
    val quiet = canonical
    val mrInflated = BenchGate.medianRatio(canonical, inflated)
    assert(mrInflated.exists { case (m, uniform) => math.abs(m - 1.26) < 1e-9 && uniform })
    // 266k eps on a 1.26x-contended host (calibration agreeing) →
    // normalized 335k clears 300k: breach moves to a note, run passes
    val calib = Some(1.26)
    val sample = healthy + ("streaming_eps" -> 266000.0)
    val (b1, n1) = BenchGate.normalizedFloorBreaches(sample, mrInflated, calib)
    assert(b1.isEmpty && n1.size == 1 && n1.head.contains("normalized"))
    // same eps on a QUIET host (median ratio 1.0) → real regression, fails
    val (b2, n2) = BenchGate.normalizedFloorBreaches(sample,
      BenchGate.medianRatio(canonical, quiet), calib)
    assert(b2.exists(_.contains("streaming_eps")) && n2.isEmpty)
    // contended AND collapsed: 150k × 1.26 = 189k still under the floor —
    // the breach survives normalization
    val (b3, _) = BenchGate.normalizedFloorBreaches(
      healthy + ("streaming_eps" -> 150000.0), mrInflated, calib)
    assert(b3.exists(_.contains("streaming_eps")))
    // too few common queries for the median to mean anything → no
    // normalization (raw verdict stands)
    assert(BenchGate.medianRatio(Map("q1" -> 1.0), Map("q1" -> 1.3)).isEmpty)
    // DISPERSED inflation is not contention: half the queries at 1.0x,
    // half at 1.6x has median >= 1.1 but fails the uniformity (IQR)
    // test — a broad code regression must not excuse an eps breach
    val dispersed = canonical.map { case (k, v) =>
      k -> (if (k.stripPrefix("q").toInt % 2 == 0) v else v * 1.6) }
    val mrDispersed = BenchGate.medianRatio(canonical, dispersed)
    assert(mrDispersed.exists { case (m, uniform) => m >= 1.1 && !uniform })
    val (b5, n5) = BenchGate.normalizedFloorBreaches(sample, mrDispersed)
    assert(b5.exists(_.contains("streaming_eps")) && n5.isEmpty)
    // other floors never normalize: a sunk stall ratio on a contended
    // host is still a breach
    val (b4, _) = BenchGate.normalizedFloorBreaches(
      healthy + ("serving_stall_ratio" -> 0.42), mrInflated)
    assert(b4.exists(_.contains("serving_stall_ratio")))
  }

  test("calibration corroboration: uniform inflation normalizes only when " +
      "the independent spin signal agrees it was the host (r13 advice)") {
    val canonical = (1 to 30).map(i => s"q$i" -> 1.0).toMap
    val inflated = canonical.map { case (k, v) => k -> v * 1.26 }
    val mr = BenchGate.medianRatio(canonical, inflated)
    val sample = healthy + ("streaming_eps" -> 266000.0)
    // calibration also inflated → contention CORROBORATED, normalize
    val (b1, n1) = BenchGate.normalizedFloorBreaches(sample, mr, Some(1.3))
    assert(b1.isEmpty && n1.exists(_.contains("CORROBORATED")))
    // calibration quiet → the uniform inflation is CODE: breach stands
    // (this is exactly the signature a real global regression leaves)
    val (b2, n2) = BenchGate.normalizedFloorBreaches(sample, mr, Some(1.0))
    assert(b2.exists(_.contains("streaming_eps")))
    assert(n2.exists(_.contains("NOT corroborated")))
    // no calibration data (pre-r14 canonical) → FAIL CLOSED (r15, the
    // r14 advice: the old provisional rescale let a regression benched
    // against a calib-less canonical pass)
    val (b3, n3) = BenchGate.normalizedFloorBreaches(sample, mr, None)
    assert(b3.exists(_.contains("streaming_eps")))
    assert(n3.exists(_.contains("failing closed")))
    // a quiet calibration never blocks a run that needs no normalizing
    val (b4, n4) = BenchGate.normalizedFloorBreaches(healthy,
      BenchGate.medianRatio(canonical, canonical), Some(1.0))
    assert(b4.isEmpty && n4.isEmpty)
  }

  test("serving_eps_free normalizes by the CALIBRATION ratio, not the " +
      "query median — and only under corroborated contention (r15)") {
    val canonical = (1 to 30).map(i => s"q$i" -> 1.0).toMap
    val inflated = canonical.map { case (k, v) => k -> v * 1.12 }
    val mr = BenchGate.medianRatio(canonical, inflated)
    // the r14 contended-driver shape: query median only 1.12 but the
    // thread-bound serving hop 3.2× down (9.1k vs 29.5k canonical);
    // a cores-wide calibration reading 1.75× rescales 9138 → 15992,
    // clearing the 15k floor
    val sample = healthy + ("serving_eps_free" -> 9138.0)
    val (b1, n1) = BenchGate.normalizedFloorBreaches(sample, mr, Some(1.75))
    assert(b1.isEmpty, b1.mkString("; "))
    assert(n1.exists(n => n.contains("serving_eps_free") && n.contains("calibration ratio")))
    // the query median alone (1.12) could never have cleared it:
    // 9138 × 1.12 ≈ 10.2k < 15k — keyed on the median this sample
    // would fail on every contended host (the r12 lesson)
    assert(9138.0 * 1.12 < BenchGate.ServingEpsFreeFloor)
    // mild calibration inflation that cannot explain the collapse →
    // the breach SURVIVES normalization (a real serving regression
    // cannot hide behind mild contention)
    val (b2, _) = BenchGate.normalizedFloorBreaches(sample, mr, Some(1.2))
    assert(b2.exists(_.contains("serving_eps_free")))
    // quiet calibration → no rescale at all
    val (b3, _) = BenchGate.normalizedFloorBreaches(sample, mr, Some(1.0))
    assert(b3.exists(_.contains("serving_eps_free")))
    // stall ratio still never normalizes
    val (b4, _) = BenchGate.normalizedFloorBreaches(
      healthy + ("serving_stall_ratio" -> 0.42), mr, Some(1.75))
    assert(b4.exists(_.contains("serving_stall_ratio")))
  }

  test("per-query outlier cluster: calibration-corroborated disturbance " +
      "demotes flags to notes, uncorroborated flags stand (r16 verdict item 1)") {
    // the r16 driver-run shape: 3 queries 3.3–4.6× slower on paths no
    // commit touched, the rest of the registry at parity
    val canonical = (1 to 30).map(i => s"q$i" -> 1.0).toMap +
      ("q_walk" -> 3.62) + ("q_sub" -> 1.28) + ("q_ivf" -> 1.70)
    val sample = canonical +
      ("q_walk" -> 12.95) + ("q_sub" -> 5.86) + ("q_ivf" -> 5.68)
    // raw rule flags the trio
    assert(BenchGate.regressions(canonical, sample).map(_.name).toSet ==
      Set("q_walk", "q_sub", "q_ivf"))
    // memory-domain disturbance corroborated (calib_mem 47→55 = 1.17×)
    // → machine-adjudicated as contention: flags demote to notes that
    // mandate a quiet re-measure
    val (f1, n1) = BenchGate.adjudicatedRegressions(canonical, sample,
      Some((55.0 / 47.0, "calib_mem_ms")))
    assert(f1.isEmpty)
    assert(n1.size == 3 && n1.forall(n =>
      n.contains("DEMOTED") && n.contains("calib_mem_ms") &&
        n.contains("re-measure")))
    // quiet calibration → the cluster is CODE: every flag stands
    val (f2, n2) = BenchGate.adjudicatedRegressions(canonical, sample,
      Some((1.01, "calib_par_ms")))
    assert(f2.map(_.name).toSet == Set("q_walk", "q_sub", "q_ivf") && n2.isEmpty)
    // no calibration data → fail closed, flags stand
    val (f3, _) = BenchGate.adjudicatedRegressions(canonical, sample, None)
    assert(f3.size == 3)
    // clean sample never produces flags or notes regardless of calib
    val (f4, n4) = BenchGate.adjudicatedRegressions(canonical, canonical,
      Some((1.5, "calib_mem_ms")))
    assert(f4.isEmpty && n4.isEmpty)
  }

  test("adjudication demands a contention SHAPE: a lone flag under mild " +
      "calibration noise stands; the median signature re-enables it (r17 advice)") {
    val canonical = (1 to 30).map(i => s"q$i" -> 1.0).toMap + ("q_bad" -> 1.0)
    // a SINGLE query regressed 2× while the rest of the registry sits
    // at parity — on a host whose mem probe happens to read 1.12×
    // (common on a busy box), the old rule demoted this real
    // regression; now it stands: no cluster, no median signature
    val lone = canonical + ("q_bad" -> 2.0)
    val mrParity = BenchGate.medianRatio(canonical, lone)
    val (f1, n1) = BenchGate.adjudicatedRegressions(canonical, lone,
      Some((1.12, "calib_mem_ms")), mrParity)
    assert(f1.map(_.name) == Seq("q_bad"))
    assert(n1.exists(_.contains("flags STAND")))
    // same lone flag but the WHOLE registry uniformly inflated 1.3×
    // (q_bad carried past the gate by contention): median signature +
    // calibration → demote
    val uniform = canonical.map { case (k, v) =>
      k -> (if (k == "q_bad") v * 2.0 else v * 1.3) }
    val mrU = BenchGate.medianRatio(canonical, uniform)
    assert(mrU.exists { case (m, u) => u && m >= BenchGate.ContentionMinRatio })
    val (f2, n2) = BenchGate.adjudicatedRegressions(canonical, uniform,
      Some((1.3, "calib_par_ms")), mrU)
    assert(f2.isEmpty && n2.exists(_.contains("uniform median inflation")))
    // two flags (< MinClusterFlags) with a parity median still stand —
    // a shared-helper regression touching two queries must not hide
    val pair = canonical + ("q1" -> 2.0) + ("q2" -> 2.0)
    val (f3, _) = BenchGate.adjudicatedRegressions(canonical, pair,
      Some((1.12, "calib_mem_ms")), BenchGate.medianRatio(canonical, pair))
    assert(f3.size == 2)
    // at the cluster threshold the r16 shape demotes even with a
    // parity median (the motivating incident: 3 unrelated paths hit
    // together while the registry median sat at 1.0)
    assert(BenchGate.MinClusterFlags == 3)
  }

  test("serving rescale keys on the CPU-domain (par) ratio, not the " +
      "corroboration max — a memory-domain disturbance cannot clear a " +
      "real serving regression (r16 advice)") {
    val canonical = (1 to 30).map(i => s"q$i" -> 1.0).toMap
    val inflated = canonical.map { case (k, v) => k -> v * 1.2 }
    val mr = BenchGate.medianRatio(canonical, inflated)
    val sample = healthy + ("serving_eps_free" -> 9138.0)
    // corroboration max = 1.75 but from the MEM domain; par quiet at
    // 1.02: the thread-bound serving hop saw no scheduler pressure, so
    // 9138 × 1.02 < 15k — the breach SURVIVES (old behavior would
    // have rescaled by 1.75 and cleared it)
    val (b1, _) = BenchGate.normalizedFloorBreaches(sample, mr,
      calibRatio = Some(1.75), parRatio = Some(1.02))
    assert(b1.exists(_.contains("serving_eps_free")))
    // CPU-domain disturbance: par itself at 1.75 → rescale clears
    val (b2, n2) = BenchGate.normalizedFloorBreaches(sample, mr,
      calibRatio = Some(1.75), parRatio = Some(1.75))
    assert(b2.isEmpty)
    assert(n2.exists(n => n.contains("serving_eps_free") &&
      n.contains("CPU-domain")))
    // pre-r15 canonical (no par scalar either side) → the max is the
    // only magnitude available: fallback preserved
    val (b3, _) = BenchGate.normalizedFloorBreaches(sample, mr,
      calibRatio = Some(1.75), parRatio = None)
    assert(b3.isEmpty)
    // parRatio helper extracts the CPU scalar specifically
    assert(BenchGate.parCalibRatio(
      Map("calib_par_ms" -> 200.0, "calib_mem_ms" -> 300.0),
      Map("calib_par_ms" -> 204.0, "calib_mem_ms" -> 450.0))
      .exists(r => math.abs(r - 1.02) < 1e-9))
    assert(BenchGate.parCalibRatio(Map("calib_ms" -> 85.0),
      Map("calib_par_ms" -> 204.0)).isEmpty)
  }

  test("calibration ratio keys on max(PARALLEL, MEM) when both sides " +
      "carry them, 1-thread fallback otherwise (r15/r16)") {
    val canonBoth = Map("calib_ms" -> 85.0, "calib_par_ms" -> 200.0)
    // the r14 live-miss shape: single-thread spin flat (86/85 ≈ 1.01)
    // while the cores-wide section inflated 1.4× — the decision must
    // see the 1.4
    val latest = Map("calib_ms" -> 86.0, "calib_par_ms" -> 280.0)
    assert(BenchGate.pickCalibRatio(canonBoth, latest).exists {
      case (r, k) => k == "calib_par_ms" && math.abs(r - 1.4) < 1e-9 })
    // pre-r15 canonical (no parallel scalar) → 1-thread fallback
    val canonOld = Map("calib_ms" -> 85.0)
    assert(BenchGate.pickCalibRatio(canonOld, latest).exists {
      case (r, k) => k == "calib_ms" && math.abs(r - 86.0 / 85.0) < 1e-9 })
    // either side lacking both → None (downstream fails closed)
    assert(BenchGate.pickCalibRatio(Map.empty, latest).isEmpty)
    assert(BenchGate.pickCalibRatio(canonBoth, Map.empty).isEmpty)
    // a zero/garbage canonical scalar never divides
    assert(BenchGate.pickCalibRatio(Map("calib_par_ms" -> 0.0),
      Map("calib_par_ms" -> 100.0)).isEmpty)
    // the r15 driver-run shape the mem scalar exists for: ALU spins
    // quiet (par 1.01) while the bandwidth probe inflated 1.5× — the
    // decision must see the 1.5, labeled as the mem scalar
    val canonMem = canonBoth + ("calib_mem_ms" -> 300.0)
    val latestMemHot = Map("calib_ms" -> 86.0, "calib_par_ms" -> 202.0,
      "calib_mem_ms" -> 450.0)
    assert(BenchGate.pickCalibRatio(canonMem, latestMemHot).exists {
      case (r, k) => k == "calib_mem_ms" && math.abs(r - 1.5) < 1e-9 })
    // CPU-domain disturbance still wins when it is the larger signal
    val latestCpuHot = Map("calib_par_ms" -> 340.0, "calib_mem_ms" -> 330.0)
    assert(BenchGate.pickCalibRatio(canonMem, latestCpuHot).exists {
      case (r, k) => k == "calib_par_ms" && math.abs(r - 1.7) < 1e-9 })
    // a canonical without the mem scalar (pre-r16) never blocks the
    // parallel path
    assert(BenchGate.pickCalibRatio(canonBoth, latestMemHot).exists {
      case (r, k) => k == "calib_par_ms" && math.abs(r - 1.01) < 1e-9 })
  }

  /** Run a LIVE assertion block up to twice (r15 ADVICE: these cases
    * compare two noisy wall-clock ratios measured on a possibly-busy
    * host — one unlucky scheduling window must not flake the suite,
    * while a real loss of signal still fails both attempts). */
  private def retryOnce(attempt: () => Unit): Unit =
    try attempt()
    catch {
      case e: org.scalatest.exceptions.TestFailedException =>
        info(s"first attempt failed (${e.getMessage}); retrying once")
        attempt()
    }

  /** Start `n` daemon competitor threads running `body(i)` until
    * stopped; runs `during`, then joins the load. */
  private def withCompetitors(n: Int)(body: (Int, java.util.concurrent.atomic.AtomicBoolean) => Long)(during: Int => Unit): Unit = {
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    val load = (1 to n).map { i =>
      val t = new Thread(() => { sink.addAndGet(body(i, stop)): Unit })
      t.setDaemon(true); t.start(); t
    }
    try during(load.size)
    finally { stop.set(true); load.foreach(_.join(2000)) }
  }

  test("LIVE: partial-core competitor load inflates the parallel spin " +
      "while the 1-thread spin stays flat (the r14 driver-window miss)") {
    val cores = Runtime.getRuntime.availableProcessors()
    assume(cores >= 8, s"needs a many-core host, have $cores")
    // unloaded baselines
    val single0 = CalibProbe.ms()
    val par0 = CalibProbe.msParallel()
    // synthetic competitor: busy-spin on ~3/4 of the cores — the
    // partial-core contention shape (competitor < cores) the r14
    // 1-thread probe could not see
    withCompetitors((3 * cores) / 4) { (i, stop) =>
      var x = i.toLong
      while (!stop.get()) { x = x * 6364136223846793005L + 1442695040888963407L }
      x
    } { n =>
      retryOnce { () =>
        val single1 = CalibProbe.ms()
        val par1 = CalibProbe.msParallel()
        val singleRatio = single1 / single0
        val parRatio = par1 / par0
        info(f"single $single0%.0f→$single1%.0f ms (${singleRatio}%.2fx), " +
          f"parallel $par0%.0f→$par1%.0f ms (${parRatio}%.2fx) under " +
          f"$n competitor threads on $cores cores")
        // the cores-wide section shares cores with the competitor:
        // runnable/cores ≈ 1.75 → expect ≥ 1.1× (theory ~1.7×)
        assert(parRatio >= BenchGate.CalibCorroborationMin,
          f"parallel spin only ${parRatio}%.2fx under partial-core load — " +
            "the contention signal the gate keys on did not move")
        // the property the gate NEEDS: the parallel signal is strictly
        // more contention-sensitive than the lone spin. On a host with
        // spare ADVERTISED cores the lone spin reads near-flat (the r14
        // miss shape, ~1.0 vs par ~1.7); on a burstable VM whose
        // effective capacity is below the advertised core count (the
        // round-15 host: 32 advertised, ~2× oversubscribed) the
        // competitor load saturates even the lone spin — both inflate,
        // and the parallel section must still inflate MORE, by a margin
        // above measurement noise (r15 ADVICE: a strict > between two
        // noisy ratios flakes when both saturate to the same value).
        // Asserting `single < 1.3` would encode the host's spare
        // capacity, which is not a property of the gate.
        assert(parRatio > singleRatio * 1.05,
          f"parallel spin (${parRatio}%.2fx) did not inflate beyond the " +
            f"1-thread spin (${singleRatio}%.2fx) by the 5%% noise margin " +
            "— no added sensitivity")
      }
    }
  }

  test("LIVE: memory-bandwidth competitor load inflates the DRAM-streamer " +
      "probe while the ALU spin stays comparatively flat (the r15 " +
      "driver-run blind spot)") {
    val cores = Runtime.getRuntime.availableProcessors()
    assume(cores >= 8, s"needs a many-core host, have $cores")
    // unloaded baselines
    val single0 = CalibProbe.ms()
    val mem0 = CalibProbe.msMem()
    // synthetic competitor: DRAM streamers over private 64 MiB
    // buffers — pure load/store pressure on the shared memory
    // controller, near-zero ALU demand. 3/4 of the cores (capped):
    // enough streams to saturate any socket's bandwidth, while total
    // runnable threads stay under the core count so the lone ALU spin
    // keeps a full core — the exact disturbance shape the r15 driver
    // run carried (query median 1.148×, calib_par 1.007).
    withCompetitors(math.min(24, (3 * cores) / 4)) { (i, stop) =>
      val buf = new Array[Long](1 << 23) // 64 MiB, far past LLC
      var acc = i.toLong
      while (!stop.get()) {
        var j = 0
        while (j < buf.length) { acc ^= buf(j); buf(j) = acc; j += 8 }
      }
      acc
    } { n =>
      retryOnce { () =>
        val single1 = CalibProbe.ms()
        val mem1 = CalibProbe.msMem()
        val singleRatio = single1 / single0
        val memRatio = mem1 / mem0
        info(f"single $single0%.0f→$single1%.0f ms (${singleRatio}%.2fx), " +
          f"mem $mem0%.0f→$mem1%.0f ms (${memRatio}%.2fx) under " +
          f"$n streamer threads on $cores cores")
        // the probe's streamers now share DRAM bandwidth with the
        // competitor → the section wall must stretch past the gate's
        // corroboration threshold
        assert(memRatio >= BenchGate.CalibCorroborationMin,
          f"mem probe only ${memRatio}%.2fx under bandwidth load — the " +
            "non-CPU contention signal the gate keys on did not move")
        // and the ALU spin must NOT have seen the disturbance the mem
        // probe saw — the separation that makes max(cpu, mem) a
        // wider-spectrum corroborator, asserted with the same 5%
        // noise margin as the parallel case
        assert(memRatio > singleRatio * 1.05,
          f"mem probe (${memRatio}%.2fx) did not inflate beyond the ALU " +
            f"spin (${singleRatio}%.2fx) by the 5%% noise margin — the " +
            "probe is not measuring the memory domain")
      }
    }
  }
}
