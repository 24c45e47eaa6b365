package graft

/** Absolute machine-speed calibration for the bench: fixed-work spin loops
  * (single-thread and all-cores) timed in the same JVM as the queries.
  *
  * Motivation (round 8): the driver's BENCH_r08 recorded 246.8 s where
  * identical code measured 53–96 s on quieter machines, yet `contended`
  * stayed false — load1m was ~1.9 and cpu/wall ~1.9, both inside healthy
  * bands. The failure mode was WHOLE-MACHINE slowdown (hypervisor steal /
  * frequency caps / noisy neighbors on the shared VM): it inflates the
  * process's CPU-seconds together with wall, which no same-run-relative
  * signal ([[BenchContention]]) can detect. A constant workload is an
  * absolute yardstick: its seconds scale with machine slowness and nothing
  * else, so cross-round engine time normalizes as
  * `wall · (calRef / calMeasured)`; per-machine reference values are
  * recorded in BASELINE.md next to each round's bench numbers.
  */
object BenchCalibration {

  /** ~1.0 s single-thread on this machine class under light load
    * (round-9 calibration: 6 steady-state runs 0.99–1.04 s, first-run JIT
    * warm-up can dip to ~0.86 s; BASELINE.md). */
  val StIters = 400000000L

  /** Per-thread work for the all-cores probe — smaller, the probe measures
    * available parallel throughput, not endurance. */
  val MtItersPerThread = 100000000L

  /** Measured single-thread seconds above this ⇒ the machine is running
    * materially below its class's observed speed and wall-clocks from this
    * run overstate engine cost. Round-9 measured 0.86–1.04 s across runs
    * on a lightly-loaded box; 1.6 s ≈ 1.5× that ceiling, far below the
    * r8-style ~2.5–4× degradation this exists to catch. The threshold is a
    * coarse flag — the real signal is `cal_st` itself, recorded per bench
    * run so cross-round wall-clocks normalize by the cal ratio. */
  val DegradedStSec = 1.6

  /** All-cores probe threshold: this box's healthy band is ~0.21-0.29 s;
    * a reading past this means MULTI-CORE throughput is degraded
    * (hypervisor core-stealing under parallel load) even when the
    * single-thread probe reads healthy — exactly the state that inflated
    * a 65 s bench to 122 s at cal_st 0.76 (r9). Gate rule: when
    * `degraded_mt` is true, normalize cross-round walls by the cal_mt
    * ratio, not cal_st. */
  val DegradedMtSec = 0.4

  // JIT must not elide the spin — results escape through a volatile sink.
  @volatile private var sink: Long = 0L

  /** xorshift64 spin: pure ALU work, no memory traffic, no allocation —
    * insensitive to cache/IO state, sensitive only to effective clock. */
  def spin(iters: Long, seed: Long = 0x9e3779b97f4a7c15L): Long = {
    var x = seed
    var i = 0L
    while (i < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    x
  }

  def singleThreadSec(): Double = {
    val t0 = System.nanoTime()
    sink = spin(StIters)
    (System.nanoTime() - t0) / 1e9
  }

  /** Wall seconds for `threads` concurrent spins to ALL finish — degrades
    * when fewer effective cores are available than claimed. */
  def multiThreadSec(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { i =>
      new Thread(() => { sink = spin(MtItersPerThread, seed = i + 1L) })
    }
    ts.foreach(_.start())
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }
}
