package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[BenchContention]] against the telemetry shapes of the recorded runs
  * that motivated it (BASELINE.md r5–r7): the classifier must flag the two
  * known-contended runs and pass the known-clean ones, so the bench gate
  * can stop re-litigating wall-clock noise. */
class BenchContentionSpec extends AnyFunSuite {

  // 64-query run skeleton: wall/cpu sums shaped like the real mix (heavy
  // parallel queries dominate the sums; full-run cpu/wall ≈ 2.5 clean).
  private val n = 64
  private def wall(totalSec: Double): Seq[Double] = Seq.fill(n)(totalSec / n)
  private def cpu(totalSec: Double): Seq[Double] = Seq.fill(n)(totalSec / n)

  test("r7 driver shape: load1m ~3.0-3.3 throughout, wall 1.31x at flat cpu => contended") {
    // BENCH_r07.json tail: per-query load1m 2.94-3.34 for the whole run;
    // wall 73.55 s vs the same-code uncontended 53.07 s, cpu unchanged.
    val load = Seq.tabulate(n)(i => 2.94 + 0.40 * (i % 5) / 4.0)
    assert(BenchContention.contended(wall(73.55), cpu(132.0), load))
  }

  test("r6 shape: load mostly 1.4-1.55 with a 13-query self-load spike cluster => clean") {
    // BENCH_r06.json tail: 13 consecutive queries at 3.34 (the bench's own
    // heavy stretch), the rest 1.37-1.55 — median must shrug the spike off.
    val load = Seq.fill(13)(3.34) ++ Seq.fill(n - 13)(1.45)
    assert(!BenchContention.contended(wall(68.1), cpu(170.0), load))
  }

  test("judge's uncontended re-run shape: load 0.5-0.9 => clean") {
    val load = Seq.tabulate(n)(i => 0.5 + 0.4 * (i % 3) / 2.0)
    assert(!BenchContention.contended(wall(53.07), cpu(132.0), load))
  }

  test("r5 starvation shape: wall 2.7x at flat cpu trips the cpu/wall floor alone") {
    // r5 recorded 26.0 s for the 9.6 s r1-set with no cpu growth; scaled to
    // the full run that is cpu/wall ~0.9 — contended even if load sampling
    // had missed the competitor (load here mid-range, below threshold).
    val load = Seq.fill(n)(2.0)
    assert(BenchContention.contended(wall(143.0), cpu(132.0), load))
    // the same load with a healthy ratio stays clean
    assert(!BenchContention.contended(wall(53.0), cpu(132.0), load))
  }

  test("platform without a cpu bean (-1 sentinel) falls back to load-only") {
    val noCpu = Seq.fill(n)(-1.0)
    assert(BenchContention.contended(wall(70.0), noCpu, Seq.fill(n)(3.1)))
    assert(!BenchContention.contended(wall(143.0), noCpu, Seq.fill(n)(1.0)))
  }

  test("r17 probe-corroborated overload: self-load alone no longer convicts") {
    // post-parallelism engine shape: the engine's own 32-way task bursts
    // hold load1m at 4-6 on a healthy idle box (measured r17 — all three
    // sweeps self-flagged), healthy cal probes, healthy cpu/wall
    val selfLoad = Seq.fill(n)(5.5)
    assert(!BenchContention.contended(wall(60.0), cpu(170.0), selfLoad,
      absoluteProbesDegraded = false))
    // the SAME load with degraded absolute probes is real external load
    assert(BenchContention.contended(wall(60.0), cpu(170.0), selfLoad,
      absoluteProbesDegraded = true))
    // starvation still convicts on its own, probes healthy or not
    assert(BenchContention.contended(wall(143.0), cpu(132.0), Seq.fill(n)(2.0),
      absoluteProbesDegraded = false))
    // clean run stays clean under the overload too
    assert(!BenchContention.contended(wall(53.0), cpu(132.0), Seq.fill(n)(1.0),
      absoluteProbesDegraded = false))
  }

  test("median: odd, even, empty") {
    assert(BenchContention.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(BenchContention.median(Seq(1.0, 2.0, 3.0, 4.0)) == 2.5)
    assert(BenchContention.median(Nil) == 0.0)
  }
}
