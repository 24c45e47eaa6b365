package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchCalibrationSpec extends AnyFunSuite {

  test("spin is deterministic in (iters, seed) and seed-sensitive") {
    assert(BenchCalibration.spin(1000) == BenchCalibration.spin(1000))
    assert(BenchCalibration.spin(1000) != BenchCalibration.spin(1001))
    assert(BenchCalibration.spin(1000, seed = 1) != BenchCalibration.spin(1000, seed = 2))
  }

  test("probes measure positive seconds and report this machine's speed") {
    val st = BenchCalibration.singleThreadSec()
    val mt = BenchCalibration.multiThreadSec(Runtime.getRuntime.availableProcessors())
    assert(st > 0 && mt > 0)
    info(f"cal_st=$st%.3f s cal_mt=$mt%.3f s " +
      f"(degraded threshold ${BenchCalibration.DegradedStSec}%.2f s)")
    // a second single-thread run lands within JIT-noise of the first on
    // any machine — wildly different repeats would make the yardstick
    // useless (generous 4x band: this asserts the MECHANISM, the health
    // threshold itself is calibrated in BASELINE.md)
    val st2 = BenchCalibration.singleThreadSec()
    assert(st2 < st * 4 && st < st2 * 4)
  }
}
