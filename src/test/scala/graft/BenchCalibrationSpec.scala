package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench window-blessing policy (Bench.Calibration / shouldBless) —
  * load-bearing since r16, when it refused five windows whose probes
  * disagreed; this pins the decision boundaries it enforced by hand there.
  */
class BenchCalibrationSpec extends AnyFunSuite {
  import Bench.{Calibration, shouldBless}

  test("agreeing healthy probes bless; the r16 blessed window reproduces") {
    val c = Calibration(0.909, 0.913)
    assert(c.agree && c.healthy)
    assert(shouldBless(fullCatalog = true, c))
    // normalized total = raw × ref / mean(probes)
    assert(math.abs(c.normalized(93.8) - 93.8 / 0.911) < 1e-9)
  }

  test("probes >10% apart refuse the window even when both look fast") {
    // the r16 driver-final window: start 0.994 / end 0.870 — host speed
    // moved mid-run, so no single number describes the window
    val c = Calibration(0.994, 0.870)
    assert(!c.agree && !c.healthy)
    assert(!shouldBless(fullCatalog = true, c))
    // boundary: exactly 10% apart still agrees; just over does not
    assert(Calibration(1.0, 1.1).agree)
    assert(!Calibration(1.0, 1.11).agree)
    // order-insensitive
    assert(Calibration(1.1, 1.0).agree && !Calibration(1.11, 1.0).agree)
  }

  test("a slow-but-stable window normalizes but is not blessed") {
    val c = Calibration(1.30, 1.32)
    assert(c.agree, "stable probes agree")
    assert(!c.healthy, "mean 1.31 > 1.2x ref must refuse the blessing")
    assert(!shouldBless(fullCatalog = true, c))
    // normalization still yields a comparable number for the stdout report
    assert(math.abs(c.normalized(131.0) - 131.0 / 1.31) < 1e-9)
  }

  test("degraded tier: blessable 1.1-1.2x windows carry the flag") {
    // the r17 blessed window (mean 1.174): valid by the gate, but its
    // normalized total must not anchor cross-round claims unquoted
    val r17 = Calibration(1.222, 1.125)
    assert(r17.healthy && shouldBless(fullCatalog = true, r17))
    assert(r17.degraded, "mean 1.174 > 1.1 must carry degraded=true")
    // a near-1.0 window is the clean anchor: blessed AND not degraded
    val clean = Calibration(0.98, 1.01)
    assert(clean.healthy && !clean.degraded)
    // boundary: exactly 1.1 is NOT degraded; just over is
    assert(!Calibration(1.1, 1.1).degraded)
    assert(Calibration(1.101, 1.101).degraded)
    // a refused window can also be degraded — flags are independent
    assert(Calibration(1.30, 1.32).degraded)
  }

  test("filtered runs never bless, however healthy the window") {
    val c = Calibration(0.95, 0.96)
    assert(c.healthy)
    assert(!shouldBless(fullCatalog = false, c))
  }

  test("degenerate probes cannot divide by zero or bless") {
    val c = Calibration(0.0, 0.0)
    assert(c.normalized(100.0).isFinite || c.normalized(100.0) > 0)
    assert(!shouldBless(fullCatalog = true, Calibration(0.0, 1.0)))
  }
}
