package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's closing sustained-contention verdict ([[Bench.closingVerdict]])
  * — the round-19 ask: a run that STARTS quiet but runs contended (the r18
  * driver artifact: startup gate passed, then mid-run serial probes hit
  * 4.2x floor and the total shipped 56% inflated) must publish
  * `gate: "contended"`, not the startup "quiet". Pure-function spec; the
  * end-to-end flip under a real synthetic co-tenant is ScaleBench's
  * `bench_contended_verdict` probe. */
class BenchGateSpec extends AnyFunSuite {

  private val serFloor = 0.354 // the converged sf0.1@32 floors (PERF.md)
  private val parFloor = 0.536

  test("quiet start, quiet close, no flagged spans: startup verdict survives") {
    assert(Bench.closingVerdict("quiet", 0, 3,
      serFloor * 1.1, Some(serFloor), parFloor * 1.05, Some(parFloor)) === "quiet")
    assert(Bench.closingVerdict("waited_quiet", 1, 3,
      serFloor, Some(serFloor), parFloor, Some(parFloor)) === "waited_quiet")
  }

  test("closing serial probe inflated vs floor downgrades to contended (r18 shape)") {
    // the r18 driver artifact's closing shape: serial 1.49 vs floor 0.354
    assert(Bench.closingVerdict("quiet", 0, 3,
      1.49, Some(serFloor), parFloor, Some(parFloor)) === "contended")
  }

  test("closing parallel probe inflated vs floor downgrades to contended") {
    // half-load inflates the all-cores probe ~1.8x — must trip its band
    assert(Bench.closingVerdict("quiet", 0, 3,
      serFloor, Some(serFloor), parFloor * 1.8, Some(parFloor)) === "contended")
  }

  test(">= k flagged spans downgrade even when the closing probes are quiet") {
    assert(Bench.closingVerdict("quiet", 3, 3,
      serFloor, Some(serFloor), parFloor, Some(parFloor)) === "contended")
    // k-1 flagged spans: the span defense already re-ran them; not sustained
    assert(Bench.closingVerdict("quiet", 2, 3,
      serFloor, Some(serFloor), parFloor, Some(parFloor)) === "quiet")
  }

  test("missing floors skip that axis (same contract as the startup gate)") {
    assert(Bench.closingVerdict("no_floor", 0, 3,
      99.0, None, 99.0, None) === "no_floor")
    // one axis floored, the other missing: the present axis still gates
    assert(Bench.closingVerdict("quiet", 0, 3,
      1.49, Some(serFloor), 99.0, None) === "contended")
  }

  test("bands match the gate's: just-inside values do not flag") {
    // serial band is 1.5x + 0.3s absolute; 1.4x with +0.3s margin is quiet.
    // Use a floor large enough that the absolute term isn't the binding one.
    assert(Bench.closingVerdict("quiet", 0, 3,
      1.4, Some(1.0), parFloor, Some(parFloor)) === "quiet")
    // parallel band is 1.35x + 0.15s
    assert(Bench.closingVerdict("quiet", 0, 3,
      serFloor, Some(serFloor), 1.3, Some(1.0)) === "quiet")
  }

  test("a proceeded_loaded start never upgrades: contended signals only add") {
    assert(Bench.closingVerdict("proceeded_loaded", 0, 3,
      serFloor, Some(serFloor), parFloor, Some(parFloor)) === "proceeded_loaded")
  }
}
