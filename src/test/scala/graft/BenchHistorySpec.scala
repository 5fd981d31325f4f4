package graft

import org.scalatest.funsuite.AnyFunSuite

/** The rolling canary ledger's contract (round-16 verdict task #4):
  * host factors compare against the MIN of the last N same-sf entries,
  * so one contended committed run can never invert the movers-discount
  * logic the way the single-previous-artifact host_factor did in r15
  * (final canary 0.394 "faster" vs a contended intermediate while
  * actually slower-hosted than r14).
  */
class BenchHistorySpec extends AnyFunSuite {

  private def tmpPath(): String =
    java.nio.file.Files.createTempDirectory("graft_hist")
      .resolve("canary_history.json").toString

  test("append/read round-trips, filters by sf, caps at HistoryKeep") {
    val p = tmpPath()
    assert(Bench.readHistory("sfA", p).isEmpty)
    Bench.appendHistory("sfA", 0.5, 1.2, p)
    Bench.appendHistory("sfB", 9.9, 9.9, p)
    Bench.appendHistory("sfA", 0.25, -1.0, p)
    assert(Bench.readHistory("sfA", p) == Seq((0.5, 1.2), (0.25, -1.0)))
    assert(Bench.readHistory("sfB", p) == Seq((9.9, 9.9)))
    (1 to Bench.HistoryKeep + 5).foreach(i => Bench.appendHistory("sfA", i.toDouble, -1.0, p))
    assert(Bench.readHistoryAll(p).size == Bench.HistoryKeep)
    // oldest entries were evicted, newest kept
    assert(Bench.readHistory("sfA", p).last._1 == (Bench.HistoryKeep + 5).toDouble)
  }

  test("rollFactor: vs robust floor; contended entries cannot lower the bar") {
    // a clean history around 0.22-0.25 with contended 0.56 runs mixed in —
    // the r15 shape. The factor must read vs the clean floor (0.25: the
    // 2nd-lowest with >=4 entries), so a contended entry never makes a
    // slow run look fast.
    val past = Seq(0.56, 0.25, 0.563, 0.558, 0.22)
    assert(math.abs(Bench.robustFloor(past) - 0.25) < 1e-9)
    assert(math.abs(Bench.rollFactor(0.44, past) - 0.44 / 0.25) < 1e-9)
    // a contended CURRENT run reads >= 1.3 (discount fires)
    assert(Bench.rollFactor(0.56, past) >= 1.3)
    // unavailable sides
    assert(Bench.rollFactor(-1.0, past) == -1.0)
    assert(Bench.rollFactor(0.5, Seq.empty) == -1.0)
    assert(Bench.rollFactor(0.5, Seq(-1.0)) == -1.0)
    // window: only the last HistoryWindow entries count — an ancient
    // fast host outside the window must not poison the bar forever
    val old = Seq(0.01, 0.01) ++ Seq.fill(Bench.HistoryWindow)(0.5)
    assert(Bench.rollFactor(0.5, old) == 1.0)
  }

  test("robustFloor: one spuriously fast entry cannot set the bar") {
    // round-16 ADVICE: a single partially-cached canary sample (0.05 in a
    // 0.25 window) inflated every subsequent factor >= 1.3 and flipped
    // movers_discounted for HistoryWindow runs. With >= 4 entries the
    // floor is the 2nd-lowest, so the outlier is inert...
    val spiked = Seq(0.26, 0.05, 0.25, 0.24, 0.27)
    assert(math.abs(Bench.robustFloor(spiked) - 0.24) < 1e-9)
    assert(Bench.rollFactor(0.26, spiked) < 1.3)
    // ...but TWO independent fast runs still lower it (a genuinely
    // faster host is not an outlier)
    val faster = Seq(0.26, 0.12, 0.125, 0.25, 0.27)
    assert(math.abs(Bench.robustFloor(faster) - 0.125) < 1e-9)
    // small windows keep the min: not enough mass to call anything an
    // outlier
    assert(math.abs(Bench.robustFloor(Seq(0.3, 0.1, 0.2)) - 0.1) < 1e-9)
    assert(Bench.robustFloor(Seq.empty) == -1.0)
  }

  test("alltime floor is sticky: entry eviction and degraded streaks cannot reset it") {
    val p = tmpPath()
    assert(Bench.readAlltime(p).isEmpty)
    Bench.appendHistory("sfA", 0.2, 0.8, p)
    Bench.appendHistory("sfA", 0.5, 0.4, p)
    // per-dimension minima, not per-entry
    assert(Bench.readAlltime(p)("sfA") == ((0.2, 0.4)))
    // a degraded streak long enough to evict the fast entries from the
    // rolling window must NOT move the all-time floor (verdict task #3:
    // the 2nd-lowest-of-window floor inherits the degradation after 10
    // bad runs; this floor is the backstop)
    (1 to Bench.HistoryKeep + 5).foreach(_ => Bench.appendHistory("sfA", 0.9, 0.9, p))
    assert(Bench.readHistoryAll(p).forall(_._2 == 0.9), "fast entries evicted")
    assert(Bench.readAlltime(p)("sfA") == ((0.2, 0.4)), "floor survives eviction")
    // negative (unavailable) samples never become the floor
    Bench.appendHistory("sfB", -1.0, -1.0, p)
    assert(Bench.readAlltime(p)("sfB") == ((-1.0, -1.0)))
    Bench.appendHistory("sfB", 0.3, 0.6, p)
    assert(Bench.readAlltime(p)("sfB") == ((0.3, 0.6)))
    // pre-round-18 ledger without an alltime object: floor seeds from
    // the surviving entries on the next append
    val legacy = tmpPath()
    java.nio.file.Files.write(java.nio.file.Paths.get(legacy),
      """{"entries":[{"sf":"sfA","cpu":0.15,"io":0.45}]}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(Bench.readAlltime(legacy).isEmpty)
    Bench.appendHistory("sfA", 0.3, 0.3, legacy)
    assert(Bench.readAlltime(legacy)("sfA") == ((0.15, 0.3)))
  }

  test("corrupt ledger reads as empty, never throws") {
    val p = tmpPath()
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      "{not json".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(Bench.readHistoryAll(p).isEmpty)
    // append over a corrupt file recovers
    Bench.appendHistory("sfA", 1.0, 2.0, p)
    assert(Bench.readHistory("sfA", p) == Seq((1.0, 2.0)))
  }
}
