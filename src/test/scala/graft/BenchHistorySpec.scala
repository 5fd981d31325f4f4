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

  test("rollFactor: vs min of window; contended entries cannot lower the bar") {
    // a clean history around 0.25 with one contended 0.56 run mixed in —
    // the r15 shape. The factor must read vs the BEST (0.25), so the
    // contended entry never makes a slow run look fast.
    val past = Seq(0.56, 0.25, 0.563, 0.558, 0.22)
    assert(math.abs(Bench.rollFactor(0.22, past) - 1.0) < 1e-9)
    assert(Bench.rollFactor(0.44, past) == 2.0)
    // a contended CURRENT run reads >= 1.3 (discount fires)
    assert(Bench.rollFactor(0.56, past) >= 1.3)
    // unavailable sides
    assert(Bench.rollFactor(-1.0, past) == -1.0)
    assert(Bench.rollFactor(0.5, Seq.empty) == -1.0)
    assert(Bench.rollFactor(0.5, Seq(-1.0)) == -1.0)
    // window: only the last HistoryWindow entries count — an ancient
    // fast host outside the window must not poison the bar forever
    val old = Seq(0.01) ++ Seq.fill(Bench.HistoryWindow)(0.5)
    assert(Bench.rollFactor(0.5, old) == 1.0)
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
