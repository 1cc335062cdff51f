package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.backtest.{PairBacktest, PairBar}

class PairBacktestSpec extends AnyFunSuite {
  private def ts(i: Int) = new Timestamp(i * 86400000L)
  private def bar(i: Int, delta: Double, r1: Double, r2: Double) =
    PairBar("p", ts(i), delta, r1, r2)

  private def run(bars: PairBar*): List[(Int, Int, Double)] =
    PairBacktest.fold("p", bars.iterator, buyAt = 0.5, fees = 0.0)
      .map(t => ((t.open_ts.getTime / 86400000L).toInt,
        (t.close_ts.getTime / 86400000L).toInt, t.ret)).toList

  test("opens at the bar AFTER the signal; inclusive range sums; long side") {
    // signal at bar1 (delta=0.6 >= 0.5, sign=+1), open at bar2, close at
    // bar3 (sign*delta = -0.1 <= 0). Sums over [bar2, bar3] inclusive.
    val trades = run(
      bar(1, 0.6, 0.1, 0.2),
      bar(2, 0.3, 0.01, 0.02),
      bar(3, -0.1, 0.001, 0.002))
    assert(trades.map(t => (t._1, t._2)) == List((2, 3)))
    val expected = -1.0 * (0.02 + 0.002) + 1.0 * (0.01 + 0.001) - 0.0
    assert(math.abs(trades.head._3 - expected) < 1e-12)
  }

  test("exit can trigger on the opening bar itself") {
    val trades = run(bar(1, 0.6, 0.0, 0.0), bar(2, -0.2, 0.05, 0.07))
    assert(trades == List((2, 2, -1.0 * 0.07 + 1.0 * 0.05)))
  }

  test("short side: negative delta entry closes when delta >= 0") {
    val trades = run(
      bar(1, -0.6, 0.0, 0.0), // sign = -1
      bar(2, -0.3, 0.01, 0.03),
      bar(3, 0.1, 0.02, 0.04)) // sign*delta = -0.1 <= 0 → close
    val expected = 1.0 * (0.03 + 0.04) - 1.0 * (0.01 + 0.02)
    assert(trades.map(t => (t._1, t._2)) == List((2, 3)))
    assert(math.abs(trades.head._3 - expected) < 1e-12)
  }

  test("signal on last bar never opens; open position at end not emitted") {
    assert(run(bar(1, 0.1, 0, 0), bar(2, 0.6, 0, 0)).isEmpty)
    assert(run(bar(1, 0.6, 0, 0), bar(2, 0.3, 0.1, 0.1)).isEmpty)
  }

  test("no overlapping trades; re-entry needs a fresh signal bar") {
    val trades = run(
      bar(1, 0.6, 0, 0), bar(2, -0.1, 0, 0), // t1: open 2, close 2
      bar(3, 0.7, 0, 0), bar(4, -0.2, 0.1, 0.2)) // t2: open 4, close 4
    assert(trades.map(t => (t._1, t._2)) == List((2, 2), (4, 4)))
    trades.sliding(2).foreach {
      case List(a, b) => assert(a._2 <= b._1)
      case _          =>
    }
  }
}
