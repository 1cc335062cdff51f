package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.backtest.IntradayEngine

/** Hand-computed traces against IntradayRegionArbitrage.py semantics. */
class IntradayEngineSpec extends AnyFunSuite {
  private val noon = 12 * 3600
  private val afterClose = 16 * 3600 + 29 * 60 + 1 // strictly after 16:29:00

  private def engine() = new IntradayEngine(bal = 1000.0, minDeviation = 0.1,
    slPercent = 0.05, triggerRange = 0.05, tradeSize = 100.0, tradeSizePercent = false)

  test("open: only returns > min_deviation; balance adds both legs (IRA.py:90-99)") {
    val e = engine()
    // idx0 opens (0.2 > 0.1); idx1 does not (0.05 <= 0.1)
    val closed = e.dataFeed(noon, Seq(0.2, 0.05), Seq(10.0, 20.0, 30.0))
    assert(closed.isEmpty && e.inTrade)
    // order = 100/1*2 = 200; long 200/20=10 shares, short base 200/10=-20;
    // balance += 10*20 + (-20)*10 = 0
    assert(math.abs(e.balance - 1000.0) < 1e-12)
  }

  test("take-profit: |ret| <= trigger_range closes at current prices") {
    val e = engine()
    e.dataFeed(noon, Seq(0.2, 0.05), Seq(10.0, 20.0, 30.0))
    val closed = e.dataFeed(noon + 300, Seq(0.02, 0.0), Seq(10.0, 21.0, 30.0))
    // close: balance += -(-20*10) - 10*21 = 200 - 210 = -10 → 990
    assert(closed == List(("tp", 990.0 / 1000.0 - 1)))
    assert(math.abs(e.balance - 990.0) < 1e-12 && !e.inTrade)
  }

  test("negative deviation never opens (one-sided detection, IRA.py:77)") {
    val e = engine()
    e.dataFeed(noon, Seq(-0.5, -0.2), Seq(10.0, 20.0, 30.0))
    assert(!e.inTrade)
  }

  test("stop-loss: mark-to-market pnl < -sl_percent (IRA.py:121-122)") {
    val e = engine()
    e.dataFeed(noon, Seq(0.2, 0.05), Seq(10.0, 20.0, 30.0))
    // ret outside the tp band; ticker 20→12, base 10:
    // pnl = (1000 + (-20*10)*(-1) + (10*12)*(-1))/1000 - 1 = +0.08 → no SL
    var closed = e.dataFeed(noon + 300, Seq(0.2, 0.0), Seq(10.0, 12.0, 30.0))
    assert(closed.isEmpty && e.inTrade)
    // ticker 30, base 12: (1000 + 240 - 300)/1000 - 1 = -0.06 < -0.05 → SL
    closed = e.dataFeed(noon + 600, Seq(0.2, 0.0), Seq(12.0, 30.0, 30.0))
    assert(closed.map(_._1) == List("sl"))
    assert(math.abs(e.balance - 940.0) < 1e-12)
  }

  test("market close flushes ALL open positions with kind=mc (snapshot fix)") {
    val e = engine()
    e.dataFeed(noon, Seq(0.2, 0.3), Seq(10.0, 20.0, 30.0)) // both open
    val closed = e.dataFeed(afterClose, Seq(0.2, 0.3), Seq(10.0, 20.0, 30.0))
    assert(closed.map(_._1) == List("mc", "mc"))
    assert(!e.inTrade)
  }

  test("at most one take-profit per tick (reference break, IRA.py:117)") {
    val e = engine()
    e.dataFeed(noon, Seq(0.2, 0.3), Seq(10.0, 20.0, 30.0))
    // both in the tp band → only the first closes this tick
    val closed = e.dataFeed(noon + 300, Seq(0.0, 0.0), Seq(10.0, 20.0, 30.0))
    assert(closed.map(_._1) == List("tp"))
    assert(e.inTrade)
    val closed2 = e.dataFeed(noon + 600, Seq(0.0, 0.0), Seq(10.0, 20.0, 30.0))
    assert(closed2.map(_._1) == List("tp"))
    assert(!e.inTrade)
  }

  test("no new opens while in trade or at/after close (IRA.py:52-65)") {
    val e = engine()
    e.dataFeed(noon, Seq(0.2, 0.05), Seq(10.0, 20.0, 30.0))
    e.dataFeed(noon + 300, Seq(0.2, 0.5), Seq(10.0, 20.0, 30.0)) // idx1 signal ignored
    e.dataFeed(noon + 600, Seq(0.02, 0.5), Seq(10.0, 20.0, 30.0)) // tp closes idx0
    assert(!e.inTrade)
    val e2 = engine()
    e2.dataFeed(afterClose, Seq(0.5, 0.5), Seq(10.0, 20.0, 30.0))
    assert(!e2.inTrade)
  }
}
