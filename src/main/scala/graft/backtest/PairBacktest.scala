package graft.backtest

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

/** One bar of an aligned pair series (long format, one row per ts). */
case class PairBar(pair: String, ts: Timestamp, delta: Double, ret1: Double, ret2: Double)

/** One completed round trip emitted by the state machine. */
case class PairTrade(pair: String, open_ts: Timestamp, close_ts: Timestamp, ret: Double)

/** T3 — the BRK share-class pair-arbitrage state machine
  * (reference: stock_arbitrage.ipynb:399-414, cell 6).
  *
  * Semantics replicated exactly:
  *  - flat + |delta| >= buyAt  → arm; the position OPENS at the *next* bar
  *    (pandas `index[get_loc(i)+1]`, T2); a signal on the last bar never opens.
  *  - in-trade + sign*delta <= 0 → close at this bar (mean reversion), emit
  *    `-sign*Σret2 + sign*Σret1 - fees` where Σ is the INCLUSIVE label-range
  *    sum over [open_bar, close_bar] (pandas label slicing, SURVEY A5).
  *  - the exit check runs on the very bar that opened the trade (pandas sets
  *    `arbitrage=True` on the signal bar, so bar i+1 takes the exit branch).
  *  - a position still open at end-of-data is not emitted (pandas appends
  *    only on close).
  *
  * The inclusive label-slice sums are carried as running cumulative sums in
  * the fold state — `Σ[open..close] = cum(close) - cum(bar before open)` —
  * so the whole backtest is one ordered pass per key.
  *
  * Scale: `groupByKey(pair).flatMapSortedGroups(ts)` = one hash shuffle by
  * pair + sort within partitions; each pair folds independently, so 10⁶
  * pairs parallelize across executors with no global ordering requirement.
  */
object PairBacktest {

  def run(bars: Dataset[PairBar], buyAt: Double, fees: Double): Dataset[PairTrade] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars.groupByKey(_.pair)
      .flatMapSortedGroups(col("ts"))((pair, it) => fold(pair, it, buyAt, fees))
  }

  /** Pure per-key fold — unit-testable without Spark. */
  private[graft] def fold(pair: String, bars: Iterator[PairBar],
                          buyAt: Double, fees: Double): Iterator[PairTrade] = {
    val out = List.newBuilder[PairTrade]
    var inArb = false
    var pendingOpen = false
    var sign = 0.0
    var cum1 = 0.0
    var cum2 = 0.0
    var openTs: Timestamp = null
    var openCum1 = 0.0 // cum sums BEFORE the opening bar (inclusive slice)
    var openCum2 = 0.0
    bars.foreach { bar =>
      if (pendingOpen) { // the bar after the signal bar: execute the open
        openTs = bar.ts; openCum1 = cum1; openCum2 = cum2
        inArb = true; pendingOpen = false
      }
      cum1 += bar.ret1
      cum2 += bar.ret2
      if (inArb) {
        if (sign * bar.delta <= 0) { // mean reversion → close this bar
          out += PairTrade(pair, openTs, bar.ts,
            -sign * (cum2 - openCum2) + sign * (cum1 - openCum1) - fees)
          inArb = false
        }
      } else if (!pendingOpen && math.abs(bar.delta) >= buyAt) {
        sign = math.signum(bar.delta)
        pendingOpen = true
      }
    }
    out.result().iterator
  }
}
