package graft.backtest

import java.sql.Timestamp
import scala.collection.mutable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

/** One 5-minute tick of one company's aligned panel: `prices(0)` is the base
  * (US) listing, `prices(1..)` the arbitrage listings, `returns(i)` the
  * rebased deviation of arbitrage listing i vs the base (df_basing output).
  */
case class CompanyTick(company: Long, ts: Timestamp, sec_of_day: Int,
                       prices: Seq[Double], returns: Seq[Double])

/** Events emitted by the intraday engine: one row per closed trade
  * (kind = tp|sl|mc) plus one `bal` row per tick (the balance history that
  * feeds the reporting pivot W1). */
case class IntradayEvent(company: Long, ts: Timestamp, kind: String,
                         roi: Double, balance: Double)

/** Serializable state of one [[IntradayEngine]] between micro-batches. */
case class EngineSnapshot(balance: Double, shares: Map[Int, Double],
                          baseShares: Map[Int, Double], cpt: List[Int])

/** T4 — faithful re-implementation of the reference's stateful intraday
  * pair-trading engine, class `IntradayRegionArbitrage`
  * (/root/reference/IntradayRegionArbitrage.py:5-159), as a pure per-key
  * transducer `(state, tick) → events`.
  *
  * Replicated exactly:
  *  - one-sided opportunity detection (IRA.py:67-79): `opportunity = ret >
  *    min_deviation` with `min_deviation > 0` asserted, so only positive
  *    deviations open and `signal` is always long on open (SURVEY §7.4(c) —
  *    observable behavior, kept).
  *  - order sizing `(trade_size[*balance]/n_positions)*2` and the
  *    both-legs-add balance accounting (IRA.py:90-99).
  *  - take-profit closes AT MOST ONE position per tick (`break`,
  *    IRA.py:114-117); remaining positions aren't SL-checked that tick.
  *  - stop-loss mark-to-market `pnl = (bal - base_leg - tick_leg)/bal - 1 <
  *    -sl_percent` (IRA.py:121-122).
  *  - market close is strictly after 16:29:00, not the documented 16:30
  *    (IRA.py:152-159; SURVEY §7.4(e), kept).
  *  - no new opens while any position is open, and none at/after close
  *    (IRA.py:52-65).
  *
  * Deliberate divergences (SURVEY §7.4, sane semantics, documented):
  *  - market-close flush closes over a SNAPSHOT of open positions; the
  *    reference's `tmp = self._cpt` aliases the list being mutated and
  *    skips every other position (IRA.py:57-58, quirk (b) — fixed).
  *  - stop-loss iteration likewise walks a snapshot (the reference mutates
  *    `_cpt` mid-iteration at IRA.py:112/150).
  */
final class IntradayEngine(bal: Double, minDeviation: Double, slPercent: Double,
                           triggerRange: Double, tradeSize: Double,
                           tradeSizePercent: Boolean) {
  require(minDeviation > 0, "min_deviation must be greater than 0")
  require(slPercent > 0, "stop loss cant be 0 or negative")
  require(minDeviation > triggerRange && triggerRange > 0,
    "trigger range must be > 0 and < min_deviation")
  require(!tradeSizePercent || tradeSize < 1, "percent trade size must be < 1")

  private val closeCutoffSec = 16 * 3600 + 29 * 60 // strictly after 16:29:00

  var balance: Double = bal
  private val shares = mutable.HashMap.empty[Int, Double]     // arb-leg shares by idx
  private val baseShares = mutable.HashMap.empty[Int, Double] // base-leg shares by idx
  private var cpt: List[Int] = Nil                            // open position indices
  private var basePrice: Double = 0.0
  private var prices: Seq[Double] = Nil                       // arb prices this tick

  def inTrade: Boolean = cpt.nonEmpty

  /** Export the mutable state as an immutable snapshot (for checkpointed
    * execution: `GroupState` in flatMapGroupsWithState). */
  def snapshot: EngineSnapshot =
    EngineSnapshot(balance, shares.toMap, baseShares.toMap, cpt)

  /** Restore from a snapshot (inverse of [[snapshot]]). */
  def restore(s: EngineSnapshot): Unit = {
    balance = s.balance
    shares.clear(); shares ++= s.shares
    baseShares.clear(); baseShares ++= s.baseShares
    cpt = s.cpt
  }

  /** Process one tick; returns (kind, roi) for each trade closed on it.
    * Mirrors IRA.data_feed (IRA.py:35-65). */
  def dataFeed(secOfDay: Int, returns: Seq[Double], priceData: Seq[Double]): List[(String, Double)] = {
    require(priceData.length == returns.length + 1, "prices must be base +: arbs")
    basePrice = priceData.head
    prices = priceData.tail
    val out = mutable.ListBuffer.empty[(String, Double)]
    val closing = secOfDay > closeCutoffSec
    if (cpt.nonEmpty) {
      priceCheck(returns, out)
      if (closing) cpt.foreach(i => closeTrade(i, "mc", out)) // snapshot: cpt reassigned inside
    } else if (!closing) {
      cpt = returns.indices.filter(i => returns(i) > minDeviation).toList
      if (cpt.nonEmpty) tradeSignal(returns, out)
    }
    out.toList
  }

  /** IRA.trade_signal (IRA.py:81-102). */
  private def tradeSignal(returns: Seq[Double], out: mutable.ListBuffer[(String, Double)]): Unit = {
    val orderSize =
      (if (tradeSizePercent) tradeSize * balance else tradeSize) / cpt.length * 2
    cpt.foreach { idx =>
      val price = prices(idx)
      val long = returns(idx) > 0 // always true on open given minDeviation > 0
      shares(idx) = orderSize / price * (if (long) 1 else -1)
      baseShares(idx) = orderSize / basePrice * (if (long) -1 else 1)
      balance += shares(idx) * price
      balance += baseShares(idx) * basePrice
    }
  }

  /** IRA.price_check (IRA.py:104-124): TP band (at most one per tick, then
    * stop checking), else SL mark-to-market. */
  private def priceCheck(returns: Seq[Double], out: mutable.ListBuffer[(String, Double)]): Unit = {
    val open = cpt // snapshot
    var broke = false
    open.foreach { i =>
      if (!broke && cpt.contains(i)) {
        if (returns(i) <= triggerRange && returns(i) >= -triggerRange) {
          closeTrade(i, "tp", out)
          broke = true // reference `break`: nothing else checked this tick
        } else {
          val pnl = (balance + baseShares(i) * basePrice * -1 +
            shares(i) * prices(i) * -1) / balance - 1
          if (pnl < -slPercent) closeTrade(i, "sl", out)
        }
      }
    }
  }

  /** IRA.close_trade (IRA.py:126-150): unwind both legs at current prices. */
  private def closeTrade(idx: Int, kind: String, out: mutable.ListBuffer[(String, Double)]): Unit = {
    val tmpBal = balance
    balance += baseShares(idx) * basePrice * -1 + shares(idx) * prices(idx) * -1
    val roi = balance / tmpBal - 1
    shares.remove(idx)
    baseShares.remove(idx)
    cpt = cpt.filterNot(_ == idx)
    out += ((kind, roi))
  }
}

/** Streaming wrapper (SURVEY.md §2.10): the SAME transducer under
  * `flatMapGroupsWithState` — engine state snapshots live in the state
  * store between micro-batches, the 16:29 market-close flush fires off
  * tick event times exactly as in batch. Assumes per-key event-time order
  * across micro-batches (ticks within a batch are sorted here; a
  * production feed out-of-order beyond a batch needs watermark buffering
  * upstream — documented out-of-scope per SURVEY §2.10). */
object IntradayStream {
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def run(ticks: Dataset[CompanyTick], bal: Double, minDeviation: Double,
          slPercent: Double, triggerRange: Double, tradeSize: Double,
          tradeSizePercent: Boolean, watermark: String = "1 minute"): Dataset[IntradayEvent] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .withWatermark("ts", watermark)
      .groupByKey(_.company)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        stateFn(bal, minDeviation, slPercent, triggerRange, tradeSize,
          tradeSizePercent))
  }

  private[graft] def stateFn(bal: Double, minDeviation: Double, slPercent: Double,
      triggerRange: Double, tradeSize: Double, tradeSizePercent: Boolean)(
      company: Long, ticks: Iterator[CompanyTick],
      state: GroupState[EngineSnapshot]): Iterator[IntradayEvent] = {
    val engine = new IntradayEngine(bal, minDeviation, slPercent, triggerRange,
      tradeSize, tradeSizePercent)
    state.getOption.foreach(engine.restore)
    val out = List.newBuilder[IntradayEvent]
    ticks.toSeq.sortBy(_.ts.getTime).foreach { t =>
      engine.dataFeed(t.sec_of_day, t.returns, t.prices).foreach {
        case (kind, roi) =>
          out += IntradayEvent(company, t.ts, kind, roi, engine.balance)
      }
      out += IntradayEvent(company, t.ts, "bal", 0.0, engine.balance)
    }
    state.update(engine.snapshot)
    out.result().iterator
  }
}

/** Spark wrapper: run one IntradayEngine per company over its ts-sorted
  * ticks. One hash shuffle by company; companies fold independently in
  * parallel — the same shape that scales to millions of keys. */
object IntradayBacktest {

  def run(ticks: Dataset[CompanyTick], bal: Double, minDeviation: Double,
          slPercent: Double, triggerRange: Double, tradeSize: Double,
          tradeSizePercent: Boolean): Dataset[IntradayEvent] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.groupByKey(_.company)
      .flatMapSortedGroups(col("ts"))((company, it) =>
        fold(company, it, bal, minDeviation, slPercent, triggerRange,
          tradeSize, tradeSizePercent))
  }

  /** Pure per-key fold — unit-testable without Spark. Emits one `bal` row
    * per tick (the cell-8 `[timestamp, balance]` history,
    * intra_day_arbitrage.ipynb:130-150) plus one row per closed trade. */
  private[graft] def fold(company: Long, ticks: Iterator[CompanyTick],
                          bal: Double, minDeviation: Double, slPercent: Double,
                          triggerRange: Double, tradeSize: Double,
                          tradeSizePercent: Boolean): Iterator[IntradayEvent] = {
    val engine = new IntradayEngine(bal, minDeviation, slPercent, triggerRange,
      tradeSize, tradeSizePercent)
    val out = List.newBuilder[IntradayEvent]
    ticks.foreach { t =>
      val closed = engine.dataFeed(t.sec_of_day, t.returns, t.prices)
      closed.foreach { case (kind, roi) =>
        out += IntradayEvent(company, t.ts, kind, roi, engine.balance)
      }
      out += IntradayEvent(company, t.ts, "bal", 0.0, engine.balance)
    }
    out.result().iterator
  }
}
