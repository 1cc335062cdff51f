package graft.backtest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5 — the reference's FULL intraday feeding composition (SURVEY.md §3.2;
  * `intra_day_arbitrage.ipynb` cells 4/6/7/8/16/27), as one reusable
  * long-form Spark pipeline:
  *
  *  1. restrict quotes to the explicit week blocks (cell 16, `:1146-1150`)
  *  2. outer-align every listing of a company onto the union 5-min grid of
  *     its block (`pd.concat(axis=1)`, cell 7 `:108-110`)
  *  3. reindex+ffill the FX series onto that grid and convert flagged
  *     listings (`:111-114`; A3 + F3)
  *  4. min-max normalize each (company, listing, block) column on NATIVE
  *     prices BEFORE any ffill (`normalize_col` at `:46-47` runs inside
  *     `get_price_data` on the unfilled aligned frame — quirk §7.4(d))
  *  5. block-wide ffill of both the converted price and the normalized
  *     series (`extract_trading_days` ffills the whole block before day
  *     grouping, cell 6 `:90-92`)
  *  6. session filter `between_time("14:30","16:30")` inclusive (`:92`)
  *  7. rebase each listing against the base listing per tick
  *     (`df_basing`, cell 4 `:57-63`): `ret = norm/norm_base - 1` with
  *     pandas inf/NaN division semantics preserved
  *  8. assemble per-tick arrays (base first) for the per-company engine
  *     fold — ONE trader per company carried across ALL blocks (cell 27
  *     `:11121-11126` creates the trader outside the block loop).
  *
  * Missing data flows through as NaN exactly as in pandas: the engine's
  * comparisons (`ret > min_deviation`, TP band, SL mark-to-market) are all
  * false on NaN, so gaps can never open a position — same observable
  * behavior, no coalesce-to-zero shortcut.
  *
  * Sanctioned divergence (SURVEY §7.4(a)): trading days group by real
  * date, not pandas `index.day` day-of-month, so a block spanning a month
  * boundary keeps its days in chronological order instead of processing
  * Jan 1-6 before Dec 29-31.
  *
  * Scale shape: every window partitions by (company[, listing][, block])
  * — one hash shuffle each, no global sort; the only keyless windows run
  * over the bounded 5-minute time grid (≈ 20k rows/year), never over fact
  * data. The block calendar and FX grid broadcast.
  */
object IntradayPipeline {

  /** pandas `between_time("14:30","16:30")` bounds, inclusive. */
  val SessionStartSec: Int = 14 * 3600 + 30 * 60
  val SessionEndSec: Int = 16 * 3600 + 30 * 60

  /** Full feed: 5-minute `quotes` in long form
    * `(company long, listing int, convert boolean, ts timestamp, price double)`
    * — `listing` 0 is the base (US) series, `convert` marks FX-converted
    * listings ("." tickers); `fx` is `(ts, rate)`; `blocks` is
    * `(block int, start timestamp, stop timestamp)` with [start, stop)
    * semantics (the reference's yfinance start/end). */
  def companyTicks(quotes: DataFrame, fx: Option[DataFrame],
                   blocks: DataFrame): Dataset[CompanyTick] = {
    val spark = quotes.sparkSession
    import spark.implicits._

    // 1. block restriction: tiny calendar → broadcast range join
    val qb = quotes.join(broadcast(blocks),
        col("ts") >= col("start") && col("ts") < col("stop"))
      .select("company", "listing", "convert", "ts", "price", "block")

    // 2. union alignment grid per (company, block) × the company's listings.
    //    Companies without a base listing anywhere are dropped (the
    //    reference's eligibility loop guarantees a US base ticker,
    //    intra.ipynb:11123-11124; without one the engine's base+arbs arity
    //    contract can't hold).
    // (no broadcast hint: the company set scales with the corpus — AQE
    // converts the semi joins at runtime when the side fits)
    val listings0 = qb.select("company", "listing", "convert").distinct()
    val withBase = listings0.filter(col("listing") === 0).select("company").distinct()
    val listings = listings0.join(withBase, Seq("company"), "left_semi")
    val grid = qb.join(withBase, Seq("company"), "left_semi")
      .select("company", "block", "ts").distinct()
    val cells = grid.join(listings, Seq("company"))
      .join(qb.select("company", "listing", "ts", "price"),
        Seq("company", "listing", "ts"), "left")

    // 3. FX reindexed to the block's grid then ffilled (NOT an as-of join:
    //    pandas `reindex(grid).ffill()` drops off-grid FX ticks entirely).
    //    The grid is the bounded 5-min spine — the keyless ffill window is
    //    over ~20k rows/year, never fact data.
    val withRate = fx match {
      case Some(f) =>
        val tsGrid = grid.select("block", "ts").distinct()
          .join(f.select(col("ts"), col("rate").as("__fx_raw")), Seq("ts"), "left")
        val wFx = Window.partitionBy("block").orderBy("ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val rates = tsGrid
          .withColumn("rate", last(col("__fx_raw"), ignoreNulls = true).over(wFx))
          .select("ts", "rate")
        cells.join(broadcast(rates), Seq("ts"), "left")
      case None => cells.withColumn("rate", lit(null).cast("double"))
    }

    // 4. block-local min-max stats on NATIVE prices (nulls skipped, like
    //    pandas min/max over NaN); constant column → NaN (pandas 0/0)
    val wCol = Window.partitionBy("company", "listing", "block")
    val mn = min(col("price")).over(wCol)
    val mx = max(col("price")).over(wCol)
    val normed = withRate
      .withColumn("__norm",
        when(mx === mn, lit(Double.NaN))
          .otherwise((col("price") - mn) / (mx - mn)))
      // 5a. FX conversion of the PRICE side only (returns stay native):
      //     null rate × price → null, like pandas NaN propagation
      .withColumn("__conv",
        when(col("convert"), col("price") * col("rate")).otherwise(col("price")))

    // 5b. block-wide ffill of both series
    val wFfill = Window.partitionBy("company", "listing", "block").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = normed
      .withColumn("fp", last(col("__conv"), ignoreNulls = true).over(wFfill))
      .withColumn("fn", last(col("__norm"), ignoreNulls = true).over(wFfill))

    // 6. session filter (inclusive both ends, pandas between_time)
    val secOfDay = hour(col("ts")) * 3600 + minute(col("ts")) * 60 + second(col("ts"))
    val session = filled.filter(secOfDay.between(SessionStartSec, SessionEndSec))

    // 7. rebase vs the base listing per tick, pandas division semantics:
    //    x/0 → ±inf, 0/0 and NaN/0 → NaN (ANSI-safe: the zero divisor
    //    never reaches the division)
    val wTick = Window.partitionBy("company", "ts")
    val rebased = session
      .withColumn("__bval", max(when(col("listing") === 0, col("fn"))).over(wTick))
      .withColumn("__ret",
        when(col("listing") === 0, lit(null).cast("double"))
          .otherwise(
            when(col("__bval") === 0,
              when(col("fn") > 0, lit(Double.PositiveInfinity))
                .when(col("fn") < 0, lit(Double.NegativeInfinity))
                .otherwise(lit(Double.NaN)))
              .otherwise(col("fn") / col("__bval") - 1)))

    // 8. per-tick arrays, base first (listing order), nulls → NaN for the
    //    engine's pandas-equivalent comparisons
    rebased.groupBy("company", "ts")
      .agg(array_sort(collect_list(struct(
        col("listing"),
        coalesce(col("fp"), lit(Double.NaN)).as("p"),
        coalesce(col("__ret"), lit(Double.NaN)).as("r")))).as("arr"))
      .select(col("company"), col("ts"),
        (hour(col("ts")) * 3600 + minute(col("ts")) * 60 + second(col("ts")))
          .cast("int").as("sec_of_day"),
        transform(col("arr"), s => s.getField("p")).as("prices"),
        transform(filter(col("arr"), s => s.getField("listing") > 0),
          s => s.getField("r")).as("returns"))
      .as[CompanyTick]
  }
}
