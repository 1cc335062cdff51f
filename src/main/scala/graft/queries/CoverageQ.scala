package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Reshape, TimeSeries}

/** Remaining SURVEY.md §2 inventory entries: literal sources (S5), null
  * pruning (P9), FX conversion + unit scaling (F3/F4), last-N slices (W3),
  * the balance panel pivot (W1).
  */
object CoverageQ {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S5 — in-memory literal source: generated business-day calendar with
    // 7-business-day block ids (pd.bdate_range, intra.ipynb:1146-1150).
    // Pure generator, no table scan at all.
    "s5_literal_calendar" -> ((s, _) =>
      s.range(1)
        .select(explode(sequence(
          to_date(lit("2024-01-01")), to_date(lit("2024-03-31")),
          expr("interval 1 day"))).as("day"))
        .filter(dayofweek(col("day")).between(2, 6)) // Mon..Fri
        .withColumn("block", TimeSeries.weeklyBlock(col("day"), "2024-01-01"))
        .orderBy("day")),

    // P9 — null-driven row pruning (row.dropna(), intra.ipynb:11123):
    // na.drop over a gappy derived column.
    "p9_null_prune" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("v", when(col("event_type") === "error", lit(null))
          .otherwise(col("value")))
        .na.drop(Seq("v"))
        .select("event_id", "v")
        .orderBy("event_id")),

    // F3/F4 — currency conversion + unit-ratio scaling: as-of-join the
    // per-user 'purchase' series as the FX rate (A3), multiply only rows
    // whose type contains 'c' (the `"." in ticker` predicate, F3/P10),
    // and scale everything by the 1500 unit ratio (F4, stock.ipynb:28).
    "f3_fx_convert" -> ((s, d) => {
      val e = Tables.events(s, d)
      val left = e.select("event_id", "user_id", "ts", "event_type", "value")
      val rates = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("fx"))
      TimeSeries.asOfJoin(left, rates, Seq("user_id"), "ts", Seq("fx"))
        .withColumn("converted",
          round(when(col("event_type").contains("c") && col("fx").isNotNull,
            col("value") * col("fx")).otherwise(col("value")) * 1500.0, 6))
        .select("event_id", "converted")
        .orderBy("event_id")
    }),

    // W3 — last-N slice re-sorted ascending (Close[-300:], stock.ipynb:50-51)
    "w3_last_n" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy(col("l_shipdate").desc, col("l_orderkey").desc,
          col("l_linenumber").desc)
        .limit(300)
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")),

    // W1 — the balance panel: per-tick balances of the first 5 companies
    // pivoted wide and forward-filled (bal_agg_df, intra.ipynb:11144-11189)
    // plus the TOTAL row-wise sum (G7). Global-ts window over an already
    // aggregated (small) panel — the long-form history stays keyed.
    // Oracled as a literal-golden VALUES table at the gate SF
    // ([[GoldenOracles]]); the fold feeding it is spec-pinned.
    "w1_balance_panel" -> ((s, d) => {
      val hist = BacktestQ.queries("t4_balance_history")(s, d)
        .filter(col("company") < 5)
      val wide = hist.groupBy("ts")
        .pivot("company", Seq(0, 1, 2, 3, 4))
        .agg(first("balance"))
      val w = Window.orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
      val filled = Seq("0", "1", "2", "3", "4").foldLeft(wide) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
      filled
        .withColumn("TOTAL", round(
          Seq("0", "1", "2", "3", "4").map(c => coalesce(col(c), lit(0.0)))
            .reduce(_ + _), 6).cast("double"))
        .orderBy("ts")
    }),

    // W7 — wide→long melt (inverse of the A2 pivot; pandas `melt`, the
    // direction of the reference's cell-29 flattening,
    // intra.ipynb:11144-11156). Narrow per-row transform, zero shuffle.
    "w7_melt" -> ((s, d) =>
      Reshape.melt(
          Tables.part(s, d).select("p_partkey", "p_size", "p_retailprice"),
          Seq("p_partkey"), Seq("p_size", "p_retailprice"), "metric", "v")
        .withColumn("v", round(col("v"), 6))
        .orderBy("p_partkey", "metric")),
  )

  val oracles: Map[String, String] = Map(
    "s5_literal_calendar" ->
      """SELECT day, CAST(floor((floor(dd / 7) * 5 + least(dd - floor(dd / 7) * 7, 4)) / 7) AS INTEGER) AS block
         FROM (SELECT CAST(d AS DATE) AS day,
                 date_diff('day', DATE '2024-01-01', CAST(d AS DATE)) AS dd
               FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-03-31',
                       INTERVAL 1 DAY)) AS d))
         WHERE isodow(day) BETWEEN 1 AND 5 ORDER BY day""",
    "p9_null_prune" ->
      """SELECT event_id, value AS v FROM events
         WHERE event_type <> 'error' ORDER BY event_id""",
    "f3_fx_convert" ->
      """SELECT l.event_id,
           round(CASE WHEN l.event_type LIKE '%c%' AND r.fx IS NOT NULL
                      THEN l.value * r.fx ELSE l.value END * 1500.0, 6) AS converted
         FROM events l
         ASOF LEFT JOIN (SELECT user_id, ts, value AS fx FROM events
                         WHERE event_type = 'purchase') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY l.event_id""",
    "w7_melt" ->
      """SELECT p_partkey, metric, round(v, 6) AS v
         FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice FROM part)
         UNPIVOT (v FOR metric IN (p_size, p_retailprice))
         ORDER BY p_partkey, metric""",
    "w3_last_n" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM (
           SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
           ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC LIMIT 300)
         ORDER BY l_shipdate, l_orderkey, l_linenumber""",
  )
}
