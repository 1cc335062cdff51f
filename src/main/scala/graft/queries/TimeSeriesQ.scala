package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TimeSeries

/** Time-series / alignment operators (SURVEY.md §2.3 F*, §2.4 A*, §2.5 G1-G2,
  * §2.7 T1-T2, §2.8) expressed over the `events` table (`user_id` = series
  * key, `ts` = event time, `value` = price-like observable) with DuckDB
  * oracle twins.
  *
  * All windows partition by `user_id` — the 100 TB-safe shape (one shuffle
  * by key; no global window).
  */
object TimeSeriesQ {
  type Q = (SparkSession, String) => DataFrame

  private def byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))

  val queries: Map[String, Q] = Map(
    // T1 — forward-fill (pandas ffill; intra.ipynb:58,91,110). Values of
    // 'error' events are treated as gaps and carried over from the last
    // non-gap observation per user.
    "t1_ffill" -> ((s, d) =>
      TimeSeries.ffill(
        Tables.events(s, d)
          .withColumn("v", when(col("event_type") === "error", lit(null))
            .otherwise(col("value"))),
        keys = Seq("user_id"), orderCols = Seq("ts", "event_id"),
        valueCol = "v", outCol = "filled")
        .select("event_id", "user_id", "filled")
        .orderBy("event_id")),

    // T2 — next-bar lookup (iloc[get_loc(index)+1], stock.ipynb:404)
    "t2_lead" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("next_ts", lead(col("ts"), 1).over(byUser))
        .withColumn("next_value", lead(col("value"), 1).over(byUser))
        .select("event_id", "user_id", "next_ts", "next_value")
        .orderBy("event_id")),

    // F1 — min-max normalization per series (normalize_col, intra.ipynb:46-47)
    "f1_minmax_norm" -> ((s, d) =>
      TimeSeries.minMaxNormalize(Tables.events(s, d),
          keys = Seq("user_id"), valueCol = "value", outCol = "norm")
        .select(col("event_id"), col("user_id"), round(col("norm"), 9).as("norm"))
        .orderBy("event_id")),

    // F2 — rebase vs first observation (df_basing, intra.ipynb:57-63)
    "f2_rebase" -> ((s, d) =>
      TimeSeries.rebaseToFirst(Tables.events(s, d),
          keys = Seq("user_id"), orderCols = Seq("ts", "event_id"),
          valueCol = "value", outCol = "rel")
        .select(col("event_id"), col("user_id"), round(col("rel"), 9).as("rel"))
        .orderBy("event_id")),

    // F5 — relative spread between two aligned series (delta=(b-a)/b,
    // stock.ipynb:71), on daily click/view aggregates aligned by day.
    "f5_delta" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "click", col("value"))).as("a"),
             sum(when(col("event_type") === "view", col("value"))).as("b"))
        .withColumn("delta", round((col("b") - col("a")) / col("b"), 9))
        .select("day", "delta")
        .orderBy("day")),

    // F6 — percent change (pct_change, stock.ipynb:266-267)
    "f6_pct_change" -> ((s, d) =>
      TimeSeries.pctChange(Tables.events(s, d),
          Seq("user_id"), Seq("ts", "event_id"), "value", "pct")
        .select(col("event_id"), col("user_id"), round(col("pct"), 9).as("pct"))
        .orderBy("event_id")),

    // F7 — log return ln(1+pct) (stock.ipynb:266-267)
    "f7_log_return" -> ((s, d) =>
      TimeSeries.logReturn(Tables.events(s, d),
          Seq("user_id"), Seq("ts", "event_id"), "value", "lr")
        .select(col("event_id"), col("user_id"), round(col("lr"), 9).as("lr"))
        .orderBy("event_id")),

    // F8 — ±Inf/NaN cleanup (.replace([inf,-inf],0), stock.ipynb:268).
    // exp(value*4) overflows to +Inf for value>200 rows; cleanInf zeroes it.
    "f8_clean_inf" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("x", when(col("value") > 200.0, exp(col("value") * 4.0))
          .otherwise(col("value")))
        .withColumn("cleaned", round(TimeSeries.cleanInf(col("x")), 6))
        .select("event_id", "cleaned")
        .orderBy("event_id")),

    // F9 — sign / abs (np.sign, .abs(); stock.ipynb:405-406,74)
    "f9_sign_abs" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          signum(col("value") - 100.0).as("sgn"),
          round(abs(col("value") - 100.0), 6).as("mag"))
        .orderBy("event_id")),

    // F10 — exp / pow (annualization math, stock.ipynb:449,468; intra.ipynb:11215)
    "f10_exp_pow" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          round(exp(col("value") / 400.0), 9).as("e"),
          round(pow(lit(1.0) + col("value") / 10000.0, lit(365.0) / lit(30.0)), 9).as("ann"))
        .orderBy("event_id")),

    // F11 — date difference in days ((index[-1]-index[0]).days, intra.ipynb:11211)
    "f11_datediff" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(datediff(to_date(max(col("ts"))), to_date(min(col("ts")))).as("span_days"))
        .orderBy("user_id")),

    // F12 — time-of-day extraction + market-close predicate
    // (is_closing: ts > 16:29:00, IRA.py:152-159)
    "f12_time_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          hour(col("ts")).as("h"), minute(col("ts")).as("m"),
          second(col("ts")).as("sec"),
          TimeSeries.afterTime(col("ts"), 16, 29, 0).as("closing"))
        .orderBy("event_id")),

    // F13 — epoch ↔ timestamp round trip (utcfromtimestamp, intra.ipynb:104-105)
    "f13_epoch_roundtrip" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          unix_micros(col("ts")).as("micros"),
          timestamp_micros(unix_micros(col("ts"))).as("ts2"))
        .orderBy("event_id")),

    // F14 — string formatting + JSON field extraction (report f-strings,
    // IRA.py:101-144; events.props JSON per FIXTURES.md)
    "f14_format_json" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .withColumn("tag", format_string("%s#%04d", col("event_type"), col("k")))
        .select("event_id", "k", "tag")
        .orderBy("event_id")),

    // F15 — trailing rolling mean/max over the last 5 observations per
    // user (pandas rolling(5), min_periods=1 semantics)
    "f15_rolling" -> ((s, d) => {
      val w = TimeSeries.trailingWindow(Seq("user_id"), Seq("ts", "event_id"), 5)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          round(avg("value").over(w), 9).as("roll_mean"),
          round(max("value").over(w), 6).as("roll_max"))
        .orderBy("event_id")
    }),

    // F16 — TIME-range rolling (RANGE frame on epoch seconds, not row
    // counts): trailing 1-hour sum per user. Complements f15's row-count
    // frame; the frame is defined by event-time distance so gaps and
    // bursts are handled correctly.
    "f16_rolling_range" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3600, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          round(sum("value").over(w), 6).as("roll_1h"),
          count(lit(1)).over(w).cast("int").as("n_1h"))
        .orderBy("event_id")
    }),

    // P5 — between_time 14:30-16:30 inclusive (intra.ipynb:90-92)
    "p5_between_time" -> ((s, d) =>
      TimeSeries.betweenTime(Tables.events(s, d), "ts", 14 * 60 + 30, 16 * 60 + 30)
        .select("event_id", "ts")
        .orderBy("event_id")),

    // G1 — group by trading day (groupby(index.day) → per-date, SURVEY G1
    // with the sane to_date fix, §7.4(a))
    "g1_group_by_date" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("total"))
        .orderBy("day")),

    // G2 — 7-business-day block partitioning (bdate_range freq="7B",
    // intra.ipynb:1146-1150); 2024-01-01 is a Monday anchor.
    "g2_weekly_blocks" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("block", TimeSeries.weeklyBlock(col("ts"), "2024-01-01"))
        .groupBy("block")
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("total"))
        .orderBy("block")),

    // G7 — row-wise sum across series, long form (bal_agg_df.sum(axis=1),
    // intra.ipynb:11190): per day, sum over the per-(day,type) averages.
    "g7_rowwise_sum" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(avg("value").as("a"))
        .groupBy("day")
        .agg(round(sum("a"), 6).as("total"))
        .orderBy("day")),

    // A2/W1 — N-way outer alignment as pivot (pd.concat(axis=1),
    // intra.ipynb:108-116): day × event_type wide panel.
    "a2_pivot_align" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum("value"), 6))
        .orderBy("day")),

    // A3 — as-of join (reindex+ffill, intra.ipynb:111): for every click,
    // the most recent purchase value at-or-before it, per user — through
    // [[TimeSeries.asOfJoinAuto]], the deployment default (VERDICT r13
    // #5: the driver-visible path now goes through the hot-key dispatch;
    // the probe picks the plain single-shuffle arm here — no key is hot —
    // and OpsPropertySpec pins plain ≡ sliced ≡ auto, so the oracle is
    // unchanged).
    "a3_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val left = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val right = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("rate"))
      TimeSeries.asOfJoinAuto(left, right, keys = Seq("user_id"),
          tsCol = "ts", rightValueCols = Seq("rate"))
        .orderBy("event_id")
    }),

    // A3-HOT — the hot-key as-of DISPATCH made driver-visible (VERDICT
    // r14 #7): a3's fixture has no hot key, so auto always took the
    // plain single-shuffle arm in the timed path; here 80 % of events
    // collapse onto one synthetic head user (the Zipf-head shape whose
    // SCALING.md pins measured sliced 0.30 vs plain 0.84 exponents),
    // pushing that key past `maxRowsPerKey` so [[TimeSeries
    // .asOfJoinAuto]] provably dispatches the TIME-SLICED branch — the
    // 100×-scale path (no per-key partition ever exceeds one slice of
    // one key). Right side pre-aggregated to unique (key, ts) — the
    // sliced form's contract, and what makes the DuckDB ASOF oracle
    // deterministic under the collapsed key. OpsPropertySpec pins the
    // dispatch takes the sliced arm on this shape.
    "a3_asof_hot" -> ((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("user_id",
          when(pmod(col("user_id"), lit(10)) < 8, lit(0L))
            .otherwise(col("user_id")))
      val left = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val right = e.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(round(max("value"), 6).as("rate"))
      TimeSeries.asOfJoinAuto(left, right, keys = Seq("user_id"),
          tsCol = "ts", rightValueCols = Seq("rate"),
          sliceSeconds = 604800L, maxRowsPerKey = 200L)
        .orderBy("event_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "t1_ffill" ->
      """SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM events ORDER BY event_id""",
    "t2_lead" ->
      """SELECT event_id, user_id,
           lead(ts) OVER w AS next_ts, lead(value) OVER w AS next_value
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    "f1_minmax_norm" ->
      """SELECT event_id, user_id,
           CASE WHEN max(value) OVER w = min(value) OVER w THEN NULL
                ELSE round((value - min(value) OVER w)
                           / (max(value) OVER w - min(value) OVER w), 9) END AS norm
         FROM events WINDOW w AS (PARTITION BY user_id)
         ORDER BY event_id""",
    "f2_rebase" ->
      """SELECT event_id, user_id,
           round(value / first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1, 9) AS rel
         FROM events ORDER BY event_id""",
    "f5_delta" ->
      """SELECT CAST(ts AS DATE) AS day,
           round((sum(CASE WHEN event_type = 'view' THEN value END)
                  - sum(CASE WHEN event_type = 'click' THEN value END))
                 / sum(CASE WHEN event_type = 'view' THEN value END), 9) AS delta
         FROM events GROUP BY 1 ORDER BY day""",
    "f6_pct_change" ->
      """SELECT event_id, user_id,
           round(value / lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1, 9) AS pct
         FROM events ORDER BY event_id""",
    "f7_log_return" ->
      """SELECT event_id, user_id,
           CASE WHEN pct > -1 THEN round(ln(1 + pct), 9) END AS lr
         FROM (SELECT event_id, user_id,
                 value / lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS pct
               FROM events)
         ORDER BY event_id""",
    "f8_clean_inf" ->
      """SELECT event_id,
           round(CASE WHEN isinf(x) OR isnan(x) THEN 0.0 ELSE x END, 6) AS cleaned
         FROM (SELECT event_id, CASE WHEN value > 200.0 THEN exp(value * 4.0) ELSE value END AS x
               FROM events) ORDER BY event_id""",
    "f9_sign_abs" ->
      """SELECT event_id, CAST(sign(value - 100.0) AS DOUBLE) AS sgn,
           round(abs(value - 100.0), 6) AS mag
         FROM events ORDER BY event_id""",
    "f10_exp_pow" ->
      """SELECT event_id, round(exp(value / 400.0), 9) AS e,
           round(pow(1.0 + value / 10000.0, 365.0 / 30.0), 9) AS ann
         FROM events ORDER BY event_id""",
    "f11_datediff" ->
      """SELECT user_id,
           CAST(date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS INTEGER) AS span_days
         FROM events GROUP BY user_id ORDER BY user_id""",
    "f12_time_extract" ->
      """SELECT event_id, CAST(extract(hour FROM ts) AS INTEGER) AS h,
           CAST(extract(minute FROM ts) AS INTEGER) AS m,
           CAST(floor(extract(second FROM ts)) AS INTEGER) AS sec,
           (extract(hour FROM ts) * 3600 + extract(minute FROM ts) * 60
            + floor(extract(second FROM ts))) > 59340 AS closing
         FROM events ORDER BY event_id""",
    "f13_epoch_roundtrip" ->
      """SELECT event_id, epoch_us(ts) AS micros, make_timestamp(epoch_us(ts)) AS ts2
         FROM events ORDER BY event_id""",
    "f14_format_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           printf('%s#%04d', event_type, CAST(json_extract_string(props, '$.k') AS INTEGER)) AS tag
         FROM events ORDER BY event_id""",
    "f15_rolling" ->
      """SELECT event_id, user_id,
           round(avg(value) OVER w, 9) AS roll_mean,
           round(max(value) OVER w, 6) AS roll_max
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "f16_rolling_range" ->
      """SELECT event_id, user_id, ts,
           round(sum(value) OVER w, 6) AS roll_1h,
           CAST(count(*) OVER w AS INTEGER) AS n_1h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "p5_between_time" ->
      """SELECT event_id, ts FROM events
         WHERE extract(hour FROM ts) * 60 + extract(minute FROM ts) BETWEEN 870 AND 990
         ORDER BY event_id""",
    "g1_group_by_date" ->
      """SELECT CAST(ts AS DATE) AS day, count(*) AS n, round(sum(value), 6) AS total
         FROM events GROUP BY 1 ORDER BY day""",
    "g2_weekly_blocks" ->
      """SELECT CAST(floor((floor(dd / 7) * 5 + least(dd - floor(dd / 7) * 7, 4)) / 7) AS INTEGER) AS block,
           count(*) AS n, round(sum(value), 6) AS total
         FROM (SELECT value, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dd FROM events)
         GROUP BY 1 ORDER BY block""",
    "g7_rowwise_sum" ->
      """SELECT day, round(sum(a), 6) AS total
         FROM (SELECT CAST(ts AS DATE) AS day, event_type, avg(value) AS a
               FROM events GROUP BY 1, 2)
         GROUP BY day ORDER BY day""",
    "a2_pivot_align" ->
      """SELECT CAST(ts AS DATE) AS day,
           round(sum(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
           round(sum(CASE WHEN event_type = 'error' THEN value END), 6) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
           round(sum(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
           round(sum(CASE WHEN event_type = 'view' THEN value END), 6) AS view
         FROM events GROUP BY 1 ORDER BY day""",
    "a3_asof_join" ->
      """SELECT c.event_id, c.user_id, c.ts, p.rate
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
         ASOF LEFT JOIN (SELECT user_id, ts, value AS rate FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id AND c.ts >= p.ts
         ORDER BY c.event_id""",
    "a3_asof_hot" ->
      """WITH e AS (SELECT event_id,
                      CASE WHEN user_id % 10 < 8 THEN 0 ELSE user_id END AS user_id,
                      ts, event_type, value
                    FROM events),
         c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
         p AS (SELECT user_id, ts, round(max(value), 6) AS rate
               FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts)
         SELECT c.event_id, c.user_id, c.ts, p.rate
         FROM c ASOF LEFT JOIN p
           ON c.user_id = p.user_id AND c.ts >= p.ts
         ORDER BY c.event_id""",
  )
}
