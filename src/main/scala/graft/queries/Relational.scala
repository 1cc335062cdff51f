package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ProductAgg

/** SQL-expressible relational operators from SURVEY.md §2.1/2.2/2.4/2.6/2.8/2.9,
  * expressed over the driver testdata star schema. Each query has a DuckDB
  * oracle twin in [[oracles]]; names/aliases match column-for-column.
  *
  * Determinism policy: every query ends in an ORDER BY over a unique key
  * (driver hashes values; we keep row order deterministic on both sides) and
  * every floating aggregate is rounded to a precision far above the
  * accumulated double error at sf0.1.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S1 — dimension scan (reference: pd.read_excel(Stocks.xlsx), intra.ipynb:188)
    "s1_dim_scan" -> ((s, d) => Tables.region(s, d).orderBy("r_regionkey")),

    // P1 — positional column slice (iloc[:, 0:3], intra.ipynb:198-210):
    // project by schema position, not name.
    "p1_positional_slice" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.select(c.columns.slice(0, 3).map(col): _*).orderBy("c_custkey")
    }),

    // P4 — single-column projection (history(...)["Close"], intra.ipynb:106)
    "p4_single_column" -> ((s, d) =>
      Tables.events(s, d).select("event_id", "value").orderBy("event_id")),

    // P2 — column drop by name (df.drop([...], axis=1), intra.ipynb:210)
    "p2_drop_columns" -> ((s, d) =>
      Tables.part(s, d).drop("p_brand", "p_type").orderBy("p_partkey")),

    // P3 — row drop by key (.drop("Fujitsu"), intra.ipynb:1053)
    "p3_row_drop" -> ((s, d) =>
      Tables.nation(s, d).filter(col("n_name") =!= "NATION_7").orderBy("n_nationkey")),

    // P6 — label range slice by year (history[from_year:], stock.ipynb:26-28)
    "p6_year_slice" -> ((s, d) =>
      Tables.orders(s, d)
        // range form of year(o_orderdate) >= 1999 (r15): a year() filter
        // is a derived-column predicate and never reaches the parquet
        // scan (PushedFilters carried only IsNotNull); the equivalent
        // date bound pushes down and prunes row groups by min/max stats.
        // Identical output for every date (year >= 1999 ⟺ date ≥
        // 1999-01-01); the oracle still states it as extract(year ...)
        .filter(col("o_orderdate") >= lit(java.sql.Date.valueOf("1999-01-01")))
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .orderBy("o_orderkey")),

    // P7 — scalar threshold predicate (|delta| >= pct, stock.ipynb:74)
    "p7_threshold" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("delta", col("value") - lit(100.0))
        .filter(abs(col("delta")) >= 50.0)
        .select(col("event_id"), round(col("delta"), 6).as("delta"))
        .orderBy("event_id")),

    // P8 — profit/loss split filter (filter(lambda x: x[1]>0), intra.ipynb:11689)
    "p8_positive_filter" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("value") - 100.0 > 0)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")),

    // P10 — substring predicate ("." in ticker, intra.ipynb:11124)
    "p10_contains" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_type").contains("ECO"))
        .select("p_partkey", "p_type")
        .orderBy("p_partkey")),

    // A1 — dimension join; 25-row nation × 5-row region → broadcast hash join,
    // zero shuffle (reference index join, intra.ipynb:1053)
    "a1_dim_join" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")),

    // J1 — star join: fact × orders × customer × nation × region. Broadcast
    // hints ONLY on the fixed-cardinality dims (nation=25, region=5);
    // customer scales with SF, so its join is left to AQE — at local SF it
    // still converts to broadcast at runtime, at 100 TB it shuffles safely
    // instead of OOMing the driver. Partial aggregation pushes below the
    // shuffle either way.
    "j1_star_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
      val o  = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val c  = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val n  = Tables.nation(s, d).select("n_nationkey", "n_regionkey")
      val r  = Tables.region(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("r_name")
    }),

    // J2/J3 — semi / anti join (EXISTS / NOT EXISTS)
    "j2_semi_join" -> ((s, d) => {
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 40000)
        .select("o_custkey")
      Tables.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),
    "j3_anti_join" -> ((s, d) => {
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 480000)
        .select("o_custkey")
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // G4/G5/G8 — the classic flag/status aggregate (min/max/sum/avg/count +
    // conditional share; reference G4-G8). Partial (map-side) agg + one
    // shuffle on a 6-value key.
    "g5_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(min("l_extendedprice"), 2).as("min_price"),
          round(max("l_extendedprice"), 2).as("max_price"),
          count(lit(1)).as("n"),
          count(when(col("l_quantity") > 25, 1)).as("n_big"),
          round(avg(when(col("l_quantity") > 25, 1.0).otherwise(0.0)), 6).as("big_share"))
        .orderBy("l_returnflag", "l_linestatus")),

    // G6 — product aggregate (np.exp(returns).product(), stock.ipynb:468)
    // via the exact ProductAgg Aggregator (works for <=0 factors too).
    "g6_product" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(round(ProductAgg.product(lit(1.0) + col("l_discount")), 9).as("growth"))
        .orderBy("l_orderkey")),

    // W2 — head / top-n (df.head(), iloc slices; reference W2)
    "w2_topn" -> ((s, d) =>
      Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(10)),

    // W4 — final-snapshot per key (last balance row, intra.ipynb:11709):
    // row_number over (key ORDER BY ts DESC) = 1. Rank window, not
    // TopKAgg: the order needs a DESC id tiebreak (event_id desc) and
    // carries a non-numeric payload — outside the aggregate's contract.
    "w4_last_snapshot" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "ts", "value")
        .orderBy("user_id")
    }),

    // W5 — explicit global sort (pandas implicit index order made explicit)
    "w5_sort" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .limit(500)),

    // U1 — union (sum(lists, []) flattening, intra.ipynb:148-150)
    "u1_union" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.filter(col("event_type") === "click").select("event_id", "event_type")
        .union(e.filter(col("event_type") === "error").select("event_id", "event_type"))
        .orderBy("event_id")
    }),

    // U2/U3 — intersect / except (set-op completeness; not in reference, §2.9)
    "u2_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),
    "u3_except" -> ((s, d) =>
      Tables.nation(s, d).select(col("n_nationkey").as("nationkey"))
        .except(Tables.customer(s, d).filter(col("c_acctbal") > 9900)
          .select(col("c_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    // G10 — hierarchical aggregates: ROLLUP over (flag, status) with the
    // grouping-null subtotal rows (beyond the reference; engine
    // completeness for reporting).
    "g10_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // G11 — exact interpolated percentiles per group (order statistics;
    // Spark's `percentile` == SQL percentile_cont semantics). Exact is
    // the oracle-able form; at 100 TB swap for approx_percentile (KLL
    // sketch, mergeable partial agg) when one pass over unsorted data
    // matters more than exactness.
    "g11_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.25)"), 6).as("p25"),
          round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)"), 6).as("p50"),
          round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.75)"), 6).as("p75"),
          round(expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.9)"), 6).as("price_p90"))
        .orderBy("l_returnflag")),

    // G12 — mergeable sketches: HyperLogLog++ distinct counts and KLL
    // approx percentiles per group. THE one-pass shapes for 100 TB
    // profiling: both are partial+final aggregates whose buffers merge
    // associatively across partitions (no sort, no second pass; contrast
    // g11's exact percentile, which materializes each group). No SQL
    // oracle — approximation is engine-specific — so SketchSpec bounds
    // the error against the exact answers instead.
    "g12_sketches" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          percentile_approx(col("l_extendedprice").cast("double"), lit(0.5), lit(1000))
            .as("median_price_approx"))
        .orderBy("l_returnflag")),

    // W6 — ranking-function family: rank / dense_rank / ntile over
    // customers by balance within nation.
    "w6_ranking" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          ntile(4).over(w).as("quartile"))
        .orderBy("c_custkey")
    }),

    // A5 — inclusive range aggregation (label slice sum, stock.ipynb:407):
    // per order, quantities shipped within [orderdate, orderdate+60d], both
    // ends inclusive. Equi key (orderkey) keeps the range join bounded.
    "a5_range_agg" -> ((s, d) => {
      val o  = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate", "l_quantity")
      o.join(li,
          o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate").between(o("o_orderdate"),
            o("o_orderdate") + expr("INTERVAL 60 DAYS")),
          "left")
        .groupBy("o_orderkey")
        .agg(round(coalesce(sum("l_quantity"), lit(0.0)), 2).as("qty_60d"))
        .orderBy("o_orderkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "s1_dim_scan" -> "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "p1_positional_slice" ->
      "SELECT c_custkey, c_name, c_nationkey FROM customer ORDER BY c_custkey",
    "p4_single_column" ->
      "SELECT event_id, value FROM events ORDER BY event_id",
    "p2_drop_columns" ->
      "SELECT p_partkey, p_name, p_size, p_retailprice FROM part ORDER BY p_partkey",
    "p3_row_drop" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_name <> 'NATION_7' ORDER BY n_nationkey",
    "p6_year_slice" ->
      "SELECT o_orderkey, o_custkey, o_orderdate FROM orders WHERE CAST(extract(year FROM o_orderdate) AS INTEGER) >= 1999 ORDER BY o_orderkey",
    "p7_threshold" ->
      "SELECT event_id, round(value - 100.0, 6) AS delta FROM events WHERE abs(value - 100.0) >= 50.0 ORDER BY event_id",
    "p8_positive_filter" ->
      "SELECT event_id, user_id, value FROM events WHERE value - 100.0 > 0 ORDER BY event_id",
    "p10_contains" ->
      "SELECT p_partkey, p_type FROM part WHERE p_type LIKE '%ECO%' ORDER BY p_partkey",
    "a1_dim_join" ->
      "SELECT n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey",
    "j1_star_join" ->
      """SELECT r_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue, count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "j2_semi_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 40000) ORDER BY c_custkey",
    "j3_anti_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 480000) ORDER BY c_custkey",
    "g5_agg" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           round(avg(l_quantity), 6) AS avg_qty,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           count(*) AS n,
           count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_big,
           round(avg(CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END), 6) AS big_share
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "g6_product" ->
      "SELECT l_orderkey, round(product(1.0 + l_discount), 9) AS growth FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey",
    "w2_topn" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10",
    "w4_last_snapshot" ->
      """SELECT user_id, ts, value FROM (
           SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) WHERE rn = 1 ORDER BY user_id""",
    "w5_sort" ->
      "SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 500",
    "u1_union" ->
      """SELECT event_id, event_type FROM events WHERE event_type = 'click'
         UNION ALL SELECT event_id, event_type FROM events WHERE event_type = 'error'
         ORDER BY event_id""",
    "u2_intersect" ->
      "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey AS nationkey FROM supplier ORDER BY nationkey",
    "u3_except" ->
      "SELECT n_nationkey AS nationkey FROM nation EXCEPT SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900 ORDER BY nationkey",
    "g10_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "g11_percentiles" ->
      """SELECT l_returnflag,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS p25,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS p50,
           round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS p75,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 6) AS price_p90
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "w6_ranking" ->
      """SELECT c_custkey, c_nationkey,
           CAST(rank() OVER w AS INTEGER) AS rk,
           CAST(dense_rank() OVER w AS INTEGER) AS drk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
         ORDER BY c_custkey""",
    "a5_range_agg" ->
      """SELECT o_orderkey, round(coalesce(sum(l_quantity), 0.0), 2) AS qty_60d
         FROM orders LEFT JOIN lineitem
           ON o_orderkey = l_orderkey
          AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 60 DAY
         GROUP BY o_orderkey ORDER BY o_orderkey""",
  )
}
