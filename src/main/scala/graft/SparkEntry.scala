package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names encode the SURVEY.md §2 operator ids they cover
  * (s*=scan, p*=projection/filter, f*=scalar fn, a*=alignment/join,
  * g*=grouping/agg, t*=ordered/stateful, w*=window/report, u*=set op,
  * j*=join strategy, x*=text/dedup extension, v*=vector extension).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. A full
    * star-join + windowed revenue report exercising scan→join→agg→window. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, d).select("o_orderkey", "o_custkey", "o_orderdate")
    val c = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, d).select("n_nationkey", "n_name")
    // Broadcast hint only on the fixed-size dim (nation); customer scales
    // with SF — let AQE pick broadcast at runtime when it fits.
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"), col("yr"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.TimeSeriesQ.queries ++
    graft.queries.BacktestQ.queries ++
    graft.queries.TextQ.queries ++
    graft.queries.VectorQ.queries ++
    graft.queries.ExtQ.queries ++
    graft.queries.CoverageQ.queries ++
    graft.queries.ReplayQ.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
    graft.queries.TimeSeriesQ.oracles ++
    graft.queries.TextQ.oracles ++
    graft.queries.VectorQ.oracles ++
    graft.queries.ExtQ.oracles ++
    graft.queries.CoverageQ.oracles ++
    graft.queries.GoldenOracles.oracles
}
