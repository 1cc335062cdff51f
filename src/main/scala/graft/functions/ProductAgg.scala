package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact product aggregate (SURVEY.md §2.6 G6) — pandas
  * `Series.product()` (reference: stock_arbitrage.ipynb:468
  * `np.exp(returns_df['return']).product()`).
  *
  * Spark SQL has no built-in `product`; `exp(sum(log(x)))` only works for
  * strictly positive factors. This Aggregator is exact for zero/negative
  * factors too. Nulls are skipped (pandas NaN-skipping semantics).
  *
  * Scale: an `Aggregator` runs as a partial (map-side) + final (reduce-side)
  * hash aggregate exactly like built-in aggregates — one shuffle of one
  * double per group.
  */
object ProductAgg extends Aggregator[java.lang.Double, Double, Double] {
  override def zero: Double = 1.0
  override def reduce(b: Double, a: java.lang.Double): Double =
    if (a == null) b else b * a.doubleValue()
  override def merge(b1: Double, b2: Double): Double = b1 * b2
  override def finish(r: Double): Double = r
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `product(col)` usable in `agg(...)`. */
  def product(c: Column): Column = udaf(ProductAgg).apply(c)
}
