package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Long↔wide reshaping (SURVEY.md §2.4 A2, §2.8 W1).
  *
  * The canonical data layout in this engine is LONG `(key, ts, value)` —
  * pandas' wide panels (one column per ticker, aligned on a DatetimeIndex)
  * are materialized only on demand, because long form scales: a union of
  * series is a cheap append, while wide alignment is an N-way full outer
  * join that pandas hides inside `concat(axis=1)`.
  */
object Reshape {

  /** Long → wide: `groupBy(ts).pivot(series).agg(agg(value))` — the Spark
    * translation of `pd.concat(axis=1)` outer alignment (reference:
    * intra_day_arbitrage.ipynb:108-116) and of the cell-29/30 balance pivot
    * (`intra.ipynb:11144-11189`).
    *
    * `seriesValues` should be supplied when known (the 50-company dimension
    * is known up front): it skips Spark's extra distinct-collection job AND
    * keeps the pivot a single shuffle.
    */
  def pivotWide(df: DataFrame, tsCol: String, seriesCol: String,
                valueCol: String, seriesValues: Seq[String]): DataFrame =
    df.groupBy(col(tsCol))
      .pivot(seriesCol, seriesValues)
      .agg(first(col(valueCol), ignoreNulls = true))

  /** Wide → long (inverse of pivotWide; pandas `melt`). A single narrow
    * transform — no shuffle. NUMERIC value columns only: they are widened
    * to double so one `value` column can hold every series (the panel
    * use-case); string columns would cast to null — melt those in a
    * separate pass with their own value type. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           keyName: String, valueName: String): DataFrame = {
    val kvs = valueCols.flatMap(c => Seq(lit(c), col(c).cast("double")))
    df.select(idCols.map(col) :+
      explode(map(kvs: _*)).as(Seq(keyName, valueName)): _*)
  }
}
