package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k-per-key as an AGGREGATE instead of a rank window.
  *
  * The window form (`row_number().over(partitionBy(key).orderBy(...))
  * <= k`) shuffles EVERY candidate row to its key's reducer and sorts
  * the whole partition before discarding all but k rows. As an
  * `Aggregator`, Spark's partial aggregation does the discarding
  * map-side: each mapper keeps a bounded k-entry buffer per key (one
  * ordered insert per row, O(k) with k ≤ tens), so the shuffle carries
  * at most k entries per (mapper, key) and the reducer merges tiny
  * buffers — no sort, no full-candidate shuffle. At brute-force scale
  * (n candidates per query) the shuffle volume drops from n rows to
  * ~k · mappers rows per query.
  *
  * ORDER CONTRACT: exactly the rank windows' `(score desc, id asc)` —
  * same comparator, same double equality, so the kept set and its
  * ranks are bit-identical to the window form on non-NaN scores
  * (TopKAggSpec proves equality on ties and at partition boundaries;
  * the serve kernels gate parity in their own specs). The ONE
  * deliberate deviation: NaN scores rank LAST (id tiebreak among
  * themselves) — Spark's desc sort would put NaN first, letting a
  * degenerate score displace every real candidate; here a NaN can
  * never evict a real entry. No engine path produces NaN scores
  * (cosine yields NULL on zero norms), so parity holds everywhere the
  * oracle looks.
  *
  * Scala `Aggregator` → `udaf()` runs as an ObjectHashAggregate —
  * outside whole-stage codegen, but the per-row work is one comparator
  * probe against the buffer head (the common case: row worse than the
  * current k-th → O(1) reject), which measurement shows is dominated
  * by the shuffle savings (SCALING.md r8).
  */
object TopKAgg {

  /** One scored candidate: `rs` is the rank key, `carry` the emitted
    * payload (identical to `rs` in the plain form; the BM25 serves rank
    * on round(score, n) while emitting the raw score). */
  case class Entry(rs: Double, id: Long, carry: Double)

  /** THE aggregator — buffer kept ORDERED best-first under
    * (rs desc, id asc, NaN last), length ≤ k; merge is a bounded
    * ordered merge, finish the identity. Every public entry point
    * below routes through this one class: there is exactly one copy of
    * the comparator and the insert path. */
  class TopK(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    require(k > 0, s"k must be positive, got $k")

    private def better(a: Entry, b: Entry): Boolean =
      if (a.rs.isNaN) b.rs.isNaN && a.id < b.id
      else if (b.rs.isNaN) true
      else a.rs > b.rs || (a.rs == b.rs && a.id < b.id)

    private def insert(b: Seq[Entry], a: Entry): Seq[Entry] =
      if (b.lengthCompare(k) >= 0 && better(b.last, a)) b // O(1) reject
      else {
        val (keep, rest) = b.span(better(_, a))
        val nb = keep ++ (a +: rest)
        if (nb.lengthCompare(k) > 0) nb.take(k) else nb
      }

    override def zero: Seq[Entry] = Nil
    override def reduce(b: Seq[Entry], a: Entry): Seq[Entry] = insert(b, a)
    override def merge(b1: Seq[Entry], b2: Seq[Entry]): Seq[Entry] =
      b2.foldLeft(b1)(insert)
    override def finish(r: Seq[Entry]): Seq[Entry] = r
    override def bufferEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] = bufferEncoder
  }

  /** The full window-replacement: top-k rows per `keyCol` ranked by
    * (`scoreCol` desc, `idCol` asc) — output columns (key, rank, id,
    * score), bit-identical to the row_number window form. */
  def topKByKey(df: org.apache.spark.sql.DataFrame, keyCol: String,
                scoreCol: String, idCol: String, k: Int)
      : org.apache.spark.sql.DataFrame =
    topKByKeysOn(df, Seq(keyCol), col(scoreCol), idCol, scoreCol, k)

  /** [[topKByKey]] with a COMPOSITE key — for rank windows whose output
    * carries columns functionally dependent on the partition key (a
    * query's filter value, a vector's block id): grouping by all of
    * them is the same partition with the dependents riding along. */
  def topKByKeys(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
                 scoreCol: String, idCol: String, k: Int)
      : org.apache.spark.sql.DataFrame =
    topKByKeysOn(df, keyCols, col(scoreCol), idCol, scoreCol, k)

  /** Top-k per key ranked by (`rankOn` desc, `idCol` asc), carrying
    * `carryCol` through — output (key, rank, id, carry), bit-identical
    * to `row_number().over(partitionBy(key).orderBy(rankOn desc, id))`
    * with the carry column selected alongside. Rank ascending by
    * negating `rankOn` (exact for the integral/md5 scores that use it). */
  def topKByKeyOn(df: org.apache.spark.sql.DataFrame, keyCol: String,
                  rankOn: Column, idCol: String, carryCol: String, k: Int)
      : org.apache.spark.sql.DataFrame =
    topKByKeysOn(df, Seq(keyCol), rankOn, idCol, carryCol, k)

  /** The general form all others delegate to.
    *
    * NULL handling: `Entry`'s fields are primitive `Double`s, so a NULL
    * rank/carry input (cosine yields NULL on a zero-norm vector) must
    * never reach the encoder — it would either fail decoding or decode
    * to 0.0 and outrank real negative-score candidates. Both are
    * coalesced to NaN on the way in: NaN ranks LAST by the aggregator's
    * comparator, which is exactly the window form's `desc` ordering
    * (desc_nulls_last, id-asc tiebreak among the NULLs). On the way out
    * a NaN carry is restored to NULL — no engine path produces a
    * genuine NaN score (see ORDER CONTRACT above), so NaN-in-buffer
    * means NULL-in-input and window parity holds bit-for-bit. */
  def topKByKeysOn(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
                   rankOn: Column, idCol: String, carryCol: String, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val agg = udaf(new TopK(k), Encoders.product[Entry])
    val nanD = lit(Double.NaN)
    df.groupBy(keyCols.map(col): _*)
      .agg(agg(coalesce(rankOn.cast("double"), nanD), col(idCol),
        coalesce(col(carryCol).cast("double"), nanD)).as("__top"))
      .select(keyCols.map(col) :+
        posexplode(col("__top")).as(Seq("__i", "__e")): _*)
      .select(keyCols.map(col) ++ Seq(
        (col("__i") + 1).cast("int").as("rank"),
        col("__e.id").as(idCol),
        when(isnan(col("__e.carry")), lit(null).cast("double"))
          .otherwise(col("__e.carry")).as(carryCol)): _*)
  }
}
