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
  * ranks are bit-identical to the window form (TopKAggSpec proves
  * equality on ties and at partition boundaries; the serve kernels
  * gate parity in their own specs).
  *
  * Scala `Aggregator` → `udaf()` runs as an ObjectHashAggregate —
  * outside whole-stage codegen, but the per-row work is one comparator
  * probe against the buffer head (the common case: row worse than the
  * current k-th → O(1) reject), which measurement shows is dominated
  * by the shuffle savings (SCALING.md r8).
  */
object TopKAgg {

  /** One scored candidate. */
  case class Entry(score: Double, id: Long)

  /** Buffer kept ORDERED best-first under (score desc, id asc), length
    * ≤ k — merge is a bounded ordered merge, finish is the identity. */
  class TopK(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    require(k > 0, s"k must be positive, got $k")

    private def better(a: Entry, b: Entry): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

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

  /** `topk(k, score, id)` → array of the k best (score, id) structs,
    * best first. Explode with `posexplode` for (rank, id, score) rows —
    * [[topKByKey]] packages exactly that. */
  def topk(k: Int, score: Column, id: Column): Column = {
    val agg = udaf(new TopK(k), Encoders.product[Entry])
    agg(score, id)
  }

  /** The full window-replacement: top-k rows per `keyCol` ranked by
    * (`scoreCol` desc, `idCol` asc) — output columns (key, rank, id,
    * score), bit-identical to the row_number window form. */
  def topKByKey(df: org.apache.spark.sql.DataFrame, keyCol: String,
                scoreCol: String, idCol: String, k: Int)
      : org.apache.spark.sql.DataFrame =
    topKByKeys(df, Seq(keyCol), scoreCol, idCol, k)

  /** [[topKByKey]] with a COMPOSITE key — for rank windows whose output
    * carries columns functionally dependent on the partition key (a
    * query's filter value, a vector's block id): grouping by all of
    * them is the same partition with the dependents riding along. */
  def topKByKeys(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
                 scoreCol: String, idCol: String, k: Int)
      : org.apache.spark.sql.DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(topk(k, col(scoreCol), col(idCol)).as("__top"))
      .select(keyCols.map(col) :+
        posexplode(col("__top")).as(Seq("__i", "__e")): _*)
      .select(keyCols.map(col) ++ Seq(
        (col("__i") + 1).cast("int").as("rank"),
        col("__e.id").as(idCol), col("__e.score").as(scoreCol)): _*)

  /** One scored candidate with a carried payload (rank on `rs`, emit
    * `carry`) — the BM25 shape: serve ranks on round(score, n) for
    * cross-engine tie stability but emits the raw score. */
  case class Entry3(rs: Double, id: Long, carry: Double)

  /** [[TopK]] with a payload column that rides along without
    * participating in the order. */
  class TopKCarry(k: Int) extends Aggregator[Entry3, Seq[Entry3], Seq[Entry3]] {
    require(k > 0, s"k must be positive, got $k")
    private def better(a: Entry3, b: Entry3): Boolean =
      a.rs > b.rs || (a.rs == b.rs && a.id < b.id)
    private def insert(b: Seq[Entry3], a: Entry3): Seq[Entry3] =
      if (b.lengthCompare(k) >= 0 && better(b.last, a)) b
      else {
        val (keep, rest) = b.span(better(_, a))
        val nb = keep ++ (a +: rest)
        if (nb.lengthCompare(k) > 0) nb.take(k) else nb
      }
    override def zero: Seq[Entry3] = Nil
    override def reduce(b: Seq[Entry3], a: Entry3): Seq[Entry3] = insert(b, a)
    override def merge(b1: Seq[Entry3], b2: Seq[Entry3]): Seq[Entry3] =
      b2.foldLeft(b1)(insert)
    override def finish(r: Seq[Entry3]): Seq[Entry3] = r
    override def bufferEncoder: Encoder[Seq[Entry3]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry3]]()
    override def outputEncoder: Encoder[Seq[Entry3]] = bufferEncoder
  }

  /** Top-k per `keyCol` ranked by (`rankOn` desc, `idCol` asc), carrying
    * `carryCol` through — output (key, rank, id, carry), bit-identical
    * to `row_number().over(partitionBy(key).orderBy(rankOn desc, id))`
    * with the carry column selected alongside. */
  def topKByKeyOn(df: org.apache.spark.sql.DataFrame, keyCol: String,
                  rankOn: Column, idCol: String, carryCol: String, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val agg = udaf(new TopKCarry(k), Encoders.product[Entry3])
    df.groupBy(col(keyCol))
      .agg(agg(rankOn, col(idCol), col(carryCol)).as("__top"))
      .select(col(keyCol), posexplode(col("__top")).as(Seq("__i", "__e")))
      .select(col(keyCol), (col("__i") + 1).cast("int").as("rank"),
        col("__e.id").as(idCol), col("__e.carry").as(carryCol))
  }
}
