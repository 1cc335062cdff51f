package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Input row for sequence packing: one document with its token count. */
case class PackInput(group: String, doc_id: Long, n_tokens: Int)

/** One packed assignment: the document's bin within its group and the
  * bin's running fill after this document. */
case class PackedDoc(group: String, doc_id: Long, n_tokens: Int,
                     bin: Int, bin_fill: Int)

/** Sequence packing — the training-batch prep step: concatenate documents
  * into fixed token-budget sequences (bins) so batch construction wastes
  * no context window on padding.
  *
  * Algorithm: NEXT-FIT in doc-id order per group — a document opens a new
  * bin iff it doesn't fit in the current one. O(1) fold state, streaming
  * shape (the same policy an online packer applies to a firehose), fully
  * deterministic given ids. Oversized docs (> budget) get a bin of their
  * own — packing never drops or truncates; the caller decides whether to
  * split them upstream.
  *
  * Scale: `groupByKey(group).flatMapSortedGroups(doc_id)` — ONE shuffle
  * by group, per-group spillable sort, then a pure streamed fold: exactly
  * the T3/T4 backtest execution shape ([[graft.backtest.PairBacktest]]),
  * parallel across groups. Use a salted group key upstream if one group
  * dominates (a group only needs to fit a SORT, not memory). A
  * first-fit-DECREASING variant would pack ~10% tighter but needs the
  * whole group sorted by size and random-access bins — next-fit is the
  * scan-friendly scalable default.
  *
  * Not SQL-expressible (bin boundaries are a running recurrence on the
  * fold state) → rows-only in the driver gate; PackSpec pins hand traces
  * + invariants (each doc exactly once, fills ≤ budget except oversized
  * singletons, dense bin ids).
  */
object Pack {

  def packSequences(docs: DataFrame, groupCol: String, idCol: String,
                    tokCol: String, budget: Int): Dataset[PackedDoc] = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(groupCol).cast("string").as("group"),
        col(idCol).cast("long").as("doc_id"),
        col(tokCol).cast("int").as("n_tokens"))
      .as[PackInput]
      .groupByKey(_.group)
      .flatMapSortedGroups(col("doc_id")) { (g, it) =>
        var bin = -1 // first doc always opens bin 0
        var fill = budget + 1
        it.map { d =>
          if (fill + d.n_tokens > budget) { bin += 1; fill = 0 }
          fill += d.n_tokens
          PackedDoc(g, d.doc_id, d.n_tokens, bin, fill)
        }
      }
  }
}
