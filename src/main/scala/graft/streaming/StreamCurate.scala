package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** Streaming corpus curation — "curate a firehose": the x21 composite
  * quality filter and the st3 first-seen exact dedup composed into one
  * pipeline that runs identically over a batch corpus and a
  * `readStream`/`MemoryStream` micro-batched one (the §2.10 batch≡stream
  * portability story, applied to the LLM-data ops).
  *
  * The quality verdict is the ROW-SHAPED form of x21's predicate: the
  * repetition signals come from per-row array expressions over the token
  * array instead of x21's explode + two groupBys — algebraically the same
  * numbers (StreamCurationSpec asserts set equality against the aggregate
  * form on the fixture), and stateless-per-row means the filter needs no
  * streaming aggregation state: the only state in the pipeline is the
  * dedup's one marker per distinct digest.
  *
  * Scale note: the row-shaped `maxn` is O(distinct·total) per document
  * versus the aggregate form's O(total) — right for a streaming filter
  * (documents are bounded, state-free beats a shuffled agg per
  * micro-batch), while the batch x21 keeps the partial-agg explode that
  * wins on a 100 TB scan.
  */
object StreamCurate {

  /** x21's keep/drop verdict as one per-row boolean column.
    * Signals: composite quality score ≥ 0.5, repeat_ratio ≤ 0.8,
    * top-token share ≤ 0.3, length floor n_chars ≥ 50. */
  def qualityOk(text: Column, nChars: Column, stops: Seq[String]): Column = {
    val toks = TextOps.tokens(text)
    val total = size(toks).cast("double")
    val nd = size(array_distinct(toks)).cast("double")
    val maxn = array_max(transform(array_distinct(toks),
      t => size(filter(toks, x => x === t)))).cast("double")
    TextOps.qualityScore(text, stops) >= 0.5 &&
      (lit(1.0) - nd / total) <= 0.8 &&
      (maxn / total) <= 0.3 && nChars >= 50
  }

  /** The curation pipeline over a (doc_id, text, n_chars) frame — batch
    * or streaming: quality-filter, digest, emit only each digest's first
    * arrival. On a streaming input this is the online curator (update
    * output mode, one state marker per distinct surviving digest); on a
    * batch input `flatMapGroupsWithState` degenerates to one stateless
    * group pass and the result is the batch keep-min form. */
  def curate(docs: DataFrame, stops: Seq[String]): Dataset[KeptDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    StreamDedup.streamKeepFirst(
      docs.filter(qualityOk(col("text"), col("n_chars"), stops))
        .select(col("doc_id"), md5(col("text")).as("digest"))
        .as[DocEvent])
  }
}
