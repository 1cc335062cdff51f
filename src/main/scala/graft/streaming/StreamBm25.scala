package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** STREAMING maintenance of the segmented BM25 index — the sparse-index
  * member of the streaming-ingest family (st3 exact dedup, st5 near-dup,
  * st4 curation): each micro-batch of arriving documents becomes one
  * immutable ON-DISK segment, exactly the storage lifecycle the
  * [[graft.ext.TextOps.Bm25Segments]] scaladoc describes ("segments are
  * parquet partitions keyed by seg_id; the append is a partition add").
  *
  * The sink body is [[appendBatch]] — the `foreachBatch` function of a
  * `writeStream` over the document firehose. Because segments are
  * df-FREE (df and corpus stats derive at query time, [[graft.ext
  * .TextOps.bm25SearchSegmented]]), the sink tokenizes ONLY its batch and
  * never reads, rewrites, or recounts existing postings: an append is
  * two parquet appends (postings partition + one metadata row). That is
  * what makes the op safe at firehose rates — ingest cost is bounded by
  * batch size, serve cost by the touched posting lists, and neither ever
  * scans the corpus.
  *
  * At-least-once sources re-deliver: the first-seen guard drops batch
  * docs whose key is already indexed (the bm25SegmentAppend guard; at
  * scale the membership probe is per-segment key-range/bloom metadata,
  * not the postings scan used at test scale). StreamBm25Spec proves a
  * 3-micro-batch MemoryStream ingest serves bit-equal to a from-scratch
  * [[graft.ext.TextOps.bm25Index]] over the union corpus, and that a
  * re-delivered batch appends nothing.
  */
object StreamBm25 {

  private def postingsDir(dir: String) = s"$dir/postings"
  private def statsDir(dir: String) = s"$dir/segstats"
  private def termDfDir(dir: String) = s"$dir/termdf"

  /** `foreachBatch` sink body: micro-batch `batchId` → one immutable
    * on-disk segment (postings partition `seg_id=<batchId>` + one
    * metadata row). Docs already indexed are dropped (first-seen,
    * re-delivery-safe). */
  def appendBatch(dir: String, batch: DataFrame, batchId: Long,
                  idCol: String, textCol: String): Unit = {
    val spark = batch.sparkSession
    val fresh = (load(spark, dir) match {
      case Some(segs) =>
        batch.join(segs.postings.select(col("key").as(idCol)).distinct(),
          Seq(idCol), "left_anti")
      case None => batch
    }).persist()
    try {
      // ONE materialized snapshot (persist + full count, not a
      // short-circuiting isEmpty) drives every write below: the
      // anti-join + tokenize run once, and a file-listing refresh
      // between writes can no longer feed the later writes a listing
      // that already contains this batch's own postings (ADVICE r7).
      // A FULLY re-delivered batch appends nothing — not even an empty
      // segment (an n_docs=0 metadata row would be harmless for the
      // stats sums but is noise the maintained index doesn't need).
      if (fresh.count() == 0) return
      val seg = TextOps.bm25SegmentOf(fresh, idCol, textCol, batchId.toInt)
      // partition-add, never a rewrite: each segment lands in its own
      // seg_id= directory; dynamic partition overwrite is not needed
      // because segment ids never repeat (re-delivery is key-guarded)
      seg.postings.write.mode("append").partitionBy("seg_id")
        .parquet(postingsDir(dir))
      // stats + dictionary derive FROM the just-written partition
      // (partition-pruned read-back): single tokenize per batch, and the
      // metadata is consistent with the on-disk postings by construction
      val written = spark.read.parquet(postingsDir(dir))
        .withColumn("seg_id", col("seg_id").cast("int"))
        .filter(col("seg_id") === batchId.toInt)
        .select("seg_id", "key", "tok", "tf", "dl")
      val (segStats, termDf) = TextOps.segMetaFromPostings(written)
      segStats.write.mode("append").parquet(statsDir(dir))
      termDf.write.mode("append").partitionBy("seg_id")
        .parquet(termDfDir(dir))
    } finally fresh.unpersist()
  }

  /** The maintained index as written so far; None before the first
    * batch. Serve with [[graft.ext.TextOps.bm25SearchSegmented]]. */
  def load(s: SparkSession, dir: String): Option[TextOps.Bm25Segments] = {
    val p = new org.apache.hadoop.fs.Path(postingsDir(dir))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(TextOps.Bm25Segments(
      // partition column seg_id comes back as its directory-inferred
      // type; normalize to the int the in-memory form carries
      postings = s.read.parquet(postingsDir(dir))
        .withColumn("seg_id", col("seg_id").cast("int"))
        .select("seg_id", "key", "tok", "tf", "dl"),
      segStats = s.read.parquet(statsDir(dir))
        .select("seg_id", "n_docs", "sum_dl"),
      termDf = s.read.parquet(termDfDir(dir))
        .withColumn("seg_id", col("seg_id").cast("int"))
        .select("seg_id", "tok", "df")))
  }
}
