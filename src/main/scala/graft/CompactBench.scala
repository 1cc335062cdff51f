package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamBm25

/** Ad-hoc measurement of [[StreamBm25.compact]]'s scale claim: folding
  * small segments is a partition rewrite of ONLY the folded segments —
  * never a corpus operation. Per multiplier the index holds two
  * CONSTANT-size small segments (ids 0, 1 — the fresh tails a firehose
  * accumulates) plus one big segment (id 2 — the m×-scaled corpus bulk,
  * the compacted history). compact(upTo = 1) folds only the two small
  * ones, so its wall must stay FLAT as the big segment grows 64×.
  *
  * Usage: sbt "runMain graft.CompactBench [mults...]" (needs
  * /tmp/graft_scale/m<m>/documents.parquet from a ScaleStress run).
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    val mults = if (args.isEmpty) Seq(1, 8, 64) else args.map(_.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (m <- mults) {
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
        .select("doc_id", "text")
      // two constant-size small segments from the m=1 id range (present
      // at every multiplier), the m×-scaled remainder as the big one
      val small0 = docs.filter(col("doc_id") % 97 === 5 &&
        col("doc_id") < 10000000L)
      val small1 = docs.filter(col("doc_id") % 97 === 11 &&
        col("doc_id") < 10000000L)
      val big = docs.join(small0.unionByName(small1).select("doc_id"),
        Seq("doc_id"), "left_anti")
      val dir = java.nio.file.Files.createTempDirectory(s"graft-cb-m$m-")
        .toString
      StreamBm25.appendBatch(dir, small0, 0, "doc_id", "text")
      StreamBm25.appendBatch(dir, small1, 1, "doc_id", "text")
      StreamBm25.appendBatch(dir, big, 2, "doc_id", "text")
      val before = StreamBm25.load(spark, dir).get
      val folded = before.postings.filter(col("seg_id") <= 1).count()
      val total = before.postings.count()
      val t0 = System.nanoTime()
      StreamBm25.compact(spark, dir, upTo = 1, into = -1)
      val sec = (System.nanoTime() - t0) / 1e9
      val after = StreamBm25.load(spark, dir).get
      println(f"[compactbench] m=$m%-3d folded_postings=$folded%d " +
        f"total_postings=$total%d compact_sec=$sec%.2f " +
        f"segments_after=${after.segStats.count()}%d")
    }
    spark.stop()
  }
}
