package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{DocEvent, KeptDoc, StreamDedup}

/** Streaming exact dedup: a digest must be emitted exactly once no matter
  * how duplicates are spread across micro-batches, and the surviving set
  * must agree with the batch keep-first form. */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-streamdedup").getOrCreate()

  test("each digest emitted once across micro-batches; agrees with batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // fixture docs have no exact dups — plant them: every doc reappears
    // in a later batch under a shifted id (and one in the SAME batch)
    val originals = StreamDedup.digested(
        Tables.documents(spark, "/root/testdata/sf0.001").limit(60))
      .as[DocEvent].collect()
    val shifted = originals.map(d => DocEvent(d.doc_id + 100000L, d.digest))
    val sameBatchDup = originals.take(5).map(d => DocEvent(d.doc_id + 200000L, d.digest))

    val input = MemoryStream[DocEvent]
    val q = StreamDedup.streamKeepFirst(input.toDS())
      .writeStream.format("memory").queryName("kept")
      .outputMode("update").start()
    try {
      input.addData(originals.take(40) ++ sameBatchDup)
      q.processAllAvailable()
      input.addData(shifted ++ originals.drop(40)) // 40 dups + 20 new
      q.processAllAvailable()
      input.addData(shifted) // everything a dup
      q.processAllAvailable()

      val kept = spark.table("kept").as[KeptDoc].collect()
      // exactly one emission per distinct digest
      assert(kept.length == originals.map(_.digest).distinct.length)
      assert(kept.map(_.digest).distinct.length == kept.length)
      // first-arrival wins: originals all arrived before their shifted
      // twins, and same-batch dups resolve to the min id in the batch
      assert(kept.forall(_.doc_id < 100000L))

      // agreement with the batch form on the full union
      val all = (originals ++ shifted ++ sameBatchDup).toSeq.toDF("doc_id", "digest")
      val batch = StreamDedup.batchKeepFirst(all)
        .as[KeptDoc].collect().map(k => k.digest -> k.doc_id).toMap
      kept.foreach(k => assert(batch(k.digest) == k.doc_id))
    } finally q.stop()
  }
}
