package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{KeptDoc, StreamCurate}

/** One row of the curation firehose (top-level for the encoder). */
case class CurDoc(doc_id: Long, text: String, n_chars: Long)

/** The streaming curation demo: x21's quality predicate + st3's first-seen
  * dedup as ONE pipeline, proven batch ≡ stream on the documents fixture —
  * and the row-shaped quality verdict proven equal to x21's aggregate
  * form. */
class StreamCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-streamcurate").getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val stops = Seq("the", "a", "data", "row", "value")

  test("row-shaped quality verdict equals x21's aggregate form") {
    val docs = Tables.documents(spark, sf)
    val rowShaped = docs
      .filter(StreamCurate.qualityOk(col("text"), col("n_chars"), stops))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val aggShaped = SparkEntry.queries("x21_quality_filter")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rowShaped == aggShaped,
      s"row-shaped vs aggregate x21 differ: ${rowShaped.diff(aggShaped)} / ${aggShaped.diff(rowShaped)}")
    assert(rowShaped.nonEmpty && rowShaped.size < docs.count())
  }

  test("streaming curation emits exactly the batch-curated corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val originals = Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").as[CurDoc]
      .collect().sortBy(_.doc_id)
    // fixture has no exact dups — plant them across AND within batches
    val shifted = originals.map(d => d.copy(doc_id = d.doc_id + 100000L))
    val sameBatch = originals.take(10).map(d => d.copy(doc_id = d.doc_id + 200000L))

    val input = MemoryStream[CurDoc]
    val q = StreamCurate.curate(input.toDS().toDF(), stops)
      .writeStream.format("memory").queryName("curated")
      .outputMode("update").start()
    try {
      input.addData(originals.take(30) ++ sameBatch)
      q.processAllAvailable()
      input.addData(originals.drop(30) ++ shifted.take(200))
      q.processAllAvailable()
      input.addData(shifted.drop(200))
      q.processAllAvailable()

      val streamed = spark.table("curated").as[KeptDoc].collect()
      // one emission per digest, never a duplicate
      assert(streamed.map(_.digest).distinct.length == streamed.length)
      // originals always arrive no later than their planted twins → every
      // survivor is an original id
      assert(streamed.forall(_.doc_id < 100000L))

      // batch ≡ stream: the same curate() over the full union as a batch
      // frame (flatMapGroupsWithState degenerates to keep-min per digest)
      val union = (originals ++ shifted ++ sameBatch).toSeq
        .toDF("doc_id", "text", "n_chars")
      val batch = StreamCurate.curate(union, stops).collect()
        .map(k => k.digest -> k.doc_id).toMap
      assert(streamed.length == batch.size)
      streamed.foreach(k => assert(batch(k.digest) == k.doc_id))

      // and the survivors are exactly x21 ∘ first-seen on the original
      // corpus: quality-passing ids that own their digest
      val x21Ids = SparkEntry.queries("x21_quality_filter")(spark, sf)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed.map(_.doc_id).toSet == x21Ids,
        "no exact dups among originals → curation = the x21 survivor set")
    } finally q.stop()
  }
}
