package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Multimodal, Similarity}

/** Multimodal plumbing end-to-end: documents → opaque binary payloads →
  * partition-parallel stub decode → per-item feature vector → similarity
  * kernel. Exercises the full schema path (binary column, typed metadata,
  * mapPartitions batch stage, array<double> features) that a real
  * image/audio pipeline runs — only the codec inside StubDecoder is fake. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-multimodal").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("decode metadata is deterministic and matches payload arithmetic") {
    val docs = Tables.documents(spark, sf).limit(100)
    val meta = Multimodal.extractMeta(Multimodal.mediaTable(docs),
      Multimodal.StubDecoder).collect()
    assert(meta.length == 100)
    meta.foreach { m =>
      assert(m.width == (m.n_bytes % 1024).toInt)
      assert(m.height == ((m.n_bytes * 31) % 768).toInt)
      assert(m.digest.length == 32)
      assert(Set("image", "audio", "video").contains(m.kind))
    }
  }

  test("decode -> feature vector -> cosine similarity composes") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
    // feature extraction stage: metadata → a small deterministic vector
    // (stands in for a real image embedding; the pipeline shape is real)
    val feats = Multimodal.extractMeta(Multimodal.mediaTable(docs),
        Multimodal.StubDecoder)
      .map(m => (m.doc_id, Array(m.n_bytes.toDouble, m.width.toDouble,
        m.height.toDouble, m.n_frames.toDouble)))
      .toDF("doc_id", "vec")
    val q = feats.filter($"doc_id" < 2)
    val scored = Similarity.bruteForceTopK(q, feats.filter($"doc_id" >= 2),
      "doc_id", "doc_id", "vec", k = 3).collect()
    assert(scored.length == 6) // 2 queries × top-3
    scored.foreach { r =>
      val cos = r.getDouble(2)
      assert(cos > 0 && cos <= 1.0 + 1e-12)
    }
  }
}
