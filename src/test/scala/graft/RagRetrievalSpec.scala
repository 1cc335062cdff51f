package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Similarity, TextOps}

/** The retrieval (RAG) read path: fitted TF-IDF vectorizer (fit on the
  * chunk corpus, applied to held-out queries), chunk index, probe. Pins
  * the fit/apply split's semantics (parity with the monolithic form on
  * the corpus, OOV tokens drop for unseen query text), verbatim-chunk
  * rank-1 retrieval, and the v19 driver query's shape + determinism. */
class RagRetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-rag").getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val Dim = 32

  test("fit-then-apply on the corpus == monolithic hashedTfIdf") {
    val docs = Tables.documents(spark, sf).limit(60)
    val mono = TextOps.hashedTfIdf(docs, "doc_id", "text", Dim).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val model = TextOps.tfIdfModel(docs, "doc_id", "text", Dim)
    val split = TextOps.applyTfIdf(docs, "doc_id", "text", model).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(split == mono)
  }

  test("OOV query tokens drop: all-unseen text embeds to no components") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "beta delta epsilon"))
      .toDF("doc_id", "text")
    val model = TextOps.tfIdfModel(corpus, "doc_id", "text", Dim)
    val queries = Seq((10L, "zz9 qq8 xx7"), (11L, "alpha zz9"))
      .toDF("doc_id", "text")
    val comps = TextOps.applyTfIdf(queries, "doc_id", "text", model)
      .collect().map(r => r.getLong(0)).toSet
    // query 10 is fully OOV → zero components; query 11 keeps `alpha`
    assert(comps == Set(11L))
  }

  test("a verbatim-chunk query retrieves its chunk at rank 1") {
    val docs = Tables.documents(spark, sf)
    val chunks = TextOps.chunkSliding(docs, "doc_id", "text", w = 12, s = 8)
      .select((col("doc_id") * 100000 + col("chunk_id")).as("chunk_key"),
        col("chunk"))
    val model = TextOps.tfIdfModel(chunks, "chunk_key", "chunk", Dim)
    val chunkVecs = TextOps.assembleVector(
      TextOps.applyTfIdf(chunks, "chunk_key", "chunk", model), "chunk_key", Dim)
    // the planted query IS one of the corpus chunks, asked as new text
    val planted = chunks.orderBy(col("chunk_key").desc)
      .filter(length(col("chunk")) >= 40).limit(1).collect()(0)
    import spark.implicits._
    val qVec = TextOps.assembleVector(
      TextOps.applyTfIdf(
        Seq((999999L, planted.getString(1))).toDF("doc_id", "text"),
        "doc_id", "text", model), "doc_id", Dim)
      .select(col("doc_id").as("q_id"), col("vec"))
    val idx = Similarity.buildIvfIndex(chunkVecs, "chunk_key", "vec",
      nCells = 16, nAssign = 2)
    // probe EVERY cell: isolates the vectorizer+retrieval semantics from
    // cell recall (which v7/v9 measure)
    val top = Similarity.probeIvf(idx, qVec, "q_id", nProbe = 16, k = 3)
      .orderBy("rank").collect()
    assert(top.nonEmpty)
    val rank1 = top.head
    // the retrieved rank-1 chunk must carry the query's exact text (the
    // planted chunk itself, or a verbatim duplicate of it)
    val rank1Text = chunks.filter(col("chunk_key") === rank1.getLong(2))
      .collect()(0).getString(1)
    assert(rank1Text == planted.getString(1),
      s"rank-1 chunk ${rank1.getLong(2)} text mismatch")
    assert(rank1.getDouble(3) > 0.999,
      s"verbatim chunk cosine ${rank1.getDouble(3)} not ~1")
  }

  test("v19 driver query: well-formed, deterministic") {
    def run() = SparkEntry.queries("v19_rag_retrieval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4)))
    val rows = run()
    assert(rows.nonEmpty)
    // ranks are 1..n per query; sources are real corpus docs (not the
    // held-out query set)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq, s"ranks for $q")
      assert(q % 97 == 3, s"query $q not from the held-out set")
      rs.foreach { r => assert(r._3 % 97 != 3, s"retrieved a held-out doc: $r") }
    }
    assert(rows.sameElements(run()), "v19 not deterministic")
  }
}
