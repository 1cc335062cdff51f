package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** ANN recall at scale (SCALING.md evidence, not driver contract): for
  * each ScaleStress multiplier's embeddings blow-up, compute exact
  * brute-force top-10 and the IVF-probe top-10 (same sqrt(n) cell sizing
  * as ScaleStress' v5/v6 ops) and report mean recall@10 — the quality
  * column next to the cost exponents. Requires a prior `graft.ScaleStress`
  * run to have written the scaled embeddings under /tmp/graft_scale.
  *
  *   sbt "runMain graft.RecallAtScale 1 8 64"
  */
object RecallAtScale {
  def main(args: Array[String]): Unit = {
    val mults = if (args.isEmpty) Seq(1, 8, 64) else args.map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    mults.foreach { m =>
      val c = spark.read.parquet(s"/tmp/graft_scale/m$m/embeddings.parquet")
      val queries = c.filter(col("vec_id") < 5)
      val corpus = c.filter(col("vec_id") >= 5)
      val cells = math.max(16, math.sqrt(c.count().toDouble).toInt)
      val exact = Similarity.bruteForceTopK(queries, corpus,
          "vec_id", "vec_id", "vec", k = 10)
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      // two probe policies: fixed nProbe (flat cost, decaying recall as the
      // probed fraction 4/nCells shrinks) vs a constant ~10% probed
      // fraction (recall-holding; probe cost still sub-linear because
      // per-cell occupancy is ~sqrt(n))
      Seq("fixed" -> 4, "frac10" -> math.max(4, cells / 10)).foreach {
        case (policy, nProbe) =>
          val t0 = System.nanoTime()
          val approx = Similarity.ivfTopK(queries, corpus, "vec_id", "vec_id",
              "vec", nCells = cells, nProbe = nProbe, k = 10)
            .select("q_id", "c_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val sec = (System.nanoTime() - t0) / 1e9
          val perQ = exact.groupBy(_._1).view
            .mapValues(hits => hits.count(approx.contains).toDouble / hits.length)
          val mean = perQ.values.sum / perQ.size
          println(f"[recall] m=$m%-3d nCells=$cells%-5d $policy%-7s nProbe=$nProbe%-4d " +
            f"mean recall@10 = $mean%.3f  ($sec%.2f s build+probe)")
      }
    }

    // ---- the CHUNK index (v19/v20's RAG serve path): nProbe/recall trade
    // at each multiplier, same fit-once artifacts as ScaleStress.builtRag —
    // the retrieval-quality column SCALING.md pairs with the cost exponents.
    import graft.ext.TextOps
    mults.foreach { m =>
      val docs = spark.read.parquet(s"/tmp/graft_scale/m$m/documents.parquet")
      val chunks = TextOps.chunkSliding(
          docs.filter(col("doc_id") % 97 =!= 3), "doc_id", "text", w = 12, s = 8)
        .select((col("doc_id") * 100000 + col("chunk_id")).as("chunk_key"),
          col("chunk"))
      val m0 = TextOps.tfIdfModel(chunks, "chunk_key", "chunk", dim = 32)
      val dfTab = m0.dfTab.persist(); dfTab.count()
      val corpusN = m0.corpusN.persist(); corpusN.count()
      val model = m0.copy(dfTab = dfTab, corpusN = corpusN)
      val chunkVecs = TextOps.assembleVector(
        TextOps.applyTfIdf(chunks, "chunk_key", "chunk", model),
        "chunk_key", 32).persist()
      val cells = math.max(16, math.sqrt(chunkVecs.count().toDouble).toInt)
      val idx = Similarity.buildIvfIndex(chunkVecs, "chunk_key", "vec",
        nCells = cells, nAssign = 2)
      val postings = idx.postings.persist(); postings.count()
      val pIdx = idx.copy(postings = postings)
      val qv = TextOps.assembleVector(
          TextOps.applyTfIdf(docs.filter(col("doc_id") % 97 === 3),
            "doc_id", "text", model), "doc_id", 32)
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .limit(64).persist()
      qv.count()
      val exact = Similarity.bruteForceTopK(qv, chunkVecs, "doc_id",
          "chunk_key", "vec", k = 5)
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      // empty held-out slice → 0/0 NaN in the mean; say so and move on
      if (exact.isEmpty) {
        println(s"[rag-recall] m=$m: exact ground truth EMPTY " +
          "(no held-out queries at this multiplier) — skipping sweeps")
      } else
      Seq(2, 4, 8, math.max(4, cells / 10)).distinct.foreach { nProbe =>
        val t0 = System.nanoTime()
        val approx = Similarity.probeIvf(pIdx, qv, "doc_id",
            nProbe = nProbe, k = 5)
          .select("q_id", "c_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val perQ = exact.groupBy(_._1).view
          .mapValues(hits => hits.count(approx.contains).toDouble / hits.length)
        val mean = perQ.values.sum / perQ.size
        println(f"[rag-recall] m=$m%-3d nCells=$cells%-5d nProbe=$nProbe%-4d " +
          f"(${100.0 * nProbe / cells}%.1f%% probed) mean recall@5 = $mean%.3f " +
          f"($sec%.2f s probe, 64 queries)")
      }
      dfTab.unpersist(); corpusN.unpersist(); chunkVecs.unpersist()
      pIdx.centroids.unpersist(); postings.unpersist(); qv.unpersist()
    }
    spark.stop()
  }
}
