package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Similarity

class IvfSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-ivf").getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("every corpus vector lands in exactly one IVF cell") {
    val c = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("vec"))
    val assigned = Similarity.ivfAssign(c, "vec_id", "vec", nCells = 16)
    assert(assigned.count() == c.count())
    assert(assigned.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
    val cells = assigned.select("ivf_cell").distinct().count()
    assert(cells > 1 && cells <= 16)
  }

  test("IVF top-k is well-formed and overlaps brute-force top-k") {
    val q = SparkEntry.queries("v5_ivf_topk")(spark, sf).collect()
    // ranks are 1..n per query, cos non-increasing
    q.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toList == (1 to sorted.length).toList)
      sorted.map(_.getDouble(3)).sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _           =>
      }
    }
    // deterministic recall vs exact brute force (fixture is fixed):
    val exact = SparkEntry.queries("v2_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = q.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"IVF recall@10 too low: $recall (nProbe=4 of nCells=16)")
  }

  test("index survives a parquet round-trip: probe(read(write(build))) == direct") {
    val c = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("vec"))
    val corpus = c.filter(col("vec_id") >= 5)
    val queries = c.filter(col("vec_id") < 5)
    val idx = Similarity.buildIvfIndex(corpus, "vec_id", "vec", nCells = 16)
    val direct = Similarity.probeIvf(idx, queries, "vec_id", nProbe = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    // the real index lifecycle: write both frames, read them back, probe
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    idx.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    idx.postings.write.mode("overwrite").parquet(s"$dir/postings")
    val reloaded = Similarity.IvfIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/postings"), "vec_id", "vec")
    val viaDisk = Similarity.probeIvf(reloaded, queries, "vec_id", nProbe = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaDisk == direct)
  }
}
