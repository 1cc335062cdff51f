package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Similarity

/** Incremental semantic dedup — [[Similarity.incrementalSemanticDedup]],
  * the maintained-index member of the embedding dedup family (v30).
  *
  * Pins the policy (a batch doc survives iff NO in-block index vector and
  * no EARLIER in-block batch doc reaches the threshold), the m6 seniority
  * contract (committed docs dominate regardless of id — arrival time, not
  * id, orders across the index/batch boundary), the re-delivery no-op,
  * and the equivalence with a scratch [[Similarity.semanticDedup]] run
  * whenever ids agree with arrival order (index ids all smaller) — on the
  * real fixture, so the claim is proven on data, not toys.
  */
class IncrementalSemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-incsemdedup").getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val th = 0.3

  import scala.jdk.CollectionConverters._
  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("blk",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("vec",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))))
  private def df(rows: (Long, String, Seq[Double])*): DataFrame =
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)).asJava,
      schema)

  private val u = Seq(1.0, 0.0, 0.0)
  private val uNear = Seq(0.9, 0.1, 0.0) // cos(u, uNear) ≈ 0.994
  private val w = Seq(0.0, 0.0, 1.0)     // orthogonal to u

  private def run(index: DataFrame, batch: DataFrame): Set[Long] =
    Similarity.incrementalSemanticDedup(index, batch, "id", "vec", "blk", th)
      .select("id").collect().map(_.getLong(0)).toSet

  test("index dominator drops a batch doc; orthogonal and cross-block survive") {
    val index = df((10L, "A", u))
    val batch = df((20L, "A", uNear), (21L, "A", w), (22L, "B", u))
    // 20 is dominated by index doc 10 (same block, cos ≈ 0.994); 21 is
    // orthogonal; 22 matches u but in a block the index has no vector in
    assert(run(index, batch) === Set(21L, 22L))
  }

  test("earlier batch doc wins within the batch") {
    val index = df((10L, "B", u)) // no block-A vectors committed
    val batch = df((1L, "A", u), (2L, "A", uNear))
    assert(run(index, batch) === Set(1L))
  }

  test("committed docs dominate regardless of id (the m6 seniority contract)") {
    val index = df((100L, "A", u)) // larger id than the batch doc
    val batch = df((5L, "A", uNear))
    // arrival order, not id order: the committed vector arrived first
    assert(run(index, batch) === Set.empty[Long])
  }

  test("re-delivered ids are dropped up front, not re-appended") {
    val index = df((10L, "A", u))
    // 10 re-arrives byte-identical (at-least-once source); 30 is fresh
    val batch = df((10L, "A", u), (30L, "B", w))
    assert(run(index, batch) === Set(30L))
    // full re-delivery of an already-committed batch appends nothing
    assert(run(index, df((10L, "A", u))) === Set.empty[Long])
  }

  test("fixture: incremental ≡ scratch semanticDedup when ids agree with arrival order") {
    val corpus = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("vec"),
        col("label"))
    val cut = 250L // fixture ids are 0..n-1: index ids all below the cut
    val index = corpus.filter(col("vec_id") < cut)
      .select(col("vec_id").as("id"), col("label").as("blk"), col("vec"))
    val batch = corpus.filter(col("vec_id") >= cut)
      .select(col("vec_id").as("id"), col("label").as("blk"), col("vec"))
    val incremental = run(index, batch)
    // scratch: one semanticDedup over the union — with index ids all
    // smaller, "earlier" (smaller id) coincides with "committed first",
    // so the scratch survivors restricted to the batch must be identical
    val scratch = Similarity.semanticDedup(index.unionByName(batch),
        "id", "vec", "blk", th)
      .filter(col("id") >= cut)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(incremental === scratch)
    assert(incremental.nonEmpty, "vacuous fixture split")
  }
}
