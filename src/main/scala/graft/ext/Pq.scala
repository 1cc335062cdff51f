package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011) — the compression half of the
  * IVF-PQ index every production-scale vector store runs: each vector is
  * split into `m` subvectors, each subvector is replaced by the id of its
  * nearest per-subspace centroid (L2), and queries score candidates with
  * an asymmetric-distance lookup table (ADC) instead of touching raw
  * floats. At 64 dims, m=8 subspaces × 16 centroids = 8 nibbles per
  * vector — 64× smaller than float64 postings; [[VectorQ]] v8's scalar
  * quantization is the 4× sibling, this is the index-grade one.
  *
  * Everything is DataFrame ops in the house broadcast-pack style
  * ([[Similarity.assignTo]]): codebooks train distributedly (hash-seeded
  * + Lloyd, ALL subspaces in one pass — subspace id is just a grouping
  * column), collapse into ONE array-of-structs row, broadcast, and both
  * encode and ADC scoring are per-row array arithmetic with NO exchange
  * of corpus rows. No UDFs; the argmin/lookup lambdas are higher-order
  * functions over the packed codebook.
  *
  * Determinism: seeding is pmod(xxhash64(id)) group-min (the
  * [[Similarity.ivfCentroids]] scheme), so codebooks, codes and recall
  * are reproducible run-over-run (PqSpec pins this).
  */
object Pq {

  /** (id, m, sub) — one row per subvector. `subDim` = dim / m. */
  private[graft] def subvectors(df: DataFrame, idCol: String, vecCol: String,
                                m: Int, subDim: Int): DataFrame =
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          i => slice(col(vecCol), i * subDim + 1, lit(subDim))))
      .as(Seq("m", "sub")))

  /** Squared L2 distance between two equal-length double arrays — pure
    * higher-order expression. */
  private[graft] def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** A trained codebook: one row per (m, cell) with its centroid. */
  case class Codebook(centroids: DataFrame, m: Int, k: Int, subDim: Int)

  /** Train per-subspace codebooks: hash-seeded (id-distribution
    * independent) + `iters` Lloyd steps, every subspace in the same
    * distributed pass — the subspace id `m` is just another grouping
    * column, so 8 codebooks cost the same number of jobs as one.
    *
    * Cell ids are RE-DENSIFIED to 0..kEff-1 per subspace before the
    * codebook is returned: a cell that is never hash-seeded, or that
    * empties during a Lloyd step, simply vanishes from the centroid
    * table, and [[adcTopK]]/[[ivfPqShortlist]] index the per-subspace
    * LUT row positionally (`element_at(row, code + 1)`) — a gap would
    * misalign every higher code's distance and an out-of-range probe
    * yields NULL, which sorts FIRST under the ascending rank window.
    * Dense ids make position == id by construction; on a corpus where
    * all k cells survive the renumbering is the identity, so results
    * are unchanged. PqSpec's dead-cell case pins the gap scenario. */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, subDim: Int, iters: Int = 2): Codebook = {
    val subs = subvectors(corpus, idCol, vecCol, m, subDim)
    val w = Window.partitionBy("m", "cell")
      .orderBy(xxhash64(col(idCol), lit(11)), col(idCol))
    val seeds = subs
      .withColumn("cell", pmod(xxhash64(col(idCol), col("m")), lit(k)).cast("int"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("m"), col("cell"), col("sub").as("c_vec"))
    val cents = (0 until iters).foldLeft(seeds) { (cb, _) =>
      assignCells(subs, cb, k)
        .select(col("m"), col("cell"), posexplode(col("sub")).as(Seq("pos", "x")))
        .groupBy("m", "cell", "pos").agg(avg("x").as("mu"))
        .groupBy("m", "cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
        .select(col("m"), col("cell"),
          transform(col("pm"), s => s.getField("mu")).as("c_vec"))
    }
    // Re-densify: surviving cells renumber to 0..kEff-1 per subspace so
    // positional LUT indexing is exact even when cells die (see scaladoc).
    val wDense = Window.partitionBy("m").orderBy("cell")
    val dense = cents
      .withColumn("cell", (row_number().over(wDense) - 1).cast("int"))
    Codebook(dense, m, k, subDim)
  }

  /** Nearest-centroid (L2) cell per (id, m) row: the whole codebook packs
    * into one broadcast row; the per-row argmin is a lambda over the
    * packed entries, masked to the row's own subspace — no exchange. */
  private def assignCells(subs: DataFrame, cents: DataFrame, k: Int): DataFrame = {
    val packed = cents
      .agg(collect_list(struct(col("m").as("pm"), col("cell"), col("c_vec")))
        .as("__cb"))
    subs.crossJoin(broadcast(packed))
      .withColumn("__pick",
        element_at(array_sort(transform(
          filter(col("__cb"), e => e.getField("pm") === col("m")),
          e => struct(l2sq(col("sub"), e.getField("c_vec")).as("d"),
            e.getField("cell").as("cell")))), 1))
      .withColumn("cell", col("__pick.cell"))
      .drop("__cb", "__pick")
  }

  /** PQ-encode the corpus: (id, codes array<int> of length m). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cb: Codebook): DataFrame =
    assignCells(subvectors(corpus, idCol, vecCol, cb.m, cb.subDim),
        cb.centroids, cb.k)
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("cell")))),
        s => s.getField("cell")).as("codes"))

  /** ADC top-k: each query builds its (m × k) distance lookup table
    * against the broadcast codebook, the LUT joins the (tiny) query side
    * onto the codes table, and each candidate's approximate distance is
    * one zip_with/element_at pass over its m codes — the scan never
    * touches raw corpus floats, which is the entire point of PQ at
    * 100 TB: the postings are nibbles, the floats stay cold. */
  def adcTopK(queries: DataFrame, codes: DataFrame, qId: String, cId: String,
              vecCol: String, cb: Codebook, topK: Int): DataFrame = {
    // LUT rows: (q_id, lut array<array<double>>: m rows × k cells)
    val lut = assignLut(queries, qId, vecCol, cb)
    codes.crossJoin(broadcast(lut))
      .withColumn("adist",
        aggregate(zip_with(col("codes"), col("lut"),
          (code, row) => element_at(row, code + 1)), lit(0.0), _ + _))
      // ascending ADC distance = descending on its negation (TopKAgg;
      // bounded-heap instead of shipping every scanned code row)
      .transform(df => graft.functions.TopKAgg.topKByKeyOn(df, "q_id",
        -col("adist"), cId, "adist", topK))
      .select(col("q_id"), col("rank"), col(cId).as("c_id"),
        round(col("adist"), 6).as("adist"))
  }

  private def assignLut(queries: DataFrame, qId: String, vecCol: String,
                        cb: Codebook): DataFrame = {
    val packed = cb.centroids
      .agg(collect_list(struct(col("m").as("pm"), col("cell"), col("c_vec")))
        .as("__cb"))
    queries.crossJoin(broadcast(packed))
      .select(col(qId).as("q_id"),
        transform(sequence(lit(0), lit(cb.m - 1)), mi =>
          transform(
            array_sort(
              filter(col("__cb"), e => e.getField("pm") === mi),
              (a, b) => when(a.getField("cell") < b.getField("cell"), -1)
                .when(a.getField("cell") > b.getField("cell"), 1).otherwise(0)),
            e => l2sq(slice(col(vecCol), mi * cb.subDim + 1, lit(cb.subDim)),
              e.getField("c_vec")))).as("lut"))
  }

  /** IVF-PQ candidate shortlist — the composed read path of a production
    * vector index: each query probes its `nProbe` nearest IVF cells
    * ([[Similarity.assignTo]], broadcast-packed), candidates are the
    * cell-replicated postings of those cells joined BY CELL (never the
    * whole corpus), and the candidates are scored from their PQ codes
    * via the query's ADC lookup table — the scan touches nibbles, not
    * floats. Callers exact-re-rank the returned shortlist against raw
    * vectors (only `shortlist` rows per query fetch floats).
    *
    * `codes` is [[encode]]'s output joined with the index postings'
    * cell column: (cId, ivf_cell, codes). */
  def ivfPqShortlist(index: Similarity.IvfIndex, cb: Codebook,
                     codes: DataFrame, queries: DataFrame, qId: String,
                     cId: String, vecCol: String, nProbe: Int,
                     shortlist: Int): DataFrame = {
    val probed = Similarity.assignTo(
      queries.select(col(qId).as("q_id"), col(vecCol).as("q_vec")),
      index.centroids, "q_id", "q_vec", nAssign = nProbe)
    val lut = assignLut(
      queries.select(col(qId).as("q_id"), col(vecCol)), "q_id", vecCol, cb)
    probed.select("q_id", "ivf_cell")
      .join(codes.select(col(cId).as("c_id"), col("ivf_cell"), col("codes")),
        Seq("ivf_cell"))
      .dropDuplicates("q_id", "c_id") // nAssign replication across cells
      .join(broadcast(lut), Seq("q_id"))
      .withColumn("adist",
        aggregate(zip_with(col("codes"), col("lut"),
          (code, row) => element_at(row, code + 1)), lit(0.0), _ + _))
      .transform(df => graft.functions.TopKAgg.topKByKeyOn(df, "q_id",
        -col("adist"), "c_id", "adist", shortlist))
      .select(col("q_id"), col("rank"), col("c_id"),
        round(col("adist"), 6).as("adist"))
  }

  /** Mean squared reconstruction error of the codebook over the corpus —
    * the compression-quality number (falls as k grows; PqSpec pins it). */
  def reconstructionError(corpus: DataFrame, idCol: String, vecCol: String,
                          cb: Codebook): Double =
    assignCells(subvectors(corpus, idCol, vecCol, cb.m, cb.subDim),
        cb.centroids, cb.k)
      .join(cb.centroids, Seq("m", "cell"))
      .agg(avg(l2sq(col("sub"), col("c_vec"))))
      .head().getDouble(0)
}
