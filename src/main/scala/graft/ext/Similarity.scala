package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`) — brute-force
  * cosine as the exact baseline, random-hyperplane LSH bucketing as the
  * scale path (BASELINE.json north star).
  *
  * All math is codegen'd higher-order array expressions in double
  * precision (no UDF, no ml.linalg conversion).
  *
  * Scale design: brute-force top-k is a broadcast of the (small) query set
  * against a full scan — O(n·q), embarrassingly parallel, no shuffle until
  * the final per-query top-k (tiny). The LSH variant buckets both sides by
  * signature so candidate generation is ONE equi-join on the bucket key —
  * the same shape that holds at 10⁹ vectors (signature length trades
  * recall for bucket size; AQE handles skewed buckets).
  */
object Similarity {

  /** Element-exact cast to double for stable arithmetic. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity; NULL on zero-norm / mismatched inputs.
    * Backed by the native [[graft.functions.CosineSim]] Catalyst
    * expression: one fused codegen'd pass computing dot + both norms
    * (the composable zip_with/aggregate form walks each array three times
    * and allocates the product array per row). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosine_sim(a, b)

  /** The composable-expression form of [[cosine]], kept as the reference
    * implementation (same accumulation order → bit-identical results;
    * asserted in CosineSimSpec). */
  def cosineComposed(a: Column, b: Column): Column = {
    val na = norm(a); val nb = norm(b)
    when(na === 0 || nb === 0, lit(null)).otherwise(dot(a, b) / (na * nb))
  }

  /** All-pairs cosine scores of a (small, broadcast) query set against the
    * corpus. `queries`/`corpus`: (idCol, vecCol) with array<double> vecs. */
  def bruteForceScores(queries: DataFrame, corpus: DataFrame,
                       qId: String, cId: String, vecCol: String): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(cId).as("c_id"), col(vecCol).as("c_vec"))
    c.crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("q_vec"), col("c_vec")))
      .select("q_id", "c_id", "cos")
  }

  /** Exact top-k neighbours per query (rank by cosine desc, id tiebreak). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, qId: String,
                     cId: String, vecCol: String, k: Int): DataFrame =
    bruteForceScores(queries, corpus, qId, cId, vecCol)
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))))
      .filter(col("rank") <= k)

  /** Random-hyperplane signature: `planes` sign-bits, plane components are
    * deterministic ±1 derived from xxhash64(plane, dim) — reproducible
    * across runs/executors with no stored model. */
  def lshSignature(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x * when(xxhash64(lit(p), j).bitwiseAND(lit(1L)) === 0L, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(s > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF (inverted-file) index structure: pick `nCells` deterministic seed
    * vectors as centroids (id-strided sample — at scale a k-means fit
    * would produce them; the assignment/probe machinery is identical),
    * assign every vector to its nearest centroid by cosine. Returns the
    * corpus with an `ivf_cell` column — the partition/bucket key that
    * co-locates a cell's vectors.
    *
    * Scale: assignment is a broadcast of nCells centroids against one
    * corpus scan (O(n·nCells) fused-kernel evaluations, no shuffle);
    * the cell id then acts like a partition key — a top-k query probes
    * only `nProbe` cells instead of the full corpus. */
  /** Centroid set: id-strided deterministic sample (no global sort — a
    * plain pushed-down filter; at scale a k-means fit replaces this, the
    * assignment/probe machinery below is unchanged). */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   nCells: Int): DataFrame =
    corpus.filter(col(idCol) < nCells)
      .select(col(idCol).cast("int").as("ivf_cell"), col(vecCol).as("c_vec"))

  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
                nCells: Int): DataFrame = {
    val centroids = ivfCentroids(corpus, idCol, vecCol, nCells)
    corpus.crossJoin(broadcast(centroids))
      .withColumn("__sim", cosine(col(vecCol), col("c_vec")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("ivf_cell"))))
      .filter(col("__rk") === 1)
      .select(corpus.columns.map(col) :+ col("ivf_cell"): _*)
  }

  /** IVF top-k: each query probes only the `nProbe` nearest cells; exact
    * cosine re-ranks inside the probed cells. The join on `ivf_cell`
    * replaces the corpus-wide scan per query. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
              vecCol: String, nCells: Int, nProbe: Int, k: Int): DataFrame = {
    val indexed = ivfAssign(corpus, cId, vecCol, nCells)
    val centroids = ivfCentroids(corpus, cId, vecCol, nCells)
    val probed = queries.select(col(qId).as("q_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("q_id").orderBy(
          cosine(col("q_vec"), col("c_vec")).desc, col("ivf_cell"))))
      .filter(col("__rk") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("ivf_cell"))
    probed.join(indexed.select(col(cId).as("c_id"), col(vecCol).as("c_vec2"),
        col("ivf_cell")), Seq("ivf_cell"))
      .withColumn("cos", cosine(col("q_vec"), col("c_vec2")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cos")
  }

  /** ANN via LSH: candidates share a signature bucket; exact cosine re-ranks
    * within the bucket. Trades recall for a join instead of a cross join. */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
              planes: Int, k: Int): DataFrame = {
    val signed = corpus
      .select(col(idCol), col(vecCol))
      .withColumn("sig", lshSignature(col(vecCol), planes))
    val l = signed.select(col(idCol).as("id1"), col(vecCol).as("v1"), col("sig"))
    val r = signed.select(col(idCol).as("id2"), col(vecCol).as("v2"), col("sig"))
    // id1 =!= id2 (not <): each vector must rank ALL of its bucket-mates,
    // otherwise the highest-id vector in a bucket gets no neighbors and
    // "rank" stops meaning per-vector top-k
    l.join(r, Seq("sig"))
      .filter(col("id1") =!= col("id2"))
      .withColumn("cos", cosine(col("v1"), col("v2")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("id1").orderBy(col("cos").desc, col("id2"))))
      .filter(col("rank") <= k)
      .select("id1", "id2", "cos", "rank")
  }
}
