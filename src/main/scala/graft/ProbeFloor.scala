package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Similarity, TextOps}

/** Ad-hoc profiler for the probeIvf absolute floor (VERDICT r7 item 6 /
  * NOTES r7 item 4): the chunk-index probe at m≥8 scales moved ~10×
  * between measurement DAYS at identical shapes, flat-in-corpus both
  * times. This isolates the candidates the judge named — AQE partition
  * sizing of the probed-cells join on the persisted postings vs IO/page
  * cache — by re-running the IDENTICAL probe inside one JVM under:
  *   a) AQE on (the bench config),
  *   b) AQE on, partition coalescing off,
  *   c) AQE off entirely (static shuffle.partitions),
  * each N times, against BOTH a memory-persisted and a parquet-backed
  * postings table. Day-scale IO-cache variance can't reproduce inside
  * one process, but if AQE's runtime coalescing is the lever, (a) vs
  * (b)/(c) separates here; if all three agree, the variance is
  * environmental and the pinned-config note stands.
  *
  * Usage: sbt "runMain graft.ProbeFloor [m] [iters]"  (needs
  * /tmp/graft_scale/m<m>/documents.parquet from a ScaleStress run).
  */
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val m = args.lift(0).map(_.toInt).getOrElse(8)
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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
    val n = chunkVecs.count()
    val nCells = math.max(16, math.sqrt(n.toDouble).toInt)
    println(s"[probefloor] m=$m chunks=$n nCells=$nCells")
    val idx0 = Similarity.buildIvfIndex(chunkVecs, "chunk_key", "vec",
      nCells = nCells, nAssign = 2)
    val memPostings = idx0.postings.persist(); memPostings.count()
    // parquet-backed twin of the same postings (the ArtifactStore serve
    // shape): distinguishes block-cache scan vs file scan sensitivity
    val pqDir = s"/tmp/graft_scale/m$m/probe_postings.parquet"
    memPostings.write.mode("overwrite").parquet(pqDir)
    val cents = idx0.centroids // persisted inside buildIvfIndex

    val qv = TextOps.assembleVector(
        TextOps.applyTfIdf(docs.filter(col("doc_id") % 97 === 3),
          "doc_id", "text", model), "doc_id", 32)
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(64).persist()
    qv.count()

    val nP = Similarity.nProbeFor(nCells,
      Similarity.calibratedFraction(0.8, nCells))
    println(s"[probefloor] nProbe=$nP (calibrated 0.8)")

    def probeOnce(postings: DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = Similarity.probeIvf(
        Similarity.IvfIndex(cents, postings, "chunk_key", "vec"),
        qv, "doc_id", nProbe = nP, k = 5).count()
      ((System.nanoTime() - t0) / 1e9, c)
    }

    val configs = Seq(
      ("aqe_on            ", Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true")),
      ("aqe_no_coalesce   ", Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false")),
      ("aqe_off           ", Map("spark.sql.adaptive.enabled" -> "false")))
    for ((label, conf) <- configs) {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      for ((src, postings) <- Seq(
          ("mem", memPostings),
          ("parquet", spark.read.parquet(pqDir)))) {
        val runs = (1 to iters).map(_ => probeOnce(postings))
        val walls = runs.map(_._1)
        println(f"[probefloor] $label $src%-8s rows=${runs.head._2}%d " +
          f"walls=${walls.map(w => f"$w%.2f").mkString(",")} " +
          f"median=${walls.sorted.apply(iters / 2)}%.2f")
      }
    }
    spark.stop()
  }
}
