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
    spark.stop()
  }
}
