package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc measurement behind [[graft.streaming.StreamClusters
  * .needsCompaction]]'s defaults (not part of the driver contract):
  * serve cost of the st10 members⋈overlay read as a function of overlay
  * SHARE (overlay rows / member rows) in the broadcast regime, plus the
  * same join with broadcasting disabled — the shape every serve takes
  * once the overlay outgrows the autoBroadcast threshold at 10⁹+
  * members. `sbt "runMain graft.OverlayBench [nMembers]"`; results in
  * SCALING.md r10. */
object OverlayBench {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // members: n rows, one 2-row component per even id (roots = even
    // ids), written to parquet so the serve pays a real scan
    val dir = java.nio.file.Files.createTempDirectory("overlaybench")
    val mPath = s"$dir/members"
    spark.range(n)
      .select(col("id"), (col("id") - pmod(col("id"), lit(2L))).as("cluster_id"))
      .write.mode("overwrite").parquet(mPath)
    val members = spark.read.parquet(mPath)

    // the exact serve-join shape of StreamClusters.loadAt
    def served(ov: DataFrame): DataFrame = members
      .join(ov.select(col("old_root").as("cluster_id"),
        col("new_root").as("__nr")), Seq("cluster_id"), "left")
      .select(col("id"),
        coalesce(col("__nr"), col("cluster_id")).as("cluster_id"))

    def time5(df: DataFrame): Double = {
      val walls = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      walls(2)
    }

    def overlayOf(share: Double): DataFrame = {
      val k = math.max(1L, (n * share).toLong)
      // k merged-away roots: even ids hashed into the merge set, each
      // relabeled to root 0 (one-step-resolved, like the sink writes)
      spark.range(k)
        .select((col("id") * 2L).as("old_root"), lit(0L).as("new_root"))
    }

    val bare = time5(members)
    println(f"[overlaybench] n=$n bare members scan: $bare%.3f s")
    Seq(0.001, 0.01, 0.05, 0.25, 1.0).foreach { share =>
      val t = time5(served(overlayOf(share)))
      println(f"[overlaybench] share=$share%6.3f broadcast-serve: $t%.3f s (${t / bare}%.2fx bare)")
    }
    // the post-broadcast-knee shape: same join, broadcast disabled — what
    // EVERY serve pays once the overlay can't broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    Seq(0.01, 0.25).foreach { share =>
      val t = time5(served(overlayOf(share)))
      println(f"[overlaybench] share=$share%6.3f SHUFFLE-serve:   $t%.3f s (${t / bare}%.2fx bare)")
    }
    spark.stop()
  }
}
