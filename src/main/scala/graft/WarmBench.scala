package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc prematerialize-phase timer (not part of the driver contract):
  * `SPARK_GRAFT_ARTIFACT_DIR=<fresh dir> sbt "runMain graft.WarmBench
  * [sfDir] [poolSize]"` replays exactly the Bench prewarm phase — same
  * legs, same bounded pool, same job group — and prints the phase wall
  * plus per-builder walls (via [[Graft.warm]]'s stderr lines), so the
  * cold-store prematerialize cost (56% of the r15 cold suite wall) can be
  * iterated on in ~1/3 of a full bench run. */
object WarmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq(Tables.region _, Tables.nation _, Tables.customer _, Tables.supplier _,
      Tables.part _, Tables.orders _, Tables.lineitem _, Tables.events _,
      Tables.documents _, Tables.embeddings _)
      .foreach(load => try load(spark, sfDir).count() catch { case _: Throwable => () })

    val pre0 = System.nanoTime()
    val poolSize = args.lift(1).map(_.toInt).getOrElse(8)
    val preTasks: Seq[(String, Seq[String], () => Unit)] =
      Seq(("intradayFold", Seq.empty[String],
            () => graft.queries.BacktestQ.prewarm(spark, sfDir)),
          ("replayFold", Seq.empty[String],
            () => graft.queries.ReplayQ.prewarm(spark))) ++
        graft.queries.TextQ.prewarmTasks(spark, sfDir) ++
        graft.queries.VectorQ.prewarmTasks(spark, sfDir) ++
        graft.queries.ExtQ.prewarmTasks(spark, sfDir)
    graft.Graft.warmAll(spark, preTasks, poolSize)
    println(f"[warmbench] prematerialize wall: ${(System.nanoTime() - pre0) / 1e9}%.1f s (pool=$poolSize)")
    spark.stop()
  }
}
