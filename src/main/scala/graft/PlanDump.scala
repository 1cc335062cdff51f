package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture aid (not part of the driver contract):
  * `sbt "runMain graft.PlanDump <q1,q2,...> <outDir> [suffix] [sfDir]"`
  * writes each named SparkEntry query's `.explain("formatted")` output to
  * `<outDir>/<name>_<suffix>.txt` (suffix defaults to "before") — the
  * optimization-round evidence files under plans/r15/. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args.lift(2).getOrElse("before")
    val sf = args.lift(3).getOrElse("/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { nm =>
      val plan = SparkEntry.queries(nm)(spark, sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${nm}_$suffix.txt"), plan)
      println(s"[plandump] wrote ${nm}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
