package graft

import org.apache.spark.sql.SparkSession
import graft.backtest.{IntradayBacktest, IntradayPipeline}
import graft.queries.ReplayQ

/** Dev profiling harness: splits the golden-replay chain's cost between
  * the T5 feed pipeline and the T4 engine fold so bench regressions are
  * attributable to a stage, not just a query. Not part of the driver
  * contract — run ad hoc via `sbt "runMain graft.ProfileReplay"`.
  */
object ProfileReplay {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val quotes = ReplayQ.intradayQuotes(spark)
    time("quotes (dim join)")(quotes.count())
    val qp = quotes.persist(); qp.count()

    val fx = spark.read.parquet(s"${ReplayQ.fixDir}/fx_5m.parquet")
    val ticks = IntradayPipeline.companyTicks(qp, Some(fx), ReplayQ.refBlocks(spark))
    time("feed pipeline (cold)")(ticks.count())
    time("feed pipeline (warm)")(ticks.count())
    val tp = ticks.persist(); tp.count()

    val ev = IntradayBacktest.run(tp, bal = 1000.0, minDeviation = 0.1,
      slPercent = 0.03, triggerRange = 0.01, tradeSize = 0.1,
      tradeSizePercent = true)
    time("engine fold (cold)")(ev.count())
    time("engine fold (warm)")(ev.count())

    val full = IntradayBacktest.run(
      IntradayPipeline.companyTicks(qp, Some(fx), ReplayQ.refBlocks(spark)),
      bal = 1000.0, minDeviation = 0.1, slPercent = 0.03,
      triggerRange = 0.01, tradeSize = 0.1, tradeSizePercent = true)
    time("feed+fold unpersisted")(full.count())
    spark.stop()
  }
}
