package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextOps}

/** Ad-hoc single-query timer (not part of the driver contract):
  * `sbt "runMain graft.TimeOne <query> [sfDir] [iters]"` — runs the named
  * SparkEntry query (or a local experiment variant) N times solo and
  * prints per-iteration walls. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.documents(spark, sf).count()

    // scan-shaped r3 form of x17 (re-tokenizes from parquet)
    val rawX17: (SparkSession, String) => DataFrame = (s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("toks", TextOps.tokens(col("text")))
        .select(col("doc_id"), TextOps.shingles(col("toks"), 3).as("sh"))
      Dedup.crossCorpusCandidates(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0),
          "doc_id", "sh", k = 32, bands = 16)
        .filter(col("est_jaccard") >= 0.25)
        .select(col("id_a"), col("id_b"),
          round(col("est_jaccard"), 6).as("est_jaccard"))
        .orderBy("id_a", "id_b")
    }
    // comma-separated names run sequentially in ONE JVM (solo per query
    // — the adjudication A/B shape; JVM/session warmup amortized)
    val names = name.split(",").map(_.trim).filter(_.nonEmpty)
    def fnOf(n: String) =
      if (n == "x17_raw") rawX17 else SparkEntry.queries(n)
    names.foreach { nm =>
      val fn = fnOf(nm)
      (0 until iters).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sf).queryExecution.toRdd.count()
        println(f"[timeone] $nm iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    // 4th arg "show": print the rows (literal-oracle authoring aid) —
    // for EVERY named query, not just the first (ADVICE r14).
    // collect(), not show(): executeTake on unions of tiny multi-split
    // Ranges can return empty while the full plan has rows.
    if (args.lift(3).contains("show")) names.foreach { nm =>
      val df = fnOf(nm)(spark, sf)
      println(df.columns.mkString(s"[show:$nm] ", " | ", ""))
      df.collect().take(200).foreach(r => println(s"[show:$nm] $r"))
    }
    spark.stop()
  }
}
