package graft

/** Library-embedder lifecycle hooks.
  *
  * The query modules memoize expensive shared intermediates per
  * (SparkSession, sfDir) — the x11/x13 duplicate-cluster table, the shared
  * text-signal table, the prebuilt IVF index, and the two backtest folds.
  * That is the right lifetime for the bench/verify harness (entries die
  * with the session), but a long-running service embedding this library
  * would retain the persisted blocks and checkpoint RDDs forever. This
  * hook releases them explicitly; the next query that needs an
  * intermediate rebuilds it from the source tables (CacheLifecycleSpec
  * proves rebuild-after-clear returns identical results).
  */
object Graft {

  /** Unpersist and drop every memoized shared intermediate. Cached
    * blocks are released immediately; severed checkpoint RDDs fall to
    * the ContextCleaner once unreferenced. Safe to call at any point
    * between queries; concurrent in-flight queries keep their plans (a
    * Spark unpersist does not fail running jobs, it just recomputes). */
  def clearCaches(): Unit = {
    queries.TextQ.clearCache()
    queries.VectorQ.clearCache()
    queries.ExtQ.clearCache()
    queries.BacktestQ.clearCache()
    queries.ReplayQ.clearCache()
  }

  /** Prewarm-builder isolation: run one shared-artifact build, log-and-
    * continue on failure. A prewarm leg is a SEQUENCE of builders; an
    * exception in the first used to silently skip every later builder
    * in the leg, pushing whole artifact builds into timed bench queries
    * (and, when the failure is persistent, into EVERY sweep — the r12
    * driver-bench signature). Failures stay survivable (consumers build
    * lazily) but are now contained to one builder and always named. */
  /** DAG-parallel prewarm scheduler (r15): run `(name, deps, thunk)` build
    * tasks on a bounded pool, each task starting the moment its declared
    * dependencies complete. The r14 shape ran the five module legs on a
    * 3-thread pool with each leg SEQUENTIAL inside — the TextQ leg's 26
    * builders summed to ~425 s cold and were the whole prematerialize
    * wall (56% of the cold-store suite wall, r15 measurement). Tasks must
    * be declared in topological order (a dep named later is ignored);
    * failures stay isolated per-builder ([[warm]]) so dependents fall
    * back to their own lazy builds exactly as before. */
  private[graft] def warmAll(spark: org.apache.spark.sql.SparkSession,
                             tasks: Seq[(String, Seq[String], () => Unit)],
                             poolSize: Int): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.max(1, poolSize))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val done = scala.collection.mutable.Map.empty[String, Future[Unit]]
    tasks.foreach { case (name, deps, thunk) =>
      val depF = Future.sequence(deps.flatMap(done.get))
      done(name) = depF.map { _ =>
        // job group is thread-local — set it on every pool thread a task
        // lands on, clear after (the Bench attribution contract)
        spark.sparkContext.setJobGroup("prematerialize",
          "shared intermediates")
        try warm(name)(thunk())
        finally spark.sparkContext.clearJobGroup()
      }
    }
    done.values.foreach(Await.result(_, Duration.Inf))
    pool.shutdown()
  }

  /** Run independent build legs of ONE artifact concurrently (r15): used
    * by multi-sink fixture builders (e.g. the six-sink cascade ingest)
    * whose legs write disjoint directories — per-leg content is
    * deterministic, so concurrency changes wall, never bytes. The
    * caller thread's job group and scheduler pool are propagated to
    * each leg thread (both are thread-local) so bench attribution is
    * unchanged whether the builder runs under prewarm or lazily inside
    * a timed query. */
  private[graft] def parLegs(s: org.apache.spark.sql.SparkSession)
                            (legs: Seq[() => Unit]): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val grp = s.sparkContext.getLocalProperty("spark.jobGroup.id")
    val desc = s.sparkContext.getLocalProperty("spark.job.description")
    val pool = s.sparkContext.getLocalProperty("spark.scheduler.pool")
    implicit val ec: ExecutionContext = ExecutionContext.global
    legs.map(l => Future {
      if (grp != null) s.sparkContext.setJobGroup(grp,
        if (desc != null) desc else grp)
      if (pool != null)
        s.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
      try l()
      finally {
        s.sparkContext.clearJobGroup()
        s.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      }
    }).foreach(Await.result(_, Duration.Inf))
  }

  private[graft] def warm(name: String)(f: => Any): Unit = {
    val t0 = System.nanoTime()
    try { f; () } catch {
      case t: Throwable =>
        System.err.println(
          s"[prewarm] $name FAILED (its consumers will build lazily " +
            s"inside their own timing): $t")
    } finally {
      // per-builder wall on stderr: the prematerialize phase is >half the
      // cold-store suite wall (r15 measurement), so its hot spots must be
      // nameable without a profiler
      System.err.println(f"[prewarm] $name took " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
