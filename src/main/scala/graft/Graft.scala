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
  private[graft] def warm(name: String)(f: => Any): Unit =
    try { f; () } catch {
      case t: Throwable =>
        System.err.println(
          s"[prewarm] $name FAILED (its consumers will build lazily " +
            s"inside their own timing): $t")
    }
}
