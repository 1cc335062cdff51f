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
}
