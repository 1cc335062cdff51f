package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class DocEvent(doc_id: Long, digest: String)
case class KeptDoc(doc_id: Long, digest: String)

/** A doc event with an event time, for the horizon-bounded dedup. */
case class TimedDocEvent(doc_id: Long, digest: String, ts: java.sql.Timestamp)

/** Streaming exact dedup — "emit a document only the first time its
  * content digest is seen" — the online form of [[graft.ext.Dedup
  * .exactGroups]]' keep-min pass, for ingest pipelines that must filter
  * duplicates before they land.
  *
  * Same kernel, both execution modes (the §2.10 portability story):
  *  - batch: keep the first arrival per digest (min doc_id — batch has
  *    no arrival order, id is the deterministic stand-in).
  *  - streaming: `mapGroupsWithState` keyed by digest; state is one
  *    boolean-shaped marker per seen digest. First event in a micro-batch
  *    group wins (min doc_id within the batch, matching the batch form);
  *    later batches hit the state and emit nothing.
  *
  * State-size note for 100 TB ingest: one entry per DISTINCT digest,
  * forever. Real deployments bound it by keying state on a rolling
  * dedup horizon (drop state older than N days via event-time timeout)
  * or by fronting with a bloom filter; the unbounded form here matches
  * the reference-shaped "global exact dedup" semantics.
  */
object StreamDedup {

  /** Batch form: canonical survivor per digest. */
  def batchKeepFirst(docs: DataFrame): DataFrame =
    docs.groupBy("digest").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "digest")

  /** Per-digest state transition: emit only if this digest is new. */
  def keepFn(digest: String, events: Iterator[DocEvent],
             state: GroupState[Boolean]): Iterator[KeptDoc] = {
    if (state.exists) Iterator.empty
    else {
      state.update(true)
      val first = events.minBy(_.doc_id)
      Iterator.single(KeptDoc(first.doc_id, digest))
    }
  }

  /** Streaming form over a digest-keyed doc stream. Update output mode;
    * emits each kept doc exactly once. */
  def streamKeepFirst(docs: Dataset[DocEvent]): Dataset[KeptDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.digest)
      .flatMapGroupsWithState[Boolean, KeptDoc](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(keepFn)
  }

  /** HORIZON-BOUNDED streaming dedup — the state-size fix the unbounded
    * form's scaladoc promises: a digest is remembered for `horizon` of
    * EVENT time since its last sighting, then evicted via
    * `EventTimeTimeout` when the watermark passes. Duplicates inside the
    * horizon are suppressed exactly like [[streamKeepFirst]]; a duplicate
    * arriving after its digest expired is re-emitted (the documented
    * rolling-horizon semantics — state is O(distinct digests per horizon),
    * not O(all digests ever), which is what makes 100 TB/day ingest
    * feasible). Each sighting EXTENDS the horizon (dedup-since-last-seen);
    * `delayThreshold` is the watermark lateness bound on `ts`. */
  def streamKeepFirstBounded(docs: Dataset[TimedDocEvent], horizon: java.time.Duration,
                             delayThreshold: String = "0 seconds"): Dataset[KeptDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = horizon.toMillis
    docs.withWatermark("ts", delayThreshold)
      .groupByKey(_.digest)
      .flatMapGroupsWithState[Boolean, KeptDoc](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (digest: String, events: Iterator[TimedDocEvent], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val evs = events.toSeq
            val expiry = evs.map(_.ts.getTime).max + ms
            val emit =
              if (state.exists) Iterator.empty[KeptDoc]
              else {
                state.update(true)
                val first = evs.minBy(_.doc_id)
                Iterator.single(KeptDoc(first.doc_id, digest))
              }
            // extend the horizon past this batch's latest sighting (must be
            // strictly above the current watermark; max() guards stragglers)
            state.setTimeoutTimestamp(
              math.max(expiry, state.getCurrentWatermarkMs() + 1))
            emit
          }
      }
  }

  /** Digest a raw documents frame into the stream's input shape. */
  def digested(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("digest"))
}
