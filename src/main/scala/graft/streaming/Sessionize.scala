package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
case class Session(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
                   n_events: Long, total_value: Double)
case class SessionState(start: Long, end: Long, n: Long, total: Double)

/** Gap-based sessionization — the same per-key state kernel runs in batch
  * (window-sum session ids) and streaming (`flatMapGroupsWithState`),
  * proving the state logic is execution-mode agnostic (SURVEY.md §2.10,
  * §7.1 step 6).
  *
  * The reference's intraday simulator IS this pattern: keyed mutable state
  * over an event-time feed with a forced flush (16:29 market close ≙ the
  * session gap timeout).
  */
object Sessionize {

  /** Batch form: sessions split where the gap to the previous event
    * exceeds `gapSec`. Pure window algebra (lag → flag → running sum →
    * group), one shuffle by user — SQL-expressible, DuckDB-checkable.
    * `orderCols` breaks ts ties (pass `Seq("ts", "event_id")` for the
    * events fixture; the default works for any `(user_id, ts, value)`
    * frame, e.g. a `SessionEvent` Dataset). */
  def batchSessions(events: DataFrame, gapSec: Long,
                    orderCols: Seq[String] = Seq("ts")): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(orderCols.map(col): _*)
    events
      .withColumn("gap", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("new_s", when(col("gap").isNull || col("gap") > gapSec * 1000000L, 1)
        .otherwise(0))
      .withColumn("session_idx", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("total_value"))
  }

  /** Streaming form: one open session per key in `GroupState`; emit the
    * session when a new event arrives past the gap, or on event-time
    * timeout (the watermark passed the gap horizon — the "market close
    * flush" of the reference engine). */
  def flatMapFn(gapSec: Long)(
      userId: Long, events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[Session] = {
    val out = List.newBuilder[Session]
    if (state.hasTimedOut) {
      state.getOption.foreach { s =>
        out += Session(userId, new Timestamp(s.start / 1000), new Timestamp(s.end / 1000),
          s.n, s.total)
      }
      state.remove()
    } else {
      val sorted = events.toSeq.sortBy(e => e.ts.getTime)
      var cur = state.getOption
      sorted.foreach { e =>
        val tUs = e.ts.getTime * 1000
        cur match {
          case Some(s) if tUs - s.end <= gapSec * 1000000L =>
            cur = Some(SessionState(s.start, math.max(s.end, tUs), s.n + 1, s.total + e.value))
          case Some(s) =>
            out += Session(userId, new Timestamp(s.start / 1000), new Timestamp(s.end / 1000),
              s.n, s.total)
            cur = Some(SessionState(tUs, tUs, 1, e.value))
          case None =>
            cur = Some(SessionState(tUs, tUs, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end / 1000 + gapSec * 1000)
      }
    }
    out.result().iterator
  }

  /** Wire the state kernel into a streaming Dataset. */
  def streamSessions(events: Dataset[SessionEvent], gapSec: Long,
                     watermark: String = "1 minute"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        flatMapFn(gapSec))
  }
}
