package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Multimodal
import graft.streaming.Sessionize

/** Multimodal plumbing + streaming-shaped operators (tumbling windows,
  * sessionization) in their batch forms (SURVEY.md §2.10; BASELINE.json
  * north star).
  */
object ExtQ {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // M1 — multimodal metadata extraction: opaque binary payload →
    // mapPartitions batch decode (stubbed codec, real plumbing).
    "m1_media_meta" -> ((s, d) =>
      Multimodal.extractMeta(
          Multimodal.mediaTable(Tables.documents(s, d)), Multimodal.StubDecoder)
        .toDF()
        .orderBy("doc_id")),

    // ST1 — event-time tumbling window aggregation (Structured Streaming's
    // window() primitive, batch-executed; epoch-aligned 6h windows).
    "st1_tumbling_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("total"))
        .select(col("window.start").as("wstart"), col("window.end").as("wend"),
          col("event_type"), col("n"), col("total"))
        .orderBy("wstart", "event_type")),

    // ST2 — gap-based sessionization, batch form (window algebra); the
    // same state kernel runs in flatMapGroupsWithState (StreamingSpec).
    "st2_sessionize" -> ((s, d) =>
      Sessionize.batchSessions(Tables.events(s, d), gapSec = 3600,
          orderCols = Seq("ts", "event_id"))
        .orderBy("user_id", "session_idx")),
  )

  val oracles: Map[String, String] = Map(
    "m1_media_meta" ->
      """SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           CAST(octet_length(encode(text)) % 1024 AS INTEGER) AS width,
           CAST((octet_length(encode(text)) * 31) % 768 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) % 16 AS INTEGER) AS n_frames
         FROM documents ORDER BY doc_id""",
    "st1_tumbling_window" ->
      """SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 21600000000) AS wstart,
           make_timestamp(epoch_us(ts) - epoch_us(ts) % 21600000000 + 21600000000) AS wend,
           event_type, count(*) AS n, round(sum(value), 6) AS total
         FROM events GROUP BY 1, 2, 3 ORDER BY wstart, event_type""",
    "st2_sessionize" ->
      """WITH g AS (
           SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000 THEN 1
                  ELSE 0 END AS new_s
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, ts, value,
             CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
           FROM g)
         SELECT user_id, session_idx, min(ts) AS start_ts, max(ts) AS end_ts,
           count(*) AS n_events, round(sum(value), 6) AS total_value
         FROM s GROUP BY user_id, session_idx
         ORDER BY user_id, session_idx""",
  )
}
