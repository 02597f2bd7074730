package graft

import org.apache.spark.sql.functions._

/** Batch-equivalent checks for the streaming operators (SURVEY.md §2.9
  * T3/T4/T5): the same Streaming.* transform applied to the bounded events
  * table, oracle-checked in DuckDB (time_bucket for tumbling/sliding,
  * gaps-and-islands for session windows). Batch/stream parity itself is
  * asserted in StreamingSpec with MemoryStream.
  */
object StreamingQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // T3: 10-minute tumbling counts per event type.
    "q_stream_tumbling" -> ((s, dir) =>
      Streaming.tumblingCounts(Tables(s, dir, "events"), col("ts"),
                               "10 minutes")
        .orderBy("w_start", "event_type")),

    // T4: 10-minute windows sliding by 5 (every event lands in 2 windows).
    "q_stream_sliding" -> ((s, dir) =>
      Streaming.slidingCounts(Tables(s, dir, "events"), col("ts"),
                              "10 minutes", "5 minutes")
        .orderBy("w_start")),

    // T5: 30-minute-gap sessionization per user.
    "q_stream_session" -> ((s, dir) =>
      Streaming.sessionStats(Tables(s, dir, "events"), col("ts"),
                             "30 minutes")
        .orderBy("user_id", "s_start"))
  )

  val oracles: Map[String, String] = Map(
    "q_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
        |  event_type, count(*) AS n
        |FROM events GROUP BY w_start, event_type
        |ORDER BY w_start NULLS FIRST, event_type NULLS FIRST""".stripMargin,

    "q_stream_sliding" ->
      """SELECT w_start, count(*) AS n FROM (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) - to_minutes(s.k * 5)
        |           AS w_start, ts
        |  FROM events, (VALUES (0), (1)) s(k)) t
        |WHERE ts >= w_start AND ts < w_start + INTERVAL '10 minutes'
        |GROUP BY w_start ORDER BY w_start NULLS FIRST""".stripMargin,

    "q_stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), numbered AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS s_start, count(*) AS n,
        |  round(sum(value), 4) AS sum_value
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id NULLS FIRST, s_start NULLS FIRST""".stripMargin
  )
}
