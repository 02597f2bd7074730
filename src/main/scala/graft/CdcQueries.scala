package graft

import org.apache.spark.sql.functions._

/** ReplacingMergeTree upsert semantics (SURVEY.md §2.3, U1-U4) exercised on
  * the harness `events` table as a versioned change stream: entity key =
  * `user_id`, version = `ts`, arrival order = `event_id` — mirroring the
  * reference's `ORDER BY (user_id, updated_at)` + implicit
  * last-inserted-wins rule (`/root/reference/README.md:176-177`) with
  * `kafka_offset` as the deterministic tie-break (`README.md:229`).
  */
object CdcQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // U1/U3: latest state per entity ("FINAL"-style read).
    "q_upsert_latest" -> ((s, dir) =>
      Cdc.latest(Tables(s, dir, "events"), Seq("user_id"),
                 Seq(col("ts"), col("event_id")))
        .select("user_id", "ts", "event_id", "event_type", "value")
        .orderBy("user_id")),

    // U2: collapse duplicate (key, version) tuples, last arrival wins.
    "q_dedup_key" -> ((s, dir) =>
      Cdc.dedupVersions(Tables(s, dir, "events"), Seq("user_id"), Seq("ts"),
                        col("event_id"))
        .select("user_id", "ts", "event_id")
        .orderBy("user_id", "ts")),

    // U4: append-history stats (type-2 view of the change log).
    "q_history_count" -> ((s, dir) =>
      Cdc.historyStats(Tables(s, dir, "events"), "user_id", col("ts"))
        .orderBy("user_id"))
  )

  val oracles: Map[String, String] = Map(
    "q_upsert_latest" ->
      """SELECT user_id, ts, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_dedup_key" ->
      """SELECT user_id, ts, event_id FROM (
        |  SELECT user_id, ts, event_id, row_number() OVER (
        |    PARTITION BY user_id, ts ORDER BY event_id DESC NULLS LAST) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id NULLS FIRST, ts NULLS FIRST""".stripMargin,

    "q_history_count" ->
      """SELECT user_id, count(*) AS n_versions, min(ts) AS first_version,
        |       max(ts) AS last_version
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin
  )
}
