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
        .orderBy("user_id")),

    // U4b: SCD Type-2 validity intervals ([[Analytics.scd2]] — one
    // entity-partitioned window pass).
    "q_scd2" -> ((s, dir) =>
      Analytics.scd2(Tables(s, dir, "events"), "user_id", "ts",
                     Seq(col("event_id")))
        .select("user_id", "event_id", "event_type", "valid_from",
                "valid_to")
        .orderBy("user_id", "valid_from", "event_id")),

    // D: funnel analysis ([[Analytics.funnel]] — ClickHouse windowFunnel
    // analog): furthest step of view → click → purchase within 24 h of
    // the first view.
    "q_funnel" -> ((s, dir) =>
      Analytics.funnel(Tables(s, dir, "events"), "user_id", "event_type",
                       "ts", Seq("view", "click", "purchase"), "24 HOURS")
        .orderBy("user_id")),

    // D: sliding-window funnel ([[Analytics.funnelSliding]] — the FULL
    // ClickHouse windowFunnel semantics: a chain may start at ANY view,
    // not just the first one): furthest step of view → click → purchase
    // with every step strictly later than the previous and within 30 min
    // of its own chain's start. Each stage is one strict forward as-of
    // join — linear in events, never |starts| × |events|.
    "q_funnel_window" -> ((s, dir) =>
      Analytics.funnelSliding(Tables(s, dir, "events"), "user_id",
                              "event_type", "ts",
                              Seq("view", "click", "purchase"),
                              "30 MINUTES")
        .orderBy("user_id")),

    // D: windowFunnel 'strict_order' mode ([[Analytics.funnelStrictOrder]]):
    // a chain advances only when the expected step is the user's
    // IMMEDIATELY NEXT event — any intervening event kills that chain
    // (later view starts still restart it).
    "q_funnel_strict" -> ((s, dir) =>
      Analytics.funnelStrictOrder(Tables(s, dir, "events"), "user_id",
                                  "event_type", "ts", "event_id",
                                  Seq("view", "click", "purchase"),
                                  "30 MINUTES")
        .orderBy("user_id")),

    // D: windowFunnel 'strict_dedup' mode ([[Analytics.funnelStrictDedup]]):
    // a repeat of an already-matched step arriving before the next
    // expected step interrupts the chain — the dedup check folds into the
    // same strict forward as-of join (candidates = matched ∪ next types).
    "q_funnel_dedup" -> ((s, dir) =>
      Analytics.funnelStrictDedup(Tables(s, dir, "events"), "user_id",
                                  "event_type", "ts", "event_id",
                                  Seq("view", "click", "purchase"),
                                  "30 MINUTES")
        .orderBy("user_id")),

    // D: interval union length (ClickHouse intervalLengthSum analog) over
    // per-event activity intervals synthesized deterministically from
    // event_id (start = event time, length 60 s + up to 10 min): total
    // covered micros + merged-interval count per user, one
    // gaps-and-islands window pass ([[Analytics.intervalUnionLength]]).
    "q_interval_union" -> ((s, dir) =>
      Analytics.intervalUnionLength(
          Tables(s, dir, "events").select(
            col("user_id"),
            unix_micros(col("ts")).as("s_us"),
            (unix_micros(col("ts")) +
               (lit(60) + pmod(col("event_id"), lit(600))) * lit(1000000L))
              .as("e_us")),
          "user_id", "s_us", "e_us")
        .orderBy("user_id")),

    // D: max simultaneously-open intervals + the earliest instant that
    // maximum is reached (ClickHouse maxIntersections /
    // maxIntersectionsPosition): ±1 boundary sweep over the same
    // synthesized intervals ([[Analytics.maxConcurrentIntervals]]).
    "q_interval_overlap" -> ((s, dir) =>
      Analytics.maxConcurrentIntervals(
          Tables(s, dir, "events").select(
            col("user_id"),
            unix_micros(col("ts")).as("s_us"),
            (unix_micros(col("ts")) +
               (lit(60) + pmod(col("event_id"), lit(600))) * lit(1000000L))
              .as("e_us")),
          "user_id", "s_us", "e_us")
        .orderBy("user_id")),

    // D: LTTB downsampling to 12 visually-representative points per
    // series (ClickHouse largestTriangleThreeBuckets, parallel
    // bucket-anchor variant — [[Analytics.lttbDownsample]]). Inputs are
    // integerized (epoch seconds, value×10⁴) so every bucket sum is an
    // exact double and the selection hashes identically cross-engine.
    "q_lttb" -> ((s, dir) =>
      Analytics.lttbDownsample(
          Tables(s, dir, "events").select(
            col("user_id"),
            expr("unix_micros(ts) div 1000000").as("t_s"),
            round(col("value") * 10000, 0).cast("long").as("v_i")),
          "user_id", "t_s", "v_i", 12)
        .orderBy("user_id", "bucket")),

    // D: event-sequence predicate ([[Analytics.sequenceMatch]] —
    // ClickHouse sequenceMatch analog): did view → click → purchase
    // happen in strict order, any gaps, no window bound.
    "q_seq_match" -> ((s, dir) =>
      Analytics.sequenceMatch(Tables(s, dir, "events"), "user_id",
                              "event_type", "ts",
                              Seq("view", "click", "purchase"))
        .orderBy("user_id")),

    // D: time-conditioned sequence match ([[Analytics.sequenceMatchTime]]
    // — ClickHouse sequenceMatch with (?t<86400) gap conditions): did
    // signup → click → purchase happen with every consecutive gap under
    // a day — exists-subsequence semantics via the latest-feasible-
    // prefix DP (greedy earliest-first is incomplete under gap bounds),
    // one strict backward as-of join per step.
    "q_seq_match_time" -> ((s, dir) =>
      Analytics.sequenceMatchTime(Tables(s, dir, "events"), "user_id",
                                  "event_type", "ts",
                                  Seq("signup", "click", "purchase"),
                                  86400L)
        .orderBy("user_id")),

    // D: non-overlapping sequence occurrences ([[Analytics.sequenceCount]]
    // — ClickHouse sequenceCount analog): how many view → purchase
    // chains per user, greedy matching as one per-entity integer fold.
    "q_seq_count" -> ((s, dir) =>
      Analytics.sequenceCount(Tables(s, dir, "events"), "user_id",
                              "event_type", "ts", "event_id",
                              Seq("view", "purchase"))
        .orderBy("user_id")),

    // D: sequenceNextNode (ClickHouse, forward/head): after each user's
    // first view → next click chain, which event type comes immediately
    // next? Two strict forward as-of joins ([[Relational.asofJoinForward]]
    // — one union + one per-key window pass each, linear in events); the
    // candidate set is pre-reduced to one row per (user, instant) with a
    // min_by(event_id) tiebreak so the simultaneous-event pick is
    // deterministic. Users without a full chain keep a NULL next_type.
    "q_seq_next_node" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("user_id").as("u"), col("event_type").as("et"),
                col("ts"), col("event_id"))
      val s1 = e.filter(col("et") === "view")
        .groupBy("u").agg(min("ts").as("t1"))
      val clicks = e.filter(col("et") === "click")
        .select(col("u"), col("ts"), col("ts").as("tc"))
      val s2 = Relational.asofJoinForward(s1, clicks, "u", "t1", "ts",
                                          Seq("tc"), strict = true)
        .select(col("u"), col("asof_tc").as("t2"))
      val nxt = e.groupBy(col("u"), col("ts"))
        .agg(min_by(col("et"), col("event_id")).as("nt"))
      val s3 = Relational.asofJoinForward(s2, nxt, "u", "t2", "ts",
                                          Seq("nt"), strict = true)
        .select(col("u"), col("asof_nt").as("next_type"))
      e.select(col("u")).distinct()
        .join(s3, Seq("u"), "left")
        .select(col("u").as("user_id"), col("next_type"))
        .orderBy("user_id")
    }),

    // D: cohort retention ([[Analytics.retention]]) — users by signup day;
    // active exactly 1 and 7 days later.
    "q_retention" -> ((s, dir) =>
      Analytics.retention(Tables(s, dir, "events"), "user_id", "event_type",
                          "ts", "signup", Seq(1, 7))
        .orderBy("d0")),

    // D: time-series gap fill (ClickHouse ORDER BY ... WITH FILL analog):
    // one row per (entity, day) over each entity's active range, carrying
    // the latest value as of end-of-day. Day grid = sequence+explode;
    // fill = the single-shuffle as-of join ([[Relational.asofJoin]]) over
    // version-deduped events (unique ts per entity → deterministic pick).
    "q_ts_fill" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val dedup = Cdc.dedupVersions(e, Seq("user_id"), Seq("ts"),
                                    col("event_id"))
        .select("user_id", "ts", "value")
      val days = e.groupBy("user_id")
        .agg(date_trunc("day", min("ts")).as("d_min"),
             date_trunc("day", max("ts")).as("d_max"))
        .select(col("user_id"),
                explode(sequence(col("d_min"), col("d_max"),
                                 expr("INTERVAL 1 DAY"))).as("d"))
        .withColumn("eod", col("d") + expr("INTERVAL 1 DAY")
                             - expr("INTERVAL 1 MICROSECOND"))
      Relational.asofJoin(days, dedup, "user_id", "eod", "ts", Seq("value"))
        .select(col("user_id"), col("d"),
                col("asof_value").as("fill_value"))
        .orderBy("user_id", "d")
    }),

    // D: LINEAR-interpolation gap fill (ClickHouse WITH FILL …
    // INTERPOLATE analog) — q_ts_fill's carry becomes a time-weighted
    // blend of the surrounding observations at each end-of-day point;
    // edge days carry the nearest observation. One union + one
    // per-entity window pass, no join ([[Analytics.interpolateDaily]]).
    "q_ts_interpolate" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val dedup = Cdc.dedupVersions(e, Seq("user_id"), Seq("ts"),
                                    col("event_id"))
        .select("user_id", "ts", "value")
      Analytics.interpolateDaily(dedup, "user_id", "ts", "value")
        .select(col("user_id"), col("d"),
                round(col("interp_value"), 4).as("interp_value"))
        .orderBy("user_id", "d")
    }),

    // U5: CollapsingMergeTree-analog latest-state read ([[Cdc.collapse]]):
    // the stream carries sign = +1 state / -1 cancel (synthesized
    // deterministically from event_id here); one hash aggregate yields the
    // surviving latest row per entity plus its net sign.
    "q_cdc_collapse" -> ((s, dir) =>
      Cdc.collapse(
          Tables(s, dir, "events")
            .withColumn("sign", when(pmod(col("event_id"), lit(3)) === 0,
                                     lit(-1)).otherwise(lit(1))),
          Seq("user_id"), col("sign"),
          Seq("ts", "event_id"), Seq("event_type", "value"))
        .orderBy("user_id")),

    // U6: MergeTree TTL GROUP BY analog ([[Cdc.ttlRollup]]): lineitem
    // rows shipped before the as-of cutoff collapse to monthly rollups
    // per return flag; recent rows survive at full granularity.
    "q_ttl_rollup" -> ((s, dir) =>
      Cdc.ttlRollup(Tables(s, dir, "lineitem"), "l_shipdate",
                    lit("1998-09-01").cast("date"),
                    Seq("l_returnflag"),
                    date_trunc("month", col("l_shipdate")).cast("date"),
                    Seq("l_quantity"))
        .orderBy("l_returnflag", "l_shipdate", "n", "l_quantity")),

    // U6b: GraphiteMergeTree-style tiered retention
    // ([[Cdc.retentionRollup]]): raw precision within a year of the as-of
    // date, monthly within four, yearly beyond — one hash aggregate.
    "q_retention_tiers" -> ((s, dir) =>
      Cdc.retentionRollup(Tables(s, dir, "lineitem"), "l_shipdate",
          Seq("l_returnflag"), Seq("l_quantity"),
          Seq(lit("1998-01-01").cast("date") -> col("l_shipdate"),
              lit("1995-01-01").cast("date") ->
                date_trunc("month", col("l_shipdate")).cast("date")),
          date_trunc("year", col("l_shipdate")).cast("date"))
        .orderBy("l_returnflag", "l_shipdate", "n", "l_quantity")),

    // U5b: VersionedCollapsingMergeTree analog ([[Cdc.collapseVersioned]]):
    // cancels only pair up within the same (entity, version) tuple; the
    // surviving version rows are the readable history.
    "q_cdc_collapse_versioned" -> ((s, dir) =>
      Cdc.collapseVersioned(
          Tables(s, dir, "events")
            .withColumn("sign", when(pmod(col("event_id"), lit(3)) === 0,
                                     lit(-1)).otherwise(lit(1))),
          Seq("user_id"), Seq("ts"), col("sign"),
          Seq("event_id", "event_type", "value"))
        .orderBy("user_id", "ts"))
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
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_ts_fill" ->
      """WITH dedup AS (
        |  SELECT user_id, ts, value FROM (
        |    SELECT user_id, ts, value, row_number() OVER (
        |      PARTITION BY user_id, ts
        |      ORDER BY event_id DESC NULLS LAST) AS rn
        |    FROM events) t WHERE rn = 1),
        |bounds AS (
        |  SELECT user_id,
        |    CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS dmin,
        |    CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS dmax
        |  FROM events GROUP BY user_id),
        |days AS (
        |  SELECT user_id,
        |    unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS d
        |  FROM bounds)
        |SELECT days.user_id, d,
        |  (SELECT e.value FROM dedup e
        |   WHERE e.user_id = days.user_id AND e.ts < d + INTERVAL 1 DAY
        |   ORDER BY e.ts DESC LIMIT 1) AS fill_value
        |FROM days
        |ORDER BY user_id NULLS FIRST, d NULLS FIRST""".stripMargin,

    // Mirrors the Spark plan shape exactly (union + backward/forward
    // IGNORE NULLS window frames + the same lerp expression), so the
    // doubles agree bit-for-bit before the round.
    "q_ts_interpolate" ->
      """WITH dedup AS (
        |  SELECT user_id, ts, value FROM (
        |    SELECT user_id, ts, value, row_number() OVER (
        |      PARTITION BY user_id, ts
        |      ORDER BY event_id DESC NULLS LAST) AS rn
        |    FROM events) t WHERE rn = 1),
        |bounds AS (
        |  SELECT user_id,
        |    CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS dmin,
        |    CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS dmax
        |  FROM dedup GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |    unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS d
        |  FROM bounds),
        |uni AS (
        |  SELECT user_id, d,
        |    d + INTERVAL 1 DAY - INTERVAL 1 MICROSECOND AS t,
        |    1 AS isg, CAST(NULL AS DOUBLE) AS v
        |  FROM grid
        |  UNION ALL
        |  SELECT user_id, CAST(NULL AS TIMESTAMP) AS d, ts AS t,
        |    0 AS isg, value AS v
        |  FROM dedup),
        |w AS (
        |  SELECT *,
        |    last_value(v IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY t, isg
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY t, isg
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |    first_value(v IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY t, isg
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY t, isg
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        |  FROM uni)
        |SELECT user_id, d,
        |  round(CASE
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv) *
        |      ((epoch_us(t) - epoch_us(pt)) /
        |       CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
        |  END, 4) AS interp_value
        |FROM w WHERE isg = 1
        |ORDER BY user_id NULLS FIRST, d NULLS FIRST""".stripMargin,

    "q_scd2" ->
      """SELECT user_id, event_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id
        |                 ORDER BY ts, event_id) AS valid_to
        |FROM events
        |ORDER BY user_id NULLS FIRST, valid_from NULLS FIRST,
        |         event_id NULLS FIRST""".stripMargin,

    "q_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1b
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 24 HOUR
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s2.t1b + INTERVAL 24 HOUR
        |  GROUP BY e.user_id)
        |SELECT u.user_id,
        |  CAST(CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END +
        |       CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END +
        |       CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END
        |       AS BIGINT) AS funnel_level
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN s1 ON u.user_id = s1.user_id
        |LEFT JOIN s2 ON u.user_id = s2.user_id
        |LEFT JOIN s3 ON u.user_id = s3.user_id
        |ORDER BY u.user_id NULLS FIRST""".stripMargin,

    // Greedy earliest-next chaining per start (min-then-window-check,
    // mirroring the Spark stage exactly); a user's level is the deepest
    // stage any of their chains survives to.
    "q_funnel_window" ->
      """WITH e AS (SELECT user_id AS u, event_type AS et, ts FROM events),
        |s1 AS (SELECT u, ts AS t0, ts AS tp FROM e WHERE et = 'view'),
        |s2 AS (
        |  SELECT s1.u, s1.t0, min(e.ts) AS tp
        |  FROM s1 JOIN e ON e.u = s1.u AND e.et = 'click' AND e.ts > s1.tp
        |  GROUP BY s1.u, s1.t0
        |  HAVING min(e.ts) <= s1.t0 + INTERVAL 30 MINUTE),
        |s3 AS (
        |  SELECT s2.u, s2.t0, min(e.ts) AS tp
        |  FROM s2 JOIN e ON e.u = s2.u AND e.et = 'purchase'
        |    AND e.ts > s2.tp
        |  GROUP BY s2.u, s2.t0
        |  HAVING min(e.ts) <= s2.t0 + INTERVAL 30 MINUTE)
        |SELECT du.u AS user_id,
        |  CAST(CASE WHEN s1x.u IS NULL THEN 0 ELSE 1 END +
        |       CASE WHEN s2x.u IS NULL THEN 0 ELSE 1 END +
        |       CASE WHEN s3x.u IS NULL THEN 0 ELSE 1 END
        |       AS BIGINT) AS funnel_level
        |FROM (SELECT DISTINCT u FROM e) du
        |LEFT JOIN (SELECT DISTINCT u FROM s1) s1x ON du.u = s1x.u
        |LEFT JOIN (SELECT DISTINCT u FROM s2) s2x ON du.u = s2x.u
        |LEFT JOIN (SELECT DISTINCT u FROM s3) s3x ON du.u = s3x.u
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    // Per stage: the next instant after t_prev (min ts), its reduced
    // event type must equal the expected step, inside the window.
    "q_funnel_strict" ->
      """WITH e AS (SELECT user_id AS u, event_type AS et, ts, event_id
        |           FROM events),
        |nxt AS (SELECT u, ts, arg_min(et, event_id) AS nt
        |        FROM e GROUP BY u, ts),
        |s1 AS (SELECT u, ts AS t0, ts AS tp FROM e WHERE et = 'view'),
        |b2 AS (SELECT s1.u, s1.t0, min(n.ts) AS tnext
        |       FROM s1 JOIN nxt n ON n.u = s1.u AND n.ts > s1.tp
        |       GROUP BY s1.u, s1.t0),
        |s2 AS (SELECT b2.u, b2.t0, b2.tnext AS tp
        |       FROM b2 JOIN nxt n ON n.u = b2.u AND n.ts = b2.tnext
        |       WHERE n.nt = 'click'
        |         AND b2.tnext <= b2.t0 + INTERVAL 30 MINUTE),
        |b3 AS (SELECT s2.u, s2.t0, min(n.ts) AS tnext
        |       FROM s2 JOIN nxt n ON n.u = s2.u AND n.ts > s2.tp
        |       GROUP BY s2.u, s2.t0),
        |s3 AS (SELECT b3.u, b3.t0, b3.tnext AS tp
        |       FROM b3 JOIN nxt n ON n.u = b3.u AND n.ts = b3.tnext
        |       WHERE n.nt = 'purchase'
        |         AND b3.tnext <= b3.t0 + INTERVAL 30 MINUTE)
        |SELECT du.u AS user_id,
        |  CAST(CASE WHEN s1x.u IS NULL THEN 0 ELSE 1 END +
        |       CASE WHEN s2x.u IS NULL THEN 0 ELSE 1 END +
        |       CASE WHEN s3x.u IS NULL THEN 0 ELSE 1 END
        |       AS BIGINT) AS funnel_level
        |FROM (SELECT DISTINCT u FROM e) du
        |LEFT JOIN (SELECT DISTINCT u FROM s1) s1x ON du.u = s1x.u
        |LEFT JOIN (SELECT DISTINCT u FROM s2) s2x ON du.u = s2x.u
        |LEFT JOIN (SELECT DISTINCT u FROM s3) s3x ON du.u = s3x.u
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    // Per stage: the earliest following event among (matched ∪ next)
    // types must BE the expected next type (a repeat arriving first kills
    // the chain), inside the window; arg_min over the same relevant set
    // decides simultaneous events.
    "q_funnel_dedup" ->
      """WITH e AS (SELECT user_id AS u, event_type AS et, ts, event_id
        |           FROM events),
        |n2 AS (SELECT u, ts, arg_min(et, event_id) AS nt FROM e
        |       WHERE et IN ('view', 'click') GROUP BY u, ts),
        |n3 AS (SELECT u, ts, arg_min(et, event_id) AS nt FROM e
        |       WHERE et IN ('view', 'click', 'purchase') GROUP BY u, ts),
        |s1 AS (SELECT u, ts AS t0, ts AS tp FROM e WHERE et = 'view'),
        |b2 AS (SELECT s1.u, s1.t0, min(n.ts) AS tnext
        |       FROM s1 JOIN n2 n ON n.u = s1.u AND n.ts > s1.tp
        |       GROUP BY s1.u, s1.t0),
        |s2 AS (SELECT b2.u, b2.t0, b2.tnext AS tp
        |       FROM b2 JOIN n2 n ON n.u = b2.u AND n.ts = b2.tnext
        |       WHERE n.nt = 'click'
        |         AND b2.tnext <= b2.t0 + INTERVAL 30 MINUTE),
        |b3 AS (SELECT s2.u, s2.t0, min(n.ts) AS tnext
        |       FROM s2 JOIN n3 n ON n.u = s2.u AND n.ts > s2.tp
        |       GROUP BY s2.u, s2.t0),
        |s3 AS (SELECT b3.u, b3.t0, b3.tnext AS tp
        |       FROM b3 JOIN n3 n ON n.u = b3.u AND n.ts = b3.tnext
        |       WHERE n.nt = 'purchase'
        |         AND b3.tnext <= b3.t0 + INTERVAL 30 MINUTE)
        |SELECT du.u AS user_id,
        |  CAST(CASE WHEN s1x.u IS NULL THEN 0 ELSE 1 END +
        |       CASE WHEN s2x.u IS NULL THEN 0 ELSE 1 END +
        |       CASE WHEN s3x.u IS NULL THEN 0 ELSE 1 END
        |       AS BIGINT) AS funnel_level
        |FROM (SELECT DISTINCT u FROM e) du
        |LEFT JOIN (SELECT DISTINCT u FROM s1) s1x ON du.u = s1x.u
        |LEFT JOIN (SELECT DISTINCT u FROM s2) s2x ON du.u = s2x.u
        |LEFT JOIN (SELECT DISTINCT u FROM s3) s3x ON du.u = s3x.u
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + (60 + event_id % 600) * 1000000 AS e
        |  FROM events),
        |m AS (
        |  SELECT user_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                 AND 1 PRECEDING) AS pm
        |  FROM iv),
        |f AS (SELECT user_id, s, e,
        |        CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nw
        |      FROM m),
        |g AS (
        |  SELECT user_id, s, e,
        |    sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
        |                  ROWS BETWEEN UNBOUNDED PRECEDING
        |                  AND CURRENT ROW) AS isl
        |  FROM f),
        |i AS (SELECT user_id, isl, max(e) - min(s) AS len
        |      FROM g GROUP BY user_id, isl)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS union_len,
        |  CAST(count(*) AS BIGINT) AS n_islands
        |FROM i GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_interval_overlap" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + (60 + event_id % 600) * 1000000 AS e
        |  FROM events),
        |p AS (SELECT user_id, s AS t, 1 AS d FROM iv
        |      UNION ALL SELECT user_id, e AS t, -1 AS d FROM iv),
        |r AS (
        |  SELECT user_id, t,
        |    sum(d) OVER (PARTITION BY user_id ORDER BY t, d
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                 AND CURRENT ROW) AS run
        |  FROM p),
        |x AS (SELECT user_id, t, run,
        |        max(run) OVER (PARTITION BY user_id) AS mx FROM r)
        |SELECT user_id, CAST(max(mx) AS BIGINT) AS max_concurrent,
        |  CAST(min(t) AS BIGINT) AS at_t
        |FROM x WHERE run = mx
        |GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    // Mirrors lttbDownsample clause by clause; the row_number ORDER BY
    // is the lexicographic max_by selection key.
    "q_lttb" ->
      """WITH p AS (
        |  SELECT user_id AS k, epoch_us(ts) // 1000000 AS t,
        |    CAST(round(value * 10000, 0) AS BIGINT) AS v
        |  FROM events),
        |s AS (SELECT k, min(t) AS tmin, max(t) AS tmax FROM p GROUP BY k),
        |b AS (
        |  SELECT p.k, t, v, CAST(t - tmin AS DOUBLE) AS rt,
        |    least(11, CAST(floor(CAST((t - tmin) * 12 AS DOUBLE) /
        |      CAST(tmax - tmin + 1 AS DOUBLE)) AS INT)) AS bk
        |  FROM p JOIN s ON p.k = s.k),
        |g AS (SELECT k, bk, sum(rt) AS st, sum(CAST(v AS DOUBLE)) AS sv,
        |        CAST(count(*) AS DOUBLE) AS n
        |      FROM b GROUP BY k, bk),
        |nb AS (
        |  SELECT k, bk,
        |    lag(st) OVER w / lag(n) OVER w AS pt,
        |    lag(sv) OVER w / lag(n) OVER w AS pv,
        |    lead(st) OVER w / lead(n) OVER w AS nt,
        |    lead(sv) OVER w / lead(n) OVER w AS nv
        |  FROM g WINDOW w AS (PARTITION BY k ORDER BY bk)),
        |r AS (
        |  SELECT b.k, b.bk, b.t, b.v,
        |    row_number() OVER (PARTITION BY b.k, b.bk ORDER BY
        |      CASE WHEN pt IS NULL OR nt IS NULL THEN 0.0
        |           ELSE abs((pt - nt) * (CAST(b.v AS DOUBLE) - pv)
        |                    - (pt - b.rt) * (nv - pv)) END DESC,
        |      CASE WHEN nt IS NULL THEN b.rt ELSE -b.rt END DESC,
        |      CASE WHEN nt IS NULL THEN CAST(b.v AS DOUBLE)
        |           ELSE -CAST(b.v AS DOUBLE) END DESC) AS rn
        |  FROM b JOIN nb ON b.k = nb.k AND b.bk = nb.bk)
        |SELECT k AS user_id, CAST(bk AS BIGINT) AS bucket, t, v
        |FROM r WHERE rn = 1
        |ORDER BY user_id NULLS FIRST, bucket""".stripMargin,

    "q_seq_match" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
        |  GROUP BY e.user_id)
        |SELECT u.user_id, s3.user_id IS NOT NULL AS matched
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN s3 ON u.user_id = s3.user_id
        |ORDER BY u.user_id NULLS FIRST""".stripMargin,

    // The DP's "latest prior within gap" test is EXISTS-equivalent, so
    // the oracle states each feasible-end set as an EXISTS filter —
    // two independent formulations of the same reachability relation.
    "q_seq_match_time" ->
      """WITH e AS (
        |  SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t
        |  FROM events),
        |f1 AS (SELECT u, t FROM e WHERE et = 'signup'),
        |f2 AS (
        |  SELECT c.u, c.t FROM e c WHERE c.et = 'click' AND EXISTS (
        |    SELECT 1 FROM f1 p WHERE p.u = c.u AND p.t < c.t
        |      AND c.t - p.t < 86400000000)),
        |f3 AS (
        |  SELECT c.u, c.t FROM e c WHERE c.et = 'purchase' AND EXISTS (
        |    SELECT 1 FROM f2 p WHERE p.u = c.u AND p.t < c.t
        |      AND c.t - p.t < 86400000000))
        |SELECT d.u AS user_id, m.u IS NOT NULL AS matched
        |FROM (SELECT DISTINCT u FROM e) d
        |LEFT JOIN (SELECT DISTINCT u FROM f3) m ON d.u = m.u
        |ORDER BY d.u NULLS FIRST""".stripMargin,

    // Recursive-CTE automaton rather than a DuckDB list_reduce fold: this
    // harness's DuckDB (1.0.0) mis-evaluates list_reduce over grouped
    // lists of uneven lengths (verified: same list, scalar fold 27 vs
    // grouped fold 17), so the oracle walks the per-user event sequence
    // one position per recursion round instead.
    "q_seq_count" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn,
        |    CASE WHEN event_type = 'view' THEN 1
        |         WHEN event_type = 'purchase' THEN 2 ELSE 0 END AS s
        |  FROM events),
        |n AS (SELECT user_id AS u, max(rn) AS mx FROM ev GROUP BY user_id),
        |walk(user_id, rn, acc) AS (
        |  SELECT u, 0, 0 FROM n
        |  UNION ALL
        |  SELECT w.user_id, w.rn + 1,
        |    CASE WHEN e.s = (w.acc % 2) + 1 THEN w.acc + 1 ELSE w.acc END
        |  FROM walk w JOIN ev e ON e.user_id = w.user_id
        |                       AND e.rn = w.rn + 1)
        |SELECT w.user_id, CAST(acc // 2 AS BIGINT) AS n_matches
        |FROM walk w JOIN n ON w.user_id = n.u AND w.rn = n.mx
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    // min(ts > prev) replicates each strict forward as-of stage;
    // arg_min mirrors the min_by(event_id) simultaneous-event tiebreak.
    "q_seq_next_node" ->
      """WITH e AS (
        |  SELECT user_id AS u, event_type AS et, ts, event_id FROM events),
        |s1 AS (SELECT u, min(ts) AS t1 FROM e WHERE et = 'view'
        |       GROUP BY u),
        |s2 AS (
        |  SELECT s1.u, min(e.ts) AS t2
        |  FROM s1 JOIN e ON e.u = s1.u AND e.et = 'click'
        |    AND e.ts > s1.t1
        |  GROUP BY s1.u),
        |nxt AS (SELECT u, ts, arg_min(et, event_id) AS nt
        |        FROM e GROUP BY u, ts),
        |s3 AS (
        |  SELECT s2.u, arg_min(n.nt, n.ts) AS next_type
        |  FROM s2 JOIN nxt n ON n.u = s2.u AND n.ts > s2.t2
        |  GROUP BY s2.u)
        |SELECT du.u AS user_id, s3.next_type
        |FROM (SELECT DISTINCT u FROM e) du
        |LEFT JOIN s3 ON du.u = s3.u
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP)
        |    AS d0
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS d FROM events),
        |per_user AS (
        |  SELECT c.user_id, c.d0,
        |    max(CASE WHEN a.d = c.d0 + INTERVAL 1 DAY THEN 1 ELSE 0 END)
        |      AS r1,
        |    max(CASE WHEN a.d = c.d0 + INTERVAL 7 DAY THEN 1 ELSE 0 END)
        |      AS r7
        |  FROM cohort c JOIN activity a ON c.user_id = a.user_id
        |  GROUP BY c.user_id, c.d0)
        |SELECT d0, count(*) AS n_users,
        |  CAST(sum(r1) AS BIGINT) AS retained_d1,
        |  CAST(sum(r7) AS BIGINT) AS retained_d7
        |FROM per_user GROUP BY d0 ORDER BY d0 NULLS FIRST""".stripMargin,

    "q_ttl_rollup" ->
      """WITH live AS (
        |  SELECT l_returnflag, l_shipdate, CAST(1 AS BIGINT) AS n,
        |    CAST(l_quantity AS DOUBLE) AS l_quantity
        |  FROM lineitem WHERE l_shipdate >= DATE '1998-09-01'),
        |expired AS (
        |  SELECT l_returnflag,
        |    CAST(date_trunc('month', l_shipdate) AS DATE) AS l_shipdate,
        |    count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |      AS l_quantity
        |  FROM lineitem WHERE l_shipdate < DATE '1998-09-01'
        |  GROUP BY 1, 2)
        |SELECT * FROM (SELECT * FROM live UNION ALL SELECT * FROM expired)
        |ORDER BY l_returnflag NULLS FIRST, l_shipdate NULLS FIRST,
        |         n NULLS FIRST, l_quantity NULLS FIRST""".stripMargin,

    "q_retention_tiers" ->
      """SELECT l_returnflag,
        |  CASE WHEN l_shipdate >= DATE '1998-01-01' THEN l_shipdate
        |       WHEN l_shipdate >= DATE '1995-01-01'
        |         THEN CAST(date_trunc('month', l_shipdate) AS DATE)
        |       ELSE CAST(date_trunc('year', l_shipdate) AS DATE)
        |  END AS l_shipdate,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    AS l_quantity
        |FROM lineitem GROUP BY 1, 2
        |ORDER BY l_returnflag NULLS FIRST, l_shipdate NULLS FIRST,
        |         n NULLS FIRST, l_quantity NULLS FIRST""".stripMargin,

    "q_cdc_collapse" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    CASE WHEN event_id % 3 = 0 THEN -1 ELSE 1 END AS sign
        |  FROM events),
        |net AS (SELECT user_id, CAST(sum(sign) AS BIGINT) AS net
        |        FROM s GROUP BY user_id),
        |latest AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
        |  FROM s WHERE sign = 1)
        |SELECT l.user_id, l.ts, l.event_id, l.event_type, l.value, n.net
        |FROM latest l JOIN net n ON l.user_id = n.user_id
        |WHERE l.rn = 1 AND n.net > 0
        |ORDER BY l.user_id NULLS FIRST""".stripMargin,

    "q_cdc_collapse_versioned" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    CASE WHEN event_id % 3 = 0 THEN -1 ELSE 1 END AS sign
        |  FROM events),
        |net AS (SELECT user_id, ts, CAST(sum(sign) AS BIGINT) AS net
        |        FROM s GROUP BY user_id, ts),
        |latest AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC NULLS LAST) AS rn
        |  FROM s WHERE sign = 1)
        |SELECT l.user_id, l.ts, l.event_id, l.event_type, l.value, n.net
        |FROM latest l JOIN net n ON l.user_id = n.user_id AND l.ts = n.ts
        |WHERE l.rn = 1 AND n.net > 0
        |ORDER BY l.user_id NULLS FIRST, l.ts NULLS FIRST""".stripMargin
  )
}
