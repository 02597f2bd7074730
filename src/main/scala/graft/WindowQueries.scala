package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2.6, W1-W7). The reference's
  * latest-version collapse IS a ranking window over its sorting key
  * (`/root/reference/README.md:177`); the rest is the analytics surface.
  *
  * All windows partition by `user_id` — state per window is bounded by one
  * entity's history, and the shuffle is a single hash exchange on the key
  * (skew handled by AQE at scale).
  */
object WindowQueries extends QueryPack {

  private def byUserTs = Window.partitionBy("user_id").orderBy("ts")

  val queries: Map[String, Q] = Map(
    // W1: ranking.
    "q_win_rownum" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"),
                row_number().over(byUserTs).cast("long").as("rn"),
                rank().over(Window.partitionBy("user_id")
                  .orderBy("event_type")).cast("long").as("rnk"))
        .orderBy("event_id")),

    // W2: lag/lead deltas.
    "q_win_lag" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"),
                round(col("value") - lag("value", 1).over(byUserTs), 4)
                  .as("delta"),
                lead("event_type", 1).over(byUserTs).as("next_type"))
        .orderBy("event_id")),

    // W3: running sum (row frame).
    "q_win_running_sum" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"),
                round(sum("value").over(
                  byUserTs.rowsBetween(Window.unboundedPreceding,
                                       Window.currentRow)), 4).as("run_sum"))
        .orderBy("event_id")),

    // W4: sliding row frame (moving average).
    "q_win_moving_avg" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"),
                round(avg("value").over(byUserTs.rowsBetween(-3, 0)), 4)
                  .as("mov_avg"))
        .orderBy("event_id")),

    // W5: range frame over epoch seconds (trailing 1 day).
    "q_win_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-86400, 0)
      Tables(s, dir, "events")
        .select(col("event_id"),
                round(sum("value").over(w), 4).as("day_sum"))
        .orderBy("event_id")
    }),

    // W6: ntile / percent_rank over a total order — derived from the
    // scale-safe [[Relational.globalRowNumberInPlan]] rank instead of
    // an un-partitioned ranking window, which funnels the whole table
    // through ONE task. EVERYTHING rides in-plan: the rank's
    // value-range bucketing (high-cardinality acctbal leading column —
    // the in-plan form's sweet spot) and n as a broadcast 1-row count
    // aggregate crossJoin, so the returned DataFrame is fully
    // self-contained — zero construction-time jobs, the bench times
    // the whole computation. Standard ntile hands the first n mod 4
    // quartiles ceil(n/4) rows and the rest floor(n/4) — closed-form
    // from rn in exact integer division; percent_rank = (rn-1)/(n-1)
    // with the n = 1 degenerate case pinned to 0 as in SQL (the order
    // is total, c_custkey is unique, so rank = row_number). Every
    // per-row stage is parallel.
    "q_win_ntile" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select("c_custkey", "c_acctbal")
      Relational.globalRowNumberInPlan(
          c, col("c_acctbal"),
          Seq(col("c_acctbal"), col("c_custkey")), "rn")
        .crossJoin(broadcast(c.agg(count(lit(1)).as("n"))))
        // size/rem/cut of the quartile arithmetic, from the n column
        .withColumn("cut", expr("(n % 4) * (n div 4 + 1)"))
        .select(col("c_custkey"),
                (when(col("rn") <= col("cut"),
                      expr("(rn - 1) div (n div 4 + 1)"))
                   .otherwise(expr(
                     "n % 4 + (rn - 1 - cut) div greatest(n div 4, 1)"))
                 + 1L).cast("long").as("quartile"),
                when(col("n") > 1,
                     round((col("rn") - 1).cast("double") /
                             (col("n") - 1).cast("double"), 6))
                  .otherwise(lit(0.0)).as("pct_rank"))
        .orderBy("c_custkey")
    }),

    // W6b: distribution functions + nth value.
    "q_win_dist" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts")
      val full = w.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
      Tables(s, dir, "events")
        .select(col("event_id"),
                round(cume_dist().over(w), 6).as("cd"),
                nth_value(col("event_type"), 2).over(full).as("second_type"))
        .orderBy("event_id")
    }),

    // ClickHouse `LIMIT n OFFSET o BY key` analog: skip each entity's
    // first event, keep its next two — per-key pagination as a ranking
    // window + band filter (the same single hash exchange as every
    // per-entity window here).
    "q_limit_by" -> ((s, dir) =>
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .filter(col("rn") > 1 && col("rn") <= 3)
        .select("user_id", "event_id")
        .orderBy("event_id")),

    // W8: exponential moving average per series (ClickHouse
    // exponentialMovingAverage analog, α = 0.25) — EMA is recursive
    // (each step weights the previous result), which no window frame
    // expresses. Runs as [[Analytics.emaBucketed]]: per (entity, day)
    // affine summaries (decay, partial) then a carry fold over the
    // bucket summaries — no buffer ever holds more than one (entity,
    // day) slice, so a bot entity can't blow a single aggregation
    // buffer. The fold arithmetic (0.25·v + 0.75·acc, left to right)
    // matches the oracle's recursive CTE; bucket composition
    // reassociates only the cross-bucket carry term, well inside the
    // round-4 grid.
    "q_win_ema" -> ((s, dir) =>
      Analytics.emaBucketed(Tables(s, dir, "events"), "user_id", "ts",
                            "event_id", "value", 0.25,
                            t => date_trunc("day", t))
        .select(col("user_id"), round(col("ema"), 4).as("ema"))
        .orderBy("user_id")),

    // W8b: TIME-weighted exponential decay average (ClickHouse
    // exponentialTimeDecayedAvg analog, half-life = 1 day) — the
    // irregular-series sibling of q_win_ema: weights depend on event
    // AGE, not row position. Plain weighted mean anchored at each
    // entity's latest event; weights are exact powers of two (age
    // quantized to whole half-lives) so Spark and DuckDB agree
    // bit-for-bit on every term.
    "q_win_time_decay" -> ((s, dir) =>
      Analytics.timeDecayedAvg(Tables(s, dir, "events"), "user_id", "ts",
                               "value", 86400L)
        .select(col("user_id"), round(col("tdavg"), 4).as("tdavg"))
        .orderBy("user_id")),

    // W2b: per-series derivative pair (ClickHouse runningDifference +
    // nonNegativeDerivative): consecutive value delta, and the
    // rate-per-second clamped at zero — counter-reset-safe rate of a
    // monotone gauge. One lag window per series, ties broken by
    // event_id so the neighbor is deterministic.
    "q_win_derivative" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val dv = col("value") - lag("value", 1).over(w)
      val dt = (unix_micros(col("ts")) -
                 lag(unix_micros(col("ts")), 1).over(w)).cast("double")
      Tables(s, dir, "events")
        .select(col("event_id"),
                round(dv, 4).as("run_diff"),
                // dt > 0 guard: simultaneous neighbors yield NULL, not a
                // divide-by-zero artifact (engines disagree on x/0.0)
                round(when(dt > 0, greatest(dv * lit(1000000.0) / dt,
                                            lit(0.0))), 6)
                  .as("nn_deriv"))
        .orderBy("event_id")
    }),

    // W8c: the rest of the exponentialTimeDecayed* family
    // ([[Analytics.timeDecayedStats]]): decayed sum, decayed event
    // count, and decayed max per series — same exact power-of-two
    // weight plan as q_win_time_decay, one pass for all three.
    "q_win_time_decay_family" -> ((s, dir) =>
      Analytics.timeDecayedStats(Tables(s, dir, "events"), "user_id",
                                 "ts", "value", 86400L)
        .select(col("user_id"),
                round(col("tdsum"), 4).as("tdsum"),
                round(col("tdcount"), 4).as("tdcount"),
                // tdmax is ONE bit-identical product (2-dp value ×
                // 2⁻ᵏ), which lands on .00005 decimal-round boundaries
                // CONSTANTLY (…25/…75 tails); round() then diverges
                // between engines (Spark rounds the shortest decimal
                // rep, DuckDB the binary value). floor on the scaled
                // BINARY double is engine-identical — no decimal
                // conversion anywhere.
                floor(col("tdmax") * 10000).cast("long").as("tdmax_e4"))
        .orderBy("user_id")),

    // W7: first/last value over the full partition frame.
    "q_win_first_last" -> ((s, dir) => {
      val full = byUserTs.rowsBetween(Window.unboundedPreceding,
                                      Window.unboundedFollowing)
      Tables(s, dir, "events")
        .select(col("event_id"),
                first("event_type").over(full).as("first_type"),
                last("event_type").over(full).as("last_type"))
        .orderBy("event_id")
    }),

    // W9: rolling z-score anomaly detection — each event tested against
    // the trailing-100 window of its own user series (per-entity partitions — bounded, high-cardinality, never a 5-way skew key) (the streaming-metrics
    // outlier shape). |z| > 3 is evaluated as the EXACT integer
    // predicate (v·n − s1)² > 9·(n·s2 − s1²) over cent-scaled values
    // (multiply the definition through by n²), so no mean/variance
    // double ever exists and cross-engine summation-order drift cannot
    // flip a boundary case. The frame is ≤ 100 rows (bounded window
    // state per series); cent values ≤ 10⁵, so every product stays
    // under 2⁶³ regardless of SF. Rows with under 30 predecessors are
    // reported but not tested (warm-up guard).
    "q_win_zscore" -> ((s, dir) =>
      Analytics.rollingZscoreFlags(
          Tables(s, dir, "events")
            .select(col("user_id"), col("ts"), col("event_id"),
                    expr("CAST(round(value * 100) AS BIGINT)").as("v")),
          "user_id", "ts", "event_id", "v")
        .groupBy("user_id")
        .agg(count(when(col("checked"), 1)).as("n_checked"),
             count(when(col("anomaly"), 1)).as("n_anomalies"))
        .orderBy("user_id"))
  )

  val oracles: Map[String, String] = Map(
    "q_win_rownum" ->
      """SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn,
        |  rank() OVER (PARTITION BY user_id ORDER BY event_type) AS rnk
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_win_lag" ->
      """SELECT event_id,
        |  round(value - lag(value, 1) OVER
        |    (PARTITION BY user_id ORDER BY ts), 4) AS delta,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts)
        |    AS next_type
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_win_derivative" ->
      """WITH d AS (
        |  SELECT event_id,
        |    value - lag(value, 1) OVER w AS dv,
        |    CAST(epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS DOUBLE)
        |      AS dt
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, round(dv, 4) AS run_diff,
        |  round(CASE WHEN dt > 0
        |    THEN greatest(dv * 1000000.0 / dt, 0.0) END, 6) AS nn_deriv
        |FROM d ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_win_running_sum" ->
      """SELECT event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_sum
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_win_moving_avg" ->
      """SELECT event_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_win_range_frame" ->
      """SELECT event_id,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY (epoch_us(ts) // 1000000)
        |    RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW), 4) AS day_sum
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_win_ntile" ->
      """SELECT c_custkey,
        |  ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
        |  round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6)
        |    AS pct_rank
        |FROM customer ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_win_dist" ->
      """SELECT event_id,
        |  round(cume_dist() OVER (PARTITION BY user_id ORDER BY ts), 6)
        |    AS cd,
        |  nth_value(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_type
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_limit_by" ->
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn > 1 AND rn <= 3
        |ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_win_ema" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, value, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |rec AS (
        |  SELECT user_id, rn, value AS ema FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn, 0.25 * e.value + 0.75 * r.ema
        |  FROM ev e JOIN rec r
        |    ON e.user_id = r.user_id AND e.rn = r.rn + 1),
        |lastrn AS (SELECT user_id, max(rn) AS mx FROM ev GROUP BY user_id)
        |SELECT r.user_id, round(r.ema, 4) AS ema
        |FROM rec r JOIN lastrn l ON r.user_id = l.user_id AND r.rn = l.mx
        |ORDER BY r.user_id NULLS FIRST""".stripMargin,

    "q_win_time_decay" ->
      """WITH t AS (
        |  SELECT user_id, value, (epoch_us(ts) // 1000000) AS s,
        |         max(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id)
        |           AS t_last
        |  FROM events)
        |SELECT user_id,
        |  round(sum(value * power(0.5, floor((t_last - s) / 86400))) /
        |        sum(power(0.5, floor((t_last - s) / 86400))), 4) AS tdavg
        |FROM t GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_win_time_decay_family" ->
      """WITH t AS (
        |  SELECT user_id, value, (epoch_us(ts) // 1000000) AS s,
        |         max(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id)
        |           AS t_last
        |  FROM events)
        |SELECT user_id,
        |  round(sum(value * power(0.5, floor((t_last - s) / 86400))), 4)
        |    AS tdsum,
        |  round(sum(power(0.5, floor((t_last - s) / 86400))), 4)
        |    AS tdcount,
        |  CAST(floor(max(value * power(0.5, floor((t_last - s) / 86400)))
        |             * 10000) AS BIGINT) AS tdmax_e4
        |FROM t GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_win_first_last" ->
      """SELECT event_id,
        |  first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS first_type,
        |  last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS last_type
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    // Same integer predicate; DuckDB's HUGEINT products are exact, so
    // the comparison matches Spark's in-range BIGINT arithmetic.
    "q_win_zscore" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |w AS (
        |  SELECT user_id, v,
        |    count(v) OVER win AS n,
        |    sum(v) OVER win AS s1,
        |    sum(v * v) OVER win AS s2
        |  FROM e WINDOW win AS (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING))
        |SELECT user_id,
        |  count(CASE WHEN n >= 30 THEN 1 END) AS n_checked,
        |  count(CASE WHEN n >= 30 AND
        |    (v * n - s1) * (v * n - s1) > 9 * (n * s2 - s1 * s1)
        |    THEN 1 END) AS n_anomalies
        |FROM w GROUP BY user_id
        |ORDER BY user_id NULLS FIRST""".stripMargin
  )
}
