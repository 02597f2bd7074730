package graft

import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2.4, J1-J8). Multi-table analytics is the
  * destination-engine surface the reference pipeline exists to serve
  * (`/root/reference/README.md:3`, FAQ on adding tables `README.md:277-278`).
  *
  * Scale notes: dimension joins (region/nation/supplier) are broadcast —
  * no shuffle of the fact side; the non-equi range join keeps the small
  * relation on the broadcast side of the nested loop; the as-of join is the
  * union+window formulation (single shuffle, no fan-out — see
  * [[Relational.asofJoin]]).
  */
object JoinQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // J1: inner equi-join + aggregate (money via DECIMAL for determinism).
    "q_join_inner" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"),
              col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
               .as("total_price"))
        .orderBy("c_mktsegment")),

    // J2: explicit broadcast of dimension tables (no shuffle of fact side).
    "q_join_broadcast" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .join(broadcast(Tables(s, dir, "nation")),
              col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, dir, "region")),
              col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("r_name")),

    // J3: left outer + count of matches (0 for no-order customers).
    "q_join_left" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"),
              col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")),

    // J2b: right outer — every order kept even when its customer is
    // filtered out of the left side.
    "q_join_right" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_mktsegment")
        .join(Tables(s, dir, "orders")
                .select("o_orderkey", "o_custkey"),
              col("c_custkey") === col("o_custkey"), "right")
        .select(col("o_orderkey"), col("o_custkey"),
                col("c_mktsegment"))
        .orderBy("o_orderkey")),

    // J3: full outer over partially-overlapping subsets.
    "q_join_full" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_acctbal")
      val o = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 300000)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_big_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full")
        .select(col("c_custkey"), col("c_acctbal"), col("o_custkey"),
                col("n_big_orders"))
        .orderBy(coalesce(col("c_custkey"), col("o_custkey")).asc_nulls_first,
                 col("c_custkey").asc_nulls_first)
    }),

    // J4: left semi (EXISTS).
    "q_join_semi" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // J4: left anti (NOT EXISTS).
    "q_join_anti" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // J5: non-equi range join (small side broadcast → nested loop stays
    // bounded by the dimension cardinality).
    "q_join_range" -> ((s, dir) =>
      Tables(s, dir, "supplier").as("s")
        .join(Tables(s, dir, "customer").as("c"),
              col("c.c_acctbal").between(col("s.s_acctbal") - 100,
                                         col("s.s_acctbal") + 100))
        .groupBy("s.s_suppkey")
        .agg(count(lit(1)).as("n_close"))
        .orderBy("s_suppkey")),

    // J5b: the same range join through bucket quantization (hash join on
    // bucket + residual filter — the formulation that survives 100 TB).
    "q_join_range_bucketed" -> ((s, dir) =>
      Relational.bucketedBetweenJoin(
        Tables(s, dir, "customer"), col("c_acctbal"),
        Tables(s, dir, "supplier"),
        col("s_acctbal") - 100, col("s_acctbal") + 100, 100L)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_close"))
        .orderBy("s_suppkey")),

    // J5d: interval-overlap join ([[Relational.intervalOverlapJoin]]):
    // which click intervals overlap which purchase intervals of the
    // SAME user — both sides explode to 600 s time buckets (fan-out
    // <= 3 for these <= 660 s intervals), meet on one (user, bucket)
    // equi-join, verify the exact predicate, and emit at each pair's
    // FIRST shared bucket so no dedup shuffle is needed.
    "q_join_interval" -> ((s, dir) => {
      def iv(t: String) = Tables(s, dir, "events")
        .filter(col("event_type") === t)
        .select(col("user_id"), col("event_id"),
                expr("unix_micros(ts) div 1000000").as("s"))
        .withColumn("e", col("s") + lit(60) + pmod(col("event_id"),
                                                   lit(600)))
      Relational.intervalOverlapJoin(
          iv("click"), col("s"), col("e"),
          iv("purchase"), col("s"), col("e"), 600L,
          leftKey = Some(col("user_id")),
          rightKey = Some(col("user_id")))
        .select(col("a_user_id").as("user_id"), col("a_event_id"),
                col("b_event_id"))
        .orderBy("user_id", "a_event_id", "b_event_id")
    }),

    // J9: positional paste join (ClickHouse PASTE JOIN): zip two
    // relations row-by-row in their respective sort orders. Both sides
    // get a range-partitioned global row number
    // ([[Relational.globalRowNumber]] — never a single-task window),
    // then one equi-join on the ordinal; inner semantics truncate to
    // the shorter side.
    "q_join_paste" -> ((s, dir) => {
      val c = Relational.globalRowNumber(
        Tables(s, dir, "customer").select("c_custkey"),
        Seq(col("c_custkey")), "rn")
      val p = Relational.globalRowNumber(
        Tables(s, dir, "supplier").select("s_suppkey"),
        Seq(col("s_suppkey")), "rn")
      c.join(p, "rn")
        .select(col("rn"), col("c_custkey"), col("s_suppkey"))
        .orderBy("rn")
    }),

    // J5c: spatial radius self-join ([[Relational.geoRadiusPairs]]):
    // event pairs within 300 km great-circle distance over deterministic
    // synthetic coordinates (|lat| <= 60 so a 6° grid cell spans the
    // radius in longitude everywhere). Grid-bucketed — constant 3×3
    // probe replication + one equi-join shuffle, collision-linear,
    // never all-pairs.
    "q_geo_radius_join" -> ((s, dir) =>
      Relational.geoRadiusPairs(
          Tables(s, dir, "events")
            .filter(pmod(col("event_id"), lit(4)) === 0)
            .select(col("event_id"),
                    (pmod(col("event_id") * 37, lit(12000L))
                       .cast("double") / 100.0 - 60.0).as("lat"),
                    (pmod(col("event_id") * 73, lit(35900L))
                       .cast("double") / 100.0 - 179.5).as("lon")),
          "event_id", "lat", "lon", 300.0, 6.0, maxAbsLat = 60.0)
        .orderBy("id_a", "id_b")),

    // J6: as-of join — for each purchase, the latest prior click by the
    // same user (union + window; see Relational.asofJoin for scale notes).
    "q_join_asof" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
      val clicks = e.filter(col("event_type") === "click")
      Relational.asofJoin(purchases, clicks, "user_id", "ts", "ts",
                          Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("asof_event_id"))
        .orderBy("event_id")
    }),

    // J6e: LEFT OUTER as-of — purchases with no prior click SURVIVE
    // with a NULL match (pandas merge_asof default / DuckDB ASOF LEFT
    // JOIN), the enrichment form where "no state yet" is information.
    // Same single-shuffle union+window plan as q_join_asof.
    "q_join_asof_left" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
      val clicks = e.filter(col("event_type") === "click")
      Relational.asofJoinLeft(purchases, clicks, "user_id", "ts", "ts",
                              Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("asof_event_id"))
        .orderBy("event_id")
    }),

    // J6g: NEAREST as-of — for each purchase, the click minimizing
    // |click.ts − purchase.ts| for that user; backward wins distance
    // ties (pandas direction='nearest'). One shuffle: backward and
    // forward carries are two window passes over the same unioned frame.
    "q_join_asof_nearest" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
      val clicks = e.filter(col("event_type") === "click")
      Relational.asofJoinNearest(purchases, clicks, "user_id", "ts", "ts",
                                 Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("asof_event_id"))
        .orderBy("event_id")
    }),

    // J6d: FORWARD as-of — for each purchase, the EARLIEST click at or
    // after it by the same user (pandas merge_asof direction='forward');
    // same single-shuffle plan as q_join_asof with the window reversed.
    "q_join_asof_fwd" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
      val clicks = e.filter(col("event_type") === "click")
      Relational.asofJoinForward(purchases, clicks, "user_id", "ts", "ts",
                                 Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("asof_event_id"))
        .orderBy("event_id")
    }),

    // J6c: the hot-key-safe as-of join — same result through the
    // time-bucketed three-pass plan (within-bucket fill + per-bucket
    // reduction + carry over the bucket list), so no task ever sorts a
    // whole key's history (see Relational.asofJoinBucketed). Hourly
    // buckets; identical oracle to q_join_asof.
    "q_join_asof_bucketed" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
      val clicks = e.filter(col("event_type") === "click")
      Relational.asofJoinBucketed(purchases, clicks, "user_id", "ts", "ts",
          Seq("event_id"),
          t => floor(unix_micros(t) / lit(3600L * 1000000L)))
        .select(col("user_id"), col("event_id"), col("asof_event_id"))
        .orderBy("event_id")
    }),

    // J6h: hot-key-safe FORWARD as-of — the bucketed three-pass plan
    // under time negation ([[Relational.asofJoinForwardBucketed]]);
    // same answer as q_join_asof_fwd, per-task rows bounded by bucket
    // width instead of a hot user's event count.
    "q_join_asof_fwd_bucketed" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .withColumn("tus", unix_micros(col("ts")))
      val purchases = e.filter(col("event_type") === "purchase")
      val clicks = e.filter(col("event_type") === "click")
      Relational.asofJoinForwardBucketed(purchases, clicks, "user_id",
          "tus", "tus", Seq("event_id"),
          t => floor(t / lit(3600.0 * 1000000)).cast("long"))
        .select(col("user_id"), col("event_id"), col("asof_event_id"))
        .orderBy("event_id")
    }),

    // J6b: as-of join with a match TOLERANCE (pandas merge_asof /
    // kdb window-join shape): the latest prior click counts only if it
    // happened within 1 hour of the purchase; staler matches are nulled
    // but the left row survives. Same single-shuffle asof plan — the
    // tolerance is a post-join projection, never a second join.
    "q_join_asof_tol" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
      val clicks = e.filter(col("event_type") === "click")
        .withColumn("cts", col("ts"))
      Relational.asofJoin(purchases, clicks, "user_id", "ts", "ts",
                          Seq("event_id", "cts"))
        .select(col("user_id"), col("event_id"),
                when(col("asof_cts") >= col("ts") - expr("INTERVAL 1 HOUR"),
                     col("asof_event_id")).as("tol_event_id"))
        .orderBy("event_id")
    }),

    // ClickHouse LEFT ANY JOIN analog: at most ONE right row per left
    // row, made deterministic (ClickHouse keeps an arbitrary match) by
    // collapsing the right side to its lexicographic-min row per key
    // FIRST — a hash aggregate, so the right side shrinks before the
    // join and left rows never duplicate. min(struct) keeps the matched
    // columns consistent with each other (one row, not per-column mins).
    "q_join_any" -> ((s, dir) => {
      val one = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(min(struct(col("l_shipdate"), col("l_linenumber"),
                        col("l_quantity"))).as("f"))
      Tables(s, dir, "orders")
        .join(one, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), col("o_orderpriority"),
                col("f.l_shipdate").as("any_ship"),
                col("f.l_linenumber").as("any_line"),
                col("f.l_quantity").as("any_qty"))
        .orderBy("o_orderkey")
    }),

    // J7: cross join (bounded inputs only) — the 25-row nation side is
    // broadcast explicitly, matching the file's convention (the
    // planner picks the same plan; the intent should be in the code).
    "q_join_cross" -> ((s, dir) =>
      Tables(s, dir, "region")
        .crossJoin(broadcast(Tables(s, dir, "nation")))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")),

    // J8: self-join — signup→purchase pairs per user.
    "q_join_self" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id").as("su"), col("ts").as("s_ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("p_ts"))
      signups.join(purchases,
                   col("su") === col("pu") && col("p_ts") > col("s_ts"))
        .groupBy(col("su").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name NULLS FIRST""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_join_right" ->
      """SELECT o_orderkey, o_custkey, c_mktsegment
        |FROM (SELECT c_custkey, c_mktsegment FROM customer
        |      WHERE c_mktsegment = 'BUILDING') c
        |RIGHT JOIN (SELECT o_orderkey, o_custkey FROM orders) o
        |  ON c_custkey = o_custkey
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin,

    "q_join_full" ->
      """SELECT c_custkey, c_acctbal, o_custkey, n_big_orders FROM
        |  (SELECT c_custkey, c_acctbal FROM customer
        |   WHERE c_mktsegment = 'BUILDING') c
        |FULL JOIN
        |  (SELECT o_custkey, count(*) AS n_big_orders FROM orders
        |   WHERE o_totalprice > 300000 GROUP BY o_custkey) o
        |ON c_custkey = o_custkey
        |ORDER BY coalesce(c_custkey, o_custkey) ASC NULLS FIRST,
        |         c_custkey ASC NULLS FIRST""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_join_range" ->
      """SELECT s_suppkey, count(*) AS n_close
        |FROM supplier JOIN customer
        |  ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
        |GROUP BY s_suppkey ORDER BY s_suppkey NULLS FIRST""".stripMargin,

    "q_join_range_bucketed" ->
      """SELECT s_suppkey, count(*) AS n_close
        |FROM supplier JOIN customer
        |  ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
        |GROUP BY s_suppkey ORDER BY s_suppkey NULLS FIRST""".stripMargin,

    "q_join_interval" ->
      """WITH c AS (
        |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s,
        |    epoch_us(ts) // 1000000 + 60 + event_id % 600 AS e
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s,
        |    epoch_us(ts) // 1000000 + 60 + event_id % 600 AS e
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id AS user_id, c.event_id AS a_event_id,
        |  p.event_id AS b_event_id
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.s < p.e AND p.s < c.e
        |ORDER BY c.user_id NULLS FIRST, a_event_id NULLS FIRST,
        |  b_event_id NULLS FIRST""".stripMargin,

    "q_join_paste" ->
      """WITH c AS (SELECT c_custkey,
        |             row_number() OVER (ORDER BY c_custkey) AS rn
        |           FROM customer),
        |p AS (SELECT s_suppkey,
        |        row_number() OVER (ORDER BY s_suppkey) AS rn
        |      FROM supplier)
        |SELECT CAST(rn AS BIGINT) AS rn, c_custkey, s_suppkey
        |FROM c JOIN p USING (rn)
        |ORDER BY rn NULLS FIRST""".stripMargin,

    // Same grid construction clause by clause; the haversine is the
    // fixed IEEE expression from q_geo_funcs.
    "q_geo_radius_join" ->
      """WITH p AS (
        |  SELECT event_id AS id,
        |    CAST((event_id * 37) % 12000 AS DOUBLE) / 100.0 - 60.0
        |      AS lat,
        |    CAST((event_id * 73) % 35900 AS DOUBLE) / 100.0 - 179.5
        |      AS lon
        |  FROM events WHERE event_id % 4 = 0),
        |c AS (
        |  SELECT id, lat, lon,
        |    CAST(floor(lat / 6.0) AS BIGINT) AS cy,
        |    CAST(floor(lon / 6.0) AS BIGINT) AS cx
        |  FROM p),
        |pr AS (
        |  SELECT id AS id_a, lat AS lat_a, lon AS lon_a,
        |    c.cy + dy.d AS cy, c.cx + dx.d AS cx
        |  FROM c,
        |    (SELECT unnest(range(-1, 2)) AS d) dy,
        |    (SELECT unnest(range(-1, 2)) AS d) dx),
        |j AS (
        |  SELECT id_a, c.id AS id_b,
        |    2.0 * 6371.0 * asin(sqrt(
        |      pow(sin(radians(c.lat - lat_a) / 2), 2) +
        |      cos(radians(lat_a)) * cos(radians(c.lat)) *
        |      pow(sin(radians(c.lon - lon_a) / 2), 2))) AS d
        |  FROM pr JOIN c ON pr.cy = c.cy AND pr.cx = c.cx
        |  WHERE id_a < c.id)
        |SELECT id_a, id_b, round(d, 4) AS dist_km
        |FROM j WHERE d <= 300.0
        |ORDER BY id_a NULLS FIRST, id_b NULLS FIRST""".stripMargin,

    "q_join_asof" ->
      """SELECT p.user_id, p.event_id, c.event_id AS asof_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id NULLS FIRST""".stripMargin,

    "q_join_asof_left" ->
      """SELECT p.user_id, p.event_id, c.event_id AS asof_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id NULLS FIRST""".stripMargin,

    "q_join_asof_fwd" ->
      """SELECT p.user_id, p.event_id, c.event_id AS asof_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts >= p.ts
        |ORDER BY p.event_id NULLS FIRST""".stripMargin,

    // Same contract as the single-window forward form.
    "q_join_asof_fwd_bucketed" ->
      """SELECT p.user_id, p.event_id, c.event_id AS asof_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts >= p.ts
        |ORDER BY p.event_id NULLS FIRST""".stripMargin,

    // Both directional ASOF joins over the per-instant-reduced click
    // stream (min event_id per (user, ts) — the same deterministic
    // reduction the Spark helper applies), then the same
    // tie-to-backward CASE.
    "q_join_asof_nearest" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, min(event_id) AS event_id
        |      FROM events WHERE event_type = 'click'
        |      GROUP BY user_id, ts),
        |b AS (
        |  SELECT p.user_id, p.event_id, p.ts,
        |    c.event_id AS bid, c.ts AS bts
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts),
        |f AS (
        |  SELECT p.event_id, c.event_id AS fid, c.ts AS fts
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND c.ts >= p.ts)
        |SELECT b.user_id, b.event_id,
        |  CASE WHEN fid IS NULL THEN bid
        |       WHEN bid IS NULL THEN fid
        |       WHEN (b.ts - bts) <= (fts - b.ts) THEN bid
        |       ELSE fid END AS asof_event_id
        |FROM b JOIN f USING (event_id)
        |WHERE bid IS NOT NULL OR fid IS NOT NULL
        |ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_join_asof_bucketed" ->
      """SELECT p.user_id, p.event_id, c.event_id AS asof_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id NULLS FIRST""".stripMargin,

    "q_join_asof_tol" ->
      """SELECT p.user_id, p.event_id,
        |  CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.event_id
        |  END AS tol_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id NULLS FIRST""".stripMargin,

    "q_join_any" ->
      """SELECT o_orderkey, o_orderpriority,
        |  l_shipdate AS any_ship,
        |  l_linenumber AS any_line,
        |  l_quantity AS any_qty
        |FROM orders LEFT JOIN (
        |  SELECT l_orderkey, l_shipdate, l_linenumber, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_shipdate, l_linenumber, l_quantity) AS rn
        |  FROM lineitem) l
        |  ON o_orderkey = l_orderkey AND rn = 1
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q_join_self" ->
      """SELECT s.user_id, count(*) AS n_pairs
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id AND p.ts > s.ts
        |GROUP BY s.user_id ORDER BY s.user_id NULLS FIRST""".stripMargin
  )
}
