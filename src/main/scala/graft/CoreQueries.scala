package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scans, projections, filters, timestamp conversion, sorts, limits and set
  * ops (SURVEY.md §2.1, §2.2, §2.7). The only scalar transform the
  * reference itself performs is the epoch-micros → second-truncated
  * DateTime conversion in its materialized view
  * (`/root/reference/README.md:226-227`) — `q_ts_convert` replicates it.
  */
object CoreQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // S6: columnar scan with projection — column pruning must reach parquet.
    "q_scan" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")),

    // P1: projection + rename (the MV SELECT-list pattern, README.md:222-230).
    "q_project" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey").as("order_id"),
                col("o_orderpriority").as("priority"),
                col("o_totalprice").as("total"))
        .orderBy("order_id")),

    // P2/F1: epoch micros → truncated-to-second timestamp (CH parity).
    "q_ts_convert" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_id"),
                unix_micros(col("ts")).as("ts_micros"),
                Functions.microsToTimestampSecond(unix_micros(col("ts"))).as("ts_sec"))
        .orderBy("event_id")),

    // P5: conjunctive predicates.
    "q_filter" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "A")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")),

    // P5: IN-list + equality.
    "q_filter_in" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
                col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .orderBy("o_orderkey")),

    // P5: NULL-aware predicates (nullif/isNull/between).
    "q_filter_null" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .withColumn("ret_n", nullif(col("l_returnflag"), lit("N")))
        .filter(col("ret_n").isNull || col("l_quantity").between(1, 3))
        .select("l_orderkey", "l_linenumber", "l_quantity", "ret_n")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "ret_n")),

    // O1: multi-key total sort (the final table's ORDER-BY clustering,
    // README.md:177) — range-partitioned sort, no single-task bottleneck.
    "q_sort" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
        .orderBy(col("l_returnflag"), col("l_shipdate").desc_nulls_last,
                 col("l_orderkey"), col("l_linenumber"))),

    // O2: top-N (planner: TakeOrderedAndProject — per-partition heaps, no
    // global sort).
    "q_topn" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey"))
        .limit(100)),

    // O3: top-k per group.
    "q_topk_per_group" -> ((s, dir) =>
      Relational.topKPerGroup(
        Tables(s, dir, "orders"),
        Seq("o_custkey"),
        Seq(col("o_totalprice").desc_nulls_last, col("o_orderkey")), 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("o_custkey"), col("o_totalprice").desc_nulls_last,
                 col("o_orderkey"))),

    // O4: UNION ALL (multi-source MV fan-in, README.md:277-278).
    "q_union" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      e.filter(col("event_type") === "click")
        .unionByName(e.filter(col("event_type") === "error"))
        .select("event_id", "event_type", "user_id")
        .orderBy("event_id")
    }),

    // O5: DISTINCT.
    "q_distinct" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // O6: INTERSECT.
    "q_intersect" -> ((s, dir) => {
      val building = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val withOrders = Tables(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"))
      building.intersect(withOrders).orderBy("c_custkey")
    }),

    // O6: EXCEPT.
    "q_except" -> ((s, dir) => {
      val all = Tables(s, dir, "customer").select(col("c_custkey"))
      val withOrders = Tables(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"))
      all.except(withOrders).orderBy("c_custkey")
    }),

    // O4: UNION with distinct semantics.
    "q_union_distinct" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      e.filter(col("event_type") === "click").select(col("user_id"))
        .union(e.filter(col("event_type") === "error").select(col("user_id")))
        .distinct()
        .orderBy("user_id")
    }),

    // O6: multiset EXCEPT ALL / INTERSECT ALL.
    "q_except_all" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_orderpriority"))
        .exceptAll(o.filter(col("o_orderstatus") === "P")
          .select(col("o_orderpriority")))
        .orderBy("o_orderpriority")
    }),
    "q_intersect_all" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_orderpriority"))
        .intersectAll(o.filter(col("o_orderstatus") === "P")
          .select(col("o_orderpriority")))
        .orderBy("o_orderpriority")
    }),

    // Deterministic hash-based sampling (same md5 on both engines — the
    // reproducible-sample idiom for pipeline debugging at scale).
    "q_sample_hash" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1)
          .isin("0", "1"))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Global row numbering without the single-task window (range partition
    // + per-partition offsets — see Relational.globalRowNumber).
    "q_global_rownum" -> ((s, dir) =>
      Relational.globalRowNumber(
        Tables(s, dir, "events"), Seq(col("ts"), col("event_id")))
        .select("event_id", "rn")
        .orderBy("event_id")),

    // The fully IN-PLAN variant (value-range bucketing + pre-aggregated
    // offset window — no RDD drop, no construction-time job, codegen
    // intact). Same oracle as q_global_rownum: both are THE total-order
    // rank.
    "q_global_rownum_inplan" -> ((s, dir) =>
      Relational.globalRowNumberInPlan(
        Tables(s, dir, "events"), col("ts").cast("long"),
        Seq(col("ts"), col("event_id")))
        .select("event_id", "rn")
        .orderBy("event_id")),

    // Skew-aware auto-dispatch under PLANTED leading-value skew: 3/4 of
    // the rows collapse onto one leading value (event_id % 4 != 0 -> 0),
    // so the in-plan form's value-range bucketing would funnel 75% of
    // the corpus through ONE window task — the exact per-bucket count
    // probe measures that and dispatches to the sampled-split form
    // (Relational.globalRowNumberAuto). Same total-order rank either
    // way; the oracle pins it.
    "q_global_rownum_skew" -> ((s, dir) =>
      Relational.globalRowNumberAuto(
        Tables(s, dir, "events")
          .withColumn("skew_lead",
            when(col("event_id") % 4 =!= 0, lit(0L))
              .otherwise(col("event_id"))),
        col("skew_lead"),
        Seq(col("skew_lead"), col("event_id")))
        .select("event_id", "rn")
        .orderBy("event_id")),

    // Salted skew join (result must equal the plain equi-join).
    "q_salted_join" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      Relational.saltedJoin(o, c, "o_custkey", 4)
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    }),

    // Z-order (Morton) clustering value — the 2-D layout key behind
    // Relational.writeZOrdered, oracle-checked bit-for-bit.
    "q_zorder" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
                Relational.zorder2(col("c_custkey"), col("c_nationkey"))
                  .as("z"))
        .orderBy("c_custkey")),

    // Projection routing end-to-end (see projectionRouteQuery below).
    "q_projection_route" -> ((s, dir) => projectionRouteQuery(s, dir)),

    // Same projection, with a PROJECTION-KEY filter between the
    // aggregate and the base — the router's filter-routing reach:
    // key-only selection commutes with partial re-aggregation, so the
    // rewrite stays answer-preserving (the DuckDB oracle computes the
    // filtered aggregate over the raw table).
    "q_projection_route_filtered" -> ((s, dir) => {
      val base = projectionRouteSetup(s, dir)
      s.read.parquet(base)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
             sum("o_custkey").as("sum_cust"),
             max("o_totalprice").as("max_price"))
        .orderBy("o_orderpriority")
    })
  )

  /** Build + register the shared scratch projection over a PRIVATE copy
    * of orders (deterministic per-dir temp path — reused, not leaked —
    * so the registration can never reroute OTHER queries reading the
    * shared orders.parquet in the same session). Returns the base path.
    */
  private def projectionRouteSetup(s: SparkSession, dir: String): String = {
    val scratch = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_projroute_${math.abs(dir.hashCode)}").toString
    val base = s"$scratch/orders_base"
    val proj = s"$scratch/orders_by_priority"
    s.read.parquet(s"$dir/orders.parquet")
      .write.mode("overwrite").parquet(base)
    ProjectionRouter.writeProjection(
      s.read.parquet(base), Seq("o_orderpriority"),
      Seq("o_custkey", "o_totalprice"), proj)
    GraftExtensions.register(s)
    ProjectionRouter.register(ProjectionRouter.Projection(
      base, proj, Set("o_orderpriority"), Set("o_custkey", "o_totalprice")))
    base
  }

  private val projectionRouteQuery: Q = (s, dir) => {
    // Build + register the projection, then run a plain aggregate over
    // the BASE path: [[ProjectionRouter]] rewrites the plan to
    // re-aggregate the partials, and the DuckDB oracle computes the
    // same aggregate directly over the raw table — a hash match proves
    // the routed plan is answer-identical end-to-end, not just in the
    // spec. Measures chosen exact (count / long sum / double min-max)
    // so partial re-aggregation is bit-stable.
    val base = projectionRouteSetup(s, dir)
    s.read.parquet(base)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
           sum("o_custkey").as("sum_cust"),
           min("o_totalprice").as("min_price"),
           max("o_totalprice").as("max_price"))
      .orderBy("o_orderpriority")
  }

  val oracles: Map[String, String] = Map(
    "q_projection_route" ->
      """SELECT o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin,
    "q_projection_route_filtered" ->
      """SELECT o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
        |  max(o_totalprice) AS max_price
        |FROM orders
        |WHERE o_orderpriority <> '1-URGENT'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin,
    "q_zorder" ->
      """WITH t0 AS (
        |  SELECT c_custkey, CAST(c_custkey AS BIGINT) AS a,
        |         CAST(c_nationkey AS BIGINT) AS b FROM customer),
        |t1 AS (SELECT c_custkey,
        |  (a | (a << 16)) & 281470681808895 AS a,
        |  (b | (b << 16)) & 281470681808895 AS b FROM t0),
        |t2 AS (SELECT c_custkey,
        |  (a | (a << 8)) & 71777214294589695 AS a,
        |  (b | (b << 8)) & 71777214294589695 AS b FROM t1),
        |t3 AS (SELECT c_custkey,
        |  (a | (a << 4)) & 1085102592571150095 AS a,
        |  (b | (b << 4)) & 1085102592571150095 AS b FROM t2),
        |t4 AS (SELECT c_custkey,
        |  (a | (a << 2)) & 3689348814741910323 AS a,
        |  (b | (b << 2)) & 3689348814741910323 AS b FROM t3),
        |t5 AS (SELECT c_custkey,
        |  (a | (a << 1)) & 6148914691236517205 AS a,
        |  (b | (b << 1)) & 6148914691236517205 AS b FROM t4)
        |SELECT c_custkey, (a | (b << 1)) AS z FROM t5
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
        |         l_quantity NULLS FIRST, l_extendedprice NULLS FIRST""".stripMargin,

    "q_project" ->
      """SELECT o_orderkey AS order_id, o_orderpriority AS priority,
        |       o_totalprice AS total
        |FROM orders ORDER BY order_id NULLS FIRST""".stripMargin,

    "q_ts_convert" ->
      """SELECT event_id, epoch_us(ts) AS ts_micros,
        |       make_timestamp((epoch_us(ts) // 1000000) * 1000000) AS ts_sec
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'A'
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
        |         l_quantity NULLS FIRST, l_extendedprice NULLS FIRST""".stripMargin,

    "q_filter_in" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus = 'F'
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin,

    "q_filter_null" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       nullif(l_returnflag, 'N') AS ret_n
        |FROM lineitem
        |WHERE nullif(l_returnflag, 'N') IS NULL
        |   OR l_quantity BETWEEN 1 AND 3
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
        |         l_quantity NULLS FIRST, ret_n NULLS FIRST""".stripMargin,

    "q_sort" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
        |FROM lineitem
        |ORDER BY l_returnflag NULLS FIRST, l_shipdate DESC NULLS LAST,
        |         l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""".stripMargin,

    "q_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS FIRST
        |LIMIT 100""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC NULLS LAST, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey NULLS FIRST, o_totalprice DESC NULLS LAST,
        |         o_orderkey NULLS FIRST""".stripMargin,

    "q_union" ->
      """SELECT event_id, event_type, user_id FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, event_type, user_id FROM events WHERE event_type = 'error'
        |ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_union_distinct" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_except_all" ->
      """SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin,

    "q_intersect_all" ->
      """SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin,

    "q_sample_hash" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "q_global_rownum" ->
      """SELECT event_id,
        |  row_number() OVER (ORDER BY ts, event_id) AS rn
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_global_rownum_inplan" ->
      """SELECT event_id,
        |  row_number() OVER (ORDER BY ts, event_id) AS rn
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_global_rownum_skew" ->
      """SELECT event_id,
        |  row_number() OVER (ORDER BY
        |    CASE WHEN event_id % 4 <> 0 THEN 0 ELSE event_id END,
        |    event_id) AS rn
        |FROM events ORDER BY event_id NULLS FIRST""".stripMargin,

    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST""".stripMargin
  )
}
