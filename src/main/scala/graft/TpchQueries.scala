package graft

import org.apache.spark.sql.functions._

/** Composite analytics in the TPC-H shapes — the end-to-end proof that the
  * operator inventory composes into the multi-join reporting queries the
  * reference deployment exists to serve (destination-engine surface [D],
  * SURVEY.md §2.4-2.7). Run both through the DataFrame API (q1, q3) and
  * the SQL entry point (q5 via [[Sql.query]]).
  *
  * Determinism: revenue terms are `extprice * (1 - disc)` computed in
  * double (bit-identical across engines) then cast to DECIMAL(18,4) —
  * the true value has ≤4 decimals, so the cast recovers it exactly and
  * the sum is order-independent.
  */
object TpchQueries extends QueryPack {

  private val revenue =
    (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")

  val queries: Map[String, Q] = Map(
    // Q1 shape: pricing summary with filter + multi-aggregate.
    "q_tpch_q1" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"),
             sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
               .as("sum_base_price"),
             sum(revenue).cast("double").as("sum_disc_price"),
             round(avg("l_discount"), 6).as("avg_disc"),
             count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Q3 shape: 3-way join, grouped revenue, top-10.
    "q_tpch_q3" -> ((s, dir) => {
      val cutoff = lit("1998-06-30").cast("timestamp")
      Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < cutoff)
        .join(Tables(s, dir, "lineitem"),
              col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("revenue").desc_nulls_last, col("l_orderkey"))
        .limit(10)
    }),

    // Scalar subquery (decorrelated by Catalyst to a join — SURVEY.md §4).
    "q_subquery_scalar" -> ((s, dir) => Sql.query(s, dir,
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) * 2 FROM orders)
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin)),

    // IN subquery.
    "q_subquery_in" -> ((s, dir) => Sql.query(s, dir,
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey IN (
        |  SELECT n_nationkey FROM nation
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA')
        |ORDER BY c_custkey NULLS FIRST""".stripMargin)),

    // Correlated EXISTS with an extra correlated predicate.
    "q_subquery_corr" -> ((s, dir) => Sql.query(s, dir,
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > c_acctbal * 10)
        |ORDER BY c_custkey NULLS FIRST""".stripMargin)),

    // Q6 shape: scan-heavy filtered scalar aggregate (the forecast-revenue
    // query — pure pushdown + map-side sum, no shuffle beyond the final
    // single-row combine).
    "q_tpch_q6" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
                col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
                   .cast("decimal(18,4)")).cast("double").as("revenue"))),

    // Q18 shape: large-volume customers — aggregate lineitem first (the
    // small side AFTER reduction), then join orders + customer. The
    // group-before-join order is the 100 TB plan: the having-filtered
    // aggregate shrinks 6 B rows to the few large orders before any join.
    "q_tpch_q18" -> ((s, dir) => {
      val big = Tables(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("sum_qty"))
        .filter(col("sum_qty") > 300)
      Tables(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables(s, dir, "customer"),
              col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
                col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey"))
    }),

    // Q10 shape: returned-item revenue per customer, top 20 — the
    // "problem customers" report (3-way join, R-flag filter, grouped
    // revenue, bounded output).
    "q_tpch_q10" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"),
              col("c_custkey") === col("o_custkey"))
        .join(Tables(s, dir, "lineitem"),
              col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_returnflag") === "R")
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("revenue").desc_nulls_last, col("c_custkey"))
        .limit(20)),

    // Q4 shape: order-priority counts for orders with late first shipment
    // (> 30 days after order date). Aggregate lineitem to min shipdate per
    // order FIRST (map-side shrink), then one equi-join — the EXISTS
    // decorrelation done by hand.
    "q_tpch_q4" -> ((s, dir) => {
      val firstShip = Tables(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(min("l_shipdate").as("first_ship"))
      Tables(s, dir, "orders")
        .join(firstShip, col("o_orderkey") === col("l_orderkey"))
        .filter(col("first_ship") > col("o_orderdate")
                  + expr("INTERVAL 30 DAYS"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late"))
        .orderBy("o_orderpriority")
    }),

    // Q14 shape: promo-revenue ratio — fact⋈dimension with a conditional
    // aggregate; part is broadcast, lineitem never shuffles.
    "q_tpch_q14" -> ((s, dir) => {
      val zero = lit(0).cast("decimal(18,4)")
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .join(broadcast(Tables(s, dir, "part")),
              col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
               sum(when(col("p_type") === "PROMO", revenue).otherwise(zero))
                 .cast("double") /
               sum(revenue).cast("double"), 6).as("promo_revenue"))
    }),

    // Q2 shape: min-cost supplier per part — a correlated aggregate
    // subquery that Catalyst decorrelates into an aggregate + join (the
    // lineitem relation plays partsupp's part↔supplier cost role in this
    // schema). Exercises decorrelation + join reorder over 5 relations.
    "q_tpch_q2" -> ((s, dir) => Sql.query(s, dir,
      """WITH europe_cost AS (
        |  SELECT l_partkey, l_suppkey, l_extendedprice
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey,
        |  ec.l_extendedprice AS cost
        |FROM part
        |JOIN europe_cost ec ON ec.l_partkey = p_partkey
        |JOIN supplier ON s_suppkey = ec.l_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE p_type = 'STANDARD' AND p_size < 25
        |  AND ec.l_extendedprice = (
        |    SELECT min(e2.l_extendedprice) FROM europe_cost e2
        |    WHERE e2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC NULLS LAST, n_name NULLS FIRST,
        |  s_name NULLS FIRST, p_partkey NULLS FIRST
        |LIMIT 100""".stripMargin)),

    // Q7 shape: volume shipping between two nations by year — the
    // two-role dimension join (nation as both supplier- and
    // customer-nation). Both nation sides are pre-filtered to the two
    // nations of interest and broadcast; only the pair filter that spans
    // both roles runs post-join.
    "q_tpch_q7" -> ((s, dir) => {
      val twoNations = Tables(s, dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val n1 = twoNations.select(col("n_nationkey").as("s_nkey"),
                                 col("n_name").as("supp_nation"))
      val n2 = twoNations.select(col("n_nationkey").as("c_nkey"),
                                 col("n_name").as("cust_nation"))
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate")
                  .between(lit("1995-01-01").cast("timestamp"),
                           lit("1996-12-31").cast("timestamp")))
        .join(Tables(s, dir, "orders"),
              col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"),
              col("o_custkey") === col("c_custkey"))
        .join(Tables(s, dir, "supplier"),
              col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === "NATION_1" &&
                 col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" &&
                 col("cust_nation") === "NATION_1"))
        .withColumn("l_year", year(col("l_shipdate")).cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q8 shape: national market share inside a region — 8-relation join
    // with nation in two roles feeding a conditional-share aggregate.
    "q_tpch_q8" -> ((s, dir) => Sql.query(s, dir,
      """SELECT o_year,
        |  round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
        |                      ELSE CAST(0 AS DECIMAL(18,4)) END)
        |             AS DOUBLE) /
        |        CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |      AS volume,
        |    n2.n_name AS nation
        |  FROM lineitem
        |  JOIN part     ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region   ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') t
        |GROUP BY o_year
        |ORDER BY o_year NULLS FIRST""".stripMargin)),

    // Q9 shape: product-type profit by nation and year — 5-relation join
    // with a computed profit measure (p_retailprice plays partsupp's cost
    // role at a fixed margin). part is filtered BEFORE the join (the
    // LIKE pushes to the scan) and all dims broadcast.
    "q_tpch_q9" -> ((s, dir) => {
      val gearParts = Tables(s, dir, "part")
        .filter(col("p_name").contains("gear"))
        .select("p_partkey", "p_retailprice")
      val amount =
        (col("l_extendedprice") * (lit(1) - col("l_discount"))
           - lit(0.6) * col("p_retailprice") * col("l_quantity"))
          .cast("decimal(18,4)")
      Tables(s, dir, "lineitem")
        .join(broadcast(gearParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables(s, dir, "supplier")),
              col("l_suppkey") === col("s_suppkey"))
        .join(Tables(s, dir, "orders"),
              col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables(s, dir, "nation")),
              col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
                year(col("o_orderdate")).cast("long").as("o_year"),
                amount.as("amount"))
        .groupBy("nation", "o_year")
        .agg(sum("amount").cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q13 shape: customer order-count distribution — left join with an
    // extra join-side predicate, then a two-level aggregate (per-customer
    // count → histogram of counts).
    "q_tpch_q13" -> ((s, dir) => {
      val perCust = Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"),
              col("c_custkey") === col("o_custkey") &&
                col("o_orderpriority") =!= "1-URGENT",
              "left")
        .groupBy("c_custkey")
        .agg(count("o_orderkey").as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q22 shape: above-average-balance customers with no urgent orders —
    // scalar aggregate subquery + correlated NOT EXISTS (anti join after
    // decorrelation), grouped by a derived country code.
    "q_tpch_q22" -> ((s, dir) => Sql.query(s, dir,
      """SELECT cntrycode, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM (
        |  SELECT c_nationkey % 5 AS cntrycode, c_acctbal FROM customer
        |  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                     WHERE c_acctbal > 0)
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |                    WHERE o_custkey = c_custkey
        |                      AND o_orderpriority = '1-URGENT')) t
        |GROUP BY cntrycode
        |ORDER BY cntrycode NULLS FIRST""".stripMargin)),

    // Q15 shape: top supplier by quarterly revenue — the revenue "view"
    // (group-before-join shrink) consumed twice: once for the join, once
    // for the scalar max the filter compares against.
    "q_tpch_q15" -> ((s, dir) => Sql.query(s, dir,
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                  AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey NULLS FIRST""".stripMargin)),

    // Q12 shape: shipping-delay priority split — late lines (shipped
    // > 60 days after order) classified into high/low priority counts
    // per return flag (the flag plays l_shipmode's role in this schema).
    // One equi-join + conditional counts; the shipdate year filter
    // pushes to the scan.
    "q_tpch_q12" -> ((s, dir) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables(s, dir, "orders"),
              col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate")
                  + expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
             sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // Q17 shape: small-quantity-order revenue — a correlated average
    // subquery per part (Catalyst decorrelates it to an aggregate +
    // join). The per-part average goes through DECIMAL so the 0.2×avg
    // threshold is order-independent in both engines.
    "q_tpch_q17" -> ((s, dir) => Sql.query(s, dir,
      """SELECT CAST(round(
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / 7.0, 4) AS DOUBLE) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
        |  AND l_quantity < (
        |    SELECT 0.2 * CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
        |                      AS DOUBLE) / count(*)
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""
        .stripMargin)),

    // Q19 shape: disjunctive OR-of-ANDs predicate spanning both join
    // sides — the pushdown stress case: each disjunct's part-only
    // conjuncts can prefilter the broadcast dim, the residual runs
    // post-join.
    "q_tpch_q19" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")),
              col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
             col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
             col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
             col("l_quantity").between(20, 30)))
        .agg(sum(revenue).cast("double").as("revenue"))),

    // Q21 shape: suppliers who kept finished orders waiting — the
    // hardest decorrelation in the suite: a correlated EXISTS (another
    // supplier contributed to the order) AND a correlated NOT EXISTS
    // (no OTHER supplier was late) with non-equality correlated
    // predicates, over multi-line orders. Late = shipped > 60 days
    // after order date.
    "q_tpch_q21" -> ((s, dir) => Sql.query(s, dir,
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC NULLS LAST, s_name NULLS FIRST
        |LIMIT 100""".stripMargin)),

    // Q11 shape: important-stock identification — grouped inventory value
    // per part within one nation, kept only above a scalar-subquery
    // threshold (a fraction of the nation's total). Supplier + nation are
    // broadcast dims; partsupp aggregates once per branch with map-side
    // combine; all arithmetic is exact integer cents (see
    // [[Tables.partsupp]]) so the threshold compare is order-independent.
    "q_tpch_q11" -> ((s, dir) => Sql.query(s, dir,
      """SELECT ps_partkey,
        |  sum(ps_supplycost_cents * ps_availqty) AS value_cents
        |FROM partsupp
        |JOIN supplier ON ps_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_19'
        |GROUP BY ps_partkey
        |HAVING sum(ps_supplycost_cents * ps_availqty) > (
        |  SELECT sum(ps_supplycost_cents * ps_availqty) * 0.0001
        |  FROM partsupp
        |  JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_19')
        |ORDER BY value_cents DESC NULLS LAST,
        |  ps_partkey NULLS FIRST""".stripMargin)),

    // Q16 shape: supplier-part-type counts — count-distinct suppliers per
    // (brand, type, size) bucket excluding a NOT-IN supplier denylist
    // (negative balance plays the official "Customer Complaints" comment
    // filter's role in this schema — supplier has no comment column).
    // The NOT IN decorrelates to a null-aware anti join; the denylist
    // side is tiny and broadcasts.
    "q_tpch_q16" -> ((s, dir) => Sql.query(s, dir,
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp
        |JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
        |  AND ps_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC NULLS LAST, p_brand NULLS FIRST,
        |  p_type NULLS FIRST, p_size NULLS FIRST""".stripMargin)),

    // Q20 shape: potential part promotion — suppliers in one nation whose
    // stock of a name-matched part exceeds half their shipped quantity
    // that year. Nested IN chains + a doubly-correlated scalar aggregate
    // (Catalyst decorrelates it to a grouped join on both correlation
    // keys); the year filter pushes to the lineitem scan. s_acctbal
    // stands in for the schema's missing s_address in the output.
    "q_tpch_q20" -> ((s, dir) => Sql.query(s, dir,
      """SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_8'
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM partsupp
        |    WHERE ps_partkey IN (
        |        SELECT p_partkey FROM part WHERE p_name LIKE '%gear%')
        |      AND ps_availqty > (
        |        SELECT 0.5 * sum(l_quantity) FROM lineitem
        |        WHERE l_partkey = ps_partkey
        |          AND l_suppkey = ps_suppkey
        |          AND l_shipdate >= TIMESTAMP '1997-01-01'
        |          AND l_shipdate < TIMESTAMP '1998-01-01'))
        |ORDER BY s_name NULLS FIRST""".stripMargin)),

    // Q5 shape: 6-way star join through the SQL entry point.
    "q_tpch_q5" -> ((s, dir) => Sql.query(s, dir,
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |             AND c_nationkey = s_nationkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC NULLS LAST, n_name NULLS FIRST""".stripMargin))
  )

  /** DuckDB rebuild of the synthesized partsupp relation — must mirror
    * [[Tables.partsupp]] bit-for-bit (same md5-prefix hashes, same
    * integer-cent cost). Prefixed onto the Q11/Q16/Q20 oracles.
    */
  private val partsuppCte =
    """WITH partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    CAST(CAST(concat('0x', substring(md5(concat_ws('_',
      |           ps_partkey, ps_suppkey)), 1, 8)) AS BIGINT) % 9999 + 1
      |         AS INTEGER) AS ps_availqty,
      |    CAST(concat('0x', substring(md5(concat_ws('#',
      |           ps_suppkey, ps_partkey)), 1, 8)) AS BIGINT) % 99900 + 100
      |      AS ps_supplycost_cents
      |  FROM (SELECT DISTINCT l_partkey AS ps_partkey,
      |                        l_suppkey AS ps_suppkey FROM lineitem))
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_tpch_q11" -> (partsuppCte +
      """SELECT ps_partkey,
        |  CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT)
        |    AS value_cents
        |FROM partsupp
        |JOIN supplier ON ps_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_19'
        |GROUP BY ps_partkey
        |HAVING sum(ps_supplycost_cents * ps_availqty) > (
        |  SELECT sum(ps_supplycost_cents * ps_availqty) * 0.0001
        |  FROM partsupp
        |  JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_19')
        |ORDER BY value_cents DESC NULLS LAST,
        |  ps_partkey NULLS FIRST""".stripMargin),

    "q_tpch_q16" -> (partsuppCte +
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp
        |JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
        |  AND ps_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC NULLS LAST, p_brand NULLS FIRST,
        |  p_type NULLS FIRST, p_size NULLS FIRST""".stripMargin),

    "q_tpch_q20" -> (partsuppCte +
      """SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_8'
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM partsupp
        |    WHERE ps_partkey IN (
        |        SELECT p_partkey FROM part WHERE p_name LIKE '%gear%')
        |      AND ps_availqty > (
        |        SELECT 0.5 * sum(l_quantity) FROM lineitem
        |        WHERE l_partkey = ps_partkey
        |          AND l_suppkey = ps_suppkey
        |          AND l_shipdate >= TIMESTAMP '1997-01-01'
        |          AND l_shipdate < TIMESTAMP '1998-01-01'))
        |ORDER BY s_name NULLS FIRST""".stripMargin),

    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30'
        |  AND l_shipdate > TIMESTAMP '1998-06-30'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC NULLS LAST, l_orderkey NULLS FIRST
        |LIMIT 10""".stripMargin,

    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) * 2 FROM orders)
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin,

    "q_subquery_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey IN (
        |  SELECT n_nationkey FROM nation
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA')
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_subquery_corr" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > c_acctbal * 10)
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC NULLS LAST,
        |         o_orderkey NULLS FIRST""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_mktsegment
        |ORDER BY revenue DESC NULLS LAST, c_custkey NULLS FIRST
        |LIMIT 20""".stripMargin,

    "q_tpch_q4" ->
      """WITH fs AS (
        |  SELECT l_orderkey, min(l_shipdate) AS first_ship
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderpriority, count(*) AS n_late
        |FROM orders JOIN fs ON o_orderkey = l_orderkey
        |WHERE first_ship > o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin,

    "q_tpch_q14" ->
      """SELECT round(100.0 *
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                AS DECIMAL(18,4))) AS DOUBLE), 6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,

    "q_tpch_q2" ->
      """WITH europe_cost AS (
        |  SELECT l_partkey, l_suppkey, l_extendedprice
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey,
        |  ec.l_extendedprice AS cost
        |FROM part
        |JOIN europe_cost ec ON ec.l_partkey = p_partkey
        |JOIN supplier ON s_suppkey = ec.l_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE p_type = 'STANDARD' AND p_size < 25
        |  AND ec.l_extendedprice = (
        |    SELECT min(e2.l_extendedprice) FROM europe_cost e2
        |    WHERE e2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC NULLS LAST, n_name NULLS FIRST,
        |  s_name NULLS FIRST, p_partkey NULLS FIRST
        |LIMIT 100""".stripMargin,

    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN (SELECT n_nationkey AS s_nkey, n_name AS supp_nation
        |      FROM nation) a ON s_nationkey = s_nkey
        |JOIN (SELECT n_nationkey AS c_nkey, n_name AS cust_nation
        |      FROM nation) b ON c_nationkey = c_nkey
        |WHERE ((supp_nation = 'NATION_1' AND cust_nation = 'NATION_2') OR
        |       (supp_nation = 'NATION_2' AND cust_nation = 'NATION_1'))
        |  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01'
        |                     AND TIMESTAMP '1996-12-31'
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation NULLS FIRST, cust_nation NULLS FIRST,
        |  l_year NULLS FIRST""".stripMargin,

    "q_tpch_q8" ->
      """SELECT o_year,
        |  round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
        |                      ELSE CAST(0 AS DECIMAL(18,4)) END)
        |             AS DOUBLE) /
        |        CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |      AS volume,
        |    n2.n_name AS nation
        |  FROM lineitem
        |  JOIN part     ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region   ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') t
        |GROUP BY o_year
        |ORDER BY o_year NULLS FIRST""".stripMargin,

    "q_tpch_q9" ->
      """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount)
        |         - 0.6 * p_retailprice * l_quantity AS DECIMAL(18,4))
        |      AS amount
        |  FROM lineitem
        |  JOIN part     ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%gear%') t
        |GROUP BY nation, o_year
        |ORDER BY nation NULLS FIRST, o_year DESC NULLS LAST""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST"""
        .stripMargin,

    "q_tpch_q22" ->
      """SELECT cntrycode, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM (
        |  SELECT c_nationkey % 5 AS cntrycode, c_acctbal FROM customer
        |  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                     WHERE c_acctbal > 0)
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |                    WHERE o_custkey = c_custkey
        |                      AND o_orderpriority = '1-URGENT')) t
        |GROUP BY cntrycode
        |ORDER BY cntrycode NULLS FIRST""".stripMargin,

    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                  AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey NULLS FIRST""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q_tpch_q17" ->
      """SELECT CAST(round(
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / 7.0, 4) AS DOUBLE) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
        |  AND l_quantity < (
        |    SELECT 0.2 * CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
        |                      AS DOUBLE) / count(*)
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    "q_tpch_q19" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC NULLS LAST, s_name NULLS FIRST
        |LIMIT 100""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC NULLS LAST, n_name NULLS FIRST""".stripMargin
  )
}
