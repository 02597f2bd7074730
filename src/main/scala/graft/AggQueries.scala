package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY.md §2.5, A1-A9). Grouping keys come from the
  * reference schema (`account_type` `/root/reference/README.md:99`, time
  * buckets from the DateTime columns `README.md:172-173`).
  *
  * All aggregates here are hash aggregates with map-side partial
  * aggregation (Spark default) — one shuffle of the (small) group-key
  * space, never of raw rows.
  */
/** Shared Cramer's-rule formula text for `q_agg_ols`: the Spark query and
  * the DuckDB oracle evaluate the IDENTICAL expression tree over the same
  * exact decimal sums, so the double results are bit-identical (both
  * engines parse the same left-associative arithmetic to the same IEEE
  * operation sequence).
  */
private[graft] object OlsFormula {
  /** Cast the nine exact DECIMAL(38,0) sums to double (all < 2^53, so the
    * casts themselves are exact). */
  val castDoubles: Seq[String] = Seq(
    "n", "sq", "sd", "sp", "sqq", "sdd", "sqd", "sqp", "sdp")
    .map(c => s"CAST($c AS DOUBLE) AS $c")

  private val det =
    "(n*(sqq*sdd - sqd*sqd) - sq*(sq*sdd - sqd*sd) + sd*(sq*sqd - sqq*sd))"
  private val det0 =
    "(sp*(sqq*sdd - sqd*sqd) - sq*(sqp*sdd - sqd*sdp) + sd*(sqp*sqd - sqq*sdp))"
  private val det1 =
    "(n*(sqp*sdd - sqd*sdp) - sp*(sq*sdd - sqd*sd) + sd*(sq*sdp - sqp*sd))"
  private val det2 =
    "(n*(sqq*sdp - sqp*sqd) - sq*(sq*sdp - sqp*sd) + sp*(sq*sqd - sqq*sd))"

  /** Coefficients as floor(b * 10^4) integers: b0 intercept (cents),
    * b1 cents per quantity unit, b2 cents per discount percent. */
  val outputs: Seq[String] = Seq(
    s"CAST(floor($det0 / $det * 10000) AS BIGINT) AS b0_e4",
    s"CAST(floor($det1 / $det * 10000) AS BIGINT) AS b1_e4",
    s"CAST(floor($det2 / $det * 10000) AS BIGINT) AS b2_e4",
    "CAST(n AS BIGINT) AS n")
}

/** Shared formula text for `q_agg_skew_kurt` (ClickHouse skewPop /
  * kurtPop analogs): population central moments from exact DECIMAL(38,0)
  * power sums, the [[OlsFormula]] discipline — both engines parse the
  * IDENTICAL left-associative arithmetic over the identical exact
  * integers, so the doubles (and their floor(×10⁴) grid points) match
  * bit-for-bit. pow() is avoided on purpose: m2^1.5 is written
  * m2·sqrt(m2) because sqrt is a correctly-rounded IEEE primitive in
  * both engines while pow carries no such guarantee.
  */
private[graft] object SkewKurtFormula {
  /** Exact power sums over integerized values (v ≤ 50 ⇒ v⁴ ≤ 6.25e6 in
    * BIGINT; the DECIMAL(38,0) sums stay exact at any row count). */
  val momentAggs: Seq[String] = Seq(
    "CAST(count(*) AS DECIMAL(38,0)) AS n",
    "sum(CAST(v AS DECIMAL(38,0))) AS s1",
    "sum(CAST(v * v AS DECIMAL(38,0))) AS s2",
    "sum(CAST(v * v * v AS DECIMAL(38,0))) AS s3",
    "sum(CAST(v * v * v * v AS DECIMAL(38,0))) AS s4")

  private val nD = "CAST(n AS DOUBLE)"
  private val mean = s"(CAST(s1 AS DOUBLE) / $nD)"
  private val m2 =
    s"((CAST(s2 AS DOUBLE) / $nD) - $mean * $mean)"
  private val m3 =
    s"((CAST(s3 AS DOUBLE) / $nD) - 3.0 * $mean * " +
    s"(CAST(s2 AS DOUBLE) / $nD) + 2.0 * $mean * $mean * $mean)"
  private val m4 =
    s"((CAST(s4 AS DOUBLE) / $nD) - 4.0 * $mean * " +
    s"(CAST(s3 AS DOUBLE) / $nD) + 6.0 * $mean * $mean * " +
    s"(CAST(s2 AS DOUBLE) / $nD) - 3.0 * $mean * $mean * $mean * $mean)"

  val outputs: Seq[String] = Seq(
    "CAST(n AS BIGINT) AS n",
    s"CAST(floor($m3 / ($m2 * sqrt($m2)) * 10000) AS BIGINT) AS skew_e4",
    s"CAST(floor($m4 / ($m2 * $m2) * 10000) AS BIGINT) AS kurt_e4")

  /** Degenerate-group guard, stated identically in both engines: the
    * ratios divide by m2, so a constant-valued group (m2 = 0) is
    * excluded rather than engine-dependently Inf/NaN-floored. */
  val guard: String = s"$m2 > 0"
}

object AggQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // A1: classic multi-aggregate by key (TPC-H Q1 shape).
    "q_agg_basic" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
             sum("l_quantity").as("sum_qty"),
             round(avg("l_quantity"), 4).as("avg_qty"),
             sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
               .as("sum_price"),
             min("l_extendedprice").as("min_price"),
             max("l_extendedprice").as("max_price"))
        .orderBy("l_returnflag", "l_linestatus")),

    // A2: global (no-group) aggregate.
    "q_agg_global" -> ((s, dir) =>
      Tables(s, dir, "events")
        .agg(count(lit(1)).as("n"),
             countDistinct(col("user_id")).as("n_users"),
             round(sum("value"), 4).as("sum_value"),
             min("ts").as("min_ts"),
             max("ts").as("max_ts"))),

    // A3: exact COUNT DISTINCT by key.
    "q_agg_count_distinct" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
             countDistinct(col("l_partkey")).as("n_part"))
        .orderBy("l_returnflag")),

    // A4: approximate distinct (HLL++), driver-oracled as an accuracy
    // certificate: the exact count rides along in the same hash
    // aggregate (one extra distinct-agg, certificate-only) and the
    // estimate — deterministic given the data — is pinned within 10% of
    // it (default rsd 0.05; measured ≤3% at every harness SF). n_exact
    // is a real cross-engine row, the flag is the pinned guarantee.
    "q_agg_approx_distinct" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_suppkey")).as("approx_supp"),
             countDistinct(col("l_suppkey")).as("n_exact"))
        .select(col("l_returnflag"), col("n_exact"),
                (abs(col("approx_supp") - col("n_exact")) * lit(10)
                   <= col("n_exact")).cast("long")
                  .as("approx_within_10pct"))
        .orderBy("l_returnflag")),

    // A5: ROLLUP.
    "q_agg_rollup" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)),

    // A5: CUBE.
    "q_agg_cube" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)),

    // A6: filtered/conditional aggregates.
    "q_agg_conditional" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(round(sum(when(col("event_type") === "purchase", col("value"))), 4)
               .as("purchase_total"),
             count(when(col("event_type") === "error", lit(1))).as("n_errors"))
        .orderBy("user_id")),

    // A7: time-bucket aggregate (ClickHouse toStartOfDay idiom).
    "q_agg_by_day" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy("day")),

    // ClickHouse corrMatrix analog: every pairwise Pearson correlation
    // of four lineitem measures in ONE hash aggregate (six corr()
    // states computed side by side — one pass, no joins).
    "q_agg_corr_matrix" -> ((s, dir) => {
      val m = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for {
        i <- m.indices; j <- m.indices if i < j
      } yield round(corr(col(m(i)), col(m(j))), 4)
        .as(s"c_${m(i).drop(2)}_${m(j).drop(2)}")
      Tables(s, dir, "lineitem").agg(pairs.head, pairs.tail: _*)
    }),

    // Closed-form multiple linear regression (the deterministic batch
    // form of ClickHouse stochasticLinearRegression, and the multivariate
    // generalization of q_agg_regr): y = extendedprice-cents on
    // (quantity, discount-percent). ONE hash aggregate computes the nine
    // normal-equation sums EXACTLY (integerized inputs, DECIMAL(38,0) —
    // order-independent), then Cramer's rule solves the 3x3 system in
    // double arithmetic over those exact sums; every double op is the
    // same IEEE expression tree in both engines (the sums are < 2^53 so
    // even the decimal->double casts are exact), so the coefficients are
    // bit-identical and ship as floor(b*10^4) integers. Linear scan +
    // map-side combine — the 100 TB shape for closed-form OLS.
    "q_agg_ols" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select(expr("CAST(round(l_quantity) AS BIGINT)").as("q"),
                expr("CAST(round(l_discount * 100) AS BIGINT)").as("d"),
                expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
                  .as("p"))
        .agg(expr("CAST(count(*) AS DECIMAL(38,0))").as("n"),
             expr("sum(CAST(q AS DECIMAL(38,0)))").as("sq"),
             expr("sum(CAST(d AS DECIMAL(38,0)))").as("sd"),
             expr("sum(CAST(p AS DECIMAL(38,0)))").as("sp"),
             expr("sum(CAST(q * q AS DECIMAL(38,0)))").as("sqq"),
             expr("sum(CAST(d * d AS DECIMAL(38,0)))").as("sdd"),
             expr("sum(CAST(q * d AS DECIMAL(38,0)))").as("sqd"),
             expr("sum(CAST(q * p AS DECIMAL(38,0)))").as("sqp"),
             expr("sum(CAST(d * p AS DECIMAL(38,0)))").as("sdp"))
        .select(OlsFormula.castDoubles.map(expr): _*)
        .select(OlsFormula.outputs.map(expr): _*)),

    // ClickHouse avgWeighted(x, w): quantity-weighted mean unit price per
    // return flag. Both sums exact DECIMAL over integerized inputs; the
    // single double division + floor is engine-identical.
    "q_agg_avg_weighted" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)" +
               " * CAST(round(l_quantity) AS BIGINT) AS DECIMAL(38,0)))")
               .as("swx"),
             expr("sum(CAST(CAST(round(l_quantity) AS BIGINT)" +
               " AS DECIMAL(38,0)))").as("sw"))
        .select(col("l_returnflag"),
                expr("CAST(floor(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE)" +
                  " * 10000) AS BIGINT)").as("wavg_cents_e4"))
        .orderBy("l_returnflag")),

    // ClickHouse covarSampMatrix analog — corrMatrix's sibling: all six
    // pairwise sample covariances of four measures in ONE hash
    // aggregate. Built-in covar_samp's partial-merge order differs
    // between engines, so its binary result carries engine-specific
    // low-bit noise and NO rounding scheme is robust; instead the
    // moments are EXACT DECIMAL sums over integerized inputs and
    // cv = (Σxy − ΣxΣy/n)/(n−1) evaluates as the identical IEEE
    // expression over those exact sums in both engines — the OlsFormula
    // discipline. Unit scales are PER MEASURE: quantity stays in its
    // natural integral unit while the 2-dp measures take ×100, so every
    // DECIMAL sum cast to double stays below 2^53 even at SF10 (the
    // largest cross-moment, quantity×price-cents, is ~1e8/row) — above
    // 2^53 DuckDB's two-step hugeint→double conversion is not
    // guaranteed correctly rounded like BigDecimal.doubleValue, and a
    // 1-ulp divergence could flip the floor. The output keeps the
    // floor(cv·10⁴) contract: each pair's covariance is brought to ×10⁴
    // natural units by one exact-power scale multiply BEFORE the floor
    // (a single IEEE op, identical in both engines).
    "q_agg_covar_matrix" -> ((s, dir) => {
      val m = Seq("l_quantity" -> 1, "l_extendedprice" -> 100,
                  "l_discount" -> 100, "l_tax" -> 100)
      val ints = m.map { case (c, u) =>
        expr(s"CAST(round($c * $u) AS BIGINT)").as(c.drop(2)) }
      val names = m.map(_._1.drop(2))
      val units = m.map(_._2)
      val sums =
        expr("CAST(count(*) AS DECIMAL(38,0))").as("n") +:
        names.map(c => expr(s"sum(CAST($c AS DECIMAL(38,0)))")
                         .as(s"s_$c")) ++:
        (for { i <- names.indices; j <- names.indices if i < j }
          yield expr(s"sum(CAST(${names(i)} * ${names(j)}" +
                       s" AS DECIMAL(38,0)))")
            .as(s"sp_${names(i)}_${names(j)}"))
      val outs = for {
        i <- names.indices; j <- names.indices if i < j
      } yield {
        val (a, b) = (names(i), names(j))
        // the pair's integer covariance is in (ua·ub) units; scale to
        // the contract's ×10⁴ before flooring
        val mult = 10000 / (units(i) * units(j))
        expr(s"CAST(floor(((CAST(sp_${a}_$b AS DOUBLE) - " +
          s"CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE) / " +
          s"CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) * $mult) " +
          s"AS BIGINT)").as(s"cv_${a}_$b")
      }
      Tables(s, dir, "lineitem")
        .select(ints: _*)
        .agg(sums.head, sums.tail: _*)
        .select(outs: _*)
    }),

    // Higher-moment shape statistics — ClickHouse skewPop/kurtPop
    // analogs per group, the distribution-shape profile a metrics
    // pipeline reports next to avg/stddev. ONE hash aggregate builds
    // exact DECIMAL(38,0) power sums (map-side combinable, order-
    // invariant integers); skewness and kurtosis come from the shared
    // [[SkewKurtFormula]] closed form over those sums, floor-gridded
    // to e4 — the q_agg_ols / covar-matrix discipline.
    "q_agg_skew_kurt" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
                expr("CAST(round(l_quantity) AS BIGINT)").as("v"))
        .groupBy("l_returnflag")
        .agg(expr(SkewKurtFormula.momentAggs.head),
             SkewKurtFormula.momentAggs.tail.map(expr): _*)
        .filter(expr(SkewKurtFormula.guard))
        .select(col("l_returnflag") +:
                SkewKurtFormula.outputs.map(expr): _*)
        .orderBy("l_returnflag")),

    // Per-group winsorization — the outlier-clipping pass of a metrics /
    // curation pipeline: exact p05/p95 per event_type (on integer
    // ten-thousandths), bounds INTEGERIZED (ceil lo / floor hi) so every
    // clipped value is an exact integer and the winsorized sum is
    // order-independent BIGINT arithmetic. The 5-row bounds table
    // broadcasts back; values never shuffle twice.
    "q_agg_winsorize" -> ((s, dir) => {
      // The p05/p95 interpolation is computed in EXACT integer
      // arithmetic over the two bracketing order statistics (p = 1/20
      // and 19/20 make the interpolation fraction m/20 an exact
      // rational), so both engines land on the identical integer bound —
      // a built-in interpolated percentile would expose the
      // ulp-straddles-the-ceil/floor-boundary divergence class the
      // q_win_time_decay_family fix documented. Values are shifted
      // non-negative first so `div` (truncation) IS floor division in
      // both engines. The rank lookup runs over the DISTINCT-VALUE
      // prefix counts (the q_agg_ks_test idiom) — the per-type window
      // holds one row per distinct value (bounded domain), never one
      // per event.
      val e = Tables(s, dir, "events")
        .select(col("event_type"),
                expr("CAST(round(value * 10000) AS BIGINT)").as("v"))
      val d = e.groupBy("event_type", "v").agg(count(lit(1)).as("c"))
      val cum = d.withColumn("cum",
        sum("c").over(Window.partitionBy("event_type").orderBy("v")))
      val tot = d.groupBy("event_type")
        .agg(sum("c").as("n"), min("v").as("mn"))
      val bounds = cum.join(broadcast(tot), "event_type")
        .withColumn("w", col("v") - col("mn"))
        .groupBy("event_type")
        .agg(first("n").as("n"), first("mn").as("mn"),
             min(when(col("cum") >= expr("(n - 1) div 20 + 1"),
                      col("w"))).as("lo1"),
             min(when(col("cum") >=
                        expr("least((n - 1) div 20 + 2, n)"),
                      col("w"))).as("lo2"),
             min(when(col("cum") >= expr("(19 * (n - 1)) div 20 + 1"),
                      col("w"))).as("hi1"),
             min(when(col("cum") >=
                        expr("least((19 * (n - 1)) div 20 + 2, n)"),
                      col("w"))).as("hi2"))
        .select(col("event_type"),
          expr("(lo1 * (20 - (n - 1) % 20) + lo2 * ((n - 1) % 20)" +
            " + 19) div 20 + mn").as("lo"),
          expr("(hi1 * (20 - (19 * (n - 1)) % 20)" +
            " + hi2 * ((19 * (n - 1)) % 20)) div 20 + mn").as("hi"))
      e.join(broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(min("lo").as("lo"), min("hi").as("hi"),
             count(when(col("v") < col("lo"), 1)).as("n_lo"),
             count(when(col("v") > col("hi"), 1)).as("n_hi"),
             sum(least(greatest(col("v"), col("lo")), col("hi")))
               .cast("long").as("sum_winsorized"))
        .orderBy("event_type")
    }),

    // ClickHouse groupArraySorted(N): the N smallest values per group as
    // a sorted list. The cap runs BEFORE any collection through the
    // salted two-phase top-k (a hot group crosses 16 salt slices, each
    // bounded to N survivors), so no aggregation buffer ever holds more
    // than N rows — the hot-key-safe form of a bounded collect.
    "q_agg_group_array_sorted" -> ((s, dir) =>
      // Values integerized to ten-thousandths (the q_agg_winsorize
      // idiom) and the list serialized to a ","-joined string (the
      // q_agg_collect convention) so the cross-engine comparator can
      // sort and hash the output column.
      Relational.topKPerGroupSalted(
          Tables(s, dir, "events")
            .select(col("event_type"), col("event_id"),
                    expr("CAST(round(value * 10000) AS BIGINT)").as("v")),
          Seq("event_type"),
          Seq(col("v").asc, col("event_id").asc), 5,
          xxhash64(col("event_id")))
        .groupBy("event_type")
        .agg(array_join(
               expr("transform(array_sort(collect_list(" +
                 "struct(v, event_id))), x -> CAST(x.v AS STRING))"), ",")
               .as("smallest5"))
        .orderBy("event_type")),

    // ClickHouse retention(cond1, cond2, …) in its literal form: per
    // user the flag vector (did c1, did c1∧c2, did c1∧c3, …), summed
    // over users — one conditional hash aggregate per user, one tiny
    // global rollup.
    "q_retention_conditions" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "signup", 1).otherwise(0))
               .as("r1"),
             max(when(col("event_type") === "click", 1).otherwise(0))
               .as("h2"),
             max(when(col("event_type") === "purchase", 1).otherwise(0))
               .as("h3"))
        .agg(sum("r1").cast("long").as("n_signup"),
             sum(col("r1") * col("h2")).cast("long").as("n_signup_click"),
             sum(col("r1") * col("h3")).cast("long")
               .as("n_signup_purchase"))),

    // Exact per-day segment overlap (the set algebra q_theta_segments
    // approximates, here exact): click∩purchase visitor counts via
    // inclusion-exclusion over THREE conditional count-distincts in one
    // hash aggregate — no join, no bitmap materialization.
    "q_agg_segment_overlap" -> ((s, dir) =>
      Tables(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(countDistinct(when(col("event_type") === "click",
                                col("user_id"))).as("n_click"),
             countDistinct(when(col("event_type") === "purchase",
                                col("user_id"))).as("n_buy"),
             countDistinct(col("user_id")).as("n_union"))
        .select(col("day"), col("n_click"), col("n_buy"),
                (col("n_click") + col("n_buy") - col("n_union"))
                  .as("n_both"),
                col("n_union"))
        .orderBy("day")),

    // Rolling 7-day distinct users per day — exact sliding-window uniq
    // WITHOUT a self-join: each (day, user) observation explodes to the
    // <= 7 window-end days it can serve (bounded constant fan-out), one
    // hash aggregate per day counts distinct users. The inner distinct
    // pre-shrinks the explode input to one row per (day, user).
    "q_agg_rolling_distinct" -> ((s, dir) => {
      val du = Tables(s, dir, "events")
        .select(date_trunc("day", col("ts")).as("d"), col("user_id"))
        .distinct()
      du.withColumn("gday",
          explode(sequence(col("d"), col("d") + expr("INTERVAL 6 DAYS"),
                           expr("INTERVAL 1 DAY"))))
        .groupBy("gday")
        .agg(countDistinct("user_id").as("u7"))
        .join(du.select(col("d").as("gday")).distinct(), Seq("gday"))
        .orderBy("gday")
    }),

    // User-journey paths: each user's first five event types as a
    // ">"-joined path, counted by shape. The per-user "first 5" runs
    // the two-phase salted cap ([[Relational.topKPerGroupSalted]]) so a
    // bot entity never funnels its history through one window task;
    // the collect after it holds <= 5 rows per user by construction.
    "q_path_analysis" -> ((s, dir) => {
      val first5 = Relational.topKPerGroupSalted(
        Tables(s, dir, "events")
          .select("user_id", "ts", "event_id", "event_type"),
        Seq("user_id"), Seq(col("ts"), col("event_id")), 5,
        pmod(col("event_id"), lit(16)))
      first5.groupBy("user_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
                                           col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(desc("n_users"), col("path"))
    }),

    // A8: arg-max (value at max version — U1's aggregate form).
    "q_agg_max_by" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(max_by(col("event_type"), col("ts")).as("last_type"),
             max(col("ts")).as("last_ts"))
        .orderBy("user_id")),

    // A9: order-stabilized collect.
    "q_agg_collect" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(array_join(array_sort(collect_list(col("event_type"))), ",")
               .as("types"))
        .orderBy("user_id")),

    // Statistical aggregates (stddev/variance/correlation/covariance).
    "q_agg_stats" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
             round(var_samp(col("l_quantity")), 4).as("var_qty"),
             (round(corr(col("l_quantity"), col("l_discount")), 4) + lit(0.0))
               .as("corr_qd"),
             (round(covar_samp(col("l_quantity"), col("l_discount")), 4) + lit(0.0))
               .as("cov_qd"))
        .orderBy("l_returnflag")),

    // Deterministic mode — most frequent value per group with an explicit
    // smallest-value tie-break (built-in mode() is tie-arbitrary in both
    // engines, so it can't be oracle-checked). Two hash aggregates: the
    // value histogram, then max_by over (count, -value) — never a window
    // over raw rows.
    // ClickHouse uniqUpTo(N) analog: the EXACT distinct count while it
    // is <= N, the sentinel N+1 once it exceeds it — the "how many,
    // unless many" cardinality probe. least() over the two-phase exact
    // distinct (map-side partial dedup); day grid gives both regimes
    // (some (type, day) groups under the cap, some over).
    "q_agg_uniq_upto" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(least(countDistinct(col("user_id")), lit(11L)).cast("long")
               .as("uniq_upto_10"))
        .orderBy("event_type", "d")),

    // ClickHouse deltaSum analog: per entity, the sum of POSITIVE
    // steps between consecutive time-ordered values (counter-reset
    // tolerant accumulation — the monotone-counter reading). One
    // per-entity window pass + one hash aggregate.
    "q_agg_delta_sum" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables(s, dir, "events")
        .withColumn("__d", col("value") - lag("value", 1).over(w))
        .groupBy("user_id")
        .agg(round(sum(when(col("__d") > 0, col("__d")).otherwise(0.0)), 4)
               .as("delta_sum"))
        .orderBy("user_id")
    }),

    "q_agg_mode" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("c"))
        .groupBy("l_returnflag")
        .agg(max_by(col("l_quantity"),
                    struct(col("c"), (-col("l_quantity")).as("nq")))
               .as("mode_qty"),
             max("c").as("mode_n"))
        .orderBy("l_returnflag")),

    // Linear-regression aggregates (PostgreSQL regr_* surface — the
    // destination-engine analytics the reference's consumers run on
    // numeric pairs). Single-pass moment aggregates, rounded for
    // cross-engine float parity like q_agg_stats.
    "q_agg_regr" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg((round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
                + lit(0.0)).as("slope"),
             (round(regr_intercept(col("l_extendedprice"),
                                   col("l_quantity")), 4)
                + lit(0.0)).as("intercept"),
             (round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
                + lit(0.0)).as("r2"),
             regr_count(col("l_extendedprice"), col("l_quantity"))
               .cast("long").as("n"))
        .orderBy("l_returnflag")),

    // ClickHouse sumMap analog: per entity, the map event_type → sum(value)
    // as aligned sorted key/value lists. Two hash aggregates — the inner
    // one owns the numeric sum (DECIMAL → exact integer ten-thousandths,
    // so the joined string is bit-portable), the outer collects the small
    // per-entity key set. Values never pass through double→string.
    "q_agg_summap" -> ((s, dir) => {
      val per = Tables(s, dir, "events")
        .groupBy("user_id", "event_type")
        .agg((sum(col("value").cast("decimal(18,4)")) * 10000)
               .cast("long").as("v"))
      per.groupBy("user_id")
        .agg(array_join(array_sort(collect_list(col("event_type"))), ",")
               .as("ks"),
             array_join(
               transform(
                 array_sort(collect_list(struct(col("event_type").as("k"),
                                                col("v").as("v")))),
                 e => e.getField("v").cast("string")), ",").as("vs"))
        .orderBy("user_id")
    }),

    // ClickHouse histogram analog in its portable fixed-bin form
    // (adaptive bin placement is merge-order-dependent, so the
    // deterministic contract is equal-width bins over each group's
    // range): 10 bins of value per event type as a "bin:count" list.
    // Two hash aggregates + a broadcast of the tiny bounds table; the
    // bin expression is one fixed IEEE computation.
    "q_agg_histogram" -> ((s, dir) => {
      val e = Tables(s, dir, "events").filter(col("value").isNotNull)
      val bounds = e.groupBy("event_type")
        .agg(min("value").as("mn"), max("value").as("mx"))
      e.join(broadcast(bounds), "event_type")
        .withColumn("bin",
          when(col("mx") === col("mn"), 0)
            .otherwise(least(lit(9),
              floor((col("value") - col("mn")) /
                      (col("mx") - col("mn")) * 10).cast("int"))))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
        .groupBy("event_type")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("bin"), col("n")))),
            x => concat_ws(":", x.getField("bin").cast("string"),
                           x.getField("n").cast("string"))), ",")
            .as("hist"))
        .orderBy("event_type")
    }),

    // ClickHouse minMap/maxMap analog (q_agg_summap's siblings): per
    // entity, event_type → (min, max) of value as aligned sorted lists.
    // Same two-hash-aggregate shape; extremes carried as exact integer
    // ten-thousandths so the joined string is bit-portable.
    "q_agg_minmax_map" -> ((s, dir) => {
      val per = Tables(s, dir, "events")
        .groupBy("user_id", "event_type")
        .agg((min(col("value").cast("decimal(18,4)")) * 10000)
               .cast("long").as("mn"),
             (max(col("value").cast("decimal(18,4)")) * 10000)
               .cast("long").as("mx"))
      def vals(c: String) = array_join(
        transform(
          array_sort(collect_list(struct(col("event_type").as("k"),
                                         col(c).as("v")))),
          e => e.getField("v").cast("string")), ",")
      per.groupBy("user_id")
        .agg(array_join(array_sort(collect_list(col("event_type"))), ",")
               .as("ks"),
             vals("mn").as("mins"), vals("mx").as("maxs"))
        .orderBy("user_id")
    }),

    // ClickHouse topKWeighted analog, exact: top-5 suppliers per return
    // flag by TOTAL shipped quantity. The weight aggregate is map-side
    // combined; the per-group cap runs the two-phase salted shape
    // ([[Relational.topKPerGroupSalted]]) so a hot group never funnels
    // through one window task.
    "q_agg_topk_weighted" -> ((s, dir) => {
      val w = Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_suppkey")
        .agg(sum("l_quantity").cast("long").as("weight"))
      Relational.topKPerGroupSalted(
          w, Seq("l_returnflag"),
          Seq(col("weight").desc, col("l_suppkey")), 5,
          pmod(col("l_suppkey"), lit(16)))
        .select(col("l_returnflag"), col("l_suppkey"), col("weight"))
        .orderBy(col("l_returnflag"), desc("weight"), col("l_suppkey"))
    }),

    // ClickHouse uniqState/uniqMerge analog: mergeable HLL sketch
    // partials — per-day sketches of the visitor set, rolled up to a
    // per-event-type estimate WITHOUT touching raw rows again. The
    // partial-sketch table is what an AggregatingMergeTree target stores;
    // re-aggregation cost is O(days × sketch), not O(events). Sketch
    // binary → rows-only; SketchSpec pins merge(partials) == direct.
    // ClickHouse groupBitmap analog — EXACT mergeable distinct state
    // (the precise sibling of q_hll_rollup): per (event_type, day,
    // bitmap-bucket) partials via Spark's native bitmap aggregates, then
    // a re-aggregation that ORs bitmaps per bucket and sums bit counts —
    // the daily state table re-rolls to any coarser grain without ever
    // rescanning raw rows, and unlike the HLL form the answer is exact,
    // so the oracle is a plain COUNT(DISTINCT) hash match.
    "q_bitmap_rollup" -> ((s, dir) => {
      val state = Tables(s, dir, "events")
        .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
                expr("bitmap_bucket_number(user_id)").as("bucket"),
                expr("bitmap_bit_position(user_id)").as("pos"))
        .groupBy("event_type", "day", "bucket")
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
      state.groupBy("event_type", "bucket")
        .agg(expr("bitmap_count(bitmap_or_agg(bm))").as("n"))
        .groupBy("event_type")
        .agg(sum("n").as("n_users"))
        .orderBy("event_type")
    }),

    // Mergeable HLL rollup, driver-oracled: per-day partial sketches are
    // union-merged per type (the mergeability contract), and the merged
    // ESTIMATE is certified against the exact distinct count with a
    // bounded-relative-error flag — n_partials and n_exact are real
    // cross-engine rows (DuckDB recomputes both), est_within_5pct pins
    // the sketch's accuracy guarantee in-plan. The exact side is one
    // extra hash aggregate over the same scan, certificate-only.
    "q_hll_rollup" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val daily = e
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = daily.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
             count(lit(1)).as("n_partials"))
      val exact = e.groupBy("event_type")
        .agg(countDistinct("user_id").as("n_exact"))
      merged.join(exact, "event_type")
        .select(col("event_type"), col("n_partials"),
                col("n_exact"),
                (abs(col("est") - col("n_exact")) * lit(20)
                   <= col("n_exact")).cast("long").as("est_within_5pct"))
        .orderBy("event_type")
    }),

    // ClickHouse uniqTheta analog with SET OPERATIONS: Datasketches theta
    // sketches support intersection/difference, which HLL fundamentally
    // can't — the segment-overlap question ("how many distinct users did
    // BOTH view and purchase") answered from two mergeable per-segment
    // sketches, never from raw-row joins. Each side is a one-row partial
    // aggregate; the tiny harness user domain keeps the sketch in its
    // exact regime, so the estimates hash-match the exact set algebra.
    "q_theta_segments" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
      val v = e.filter(col("event_type") === "view")
        .agg(expr("theta_sketch_agg(user_id)").as("v"))
      val p = e.filter(col("event_type") === "purchase")
        .agg(expr("theta_sketch_agg(user_id)").as("p"))
      v.crossJoin(p).select(
        expr("theta_sketch_estimate(theta_intersection(v, p))")
          .cast("long").as("n_both"),
        expr("theta_sketch_estimate(theta_difference(v, p))")
          .cast("long").as("n_view_only"),
        expr("theta_sketch_estimate(theta_union(v, p))")
          .cast("long").as("n_either"))
    }),

    // PostgreSQL string_agg / ClickHouse groupArray-join analog via the
    // native listagg aggregate (WITHIN GROUP ordering — codegen'd, no
    // collect_list array materialization on the way to the string).
    "q_agg_listagg" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(expr("listagg(event_type, ',') WITHIN GROUP (ORDER BY event_type)")
               .as("types"))
        .orderBy("user_id")),

    // ClickHouse groupBitAnd/groupBitOr/groupBitXor analog: native bit
    // aggregates per group (one hash aggregate, map-side combinable —
    // AND/OR/XOR partials merge associatively, so re-aggregation over
    // stored partials works like any other mergeable state).
    "q_agg_bit" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(bit_and(col("user_id")).as("b_and"),
             bit_or(col("user_id")).as("b_or"),
             bit_xor(col("user_id")).as("b_xor"),
             count(lit(1)).as("n"))
        .orderBy("event_type")),

    // ClickHouse topK analog: approximate heavy hitters per group via the
    // native ApproxTopK sketch. Oracled tie-safely: the tracked-item
    // budget (65536) exceeds the l_suppkey domain at every tested SF, so
    // the sketch is in its exact regime and the DESC-sorted top-5 COUNT
    // list per group is deterministic even when a tie at the rank-5
    // boundary makes the picked ITEM arbitrary (tied items share the
    // count, so the count list is invariant). q_topk_merge below oracles
    // the mergeable-state path.
    "q_agg_approx_topk" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("approx_top_k(l_suppkey, 5, 65536)").as("top_supp"))
        .select(col("l_returnflag"),
                array_join(
                  reverse(sort_array(transform(col("top_supp"),
                    x => x.getField("count"))))
                    .cast("array<string>"), ",").as("top_counts"))
        .orderBy("l_returnflag")),

    // ClickHouse topKState/topKMerge analog, oracle-checked: per-day
    // ApproxTopK partial states (what an AggregatingMergeTree target
    // would store), combined and estimated WITHOUT re-reading raw rows.
    // The tracked-item budget (64) exceeds the event_type domain, so the
    // sketch is in its exact regime and the merged counts hash-match a
    // plain GROUP BY — re-aggregation cost O(days × sketch), not
    // O(events).
    "q_topk_merge" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(expr("approx_top_k_accumulate(event_type, 64)").as("st"))
      daily.agg(expr("approx_top_k_combine(st, 64)").as("c"))
        .select(explode(expr("approx_top_k_estimate(c, 10)")).as("e"))
        .select(col("e.item").as("event_type"), col("e.count").as("n"))
        .orderBy(desc("n"), col("event_type"))
    }),

    // Exact interpolated percentiles (ClickHouse quantile() surface).
    "q_agg_percentile" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(percentile(col("l_quantity"), lit(0.5)), 4).as("p50"),
             round(percentile(col("l_quantity"), lit(0.9)), 4).as("p90"),
             round(median(col("l_extendedprice")), 4).as("med_price"))
        .orderBy("l_returnflag")),

    // ClickHouse medianAbsoluteDeviation analog, exact and
    // order-independent: prices go to integer CENTS, the interpolated
    // median is carried DOUBLED (lower + upper order statistic — an
    // exact integer in double), deviations are exact integers, and the
    // final MAD ships ×4 (doubled twice). Two hash aggregates + one
    // broadcast join of the 3-row median table; the exact-sort group
    // buffer is the same declared cost as q_agg_percentile (at 100 TB
    // the approx sibling takes over).
    "q_agg_mad" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
                expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
                  .as("c"))
      val med = li.groupBy("l_returnflag")
        .agg((percentile(col("c"), lit(0.5)) * 2).cast("long").as("med2"))
      li.join(broadcast(med), "l_returnflag")
        .select(col("l_returnflag"),
                abs(lit(2) * col("c") - col("med2")).as("d2"))
        .groupBy("l_returnflag")
        .agg((percentile(col("d2"), lit(0.5)) * 2).cast("long").as("mad4"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // ClickHouse quantiles(...) analog: the WHOLE quantile vector from
    // ONE sort/aggregation pass — percentile over an array of fractions
    // returns an array, emitted as a joined string for cross-engine
    // hashing. At scale this is one pass over the group instead of one
    // per requested quantile.
    "q_agg_quantiles" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(array_join(transform(
               percentile(col("l_quantity"),
                          array(lit(0.1), lit(0.25), lit(0.5), lit(0.75),
                                lit(0.9))),
               q => round(q, 4).cast("string")), ",").as("quantiles"))
        .orderBy("l_returnflag")),

    // Weighted exact percentile (ClickHouse quantileExactWeighted
    // analog): each value counts `frequency` times — the built-in
    // percentile's third argument, so no row expansion ever happens;
    // the oracle replicates by actually expanding rows.
    "q_agg_percentile_weighted" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.5, l_linenumber)"), 4)
               .as("wp50"),
             round(expr("percentile(l_extendedprice, 0.9, l_linenumber)"), 4)
               .as("wp90"))
        .orderBy("l_returnflag")),

    // Approximate percentiles (ClickHouse quantileTDigest analog),
    // driver-oracled as a rank-error certificate: Spark's
    // approx_percentile guarantees rank error <= n/accuracy, so the
    // returned value must lie between the EXACT order statistics at
    // rank ± 2n/1000 around each target — those bracket values are
    // computed with the q_agg_winsorize distinct-value prefix-count
    // idiom (exact integer ranks, no floating percentile) and
    // recomputed independently by the DuckDB oracle, making lo/hi real
    // cross-engine rows and ok50/ok95 the pinned sketch guarantee.
    "q_agg_approx_percentile" -> ((s, dir) => {
      val e = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
                expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
                  .as("v"),
                col("l_extendedprice"))
      val ap = e.groupBy("flag")
        .agg(expr("CAST(round(approx_percentile(l_extendedprice, 0.5, " +
               "1000) * 100) AS BIGINT)").as("ap50"),
             expr("CAST(round(approx_percentile(l_extendedprice, 0.95, " +
               "1000) * 100) AS BIGINT)").as("ap95"))
      val d = e.groupBy("flag", "v").agg(count(lit(1)).as("c"))
      val cum = d.withColumn("cum",
        sum("c").over(Window.partitionBy("flag").orderBy("v")))
      val tot = d.groupBy("flag").agg(sum("c").as("n"))
      val bounds = cum.join(broadcast(tot), "flag")
        .groupBy("flag")
        .agg(min(when(col("cum") >= expr("greatest(CAST(1 AS BIGINT), " +
                 "(n - 1) div 2 + 1 - (n + 499) div 500)"), col("v")))
               .as("lo50"),
             min(when(col("cum") >= expr("least(n, " +
                 "(n - 1) div 2 + 2 + (n + 499) div 500)"), col("v")))
               .as("hi50"),
             min(when(col("cum") >= expr("greatest(CAST(1 AS BIGINT), " +
                 "(19 * (n - 1)) div 20 + 1 - (n + 499) div 500)"),
                 col("v"))).as("lo95"),
             min(when(col("cum") >= expr("least(n, " +
                 "(19 * (n - 1)) div 20 + 2 + (n + 499) div 500)"),
                 col("v"))).as("hi95"))
      ap.join(bounds, "flag")
        .select(col("flag").as("l_returnflag"),
                col("lo50"), col("hi50"),
                (col("ap50") >= col("lo50") && col("ap50") <= col("hi50"))
                  .cast("long").as("ok50"),
                col("lo95"), col("hi95"),
                (col("ap95") >= col("lo95") && col("ap95") <= col("hi95"))
                  .cast("long").as("ok95"))
        .orderBy("l_returnflag")
    }),

    // Data profiling (the summary() idiom, oracle-checkable form).
    "q_profile" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .agg(count(lit(1)).as("n"),
             count(when(col("o_totalprice").isNull, lit(1))).as("n_null_price"),
             countDistinct(col("o_orderstatus")).as("n_status"),
             min(col("o_orderdate")).as("min_date"),
             max(col("o_orderdate")).as("max_date"),
             round(sum(col("o_totalprice").cast("decimal(18,2)"))
                     .cast("double") / count(lit(1)), 4).as("avg_price"))),

    // GROUPING flags over ROLLUP (which aggregation level is each row).
    "q_agg_grouping" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
             grouping(col("o_orderpriority")).cast("long").as("g_prio"),
             count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first,
                 col("g_status"), col("g_prio"))),

    // Arbitrary GROUPING SETS (beyond rollup/cube lattices) through the
    // SQL surface: status-only and priority-only slices in one pass.
    "q_agg_grouping_sets" -> ((s, dir) => Sql.query(s, dir,
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST,
        |         o_orderpriority NULLS FIRST""".stripMargin)),

    // PIVOT: per-user value totals by event type (fixed category list).
    "q_pivot" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type",
               Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(sum("value"), 4))
        .orderBy("user_id")),

    // Boolean/conditional-count aggregates (every/any/count_if).
    "q_agg_bool" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(bool_and(col("l_quantity") > 0).as("all_pos"),
             bool_or(col("l_discount") > 0.05).as("any_disc"),
             count_if(col("l_quantity") > 45).as("n_big"))
        .orderBy("l_returnflag")),

    // Value histogram (ClickHouse histogram analog, fixed-width buckets):
    // floor-division bucketing is a map-side expression, so the whole
    // histogram costs one hash-aggregate on a tiny key space.
    "q_agg_histogram" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 50000).cast("long")
                   .as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    // UNPIVOT/melt — wide per-type totals back to (user, metric, value)
    // rows; the inverse of q_pivot, dropping the null cells.
    "q_unpivot" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "purchase"))
        .agg(round(sum("value"), 4))
        .unpivot(Array(col("user_id")),
                 Array(col("click"), col("purchase")),
                 "metric", "value")
        .filter(col("value").isNotNull)
        .orderBy("user_id", "metric")),

    // §2.11: typed Aggregator top-k heap — the no-global-sort LIMIT path.
    "q_topk_udaf" -> ((s, dir) => {
      val topk = udaf(new Udafs.TopKByScore(3))
      Tables(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(topk(col("c_custkey"), col("c_acctbal")).as("top"))
        .select(col("c_mktsegment"), explode(col("top")).as("t"))
        .select(col("c_mktsegment"), col("t._1").as("c_custkey"),
                col("t._2").as("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("c_acctbal").desc_nulls_last,
                 col("c_custkey"))
    }),

    // §2.11: typed Aggregator vector centroid (IVF building block),
    // exploded to (label, dim, value) rows for the oracle.
    "q_centroid" -> ((s, dir) => {
      val cent = udaf(new Udafs.VectorCentroid(64))
      Tables(s, dir, "embeddings")
        .groupBy("label")
        .agg(cent(col("embedding")).as("c"))
        .select(col("label"), posexplode(col("c")).as(Seq("dim", "v")))
        .select(col("label"), (col("dim") + 1).cast("long").as("dim"),
                (round(col("v"), 4) + lit(0.0)).as("v"))
        .orderBy("label", "dim")
    }),

    // ClickHouse entropy() analog: Shannon entropy (bits) of each event
    // type's distribution over users. The identity
    // H = log2(N) − (Σ c·log2 c)/N turns it into pure aggregate algebra
    // over the (type, user) count table — two hash aggregates, no
    // per-row probability column.
    "q_agg_entropy" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
        .groupBy("event_type")
        .agg((round(log2(sum("c")) -
                      sum(col("c") * log2(col("c"))) / sum("c"), 4)
                + lit(0.0)).as("entropy"),
             sum("c").cast("long").as("n"))
        .orderBy("event_type")),

    // Population skewness / excess kurtosis (ClickHouse skewPop /
    // kurtPop): Spark's native CentralMomentAgg built-ins; the oracle
    // reproduces the same population definitions from raw moments
    // (c₂=E₂−E₁², c₃=E₃−3E₁E₂+2E₁³, c₄=E₄−4E₁E₃+6E₁²E₂−3E₁⁴).
    "q_agg_moments" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg((round(skewness(col("l_quantity")), 4) + lit(0.0))
               .as("skew_qty"),
             (round(kurtosis(col("l_quantity")), 4) + lit(0.0))
               .as("kurt_qty"))
        .orderBy("l_returnflag")),

    // Cramér's V association between two categoricals (ClickHouse
    // cramersV). With e = rt·ct/N, χ² = N(Σ o²/(rt·ct) − 1), so
    // V = sqrt((Σ o²/(rt·ct) − 1) / min(r−1, c−1)) — N cancels. Every
    // relation after the first aggregate is contingency-cell sized;
    // marginals broadcast.
    "q_agg_cramers_v" -> ((s, dir) => {
      val cells = Tables(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).cast("double").as("obs"))
      val rowTot = cells.groupBy("o_orderstatus").agg(sum("obs").as("rt"))
      val colTot = cells.groupBy("o_orderpriority").agg(sum("obs").as("ct"))
      cells.join(broadcast(rowTot), "o_orderstatus")
        .join(broadcast(colTot), "o_orderpriority")
        .agg(sum("obs").as("n"),
             countDistinct("o_orderstatus").as("r"),
             countDistinct("o_orderpriority").as("c"),
             sum(col("obs") * col("obs") / (col("rt") * col("ct")))
               .as("q"))
        .select((round(sqrt((col("q") - 1) /
                              least(col("r") - 1, col("c") - 1)), 6)
                   + lit(0.0)).as("cramers_v"),
                col("n").cast("long").as("n"))
    }),

    // Welch's unequal-variance t statistic + Welch–Satterthwaite df
    // (ClickHouse welchTTest minus the p-value — no incomplete-beta in
    // either engine; t and df are exact arithmetic over ONE conditional
    // hash aggregate, the two samples never materialize separately).
    "q_agg_welch_t" -> ((s, dir) => {
      val isA = col("event_type") === "view"
      val isB = col("event_type") === "purchase"
      Tables(s, dir, "events")
        .filter(isA || isB)
        .agg(avg(when(isA, col("value"))).as("m1"),
             var_samp(when(isA, col("value"))).as("v1"),
             count(when(isA, lit(1))).cast("double").as("n1"),
             avg(when(isB, col("value"))).as("m2"),
             var_samp(when(isB, col("value"))).as("v2"),
             count(when(isB, lit(1))).cast("double").as("n2"))
        .select(
          (round((col("m1") - col("m2")) /
                   sqrt(col("v1") / col("n1") + col("v2") / col("n2")), 4)
             + lit(0.0)).as("t"),
          (round(pow(col("v1") / col("n1") + col("v2") / col("n2"), 2) /
                   (pow(col("v1") / col("n1"), 2) / (col("n1") - 1) +
                    pow(col("v2") / col("n2"), 2) / (col("n2") - 1)), 2)
             + lit(0.0)).as("df"),
          col("n1").cast("long").as("n1"),
          col("n2").cast("long").as("n2"))
    }),

    // Mann–Whitney U statistic over the view-vs-purchase event values —
    // see [[Analytics.mannWhitneyU]] for the hot-key-safe rank plan.
    "q_agg_mannwhitney_u" -> ((s, dir) =>
      Analytics.mannWhitneyU(
          Tables(s, dir, "events")
            .filter(col("event_type").isin("view", "purchase")),
          "value", "event_type", "view")
        .select((round(col("u1"), 4) + lit(0.0)).as("u1"),
                (round(col("u2"), 4) + lit(0.0)).as("u2"),
                col("n1"), col("n2"))),

    // Spearman rank correlation (ClickHouse rankCorr) between quantity
    // and price — tie-averaged ranks WITHOUT a ranking window
    // ([[Analytics.rankCorr]]: globalRowNumber ranks + exact DECIMAL
    // moment sums; only the final statistic is floating point).
    "q_agg_rank_corr" -> ((s, dir) =>
      Analytics.rankCorr(Tables(s, dir, "lineitem"), "l_quantity",
                         "l_extendedprice")
        .select((round(col("rank_corr"), 4) + lit(0.0)).as("rank_corr"),
                col("n"))),

    // Two-sample Kolmogorov–Smirnov D (ClickHouse kolmogorovSmirnovTest,
    // statistic only) comparing click vs view value distributions —
    // cumulative CDFs via range-partitioned prefix sums over the
    // distinct-value count table, max over the exact INTEGER
    // cross-difference |c1·n2 − c2·n1| ([[Analytics.ksTest]]).
    "q_agg_ks_test" -> ((s, dir) =>
      Analytics.ksTest(Tables(s, dir, "events"), "value", "event_type",
                       "click", "view")
        .select((round(col("ks_d"), 4) + lit(0.0)).as("ks_d"),
                col("n1"), col("n2"))),

    // Pooled-variance Student t + df (ClickHouse studentTTest minus the
    // p-value, exactly as q_agg_welch_t): ONE conditional hash
    // aggregate, sp² = ((n1−1)v1 + (n2−1)v2)/(n1+n2−2),
    // t = (m1−m2)/sqrt(sp²(1/n1 + 1/n2)).
    "q_agg_student_t" -> ((s, dir) => {
      val isA = col("event_type") === "view"
      val isB = col("event_type") === "purchase"
      Tables(s, dir, "events")
        .filter(isA || isB)
        .agg(avg(when(isA, col("value"))).as("m1"),
             var_samp(when(isA, col("value"))).as("v1"),
             count(when(isA, lit(1))).cast("double").as("n1"),
             avg(when(isB, col("value"))).as("m2"),
             var_samp(when(isB, col("value"))).as("v2"),
             count(when(isB, lit(1))).cast("double").as("n2"))
        .select(
          (round((col("m1") - col("m2")) /
                   sqrt((((col("n1") - 1) * col("v1") +
                          (col("n2") - 1) * col("v2")) /
                           (col("n1") + col("n2") - 2)) *
                        (lit(1.0) / col("n1") + lit(1.0) / col("n2"))), 4)
             + lit(0.0)).as("t"),
          (col("n1") + col("n2") - 2).cast("long").as("df"),
          col("n1").cast("long").as("n1"),
          col("n2").cast("long").as("n2"))
    }),

    // Theil's U (uncertainty coefficient U(status|priority), ClickHouse
    // theilsU) + Pearson contingency coefficient — see
    // [[Analytics.contingencyStats]] for the cell-sized plan.
    "q_agg_theils_u" -> ((s, dir) =>
      Analytics.contingencyStats(Tables(s, dir, "orders"),
                                 "o_orderstatus", "o_orderpriority")
        .select((round(col("theils_u"), 6) + lit(0.0)).as("theils_u"),
                (round(col("contingency_c"), 6) + lit(0.0))
                  .as("contingency_c"),
                col("n"))),

    // boundingRatio per event type (ClickHouse boundingRatio): the slope
    // between the chronologically first and last points of each series.
    // Simultaneous observations collapse to max(value) FIRST (hash
    // aggregate — makes the endpoints deterministic), then max_by/min_by
    // pick the endpoint values with no window anywhere.
    "q_agg_bounding_ratio" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"), unix_micros(col("ts")).as("x"))
        .agg(max("value").as("y"))
        .groupBy("event_type")
        .agg(((max_by(col("y"), col("x")) - min_by(col("y"), col("x"))) /
               ((max("x") - min("x")).cast("double") / 1000000.0))
               .as("r"),
             count(lit(1)).as("n_points"))
        .select(col("event_type"),
                (round(col("r"), 6) + lit(0.0)).as("slope_per_s"),
                col("n_points").cast("long").as("n_points"))
        .orderBy("event_type"))
  )

  val oracles: Map[String, String] = Map(
    "q_bitmap_rollup" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_agg_bit" ->
      """SELECT event_type,
        |  bit_and(user_id) AS b_and, bit_or(user_id) AS b_or,
        |  bit_xor(user_id) AS b_xor, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    // same doubled-order-statistic discipline as the Spark plan:
    // quantile_cont on integer cents ×2 is an exact integer
    "q_agg_mad" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |  FROM lineitem),
        |med AS (
        |  SELECT l_returnflag,
        |    CAST(quantile_cont(c, 0.5) * 2 AS BIGINT) AS med2
        |  FROM li GROUP BY l_returnflag),
        |dev AS (
        |  SELECT li.l_returnflag, abs(2 * c - med2) AS d2
        |  FROM li JOIN med USING (l_returnflag))
        |SELECT l_returnflag,
        |  CAST(quantile_cont(d2, 0.5) * 2 AS BIGINT) AS mad4,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM dev GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    // exact regime (budget 65536 > suppkey domain at tested SFs): the
    // DESC-sorted top-5 count list equals the exact one even under
    // rank-boundary ties (tied items share the count)
    "q_agg_approx_topk" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_suppkey, count(*) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT l_returnflag, n,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY n DESC)
        |      AS rk
        |  FROM c)
        |SELECT l_returnflag,
        |  string_agg(CAST(n AS VARCHAR), ',' ORDER BY n DESC) AS top_counts
        |FROM r WHERE rk <= 5
        |GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    // exact distinct is recomputed; the within-10% flag is the pinned
    // HLL++ estimate guarantee
    "q_agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_exact,
        |  CAST(1 AS BIGINT) AS approx_within_10pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    // exact bracketing order statistics at rank ± 2n/1000 (same integer
    // prefix-count idiom as q_agg_winsorize); ok flags are the pinned
    // rank-error guarantee
    "q_agg_approx_percentile" ->
      """WITH e AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem),
        |d AS (SELECT flag, v, count(*) AS c FROM e GROUP BY flag, v),
        |cm AS (
        |  SELECT flag, v,
        |    CAST(sum(c) OVER (PARTITION BY flag ORDER BY v)
        |         AS BIGINT) AS cum
        |  FROM d),
        |t AS (SELECT flag, CAST(sum(c) AS BIGINT) AS n
        |      FROM d GROUP BY flag)
        |SELECT flag AS l_returnflag,
        |  min(CASE WHEN cum >= greatest(1, (n - 1) // 2 + 1
        |        - (n + 499) // 500) THEN v END) AS lo50,
        |  min(CASE WHEN cum >= least(n, (n - 1) // 2 + 2
        |        + (n + 499) // 500) THEN v END) AS hi50,
        |  CAST(1 AS BIGINT) AS ok50,
        |  min(CASE WHEN cum >= greatest(1, (19 * (n - 1)) // 20 + 1
        |        - (n + 499) // 500) THEN v END) AS lo95,
        |  min(CASE WHEN cum >= least(n, (19 * (n - 1)) // 20 + 2
        |        + (n + 499) // 500) THEN v END) AS hi95,
        |  CAST(1 AS BIGINT) AS ok95
        |FROM cm JOIN t USING (flag)
        |GROUP BY flag ORDER BY flag NULLS FIRST""".stripMargin,

    // n_partials (distinct days) and n_exact are recomputed exactly; the
    // within-5% flag is the pinned estimate guarantee.
    "q_hll_rollup" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_partials,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  CAST(1 AS BIGINT) AS est_within_5pct
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_agg_basic" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity) AS sum_qty,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_global" ->
      """SELECT count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  round(sum(value), 4) AS sum_value, min(ts) AS min_ts, max(ts) AS max_ts
        |FROM events""".stripMargin,

    "q_agg_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q_agg_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_conditional" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4)
        |    AS purchase_total,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_agg_by_day" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY day ORDER BY day NULLS FIRST""".stripMargin,

    "q_agg_corr_matrix" ->
      """SELECT round(corr(l_quantity, l_extendedprice), 4)
        |    AS c_quantity_extendedprice,
        |  round(corr(l_quantity, l_discount), 4) AS c_quantity_discount,
        |  round(corr(l_quantity, l_tax), 4) AS c_quantity_tax,
        |  round(corr(l_extendedprice, l_discount), 4)
        |    AS c_extendedprice_discount,
        |  round(corr(l_extendedprice, l_tax), 4) AS c_extendedprice_tax,
        |  round(corr(l_discount, l_tax), 4) AS c_discount_tax
        |FROM lineitem""".stripMargin,

    "q_agg_ols" -> {
      val casts = OlsFormula.castDoubles.mkString(",\n    ")
      val outs = OlsFormula.outputs.mkString(",\n  ")
      s"""WITH r AS (
         |  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
         |    CAST(round(l_discount * 100) AS BIGINT) AS d,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p
         |  FROM lineitem),
         |s AS (
         |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         |    sum(CAST(q AS DECIMAL(38,0))) AS sq,
         |    sum(CAST(d AS DECIMAL(38,0))) AS sd,
         |    sum(CAST(p AS DECIMAL(38,0))) AS sp,
         |    sum(CAST(q * q AS DECIMAL(38,0))) AS sqq,
         |    sum(CAST(d * d AS DECIMAL(38,0))) AS sdd,
         |    sum(CAST(q * d AS DECIMAL(38,0))) AS sqd,
         |    sum(CAST(q * p AS DECIMAL(38,0))) AS sqp,
         |    sum(CAST(d * p AS DECIMAL(38,0))) AS sdp
         |  FROM r),
         |f AS (
         |  SELECT $casts
         |  FROM s)
         |SELECT $outs
         |FROM f""".stripMargin
    },

    "q_agg_avg_weighted" ->
      """WITH r AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
        |    CAST(round(l_quantity) AS BIGINT) AS q
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag,
        |    sum(CAST(p * q AS DECIMAL(38,0))) AS swx,
        |    sum(CAST(q AS DECIMAL(38,0))) AS sw
        |  FROM r GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  CAST(floor(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) * 10000)
        |       AS BIGINT) AS wavg_cents_e4
        |FROM s ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    // Exact DECIMAL moment sums + the identical closed-form expression
    // the Spark plan evaluates — no engine-native covar_samp anywhere.
    "q_agg_covar_matrix" -> {
      // mirrors the per-measure unit scales of the Spark plan (quantity
      // natural, 2-dp measures ×100) so every hugeint→double cast
      // operand stays below 2^53 — see the query comment
      val m = Seq("l_quantity" -> 1, "l_extendedprice" -> 100,
                  "l_discount" -> 100, "l_tax" -> 100)
      val names = m.map(_._1.drop(2))
      val units = m.map(_._2)
      val ints = m.map { case (c, u) =>
        s"CAST(round($c * $u) AS BIGINT) AS ${c.drop(2)}" }
        .mkString(",\n    ")
      val sums = (names.map(c =>
        s"sum(CAST($c AS DECIMAL(38,0))) AS s_$c") ++
        (for { i <- names.indices; j <- names.indices if i < j }
          yield s"sum(CAST(${names(i)} * ${names(j)} AS DECIMAL(38,0)))" +
            s" AS sp_${names(i)}_${names(j)}")).mkString(",\n    ")
      val outs = (for {
        i <- names.indices; j <- names.indices if i < j
      } yield {
        val (a, b) = (names(i), names(j))
        val mult = 10000 / (units(i) * units(j))
        s"CAST(floor(((CAST(sp_${a}_$b AS DOUBLE) - " +
          s"CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE) / " +
          s"CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) * $mult) " +
          s"AS BIGINT) AS cv_${a}_$b"
      }).mkString(",\n  ")
      s"""WITH r AS (
         |  SELECT
         |    $ints
         |  FROM lineitem),
         |s AS (
         |  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         |    $sums
         |  FROM r)
         |SELECT
         |  $outs
         |FROM s""".stripMargin
    },

    // Same exact integer order-statistic interpolation as the Spark
    // plan (shifted non-negative, m/20 rational fractions, ceil/floor
    // via integer division) — no floating percentile anywhere.
    // Same exact power sums, same shared closed-form text — the two
    // engines evaluate one IEEE expression tree over identical integers.
    "q_agg_skew_kurt" -> {
      s"""WITH g AS (
         |  SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS v
         |  FROM lineitem),
         |m AS (
         |  SELECT l_returnflag,
         |    ${SkewKurtFormula.momentAggs.mkString(",\n    ")}
         |  FROM g GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  ${SkewKurtFormula.outputs.mkString(",\n  ")}
         |FROM m WHERE ${SkewKurtFormula.guard}
         |ORDER BY l_returnflag NULLS FIRST""".stripMargin
    },

    "q_agg_winsorize" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v
        |  FROM events),
        |d AS (SELECT event_type, v, count(*) AS c
        |      FROM e GROUP BY event_type, v),
        |cm AS (
        |  SELECT event_type, v, c,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v)
        |         AS BIGINT) AS cum
        |  FROM d),
        |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
        |               min(v) AS mn
        |        FROM d GROUP BY event_type),
        |b0 AS (
        |  SELECT cm.event_type, min(n) AS n, min(mn) AS mn,
        |    min(CASE WHEN cum >= (n - 1) // 20 + 1
        |             THEN v - mn END) AS lo1,
        |    min(CASE WHEN cum >= least((n - 1) // 20 + 2, n)
        |             THEN v - mn END) AS lo2,
        |    min(CASE WHEN cum >= (19 * (n - 1)) // 20 + 1
        |             THEN v - mn END) AS hi1,
        |    min(CASE WHEN cum >= least((19 * (n - 1)) // 20 + 2, n)
        |             THEN v - mn END) AS hi2
        |  FROM cm JOIN tot USING (event_type)
        |  GROUP BY cm.event_type),
        |b AS (
        |  SELECT event_type,
        |    CAST((lo1 * (20 - (n - 1) % 20) + lo2 * ((n - 1) % 20)
        |          + 19) // 20 + mn AS BIGINT) AS lo,
        |    CAST((hi1 * (20 - (19 * (n - 1)) % 20)
        |          + hi2 * ((19 * (n - 1)) % 20)) // 20 + mn AS BIGINT)
        |      AS hi
        |  FROM b0)
        |SELECT e.event_type, min(lo) AS lo, min(hi) AS hi,
        |  count(CASE WHEN v < lo THEN 1 END) AS n_lo,
        |  count(CASE WHEN v > hi THEN 1 END) AS n_hi,
        |  CAST(sum(least(greatest(v, lo), hi)) AS BIGINT)
        |    AS sum_winsorized
        |FROM e JOIN b USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type NULLS FIRST""".stripMargin,

    "q_agg_group_array_sorted" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 10000) AS BIGINT) AS v
        |  FROM events),
        |r AS (
        |  SELECT event_type, v, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY v NULLS FIRST, event_id) AS rn
        |  FROM e)
        |SELECT event_type,
        |  string_agg(CAST(v AS VARCHAR), ',' ORDER BY v, event_id)
        |    AS smallest5
        |FROM r WHERE rn <= 5
        |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_retention_conditions" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS h2,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS h3
        |  FROM events GROUP BY user_id)
        |SELECT CAST(sum(r1) AS BIGINT) AS n_signup,
        |  CAST(sum(r1 * h2) AS BIGINT) AS n_signup_click,
        |  CAST(sum(r1 * h3) AS BIGINT) AS n_signup_purchase
        |FROM u""".stripMargin,

    "q_agg_segment_overlap" ->
      """WITH e AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    event_type, user_id
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |a AS (
        |  SELECT day,
        |    count(DISTINCT CASE WHEN event_type = 'click'
        |                        THEN user_id END) AS n_click,
        |    count(DISTINCT CASE WHEN event_type = 'purchase'
        |                        THEN user_id END) AS n_buy,
        |    count(DISTINCT user_id) AS n_union
        |  FROM e GROUP BY day)
        |SELECT day, n_click, n_buy,
        |  n_click + n_buy - n_union AS n_both, n_union
        |FROM a ORDER BY day NULLS FIRST""".stripMargin,

    "q_agg_rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
        |    user_id
        |  FROM events),
        |days AS (SELECT DISTINCT d FROM du),
        |x AS (
        |  SELECT days.d AS gday, du.user_id
        |  FROM du JOIN days ON du.d <= days.d
        |    AND du.d > days.d - INTERVAL 7 DAY)
        |SELECT gday, count(DISTINCT user_id) AS u7
        |FROM x GROUP BY gday ORDER BY gday NULLS FIRST""".stripMargin,

    "q_path_analysis" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn)
        |        AS path
        |      FROM r WHERE rn <= 5 GROUP BY user_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path NULLS FIRST""".stripMargin,

    "q_agg_max_by" ->
      """SELECT user_id, arg_max(event_type, ts) AS last_type,
        |  max(ts) AS last_ts
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_agg_collect" ->
      """SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS types
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_agg_stats" ->
      """SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_discount), 4) + 0 AS corr_qd,
        |  round(covar_samp(l_quantity, l_discount), 4) + 0 AS cov_qd
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q_agg_uniq_upto" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
        |  CAST(least(count(DISTINCT user_id), 11) AS BIGINT)
        |    AS uniq_upto_10
        |FROM events GROUP BY event_type, date_trunc('day', ts)
        |ORDER BY event_type NULLS FIRST, d NULLS FIRST""".stripMargin,

    "q_agg_delta_sum" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN d > 0 THEN d ELSE 0 END), 4) AS delta_sum
        |FROM (SELECT user_id, value - lag(value) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) AS d
        |      FROM events) t
        |GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_agg_mode" ->
      """SELECT l_returnflag, l_quantity AS mode_qty, CAST(c AS BIGINT)
        |    AS mode_n
        |FROM (
        |  SELECT l_returnflag, l_quantity, count(*) AS c,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY count(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |WHERE rn = 1
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q_agg_regr" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) + 0 AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) + 0
        |    AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) + 0 AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q_theta_segments" ->
      """WITH v AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'view'),
        |p AS (SELECT DISTINCT user_id FROM events
        |      WHERE event_type = 'purchase')
        |SELECT
        |  CAST((SELECT count(*) FROM v JOIN p USING (user_id))
        |    AS BIGINT) AS n_both,
        |  CAST((SELECT count(*) FROM v
        |        WHERE user_id NOT IN (SELECT user_id FROM p))
        |    AS BIGINT) AS n_view_only,
        |  CAST((SELECT count(*) FROM (
        |    SELECT user_id FROM v UNION SELECT user_id FROM p))
        |    AS BIGINT) AS n_either""".stripMargin,

    "q_agg_listagg" ->
      """SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS types
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_agg_percentile_weighted" ->
      """WITH expanded AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    unnest(generate_series(1, l_linenumber)) AS rep
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS wp50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS wp90
        |FROM expanded GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q_topk_merge" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type
        |ORDER BY n DESC NULLS LAST, event_type NULLS FIRST""".stripMargin,

    "q_agg_summap" ->
      """WITH per AS (
        |  SELECT user_id, event_type,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS v
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS ks,
        |  string_agg(CAST(v AS VARCHAR), ',' ORDER BY event_type) AS vs
        |FROM per GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_agg_histogram" ->
      """WITH e AS (
        |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |b AS (SELECT event_type, min(value) AS mn, max(value) AS mx
        |      FROM e GROUP BY 1),
        |x AS (
        |  SELECT e.event_type,
        |    CASE WHEN mx = mn THEN 0
        |         ELSE least(9, CAST(floor((value - mn) / (mx - mn) * 10)
        |                            AS INT)) END AS bin
        |  FROM e JOIN b USING (event_type)),
        |c AS (SELECT event_type, bin, count(*) AS n FROM x GROUP BY 1, 2)
        |SELECT event_type,
        |  string_agg(CAST(bin AS VARCHAR) || ':' || CAST(n AS VARCHAR),
        |             ',' ORDER BY bin) AS hist
        |FROM c GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_agg_minmax_map" ->
      """WITH per AS (
        |  SELECT user_id, event_type,
        |    CAST(min(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
        |      AS mn,
        |    CAST(max(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
        |      AS mx
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS ks,
        |  string_agg(CAST(mn AS VARCHAR), ',' ORDER BY event_type)
        |    AS mins,
        |  string_agg(CAST(mx AS VARCHAR), ',' ORDER BY event_type)
        |    AS maxs
        |FROM per GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_agg_topk_weighted" ->
      """WITH w AS (
        |  SELECT l_returnflag, l_suppkey,
        |    CAST(sum(l_quantity) AS BIGINT) AS weight
        |  FROM lineitem GROUP BY l_returnflag, l_suppkey),
        |r AS (
        |  SELECT l_returnflag, l_suppkey, weight,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY weight DESC, l_suppkey) AS rn
        |  FROM w)
        |SELECT l_returnflag, l_suppkey, weight
        |FROM r WHERE rn <= 5
        |ORDER BY l_returnflag NULLS FIRST, weight DESC, l_suppkey""".stripMargin,

    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90,
        |  round(median(l_extendedprice), 4) AS med_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q_agg_quantiles" ->
      """SELECT l_returnflag,
        |  array_to_string(list_transform(
        |    quantile_cont(l_quantity, [0.1, 0.25, 0.5, 0.75, 0.9]),
        |    q -> CAST(round(q, 4) AS VARCHAR)), ',') AS quantiles
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q_profile" ->
      """SELECT count(*) AS n,
        |  count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS n_null_price,
        |  count(DISTINCT o_orderstatus) AS n_status,
        |  min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |        / count(*), 4) AS avg_price
        |FROM orders""".stripMargin,

    "q_agg_bool" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_discount > 0.05) AS any_disc,
        |  CAST(count_if(l_quantity > 45) AS BIGINT) AS n_big
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q_agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY bucket
        |ORDER BY bucket NULLS FIRST""".stripMargin,

    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT user_id,
        |    round(sum(CASE WHEN event_type = 'click' THEN value END), 4)
        |      AS click,
        |    round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4)
        |      AS purchase
        |  FROM events GROUP BY user_id)
        |SELECT user_id, metric, value FROM (
        |  SELECT user_id, 'click' AS metric, click AS value FROM wide
        |  UNION ALL
        |  SELECT user_id, 'purchase' AS metric, purchase AS value FROM wide)
        |WHERE value IS NOT NULL
        |ORDER BY user_id NULLS FIRST, metric NULLS FIRST""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST,
        |         o_orderpriority NULLS FIRST""".stripMargin,

    "q_agg_grouping" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |  count(*) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST,
        |         g_status NULLS FIRST, g_prio NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
        |  round(sum(CASE WHEN event_type = 'error' THEN value END), 4) AS error,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
        |  round(sum(CASE WHEN event_type = 'signup' THEN value END), 4) AS signup,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END), 4) AS view
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_topk_udaf" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal, row_number() OVER (
        |    PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC NULLS LAST, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn <= 3
        |ORDER BY c_mktsegment NULLS FIRST, c_acctbal DESC NULLS LAST,
        |         c_custkey NULLS FIRST""".stripMargin,

    "q_centroid" ->
      """SELECT label, i AS dim, round(avg(CAST(v AS DOUBLE)), 4) + 0 AS v
        |FROM (SELECT label, unnest(embedding) AS v,
        |             unnest(range(1, 65)) AS i
        |      FROM embeddings) t
        |GROUP BY label, i
        |ORDER BY label NULLS FIRST, dim NULLS FIRST""".stripMargin,

    "q_agg_entropy" ->
      """SELECT event_type,
        |  round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) + 0
        |    AS entropy,
        |  CAST(sum(c) AS BIGINT) AS n
        |FROM (SELECT event_type, user_id, CAST(count(*) AS DOUBLE) AS c
        |      FROM events GROUP BY event_type, user_id) t
        |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_agg_moments" ->
      """SELECT l_returnflag,
        |  round((e3 - 3*e1*e2 + 2*e1*e1*e1)
        |        / pow(e2 - e1*e1, 1.5), 4) + 0 AS skew_qty,
        |  round((e4 - 4*e1*e3 + 6*e1*e1*e2 - 3*e1*e1*e1*e1)
        |        / pow(e2 - e1*e1, 2) - 3, 4) + 0 AS kurt_qty
        |FROM (SELECT l_returnflag, avg(q) AS e1, avg(q*q) AS e2,
        |        avg(q*q*q) AS e3, avg(q*q*q*q) AS e4
        |      FROM (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS q
        |            FROM lineitem) r
        |      GROUP BY l_returnflag) m
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q_agg_cramers_v" ->
      """WITH cells AS (
        |  SELECT o_orderstatus AS s, o_orderpriority AS p,
        |    CAST(count(*) AS DOUBLE) AS obs
        |  FROM orders GROUP BY 1, 2),
        |j AS (
        |  SELECT obs, s, p,
        |    sum(obs) OVER (PARTITION BY s) AS rt,
        |    sum(obs) OVER (PARTITION BY p) AS ct
        |  FROM cells)
        |SELECT round(sqrt((sum(obs*obs/(rt*ct)) - 1) /
        |         least(count(DISTINCT s) - 1, count(DISTINCT p) - 1)), 6)
        |    + 0 AS cramers_v,
        |  CAST(sum(obs) AS BIGINT) AS n
        |FROM j""".stripMargin,

    "q_agg_welch_t" ->
      """WITH a AS (
        |  SELECT
        |    avg(CASE WHEN event_type = 'view' THEN value END) AS m1,
        |    var_samp(CASE WHEN event_type = 'view' THEN value END) AS v1,
        |    CAST(count(CASE WHEN event_type = 'view' THEN 1 END)
        |      AS DOUBLE) AS n1,
        |    avg(CASE WHEN event_type = 'purchase' THEN value END) AS m2,
        |    var_samp(CASE WHEN event_type = 'purchase' THEN value END)
        |      AS v2,
        |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      AS DOUBLE) AS n2
        |  FROM events WHERE event_type IN ('view', 'purchase'))
        |SELECT round((m1 - m2) / sqrt(v1/n1 + v2/n2), 4) + 0 AS t,
        |  round(pow(v1/n1 + v2/n2, 2) /
        |        (pow(v1/n1, 2)/(n1 - 1) + pow(v2/n2, 2)/(n2 - 1)), 2)
        |    + 0 AS df,
        |  CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
        |FROM a""".stripMargin,

    "q_agg_mannwhitney_u" ->
      """WITH r AS (
        |  SELECT value, event_type,
        |    row_number() OVER (ORDER BY value) AS rn
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |v AS (
        |  SELECT value, avg(rn) AS ar,
        |    CAST(count(CASE WHEN event_type = 'view' THEN 1 END)
        |      AS DOUBLE) AS c1,
        |    CAST(count(*) AS DOUBLE) AS c
        |  FROM r GROUP BY value),
        |t AS (SELECT sum(ar * c1) AS r1, sum(c1) AS n1, sum(c) AS n
        |      FROM v)
        |SELECT round(r1 - n1*(n1 + 1)/2, 4) + 0 AS u1,
        |  round(n1*(n - n1) - (r1 - n1*(n1 + 1)/2), 4) + 0 AS u2,
        |  CAST(n1 AS BIGINT) AS n1, CAST(n - n1 AS BIGINT) AS n2
        |FROM t""".stripMargin,

    // Doubled tie-averaged ranks (2·rank() + equal-count − 1) are exact
    // integers; DuckDB's BIGINT sums promote to HUGEINT, matching the
    // Spark side's DECIMAL(38,0) moments exactly.
    "q_agg_rank_corr" ->
      """WITH d AS (
        |  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |r AS (
        |  SELECT
        |    2*rank() OVER (ORDER BY x)
        |      + count(*) OVER (PARTITION BY x) - 1 AS rx,
        |    2*rank() OVER (ORDER BY y)
        |      + count(*) OVER (PARTITION BY y) - 1 AS ry
        |  FROM d),
        |m AS (SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
        |        sum(rx*ry) AS sxy, sum(rx*rx) AS sxx, sum(ry*ry) AS syy
        |      FROM r)
        |SELECT round(CAST(n*sxy - sx*sy AS DOUBLE) /
        |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
        |     sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 4) + 0 AS rank_corr,
        |  CAST(n AS BIGINT) AS n
        |FROM m""".stripMargin,

    "q_agg_ks_test" ->
      """WITH s AS (
        |  SELECT value AS v,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS c1,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
        |g AS (SELECT v, sum(c1) AS a, sum(c2) AS b FROM s GROUP BY v),
        |r AS (SELECT v, sum(a) OVER (ORDER BY v) AS ca,
        |        sum(b) OVER (ORDER BY v) AS cb FROM g),
        |t AS (SELECT max(ca) AS n1, max(cb) AS n2 FROM r)
        |SELECT round(CAST(max(abs(ca*n2 - cb*n1)) AS DOUBLE) /
        |    (CAST(n1 AS DOUBLE) * n2), 4) + 0 AS ks_d,
        |  CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
        |FROM r, t GROUP BY n1, n2""".stripMargin,

    "q_agg_student_t" ->
      """WITH a AS (
        |  SELECT
        |    avg(CASE WHEN event_type = 'view' THEN value END) AS m1,
        |    var_samp(CASE WHEN event_type = 'view' THEN value END) AS v1,
        |    CAST(count(CASE WHEN event_type = 'view' THEN 1 END)
        |      AS DOUBLE) AS n1,
        |    avg(CASE WHEN event_type = 'purchase' THEN value END) AS m2,
        |    var_samp(CASE WHEN event_type = 'purchase' THEN value END)
        |      AS v2,
        |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      AS DOUBLE) AS n2
        |  FROM events WHERE event_type IN ('view', 'purchase'))
        |SELECT round((m1 - m2) /
        |    sqrt((((n1 - 1)*v1 + (n2 - 1)*v2) / (n1 + n2 - 2)) *
        |         (1.0/n1 + 1.0/n2)), 4) + 0 AS t,
        |  CAST(n1 + n2 - 2 AS BIGINT) AS df,
        |  CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
        |FROM a""".stripMargin,

    "q_agg_theils_u" ->
      """WITH cells AS (
        |  SELECT o_orderstatus AS s, o_orderpriority AS p,
        |    CAST(count(*) AS DOUBLE) AS obs
        |  FROM orders GROUP BY 1, 2),
        |j AS (
        |  SELECT obs,
        |    sum(obs) OVER (PARTITION BY s) AS rt,
        |    sum(obs) OVER (PARTITION BY p) AS ct
        |  FROM cells),
        |m AS (SELECT sum(obs) AS n, sum(obs * ln(ct/obs)) AS hc,
        |        sum(obs * ln(rt)) AS hx, sum(obs*obs/(rt*ct)) AS q
        |      FROM j)
        |SELECT round((ln(n) - hx/n - hc/n) / (ln(n) - hx/n), 6) + 0
        |    AS theils_u,
        |  round(sqrt(1.0 - 1.0/q), 6) + 0 AS contingency_c,
        |  CAST(n AS BIGINT) AS n
        |FROM m""".stripMargin,

    "q_agg_bounding_ratio" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts) AS x, max(value) AS y
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  round((arg_max(y, x) - arg_min(y, x)) /
        |        (CAST(max(x) - min(x) AS DOUBLE) / 1000000.0), 6) + 0
        |    AS slope_per_s,
        |  CAST(count(*) AS BIGINT) AS n_points
        |FROM d GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin
  )
}
