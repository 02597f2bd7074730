package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Fixture-level semantics of the event-analytics operators (the oracle
  * gate checks them against DuckDB on real data; these pin the intended
  * behavior on hand-built journeys).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: ordered steps, strict ordering, bounded window") {
    val events = Seq(
      // user 1: full journey inside 24 h → level 3
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00")),
      // user 2: click BEFORE the first view → level 1
      (2L, "click", ts("2024-01-01 00:00:00")),
      (2L, "view", ts("2024-01-01 01:00:00")),
      // user 3: purchase outside the 24 h window → level 2
      (3L, "view", ts("2024-01-01 00:00:00")),
      (3L, "click", ts("2024-01-01 00:30:00")),
      (3L, "purchase", ts("2024-01-02 12:00:00")),
      // user 4: never views → level 0
      (4L, "purchase", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(events, "user_id", "event_type", "ts",
                               Seq("view", "click", "purchase"), "24 HOURS")
      .orderBy("user_id").as[(Long, Long)].collect()
    assert(out === Array((1L, 3L), (2L, 1L), (3L, 2L), (4L, 0L)))
  }

  test("retention counts activity at exact day offsets per cohort") {
    val events = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-02 09:00:00")),  // day 1 ✓
      (1L, "click", ts("2024-01-08 23:00:00")),  // day 7 ✓
      (2L, "signup", ts("2024-01-01 11:00:00")),
      (2L, "click", ts("2024-01-03 09:00:00")),  // day 2 — counts for neither
      (3L, "signup", ts("2024-01-05 00:00:00")), // different cohort, no return
      (4L, "click", ts("2024-01-01 00:00:00"))   // never signs up: no cohort
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.retention(events, "user_id", "event_type", "ts",
                                  "signup", Seq(1, 7))
      .orderBy("d0")
      .select(col("d0").cast("string"), col("n_users"),
              col("retained_d1"), col("retained_d7"))
      .as[(String, Long, Long, Long)].collect()
    assert(out === Array(
      ("2024-01-01 00:00:00", 2L, 1L, 1L),
      ("2024-01-05 00:00:00", 1L, 0L, 0L)))
  }

  test("scd2 intervals abut and the current state is open-ended") {
    val events = Seq(
      (1L, 10L, "a", ts("2024-01-01 00:00:00")),
      (1L, 11L, "b", ts("2024-01-02 00:00:00")),
      (1L, 12L, "c", ts("2024-01-03 00:00:00")),
      (2L, 20L, "x", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val out = Analytics.scd2(events, "user_id", "ts", Seq(col("event_id")))
      .select("user_id", "event_type", "valid_from", "valid_to")
      .orderBy("user_id", "valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect()
    assert(out(0) === ((1L, "a", ts("2024-01-01 00:00:00"),
                        Some(ts("2024-01-02 00:00:00")))))
    assert(out(1) === ((1L, "b", ts("2024-01-02 00:00:00"),
                        Some(ts("2024-01-03 00:00:00")))))
    assert(out(2)._4 === None) // current state of user 1
    assert(out(3)._4 === None) // single-version user 2
  }

  test("sequenceCount: greedy non-overlapping matches, extra first-step " +
       "events ignored while a chain is open") {
    val events = Seq(
      // user 1: A B A B → 2 matches
      (1L, "A", 1L), (1L, "B", 2L), (1L, "A", 3L), (1L, "B", 4L),
      // user 2: A A B B → 1 match (second A ignored while waiting for B,
      // second B ignored while waiting for A) — the automaton semantics,
      // NOT max bipartite pairing (which would find 2)
      (2L, "A", 1L), (2L, "A", 2L), (2L, "B", 3L), (2L, "B", 4L),
      // user 3: B B A → 0 matches (B before any A never counts)
      (3L, "B", 1L), (3L, "B", 2L), (3L, "A", 3L),
      // user 4: noise between steps is fine → 1 match
      (4L, "A", 1L), (4L, "x", 2L), (4L, "B", 3L)
    ).map { case (u, t, i) =>
      (u, t, ts(s"2024-01-01 00:00:0$i"), i)
    }.toDF("user_id", "event_type", "ts", "event_id")
    val out = Analytics.sequenceCount(events, "user_id", "event_type",
                                      "ts", "event_id", Seq("A", "B"))
      .orderBy("user_id")
      .as[(Long, Long)].collect()
    assert(out === Array((1L, 2L), (2L, 1L), (3L, 0L), (4L, 1L)))
  }

  test("interpolateDaily lerps interior days time-weighted and carries " +
       "the nearest observation at the edges") {
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 0.0),
      (1L, ts("2024-01-05 00:00:00"), 96.0), // 4 days apart
      (2L, ts("2024-01-02 12:00:00"), 7.0)   // single-obs entity
    ).toDF("user_id", "ts", "value")
    val out = Analytics.interpolateDaily(obs, "user_id", "ts", "value")
      .select(col("user_id"), col("d").cast("string"), col("interp_value"))
      .as[(Long, String, Double)].collect()
      .groupBy(_._1).map { case (u, rs) =>
        u -> rs.sortBy(_._2).map(r => (r._2, r._3))
      }
    val u1 = out(1L)
    assert(u1.map(_._1) === (1 to 5).map(i => s"2024-01-0$i 00:00:00"))
    // end-of-day points climb linearly at 24/day (eod is 1µs shy of
    // midnight, hence the tolerance); the day-5 point is past the last
    // observation and carries it
    Seq(24.0, 48.0, 72.0, 96.0).zip(u1.map(_._2)).foreach {
      case (exp, got) => assert(math.abs(got - exp) < 0.001, s"$exp $got")
    }
    assert(u1.last._2 === 96.0)
    // single observation: every day carries it (lerp never divides)
    assert(out(2L).map(_._2) === Seq(7.0))
  }

  // Planted hot entity for the bucketed folds: 20 000 events for one
  // entity spread over 50 days (400 per day) — the shape where the old
  // single-buffer form put all 20 000 structs in ONE aggregation buffer.
  private def hotEntityEvents = spark.range(20000).select(
    lit(1L).as("user_id"),
    col("id").as("event_id"),
    timestamp_seconds(lit(1704067200L) + pmod(col("id"), lit(50)) * 86400
                        + floor(col("id") / 50)).as("ts"),
    (pmod(xxhash64(col("id")), lit(1000)) / 10.0).as("value"),
    element_at(array(lit("A"), lit("B"), lit("x")),
               (pmod(xxhash64(col("id")), lit(3)) + 1).cast("int"))
      .as("event_type"))

  test("emaBucketed equals the straight recursive fold on a planted hot " +
       "entity and never buffers more than one (entity, day) slice") {
    val events = hotEntityEvents.unionByName(
      spark.range(7).select(        // a normal entity alongside the hot one
        lit(2L).as("user_id"), col("id").as("event_id"),
        timestamp_seconds(lit(1704067200L) + col("id") * 3600).as("ts"),
        (pmod(xxhash64(col("id") + 99), lit(1000)) / 10.0).as("value"),
        lit("x").as("event_type")))
    val out = Analytics.emaBucketed(events, "user_id", "ts", "event_id",
                                    "value", 0.25, t => date_trunc("day", t))
      .as[(Long, Double)].collect()
    // driver-side reference: the straight seeded fold in time order
    val expected = events.select("user_id", "ts", "event_id", "value")
      .as[(Long, Timestamp, Long, Double)].collect()
      .groupBy(_._1).map { case (u, rows) =>
        val vs = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4).toSeq
        u -> vs.tail.foldLeft(vs.head)((acc, v) => 0.25 * v + 0.75 * acc)
      }
    assert(out.length === 2)
    for ((u, got) <- out)
      assert(math.abs(got - expected(u)) <=
               1e-9 * math.max(1.0, math.abs(expected(u))), s"user $u")
    // buffer bound: phase 1 holds one (entity, day) slice per buffer —
    // 400 rows for the hot entity, never its full 20 000-row history
    val sums = Analytics.emaBucketSummaries(events, "user_id", "ts",
        "event_id", "value", 0.25, t => date_trunc("day", t))
      .select("user_id", "__n").as[(Long, Int)].collect()
    assert(sums.count(_._1 == 1L) === 50)
    assert(sums.filter(_._1 == 1L).map(_._2).max === 400)
  }

  test("sequenceCountBucketed equals the straight greedy fold on a " +
       "planted hot entity and never buffers more than one (entity, day) " +
       "slice") {
    val events = hotEntityEvents
    val out = Analytics.sequenceCount(events, "user_id", "event_type", "ts",
                                      "event_id", Seq("A", "B"))
      .as[(Long, Long)].collect().toMap
    // driver-side reference: the straight greedy automaton in time order
    val seq = events.select("ts", "event_id", "event_type")
      .as[(Timestamp, Long, String)].collect()
      .sortBy(r => (r._1.getTime, r._2)).map(_._3)
    var acc = 0L
    for (t <- seq) if (t == (if (acc % 2 == 0) "A" else "B")) acc += 1
    assert(acc / 2 > 0)             // the plant really contains matches
    assert(out(1L) === acc / 2)
    val sums = Analytics.sequenceCountBucketSummaries(events, "user_id",
        "event_type", "ts", "event_id", Seq("A", "B"),
        t => date_trunc("day", t))
      .select("__n").as[Int].collect()
    assert(sums.length === 50 && sums.max === 400)
  }

  test("mannWhitneyU tie-averages ranks: hand-computed A={1,2,4} " +
       "B={2,3} gives U1=2.5") {
    // ranks: 1→1, {2,2}→2.5 each, 3→4, 4→5; R_A=8.5, U1=8.5−6=2.5,
    // U2=n1·n2−U1=3.5 (cross-check: #(a>b) + ½#(a=b) = 2 + 0.5)
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 4.0), ("B", 2.0),
                 ("B", 3.0)).toDF("g", "v")
    val out = Analytics.mannWhitneyU(df, "v", "g", "A")
      .as[(Double, Double, Long, Long)].head()
    assert(out === ((2.5, 3.5, 3L, 2L)))
  }

  test("intervalUnionLength merges overlapping AND abutting intervals") {
    // key a: [0,10] ∪ [5,20] ∪ [20,25] merge (overlap, then abut) → 25;
    // [30,40] is its own island → union 35 over 2 islands.
    // key b: disjoint [0,1], [2,3] → union 2 over 2 islands.
    val df = Seq(("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 25L),
                 ("a", 30L, 40L), ("b", 0L, 1L), ("b", 2L, 3L))
      .toDF("k", "s", "e")
    val out = Analytics.intervalUnionLength(df, "k", "s", "e")
      .orderBy("k").as[(String, Long, Long)].collect()
    assert(out === Array(("a", 35L, 2L), ("b", 2L, 2L)))
  }

  test("maxConcurrentIntervals: half-open sweep, earliest argmax") {
    // key a: [0,10],[5,20],[8,9],[15,30] → depth 3 first reached at t=8.
    // key b: abutting [0,10],[10,20] never overlap (ends before starts
    // at t=10) → depth 1 at t=0.
    val df = Seq(("a", 0L, 10L), ("a", 5L, 20L), ("a", 8L, 9L),
                 ("a", 15L, 30L), ("b", 0L, 10L), ("b", 10L, 20L))
      .toDF("k", "s", "e")
    val out = Analytics.maxConcurrentIntervals(df, "k", "s", "e")
      .orderBy("k").as[(String, Long, Long)].collect()
    assert(out === Array(("a", 3L, 8L), ("b", 1L, 0L)))
  }

  test("rankCorr: hand-computed Spearman with and without ties") {
    // x=[1,2,3], y=[30,10,20] → rank_y=[3,1,2]; ρ = −0.5 exactly.
    val d1 = Seq((1.0, 30.0), (2.0, 10.0), (3.0, 20.0)).toDF("x", "y")
    val r1 = Analytics.rankCorr(d1, "x", "y").as[(Double, Long)].head()
    assert(math.abs(r1._1 - (-0.5)) < 1e-12 && r1._2 === 3L)
    // aligned ties: x=[1,2,2,3], y=[10,20,20,40] → both rank vectors are
    // [1, 2.5, 2.5, 4] → ρ = 1 exactly.
    val d2 = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .toDF("x", "y")
    val r2 = Analytics.rankCorr(d2, "x", "y").as[(Double, Long)].head()
    assert(math.abs(r2._1 - 1.0) < 1e-12 && r2._2 === 4L)
  }

  test("ksTest: D = max |F1 - F2| with ties, hand-computed 1/3") {
    // A={1,2,3}, B={2,3,4}: at x=1 |1/3−0|, x=2 |2/3−1/3|, x=3 |1−2/3|,
    // x=4 |1−1| → D = 1/3.
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
                 ("B", 2.0), ("B", 3.0), ("B", 4.0)).toDF("g", "v")
    val out = Analytics.ksTest(df, "v", "g", "A", "B")
      .as[(Double, Long, Long)].head()
    assert(math.abs(out._1 - 1.0 / 3) < 1e-12)
    assert(out._2 === 3L && out._3 === 3L)
  }

  test("lttbDownsample keeps endpoints and picks the max-area spike") {
    // 9 points, 3 buckets of 3 (t 0-8, span 9): bucket 0 keeps the first
    // point (0,0), bucket 2 the last (8,2); bucket 1 anchors on the
    // neighbor bucket means (1,2) and (7,7/3) — the spike (4,9) has area
    // 41 vs 0.67/4.67 for its neighbors.
    val df = Seq((0, 0), (1, 5), (2, 1), (3, 2), (4, 9), (5, 3),
                 (6, 1), (7, 4), (8, 2))
      .map { case (t, v) => ("a", t.toLong, v.toLong) }
      .toDF("k", "t", "v")
    val out = Analytics.lttbDownsample(df, "k", "t", "v", 3)
      .orderBy("bucket").as[(String, Long, Long, Long)].collect()
    assert(out === Array(("a", 0L, 0L, 0L), ("a", 1L, 4L, 9L),
                         ("a", 2L, 8L, 2L)))
  }

  test("funnelStrictOrder: an intervening event kills the chain; a " +
       "later restart survives") {
    val events = Seq(
      // user 1: view → OTHER → click: strict chain from 00:00 dies at
      // the intervening 'other'; no second view → level 1. The sliding
      // funnel (gaps allowed) reaches 2.
      (1L, "view", ts("2024-01-01 00:00:00"), 1L),
      (1L, "other", ts("2024-01-01 00:01:00"), 2L),
      (1L, "click", ts("2024-01-01 00:02:00"), 3L),
      // user 2: view → other → VIEW → click: the second view's chain
      // sees click as its immediate next event → level 2.
      (2L, "view", ts("2024-01-01 00:00:00"), 4L),
      (2L, "other", ts("2024-01-01 00:01:00"), 5L),
      (2L, "view", ts("2024-01-01 00:02:00"), 6L),
      (2L, "click", ts("2024-01-01 00:03:00"), 7L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val steps = Seq("view", "click")
    val strict = Analytics.funnelStrictOrder(events, "user_id",
                                             "event_type", "ts",
                                             "event_id", steps,
                                             "10 MINUTES")
      .orderBy("user_id").as[(Long, Long)].collect()
    assert(strict === Array((1L, 1L), (2L, 2L)))
    val sliding = Analytics.funnelSliding(events, "user_id", "event_type",
                                          "ts", steps, "10 MINUTES")
      .orderBy("user_id").as[(Long, Long)].collect()
    assert(sliding === Array((1L, 2L), (2L, 2L)))
  }

  test("funnelStrictDedup: a repeated matched step kills the chain, " +
       "unrelated types are ignored, restarts survive") {
    val events = Seq(
      // user 1: view→click matched, then a REPEAT view arrives before
      // purchase → chain dies at 2 (sliding reaches 3). The repeat's own
      // restart chain finds no later click.
      (1L, "view", ts("2024-01-01 00:00:00"), 1L),
      (1L, "click", ts("2024-01-01 00:01:00"), 2L),
      (1L, "view", ts("2024-01-01 00:02:00"), 3L),
      (1L, "purchase", ts("2024-01-01 00:03:00"), 4L),
      // user 2: clean chain → 3 in every mode.
      (2L, "view", ts("2024-01-01 00:00:00"), 5L),
      (2L, "click", ts("2024-01-01 00:01:00"), 6L),
      (2L, "purchase", ts("2024-01-01 00:02:00"), 7L),
      // user 3: view view click purchase — the FIRST view's chain dies
      // on the repeat, but the second view's chain completes → 3.
      (3L, "view", ts("2024-01-01 00:00:00"), 8L),
      (3L, "view", ts("2024-01-01 00:01:00"), 9L),
      (3L, "click", ts("2024-01-01 00:02:00"), 10L),
      (3L, "purchase", ts("2024-01-01 00:03:00"), 11L),
      // user 4: an unrelated 'other' between steps does NOT interrupt
      // (unlike strict_order, which would stop at 1).
      (4L, "view", ts("2024-01-01 00:00:00"), 12L),
      (4L, "other", ts("2024-01-01 00:01:00"), 13L),
      (4L, "click", ts("2024-01-01 00:02:00"), 14L),
      (4L, "purchase", ts("2024-01-01 00:03:00"), 15L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val steps = Seq("view", "click", "purchase")
    val dedup = Analytics.funnelStrictDedup(events, "user_id",
                                            "event_type", "ts", "event_id",
                                            steps, "10 MINUTES")
      .orderBy("user_id").as[(Long, Long)].collect()
    assert(dedup === Array((1L, 2L), (2L, 3L), (3L, 3L), (4L, 3L)))
    val sliding = Analytics.funnelSliding(events, "user_id", "event_type",
                                          "ts", steps, "10 MINUTES")
      .orderBy("user_id").as[(Long, Long)].collect()
    assert(sliding === Array((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    val strict = Analytics.funnelStrictOrder(events, "user_id",
                                             "event_type", "ts", "event_id",
                                             steps, "10 MINUTES")
      .orderBy("user_id").as[(Long, Long)].collect()
    assert(strict === Array((1L, 2L), (2L, 3L), (3L, 3L), (4L, 1L)))
  }

  test("contingencyStats: U=1 when x is determined by y, U=0 when " +
       "independent") {
    // x = f(y) exactly → H(x|y) = 0 → U = 1.
    val dep = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "q"))
      .toDF("x", "y")
    val d = Analytics.contingencyStats(dep, "x", "y")
      .as[(Double, Double, Long)].head()
    assert(math.abs(d._1 - 1.0) < 1e-12 && d._3 === 4L)
    // uniform 2×2 → independence → U = 0, C = 0 (q = 1).
    val ind = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"))
      .toDF("x", "y")
    val i = Analytics.contingencyStats(ind, "x", "y")
      .as[(Double, Double, Long)].head()
    assert(math.abs(i._1) < 1e-12 && math.abs(i._2) < 1e-12)
  }

  test("funnelSliding restarts the window at any step-1 event " +
       "(windowFunnel semantics the anchored funnel can't reach)") {
    val events = Seq(
      // user 1: first view's window expires before its click, but a
      // SECOND view at 00:15 chains click@00:16 → purchase@00:17 inside
      // its own 10-minute window → level 3. Anchored funnel sees only
      // the 00:00 view → level 1.
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:20:00")),
      (1L, "view", ts("2024-01-01 00:15:00")),
      (1L, "click", ts("2024-01-01 00:16:00")),
      (1L, "purchase", ts("2024-01-01 00:17:00")),
      // user 2: click at the SAME instant as the view — strict ordering
      // rejects it → level 1
      (2L, "view", ts("2024-01-01 00:00:00")),
      (2L, "click", ts("2024-01-01 00:00:00")),
      // user 3: no view → level 0
      (3L, "click", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val steps = Seq("view", "click", "purchase")
    val sliding = Analytics.funnelSliding(events, "user_id", "event_type",
                                          "ts", steps, "10 MINUTES")
      .orderBy("user_id").as[(Long, Long)].collect()
    assert(sliding === Array((1L, 3L), (2L, 1L), (3L, 0L)))
    val anchored = Analytics.funnel(events, "user_id", "event_type", "ts",
                                    steps, "10 MINUTES")
      .orderBy("user_id").as[(Long, Long)].collect()
    assert(anchored === Array((1L, 1L), (2L, 1L), (3L, 0L)))
  }

  test("rollingZscoreFlags: planted spike flagged, steady tail not, " +
       "warm-up rows unchecked, constant series never divides by zero") {
    // series 1: 40 near-steady values (100 ± 1 alternating), then a 10x
    // spike, then steady again — only the spike row is anomalous
    val steady = (0 until 40).map(i =>
      (1L, ts(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), i.toLong,
       if (i % 2 == 0) 100L else 101L))
    val spike = Seq(
      (1L, ts("2024-01-01 00:00:40"), 40L, 1000L),
      (1L, ts("2024-01-01 00:00:41"), 41L, 100L))
    // series 2: CONSTANT values — variance 0, predicate must stay exact
    // (0 > 0 false), no float division anywhere
    val flat = (0 until 35).map(i =>
      (2L, ts(f"2024-01-01 00:00:${i % 60}%02d"), (100 + i).toLong, 7L))
    val df = (steady ++ spike ++ flat)
      .toDF("user_id", "ts", "event_id", "v")
    val out = Analytics.rollingZscoreFlags(df, "user_id", "ts",
                                           "event_id", "v")
      .select("user_id", "event_id", "checked", "anomaly")
      .as[(Long, Long, Boolean, Boolean)].collect()
    val s1 = out.filter(_._1 == 1L).sortBy(_._2)
    // first 30 rows unchecked (warm-up), the rest checked
    assert(s1.take(30).forall(!_._3) && s1.drop(30).forall(_._3))
    // exactly the spike row flagged
    assert(s1.filter(_._4).map(_._2).toSeq === Seq(40L))
    val s2 = out.filter(_._1 == 2L)
    assert(s2.count(_._3) === 5 && s2.forall(!_._4))
  }

  test("sequenceMatchTime: gap bound enforced; a late viable chain " +
       "matches where greedy earliest-first would strand it") {
    val events = Seq(
      // user 1: greedy trap — earliest A at 00:00 has no B within the
      // 10s gap, but A at 00:50 → B at 00:55 is a viable chain
      (1L, "a", ts("2024-01-01 00:00:00")),
      (1L, "a", ts("2024-01-01 00:00:50")),
      (1L, "b", ts("2024-01-01 00:00:55")),
      // user 2: gap exactly AT the bound (strict <) → no match
      (2L, "a", ts("2024-01-01 00:00:00")),
      (2L, "b", ts("2024-01-01 00:00:10")),
      // user 3: simultaneous a and b — strict order rejects
      (3L, "a", ts("2024-01-01 00:00:00")),
      (3L, "b", ts("2024-01-01 00:00:00")),
      // user 4: three-step chain, each gap inside the bound
      (4L, "a", ts("2024-01-01 00:00:00")),
      (4L, "b", ts("2024-01-01 00:00:05")),
      (4L, "c", ts("2024-01-01 00:00:12"))
    ).toDF("user_id", "event_type", "ts")
    val two = Analytics.sequenceMatchTime(events, "user_id", "event_type",
                                          "ts", Seq("a", "b"), 10L)
      .orderBy("user_id").as[(Long, Boolean)].collect()
    assert(two === Array((1L, true), (2L, false), (3L, false),
                         (4L, true)))
    val three = Analytics.sequenceMatchTime(events, "user_id",
                                            "event_type", "ts",
                                            Seq("a", "b", "c"), 10L)
      .orderBy("user_id").as[(Long, Boolean)].collect()
    assert(three.map(_._2).toSeq === Seq(false, false, false, true))
  }

  test("sequenceMatchTime: agrees with brute-force chain enumeration " +
       "on 60 seeded random series") {
    val rnd = new scala.util.Random(7)
    val types = Array("a", "b", "c", "x")
    val rows = (0 until 60).flatMap { u =>
      (0 until 12 + rnd.nextInt(14)).map { i =>
        (u.toLong, types(rnd.nextInt(4)),
         ts(f"2024-01-01 00:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"))
      }
    }
    val gap = 300L // 5 minutes
    // brute force: does ANY (a, b, c) subsequence with strict order and
    // every consecutive gap < 300 s exist?
    def brute(evts: Seq[(String, Long)]): Boolean = {
      val as = evts.filter(_._1 == "a").map(_._2)
      val bs = evts.filter(_._1 == "b").map(_._2)
      val cs = evts.filter(_._1 == "c").map(_._2)
      as.exists(ta => bs.exists(tb => tb > ta && tb - ta < gap &&
        cs.exists(tc => tc > tb && tc - tb < gap)))
    }
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      u -> brute(es.map(e => (e._2, e._3.getTime / 1000)))
    }
    val got = Analytics.sequenceMatchTime(
        rows.toDF("user_id", "event_type", "ts"),
        "user_id", "event_type", "ts", Seq("a", "b", "c"), gap)
      .as[(Long, Boolean)].collect().toMap
    assert(got === expected)
    assert(expected.values.exists(identity) &&
           !expected.values.forall(identity)) // non-degenerate fixture
  }

  test("rollingZscoreFlags: flags exactly invariant under per-series " +
       "integer scale and translation (the integer predicate's algebra)") {
    // (v·n − s1)² > σ²·(n·s2 − s1²) maps v → c·v + d to both sides × c²
    // EXACTLY in integer arithmetic — no float analog survives this.
    // 50 seeded random series, one Spark job for all of them.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 50).flatMap { k =>
      val c = rnd.nextInt(5) + 1L
      val d = (rnd.nextInt(1001) - 500).toLong
      (0 until 40 + rnd.nextInt(41)).map { i =>
        val v = (rnd.nextInt(2001) - 1000).toLong
        (k.toLong, i.toLong, v, c * v + d)
      }
    }
    val df = rows.toDF("k", "tie", "v", "vt").withColumn("ts", col("tie"))
    def flags(valCol: String) =
      Analytics.rollingZscoreFlags(
          df.select(col("k"), col("ts"), col("tie"),
                    col(valCol).as("val")),
          "k", "ts", "tie", "val", 20, 10)
        .select("k", "tie", "checked", "anomaly")
        .as[(Long, Long, Boolean, Boolean)].collect().toSet
    assert(flags("v") === flags("vt"))
  }
}
