package graft

import org.apache.spark.sql.functions._

/** Mergeable-sketch semantics (SURVEY.md §2.5 round-5 row): the HLL
  * partial-sketch rollup — ClickHouse's uniqState/uniqMerge surface — must
  * give the SAME estimate whether the sketch is built in one pass over raw
  * rows or assembled from per-day partials. That equality is what makes a
  * stored partial-aggregate table re-aggregable at 100 TB without touching
  * raw rows again.
  */
class SketchSpec extends SparkSpec {

  private lazy val events = Tables(spark, sf("events"), "events")

  test("hll: merge of daily partials equals the direct one-pass sketch") {
    val direct = events
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
             .as("direct_users"))
    val viaPartials = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
             .as("merged_users"))
    val joined = direct.join(viaPartials, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("direct_users") == r.getAs[Long]("merged_users"),
             s"partial-merge estimate diverged for ${r.get(0)}")
    }
  }

  test("hll: estimate tracks the exact distinct count") {
    val got = events
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
             .as("approx_users"),
           countDistinct(col("user_id")).as("exact_users"))
      .collect()
    got.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
             s"estimate off by >5% for ${r.get(0)}: $approx vs $exact")
    }
  }

  test("approx_top_k: combined daily partials equal the one-shot sketch " +
       "and, in the exact regime, the true counts") {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(expr("approx_top_k_accumulate(event_type, 64)").as("st"))
    val merged = daily
      .agg(expr("approx_top_k_combine(st, 64)").as("c"))
      .select(explode(expr("approx_top_k_estimate(c, 10)")).as("e"))
      .select(col("e.item").as("event_type"), col("e.count").as("n"))
    val oneShot = events
      .agg(expr("approx_top_k_accumulate(event_type, 64)").as("c"))
      .select(explode(expr("approx_top_k_estimate(c, 10)")).as("e"))
      .select(col("e.item").as("event_type"), col("e.count").as("n"))
    val exact = events.groupBy("event_type").agg(count(lit(1)).as("n"))

    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    val (mm, os, ex) = (m(merged), m(oneShot), m(exact))
    // tracked budget (64) > domain (5): sketch is exact, so merge order
    // cannot matter and counts match GROUP BY — the property that makes a
    // stored partial-state table re-aggregable without raw rows.
    assert(mm == ex, s"merged $mm != exact $ex")
    assert(os == ex, s"one-shot $os != exact $ex")
  }

  test("theta: union of daily partials equals the one-shot sketch; " +
       "intersection matches exact overlap in the exact regime") {
    val viaPartials = events
      .filter(col("event_type") === "view")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(expr("theta_sketch_agg(user_id)").as("sk"))
      .agg(expr("theta_sketch_estimate(theta_union_agg(sk))")
             .cast("long").as("n"))
      .head().getAs[Long]("n")
    val oneShot = events
      .filter(col("event_type") === "view")
      .agg(expr("theta_sketch_estimate(theta_sketch_agg(user_id))")
             .cast("long").as("n"))
      .head().getAs[Long]("n")
    assert(viaPartials == oneShot)

    val exactBoth = {
      val v = events.filter(col("event_type") === "view")
        .select("user_id").distinct()
      val p = events.filter(col("event_type") === "purchase")
        .select("user_id").distinct()
      v.join(p, "user_id").count()
    }
    val sketchBoth = SparkEntry.queries("q_theta_segments")(
        spark, sf("events"))
      .head().getAs[Long]("n_both")
    assert(sketchBoth == exactBoth,
           s"theta intersection $sketchBoth != exact $exactBoth")
  }

  test("temperature mixing: rates follow sqrt(n) and the head lang keeps all") {
    val docs = Tables(spark, sf("documents"), "documents")
    val n = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val kept = LlmQueries.queries("q_sample_temperature")(
        spark, sf("documents"))
      .groupBy("lang").agg(count(lit(1)).as("k"))
    val rows = n.join(kept, "lang").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n"),
                 r.getAs[Long]("k"))).sortBy(-_._2)
    // the most frequent language has rate 1.0 → keeps every doc
    assert(rows.head._3 == rows.head._2)
    // realized keep FRACTION grows with sqrt(n): less frequent langs are
    // kept at a lower rate than the head (up-weighting the tail less than
    // proportional sampling would)
    rows.tail.foreach { case (lang, nn, kk) =>
      assert(kk < nn, s"$lang should be downsampled")
      assert(kk > 0, s"$lang should not be dropped entirely")
    }
  }

  test("sequence packing: spans are contiguous and budget-consistent") {
    val out = LlmQueries.queries("q_pack_sequences")(
        spark, sf("documents")).collect()
    var expectedStart = 0L
    out.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
      val nTok = r.getAs[Long]("n_tok")
      val firstSeq = r.getAs[Long]("first_seq")
      val off = r.getAs[Long]("seq_offset")
      val nSeqs = r.getAs[Long]("n_seqs")
      assert(firstSeq == expectedStart / 512)
      assert(off == expectedStart % 512)
      // a doc spans exactly the sequences its token interval covers
      assert(nSeqs == (expectedStart + nTok - 1) / 512 - firstSeq + 1)
      expectedStart += nTok
    }
    // the synthetic corpus is long enough that at least one doc straddles
    // a sequence boundary (the case fixed-length packing exists for)
    assert(out.exists(_.getAs[Long]("n_seqs") > 1))
  }
}
