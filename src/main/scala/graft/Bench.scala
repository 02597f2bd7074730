package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline query set on
  * `SPARK_GRAFT_SF_DIR` and prints ONE compact JSON line.
  *
  * Methodology: every headline query is first run once on the TARGET scale
  * factor (steady state — whole-stage codegen compilation + JIT dominate
  * cold runs, e.g. 5.5 s cold vs 0.6 s warm for the typed-aggregator
  * query), then timed on a second run with a GC settle in between so one
  * query's garbage doesn't bill the next. The STDOUT JSON stays under
  * ~2 KB (3-decimal times; grand total + top-24-slowest subset with an
  * `n_queries` count) so the consumer's output-tail parser always sees a
  * complete line — round 1's all-103-query dump and round 7's 125-query
  * line both overflowed the tail buffer and failed to parse. The full
  * per-query map is persisted to `bench_last.json`.
  */
object Bench {

  /** Headline queries: every heavy operator family at sf0.1 plus one
    * representative per light family (SURVEY.md §2). Order = print order.
    */
  val headline: Seq[String] = Seq(
    // scans / filters / sorts
    "q_scan", "q_filter", "q_project", "q_sort", "q_topn",
    // joins
    "q_join_inner", "q_join_broadcast", "q_join_left", "q_join_semi",
    "q_join_anti", "q_join_asof", "q_join_asof_bucketed",
    "q_join_asof_fwd", "q_join_asof_left", "q_join_asof_tol", "q_join_any",
    "q_join_range_bucketed", "q_salted_join", "q_join_asof_fwd_bucketed",
    // aggregations / windows
    "q_agg_basic", "q_agg_count_distinct", "q_agg_approx_distinct",
    "q_agg_rollup", "q_agg_by_day", "q_agg_percentile", "q_agg_quantiles",
    "q_agg_mad",
    "q_win_rownum", "q_win_running_sum", "q_win_range_frame", "q_win_ema",
    "q_win_time_decay",
    "q_global_rownum", "q_global_rownum_inplan", "q_global_rownum_skew",
    "q_topk_per_group",
    "q_limit_by",
    // CDC + event analytics
    "q_upsert_latest", "q_dedup_key", "q_cdc_collapse", "q_ttl_rollup",
    "q_scd2", "q_funnel", "q_retention", "q_retention_tiers",
    "q_seq_match", "q_seq_match_time", "q_seq_count", "q_ts_interpolate",
    "q_funnel_window", "q_seq_next_node", "q_interval_union", "q_lttb",
    "q_join_interval", "q_path_analysis", "q_agg_rolling_distinct",
    // TPC-H composites (the full 22-shape sweep's heavy half)
    "q_tpch_q1", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
    "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q11",
    "q_tpch_q13", "q_tpch_q12", "q_tpch_q14", "q_tpch_q16", "q_tpch_q17",
    "q_tpch_q18", "q_tpch_q19", "q_tpch_q20", "q_tpch_q21", "q_tpch_q22",
    // mergeable-sketch rollups (uniqState/topKState + merge analogs)
    "q_hll_rollup", "q_bitmap_rollup", "q_topk_merge", "q_theta_segments",
    // LLM-pipeline: dedup / similarity / text
    "q_dedup_exact", "q_dedup_chunks_skew", "q_dedup_cdc_chunks", "q_dedup_minhash", "q_dedup_simhash",
    // the duplicate-class skew certificate: planted 2048-copy exact +
    // 256-member near class clustered through the hardened
    // minhashComponents path — benched so candidate-explosion
    // regressions show up as wall time, not just spec failures
    "q_dedup_minhash_dupclass",
    // (q_dedup_substr_incr and q_dedup_minhash_incr are excluded: the
    // incremental forms write an index store — pipeline cost, not query
    // serving; their batch siblings above carry the bench signal)
    "q_dedup_ngram_jaccard", "q_dedup_exact_substr", "q_dedup_rewrite",
    "q_decontaminate",
    // (q_decontaminate_3gram is excluded: it re-runs the same
    // decontaminate broadcast-join shape at n=3 — benching it would
    // double-count the stage q_decontaminate above already times)
    // q_dedup_components_star is the PRODUCTION connected-components
    // path (star contraction, O(log n) rounds) — the one the bench
    // should watch for drift. The O(diameter) label-prop twin
    // q_dedup_components is excluded: it exists as the components
    // ORACLE BASELINE (throws on non-convergence) that users should
    // not run at scale; benching it measured drift on the wrong plan
    // for four rounds.
    "q_dedup_components_star", "q_dedup_cluster_keep", "q_dedup_embed",
    // q_dedup_embed_lsh_pairs is the PRODUCTION banded-LSH path alone.
    // The fused q_dedup_embed_lsh is excluded: it carries the exact
    // all-pairs recall BASELINE inside the key (O(n²) by design — the
    // round-12 second-decade run measured the fused key at e = 1.81
    // purely from that certificate stage), so benching it measures
    // the ground-truth twin, not the operator users run at scale.
    "q_dedup_embed_lsh_pairs", "q_dedup_semantic",
    "q_cosine_sim", "q_simsearch_topk", "q_simsearch_lsh", "q_simsearch_ivf",
    // (PQ / IVF-PQ serve through their recall-certificate keys since
    // r9 — same annPqTopK/annIvfPqTopK serving path, plus the exact
    // baseline, inside one timed plan)
    "q_simsearch_pq_recall", "q_simsearch_ivfpq_recall", "q_sq8_quantize",
    "q_simsearch_kmeans",
    "q_binary_quantize",
    "q_text_tokens", "q_text_tfidf", "q_text_bm25", "q_inverted_index",
    "q_inverted_index_full", "q_lang_id", "q_text_repetition",
    "q_text_ngram_lm", "q_geo_radius_join",
    "q_knn_join", "q_curation", "q_domain_cap", "q_pack_sequences",
    "q_pack_sequences_inplan", "q_text_readability",
    "q_dsir", "q_classify_nb", "q_dedup_url", "q_mmr_rerank",
    "q_curation_rag", "q_mix_allocate",
    "q_join_asof_nearest",
    "q_text_chunk",
    // closed-form stats + array sequence functions
    "q_agg_ols", "q_array_seq", "q_agg_winsorize",
    // semi-structured + sampling
    // (ALL q_stream_* keys are excluded since r12: every one —
    // q_stream_upsert, q_stream_dedup, q_stream_watermark,
    // q_stream_agg, q_stream_bm25, q_stream_dedup_hist, and now the
    // executed q_stream_tumbling / q_stream_sliding / q_stream_session
    // — spins up a real multi-micro-batch Structured Streaming run
    // over a parquet file-source harness feed (Streaming.feedFiles,
    // since r14) — checkpoint + sink state + per-slice file-write
    // lifecycle cost, not query serving. The batch shapes carry the
    // bench signal: q_upsert_latest / q_dedup_key / q_dedup_exact /
    // q_agg_basic / q_text_bm25 for the sinks, q_agg_by_day (the
    // date-trunc tumbling grouping) for windowed counts, and
    // q_funnel / q_path_analysis for the per-user ordered-window
    // shape sessionization reduces to.
    // q_cdc_unwrap is excluded: it re-runs the q_upsert_latest
    // latest-per-key window over an in-plan envelope wrap/unwrap —
    // benching it would double-count that stage.
    // q_jdbc_stream is excluded for the same lifecycle reason: it
    // measures Derby seeding plus a checkpointed two-run streaming
    // lifecycle through the graft-jdbc source — ingest-edge transport,
    // not query serving; q_scan / q_agg_basic carry the downstream
    // signal.
    // q_rest_ingest and q_rest_stream are excluded for the same
    // lifecycle reason as the q_stream_* keys: both spin an in-JVM
    // REST-proxy stand-in and measure HTTP produce/consume round-trips
    // against it (q_rest_stream additionally a full Structured
    // Streaming checkpoint lifecycle) — edge transport cost through a
    // simulated broker, not query serving; q_scan / q_agg_basic carry
    // the bench signal for what follows the ingest edge)
    "q_json_extract", "q_variant",
    "q_sample_hash", "q_sample_weighted", "q_hash", "q_zorder",
    "q_projection_route", "q_pipeline_shard",
    // (q_projection_route_filtered re-runs q_projection_route's build +
    // registration with one extra key filter, and
    // q_dedup_components_incr re-mines the q_dedup_ngram_jaccard pair
    // graph twice as its input — both would double-count stages already
    // benched above)
    // hybrid serving, link-graph scoring, rolling anomaly detection
    // (q_dedup_ngram_prefix is excluded: it force-runs the prefix
    // branch purely as a losslessness proof against the all-pairs
    // oracle — q_dedup_ngram_jaccard above carries the cost-based
    // operator's bench signal)
    "q_rrf_fusion", "q_graph_pagerank", "q_graph_trustrank",
    // (q_pca_power2 / q_embed_outliers re-run the q_pca_power scatter +
    // iteration as their first stage and q_dedup_containment is the
    // q_dedup_ngram_jaccard join shape at another threshold — benching
    // them would double-count already-benched stages)
    "q_graph_hits", "q_agg_skew_kurt", "q_pca_power", "q_cluster_kmeans",
    "q_win_zscore", "q_bitext_mine", "q_winnow_fingerprint",
    "q_dedup_winnow", "q_text_distinct_n", "q_text_hapax",
    "q_split_leakage_safe",
    "q_bpe_train", "q_bpe_apply")

  /** Deterministic CPU calibration: `threads` concurrent 2·10⁸-step LCG
    * folds, wall-clock in ms. The harness VM's per-core speed shifts
    * between boots (round 8 measured the SAME code + data uniformly
    * 2.1× slower across 125 queries after a host change), so every bench
    * line carries a single-thread and an all-thread calibration —
    * cross-round query times should be compared as time/calib ratios,
    * not raw seconds.
    */
  private def calibrate(threads: Int): Long = {
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var h = 1125899906842597L + t
        var i = 0
        while (i < 200000000) {
          h = h * 6364136223846793005L + 1442695040888963407L
          i += 1
        }
        sink.addAndGet(h) // defeat dead-code elimination
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1000000
  }

  /** Memory-BANDWIDTH calibration: `threads` threads each stream-sum the
    * same shared 256 MB long array (32 M longs — far past any LLC), so
    * aggregate traffic is threads × 256 MB and the wall time tracks the
    * host's effective memory bandwidth under full fan-out. Needed
    * because the LCG probe above is ALU-bound while every heavy query is
    * memory-bound: the r15 boot drifted the two OPPOSITE ways (the LCG
    * gate read `quiet` while memory-bound walls ran ~1.8× hot), so the
    * artifact records BOTH probes and cross-round comparisons can
    * normalize by whichever tracks the movers
    * (`tools/bench_compare.py --norm=membw`). The array is allocated
    * once (lazily) and reused across probe runs; each thread's first
    * 1 M-element pass is untimed JIT warm-up.
    */
  private lazy val membwArray: Array[Long] = {
    val a = new Array[Long](32 * 1024 * 1024)
    var i = 0
    while (i < a.length) { a(i) = i.toLong * 2654435761L; i += 1 }
    a
  }

  private def calibrateMembw(threads: Int): Long = {
    val a = membwArray
    val sink = new java.util.concurrent.atomic.AtomicLong()
    // untimed warm-up: compile the sum loop before the clock starts
    locally {
      var s = 0L; var i = 0
      while (i < 1000000) { s += a(i); i += 1 }
      sink.addAndGet(s)
    }
    // constant AGGREGATE traffic (32 × 256 MB = 8 GB) whatever the
    // thread count: fewer threads each make more passes, so the probe
    // stays long enough (hundreds of ms) to average out scheduler
    // jitter at local[4] as well as local[32]
    val passes = math.max(1, 32 / math.max(threads, 1))
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var s = 0L
        var p = 0
        while (p < passes) {
          var i = 0
          while (i < a.length) { s += a(i); i += 1 }
          p += 1
        }
        sink.addAndGet(s) // defeat dead-code elimination
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1000000
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Relational.harnessSession(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      )
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local iteration aid: SPARK_GRAFT_ONLY=q_a,q_b times just those
    // keys — ANY packaged key qualifies (incl. non-headline
    // oracle-baseline twins, e.g. for drift adjudication runs),
    // headline members keep print order, the rest follow sorted
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = only match {
      case Some(set) =>
        headline.filter(set) ++
          (set -- headline.toSet).toSeq.sorted
      case None => headline
    }
    val qs = names.filter(SparkEntry.queries.contains)
      .map(n => n -> SparkEntry.queries(n))
    // Warm-up pass at the target SF (codegen + JIT + file-listing caches).
    qs.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => }
    }
    // Drop warm-up broadcasts/shuffles so the timed loop doesn't absorb
    // their GC.
    System.gc(); Thread.sleep(300)
    // min of two timed runs per query — GC pauses and OS jitter hit one
    // run, not both, so the min is the stable steady-state figure. BOTH
    // runs are persisted (queries_runs in bench_last.json) so a
    // cross-round swing can be adjudicated against the artifact's own
    // run-to-run spread instead of re-running blind.
    val runsPerKey = qs.map { case (name, fn) =>
      val runs = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => }
        val t = (System.nanoTime() - t0) / 1e9
        System.gc()
        t
      }
      name -> runs
    }
    val results = runsPerKey.map { case (n, rs) => n -> rs.min }
    // SELF-NORMALIZING artifact: the harness VM's speed swings between
    // boots (r8 measured 2.1×, r10's raw 1.08 round ratio was pure
    // drift, exonerated only by hand-reading the probes), so the JSON
    // carries normalized figures alongside raw seconds — value_norm =
    // seconds / calib_mt_ms. Cross-round comparisons should ratio the
    // NORMALIZED numbers; the calibration divides out the machine.
    // two independent calibration probes: the probe itself is documented
    // to swing ~20% between runs, so the artifact records both — the
    // normalization denominator stays the FIRST probe (unchanged
    // methodology vs every prior round's artifact; bench_compare.py can
    // re-normalize against either)
    val calibSt = calibrate(1)
    var calibMtRuns = Seq(calibrate(cpus.toInt), calibrate(cpus.toInt))
    // NOISE GATE (r13 verdict task 7): the r13 driver artifact landed in
    // a loaded host window (same-process run spreads to ×1.79) and could
    // only be adjudicated by a later quiet re-run. If the two probes
    // disagree by > 15 %, take a third so the artifact itself records
    // whether the window was quiet — `calib_verdict` lets a cross-round
    // comparison discount a noisy artifact WITHOUT re-running anything.
    def spreadOf(rs: Seq[Long]): Double =
      rs.max.toDouble / math.max(rs.min, 1L) - 1.0
    if (spreadOf(calibMtRuns) > 0.15)
      calibMtRuns :+= calibrate(cpus.toInt)
    val calibVerdict =
      if (spreadOf(calibMtRuns) <= 0.15) "quiet"
      else if (spreadOf(calibMtRuns.sorted.take(2)) <= 0.15)
        "noisy_probe_outlier" // two of three agree; min is trustworthy
      else "noisy"
    val calibMt = calibMtRuns.head
    // memory-bandwidth probe (r16, see [[calibrateMembw]]): same
    // two-runs-plus-escalation protocol and verdict vocabulary as the
    // LCG probe; normalization denominator stays calib_mt (unchanged
    // artifact methodology), the membw figures ride along for
    // adjudication and bench_compare.py --norm=membw.
    var calibMembwRuns = Seq(calibrateMembw(cpus.toInt),
                             calibrateMembw(cpus.toInt))
    if (spreadOf(calibMembwRuns) > 0.15)
      calibMembwRuns :+= calibrateMembw(cpus.toInt)
    val calibMembwVerdict =
      if (spreadOf(calibMembwRuns) <= 0.15) "quiet"
      else if (spreadOf(calibMembwRuns.sorted.take(2)) <= 0.15)
        "noisy_probe_outlier"
      else "noisy"
    val calibMembw = calibMembwRuns.head
    def norm(v: Double): String = f"${v / calibMt}%.6f"
    def jsonLine(rs: Seq[(String, Double)], extra: String,
                 withNormMap: Boolean): String = {
      val perQ = rs.map { case (k, v) => f""""$k":$v%.3f""" }
        .mkString("{", ",", "}")
      val normMap = if (withNormMap)
        s""","queries_norm":${rs.map { case (k, v) => s""""$k":${norm(v)}""" }
          .mkString("{", ",", "}")}"""
      else ""
      val total = results.map(_._2).sum
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec"""" +
        s""","value_norm":${norm(total)}$extra,"queries":$perQ$normMap""" +
        s""","sf":"$sfDir"}"""
    }
    // STDOUT gets a bounded line: the headline set has grown past what
    // the consumer's output-tail parser holds (~2 KB — the full
    // 125-query map is ~3 KB and r7's artifact came back "parsed":
    // null), so print the grand total plus only the top-24 slowest
    // queries, preserving print order for the kept keys. The complete
    // per-query map (raw + normalized) still goes to bench_last.json.
    val calib = s""","calib_st_ms":$calibSt,"calib_mt_ms":$calibMt""" +
      s""","calib_verdict":"$calibVerdict"""" +
      s""","calib_membw_ms":$calibMembw""" +
      s""","calib_membw_verdict":"$calibMembwVerdict""""
    val calibRuns =
      s""","calib_mt_ms_runs":${calibMtRuns.mkString("[", ",", "]")}""" +
      s""","calib_membw_ms_runs":${
        calibMembwRuns.mkString("[", ",", "]")}"""
    val runsMap = runsPerKey
      .map { case (k, rs) =>
        s""""$k":${rs.map(r => f"$r%.3f").mkString("[", ",", "]")}""" }
      .mkString(""","queries_runs":{""", ",", "}")
    val slowest = results.sortBy(-_._2).take(24).map(_._1).toSet
    val stdoutLine = jsonLine(results.filter(r => slowest(r._1)),
      s""","n_queries":${results.size}$calib""", withNormMap = false)
    // persist the FULL map as a file so every per-query number survives
    // independent of any output-buffer scraping — including both raw
    // timing runs per key and both calibration probes, so swings can be
    // adjudicated against the artifact's own spread
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"),
      jsonLine(results, calib + calibRuns + runsMap,
               withNormMap = true) + "\n")
    catch { case _: Throwable => () }
    // stop Spark BEFORE printing: executor/UI shutdown chatter must not
    // trail the JSON when a consumer captures stdout+stderr merged — the
    // bare JSON line has to be the process's final output
    spark.stop()
    println(stdoutLine)
    System.out.flush()
  }
}
