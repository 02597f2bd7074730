package graft

import org.apache.spark.sql.functions._

class LlmSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, sf("documents"), "documents")
  private def embs = Tables(spark, sf("embeddings"), "embeddings")

  test("shingles: distinct k-grams, empty for short docs") {
    val out = Seq("a b c d", "a b", "a b a b c").toDF("text")
      .select(LlmOps.shingles(LlmOps.tokens(col("text")), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq("a b a", "b a b", "a b c")) // distinct
  }

  test("minhash LSH recall: finds every exact-Jaccard pair >= 0.5") {
    val exact = LlmOps.ngramJaccardPairs(docs, "doc_id", "text", "lang", 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = LlmOps.minhashNearDupPairs(docs, "doc_id", "text", 3, 32, 16, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    // LSH is a superset-of-candidates + same exact verify → must contain
    // every pair whose signature agrees on ≥1 band; at j≥0.5, b=16/r=2
    // gives miss probability (1-j²)^16 ≤ 1% — the planted pairs (j≈0.99)
    // are found with certainty.
    assert(exact.subsetOf(lsh),
           s"missed pairs: ${exact.diff(lsh)}")
  }

  test("bands = 1 is a legal banding (rowsPerBand = numHashes): the " +
       "pair path plans and finds identical docs; components rejects " +
       "only bands > 64 (the emitted-band mask word width)") {
    // an identical pair has an identical signature, so the single
    // whole-signature band finds it with certainty; the cross-band
    // dedup OR-chain is EMPTY at bands = 1 (r14 regression: reduce on
    // an empty range threw at plan construction)
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val pairs = LlmOps.minhashNearDupPairs(d, "doc_id", "text", 3, 16, 1, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    val comp = LlmOps.minhashComponents(d, "doc_id", "text", 3, 16, 1, 0.5)
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L))
    val e = intercept[IllegalArgumentException] {
      LlmOps.minhashComponents(d, "doc_id", "text", 3, 130, 65, 0.5)
    }
    assert(e.getMessage.contains("64 bands"))
  }

  test("banded hyperplane LSH embed dedup: recall >= 0.9 vs the exact " +
       "all-pairs baseline, precision exact") {
    // exact all-pairs pairs at two thresholds below the sf0.001 max pair
    // sim (~0.48): 0.45 (a handful of pairs) and 0.4 (a wider set, so
    // recall is measured over dozens of pairs, not one)
    def exactPairs(minSim: Double): Set[(Long, Long)] = {
      val e = embs
      val a = e.select(col("vec_id").as("a"), col("embedding").as("ea"),
                       Functions.l2Norm(col("embedding")).as("na"))
      val b = e.select(col("vec_id").as("b"), col("embedding").as("eb"),
                       Functions.l2Norm(col("embedding")).as("nb"))
      a.join(b, col("a") < col("b"))
        .withColumn("sim", Functions.dotProduct(col("ea"), col("eb"))
                             / (col("na") * col("nb")))
        .filter(col("sim") >= minSim)
        .select("a", "b").as[(Long, Long)].collect().toSet
    }
    def lshPairs(minSim: Double): Set[(Long, Long)] =
      LlmOps.embedNearDupPairsBucketed(embs, "vec_id", "embedding", 16, 3,
                                       minSim)
        .select("a", "b").as[(Long, Long)].collect().toSet
    for (t <- Seq(0.45, 0.4)) {
      val exact = exactPairs(t)
      val lsh = lshPairs(t)
      assert(exact.nonEmpty, s"fixture should contain pairs at sim >= $t")
      // precision is exact by construction: every candidate is verified
      // with the same cosine arithmetic as the baseline
      assert(lsh.subsetOf(exact), s"false positives at $t: ${lsh.diff(exact)}")
      val recall = lsh.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.9,
             s"recall $recall at $t; missed ${exact.diff(lsh)}")
    }
  }

  test("incremental MinHash over two batches equals the batch-mode run " +
       "on the full corpus") {
    val store = java.nio.file.Files.createTempDirectory("graft-mh")
      .toString + "/store"
    val batch1 = docs.filter(col("doc_id") < 250)
    val batch2 = docs.filter(col("doc_id") >= 250)
    def norm(rows: Array[(Long, Long, Double)]) =
      rows.map { case (a, b, j) =>
        (math.min(a, b), math.max(a, b), j) }.toSet
    val p1 = LlmOps.minhashIncremental(batch1, "doc_id", "text", store,
                                       3, 32, 16, 0.5)
      .as[(Long, Long, Double)].collect()
    val p2 = LlmOps.minhashIncremental(batch2, "doc_id", "text", store,
                                       3, 32, 16, 0.5)
      .as[(Long, Long, Double)].collect()
    // same hash family + bands + verify arithmetic → the incremental
    // union must be EXACTLY the one-shot batch result
    val full = norm(LlmOps.minhashNearDupPairs(docs, "doc_id", "text",
                                               3, 32, 16, 0.5)
      .as[(Long, Long, Double)].collect())
    assert(norm(p1 ++ p2) === full)
    assert(full.nonEmpty, "fixture should contain planted near-dups")
    // at least one pair crosses the batch boundary (else the history
    // path went untested)
    assert((p1 ++ p2).exists { case (a, b, _) =>
      math.min(a, b) < 250 && math.max(a, b) >= 250 })
  }

  test("duplicate-class skew guard: planted m-copy classes cost O(m) " +
       "edges, not O(m^2), and cluster to the same components") {
    // the 100 TB hazard shape: a boilerplate class of m identical pages
    // plus a near-identical class (one unique trailing token each)
    val words = (0 until 40).map(j => s"dup$j tok$j").mkString(" ")
    def baseText(i: Int) =
      (0 until 40).map(j => s"b${i}w$j").mkString(" ")
    val m1 = 500; val m2 = 200
    val rows =
      (0 until 8).map(i => (i.toLong, baseText(i))) ++
      (0 until m1).map(i => (1000L + i, words)) ++
      (0 until m2).map(i => (2000L + i, words + s" zz$i"))
    val df = rows.toDF("doc_id", "text")
    val edges = LlmOps.minhashComponentEdges(
      df, "doc_id", "text", 3, 32, 16, 0.5, bucketCap = 64)
      .as[(Long, Long)].collect()
    // O(m): m1-1 member edges from the exact collapse, ~m2 bucket-star
    // edges (same (root, doc) pair in every band → distinct) plus a
    // handful of perturbed-band small-bucket pairs. The unguarded
    // candidate space is m1²/2 + m2²/2 ≈ 145k.
    assert(edges.length < 2 * (m1 + m2),
           s"edge count ${edges.length} is not O(m)")
    // the exact class never reaches the LSH join: every edge touching
    // it is a member edge from its representative
    assert(edges.filter { case (a, b) =>
      b >= 1000 && b < 1000 + m1 }.forall(_._1 == 1000L))
    // correct clustering: all planted docs form ONE component rooted at
    // the exact class minimum; unrelated base docs stay out
    val comp = LlmOps.minhashComponents(df, "doc_id", "text", 3, 32, 16,
                                        0.5)
      .as[(Long, Long)].collect().toMap
    assert(comp.size === m1 + m2)
    assert(comp.values.toSet === Set(1000L))
    assert(comp.keySet === ((0 until m1).map(1000L + _) ++
                            (0 until m2).map(2000L + _)).toSet)
    // equivalence with the unhardened path on a corpus small enough to
    // afford all-pairs — star branch forced via a tiny bucketCap
    val small = ((0 until 5).map(i => (i.toLong, baseText(i))) ++
      (0 until 20).map(i => (100L + i, words)) ++
      (0 until 10).map(i => (200L + i, words + s" zz$i")))
      .toDF("doc_id", "text")
    val hardened = LlmOps.connectedComponentsStar(
      LlmOps.minhashComponentEdges(small, "doc_id", "text", 3, 32, 16,
                                   0.5, bucketCap = 4)
        .toDF("a", "b"))
      .as[(Long, Long)].collect().toSet
    val allPairs = LlmOps.connectedComponentsStar(
      LlmOps.minhashNearDupPairs(small, "doc_id", "text", 3, 32, 16, 0.5))
      .as[(Long, Long)].collect().toSet
    assert(hardened === allPairs)
  }

  test("minhash incremental store compaction collapses file counts and " +
       "leaves the next batch's results identical") {
    val dirA = java.nio.file.Files.createTempDirectory("graft-mhc")
      .toString + "/a"
    val dirB = java.nio.file.Files.createTempDirectory("graft-mhc")
      .toString + "/b"
    val batch1 = docs.filter(col("doc_id") < 250)
    val batch2 = docs.filter(col("doc_id") >= 250)
    // A compacts after every batch (threshold 1 file); B never does
    def run(store: String, thr: Int) = Seq(batch1, batch2).map(b =>
      LlmOps.minhashIncremental(b, "doc_id", "text", store, 3, 32, 16, 0.5,
          numBuckets = 16, compactFileThreshold = thr)
        .as[(Long, Long, Double)].collect().toSet)
    val Seq(a1, a2) = run(dirA, 1)
    val Seq(b1, b2) = run(dirB, 0)
    // batch 2 dedups against A's COMPACTED history → must equal B's
    assert(a1 === b1)
    assert(a2 === b2)
    assert(a2.nonEmpty, "fixture should contain cross-batch near-dups")
    // hygiene: compaction leaves at most one file per hive bucket
    assert(Sources.dataFileCount(spark, s"$dirA/bands") <
           Sources.dataFileCount(spark, s"$dirB/bands"))
    assert(Sources.dataFileCount(spark, s"$dirA/shingles") <
           Sources.dataFileCount(spark, s"$dirB/shingles"))
    assert(Sources.dataFileCount(spark, s"$dirA/bands") <= 16)
  }

  test("PQ ANN: ADC ranking over 8 one-byte codes recalls the exact " +
       "cosine top-k; codebooks cover every subspace") {
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val exact = LlmOps.cosineTopK(embs, q, 10)
      .select("vec_id").as[Long].collect().toSet
    val pq = LlmOps.annPqTopK(embs, q, 8, 16, 2, 10, refine = 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    // ADC over 8×4-bit codes shortlists 10×k candidates, exact cosine
    // re-ranks them — the coarse quantizer only has to SURFACE the true
    // neighborhood, the refine stage restores the ordering (refine=10
    // is the certified serving config of q_simsearch_pq_recall)
    assert(recall >= 0.7, s"PQ recall $recall; pq=$pq exact=$exact")
    // the query vector itself (sim 1.0) must always survive quantization
    assert(pq.contains(0L))
    // training really produced k centroids per subspace (no empty books)
    val books = LlmOps.pqTrain(embs, 8, 16, 2)
    assert(books.groupBy("sub").count().as[(Int, Long)].collect()
             .forall { case (_, n) => n == 16 })
  }

  test("IVF nprobe: recall is monotone in probed cells and full probing " +
       "equals brute force") {
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val exact = LlmOps.cosineTopK(embs, q, 10)
      .select("vec_id").as[Long].collect().toSet
    def recallAt(nprobe: Int): Int =
      LlmOps.annIvfTopK(embs, q, 64, 10, nprobe)
        .select("vec_id").as[Long].collect().toSet
        .intersect(exact).size
    val nCells = embs.select("label").distinct().count().toInt
    // candidate sets only grow with nprobe, and an exact-top-10 member
    // present in any candidate set survives its top-10 — so recall is
    // monotone, and probing every cell IS the exact scan
    assert(recallAt(2) >= recallAt(1))
    assert(recallAt(nCells) === 10)
  }

  test("PQ sample training (maxTrain below corpus) still recalls >= 0.7 " +
       "and produces full codebooks") {
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val exact = LlmOps.cosineTopK(embs, q, 10)
      .select("vec_id").as[Long].collect().toSet
    // maxTrain=200 on a 500-vector corpus forces the md5-threshold
    // sample path: Lloyd rounds see ~200 vectors, encoding sees all 500
    val pq = LlmOps.annPqTopK(embs, q, 8, 16, 2, 10, refine = 10,
                              maxTrain = 200L)
      .select("vec_id").as[Long].collect().toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"sampled-train PQ recall $recall")
    assert(pq.contains(0L))
    // sample-trained codebooks are still complete: k centroids per
    // subspace (the sample keeps >= k distinct vectors)
    val books = LlmOps.pqTrain(embs, 8, 16, 2, maxTrain = 200L)
    assert(books.groupBy("sub").count().as[(Int, Long)].collect()
             .forall { case (_, n) => n == 16 })
  }

  test("IVF-PQ probes exactly one cell and agrees with the direct PQ " +
       "run inside it") {
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val ivfpq = LlmOps.annIvfPqTopK(embs, q, 64, 8, 16, 1, 10)
    val ids = ivfpq.select("vec_id").as[Long].collect().toSet
    assert(ids.size === 10)
    // every result comes from ONE coarse cell (the probed partition) —
    // which cell wins depends on the centroid geometry, not on where
    // the query vector happens to be labeled (the fixture's labels are
    // arbitrary, not k-means cells)
    val labels = embs.filter(col("vec_id").isin(ids.toSeq: _*))
      .select("label").distinct().as[String].collect()
    assert(labels.length === 1, labels.mkString(","))
    // intra-cell agreement: IVF-PQ == PQ run directly on the probed cell
    val direct = LlmOps.annPqTopK(
        embs.filter(col("label") === labels.head), q, 8, 16, 1, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(ids === direct)
  }

  test("mmrRerank: a near-duplicate of the top hit is deferred in " +
       "favor of a diverse pick") {
    // query OUTSIDE the corpus (else rel == max-sim-to-top-pick for
    // every candidate and MMR degenerates to relevance order). v1 top
    // by relevance; v2 is its near-duplicate and only marginally less
    // relevant; v3/v4 clearly less relevant but diverse. Relevance
    // order = (1, 2, 3); MMR at λ=0.5 defers the near-duplicate past
    // both diverse picks.
    val vecs = Seq(
      (1L, Array(0.9f, 0.1f, 0f, 0f), "a"),
      (2L, Array(0.9f, 0.105f, 0f, 0f), "a"),
      (3L, Array(0.6f, 0f, 0.8f, 0f), "a"),
      (4L, Array(0.5f, 0f, 0f, 0.85f), "a")
    ).toDF("vec_id", "embedding", "label")
    val q = Seq(Tuple1(Array(1f, 0f, 0f, 0f))).toDF("q_emb")
    val out = LlmOps.mmrRerank(vecs, q, 4, 3, 0.5)
      .orderBy("mmr_rank").as[(Long, Long)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 3L, 4L))
  }

  test("pqIndex cache: cached serve equals the self-contained PQ run; " +
       "the shared-codebook IVF-PQ stays inside the probed cell") {
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val plain = LlmOps.annPqTopK(embs, q, 8, 16, 2, 10, refine = 10)
      .select("vec_id").as[Long].collect().toSet
    val cached = LlmOps.annPqTopK(embs, q, 8, 16, 2, 10, refine = 10,
                                  cacheKey = Some("spec-pq-cache"))
      .select("vec_id").as[Long].collect().toSet
    // the memoized index is the SAME deterministic computation, so the
    // served top-k is identical, and a second lookup returns the same
    // materialized instances (no retrain)
    assert(cached === plain)
    val (b1, c1) = LlmOps.pqIndex(embs, "spec-pq-cache", 8, 16, 2)
    val (b2, c2) = LlmOps.pqIndex(embs, "spec-pq-cache", 8, 16, 2)
    assert((b1 eq b2) && (c1 eq c2))
    // deployment-shaped IVF-PQ (one stored codebook, cell-confined
    // codes): every result still comes from exactly one coarse cell
    val ivf = LlmOps.annIvfPqTopK(embs, q, 64, 8, 16, 2, 10, refine = 10,
                                  cacheKey = Some("spec-pq-cache"))
    val ids = ivf.select("vec_id").as[Long].collect().toSet
    assert(ids.nonEmpty)
    val labels = embs.filter(col("vec_id").isin(ids.toSeq: _*))
      .select("label").distinct().as[String].collect()
    assert(labels.length === 1, labels.mkString(","))
  }

  test("q_inverted_index_full caps every posting list at 50 and runs " +
       "the cap through the salt slices") {
    val df = LlmQueries.queries("q_inverted_index_full")(
      spark, sf("documents"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(
      _.getAs[String]("postings").split(",").length <= 50))
    // stop-word-like tokens (df near corpus size) still emit 50 postings
    assert(rows.exists(r => r.getAs[Long]("df") > 50 &&
      r.getAs[String]("postings").split(",").length == 50))
    // the executed plan caps per (token, salt) BEFORE any collect_list
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan.take(3000))
  }

  test("BM25 plan has no doc-length join at all and never sort-merges — " +
       "dl rides the tf rows off one shared tokenize pass") {
    val bm25 = LlmQueries.queries("q_text_bm25")(spark, sf("documents"))
    bm25.collect() // resolve AQE's final plan on this reference
    val plan = bm25.queryExecution.executedPlan.toString
    // r6 pinned the per-doc-length join at shuffle_hash; r7 removes the
    // join entirely (dl is carried as a tf groupBy key), so the only
    // joins left are the explicit broadcasts of dfreq and stats
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("ShuffledHashJoin"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // with broadcast auto-sizing OFF (the 100 TB stand-in) the explicit
    // broadcast()s still hold — no sort-merge can sneak back in
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cold = LlmQueries.queries("q_text_bm25")(spark, sf("documents"))
      cold.collect()
      val coldPlan = cold.queryExecution.executedPlan.toString
      assert(!coldPlan.contains("SortMergeJoin"), coldPlan.take(3000))
      assert(coldPlan.contains("BroadcastHashJoin"), coldPlan.take(3000))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("normalizing tokenizer lowercases, strips punctuation, drops " +
       "empty tokens; bare mode is unchanged") {
    val fixture = Seq(
      (1L, "The QUICK, brown... fox!!  jumps-over 2 dogs"),
      (2L, ""),
      (3L, "already clean tokens")).toDF("id", "text")
    val norm = fixture.orderBy("id")
      .select(LlmOps.tokens(col("text"), normalize = true))
      .as[Seq[String]].collect()
    assert(norm(0) === Seq("the", "quick", "brown", "fox", "jumps",
                           "over", "2", "dogs"))
    assert(norm(1) === Seq.empty)
    assert(norm(2) === Seq("already", "clean", "tokens"))
    // normalize = false stays the bare split the existing oracles pin
    val bare = fixture.orderBy("id")
      .select(LlmOps.tokens(col("text"), normalize = false))
      .as[Seq[String]].collect()
    assert(bare(0).contains("QUICK,"))
    assert(bare(2) === norm(2)) // no-op on clean text, in both modes
  }

  test("auto-tuned embed LSH picks the corpus-appropriate bucket width") {
    // 500 vectors / target 64 per bucket → ceil(log2(7.8)) = 3 bits: the
    // auto form must equal the manually tuned production parameters
    val auto = LlmOps.embedNearDupPairsAuto(embs, "vec_id", "embedding",
                                            16, 64, 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val manual = LlmOps.embedNearDupPairsBucketed(embs, "vec_id",
                                                  "embedding", 16, 3, 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(auto === manual && auto.nonEmpty)
  }

  test("simhash: identical docs collide, near-dups are close") {
    val df = Seq(
      (1L, "spark join hash row batch scan filter merge order vector"),
      (2L, "spark join hash row batch scan filter merge order vector"),
      (3L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val pairs = LlmOps.simhashNearDupPairs(df, "doc_id", "text", 0)
      .select("a", "b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.toSeq === Seq((1L, 2L, 0L)))
  }

  test("hyperplane LSH ANN: query lands in its own bucket; results are a " +
       "subset of the brute-force ranking") {
    val q = embs.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val ann = LlmOps.annLshTopK(embs, q, 4, 10)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(ann.map(_._1).contains(0L)) // the query vector itself
    assert(ann.map(_._2).max === 1.0)
    val brute = LlmOps.cosineTopK(embs, q, 500)
      .select("vec_id").as[Long].collect().toSet
    assert(ann.map(_._1).toSet.subsetOf(brute))
  }

  test("multi-probe LSH ANN recall dominates single-probe and stays a " +
       "subset of the brute-force ranking") {
    val q = embs.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val trueTop = LlmOps.cosineTopK(embs, q, 10)
      .select("vec_id").as[Long].collect().toSet
    def recallOf(ann: Array[Long]) = ann.toSet.intersect(trueTop).size / 10.0
    val single = LlmOps.annLshTopK(embs, q, 4, 10)
      .select("vec_id").as[Long].collect()
    val r1 = LlmOps.annLshMultiProbeTopK(embs, q, 4, 10, radius = 1)
      .select("vec_id").as[Long].collect()
    val r2 = LlmOps.annLshMultiProbeTopK(embs, q, 4, 10, radius = 2)
      .select("vec_id").as[Long].collect()
    // widening the radius widens the candidate set monotonically, so
    // recall can only improve; on this near-random corpus (top-10 sims
    // ~0.4-0.5, per-plane agreement ~2/3) radius 2 is what buys real
    // recall — exactly the knob's purpose
    assert(recallOf(r1) >= recallOf(single))
    assert(recallOf(r2) >= recallOf(r1))
    assert(recallOf(r2) >= 0.7, s"radius-2 recall ${recallOf(r2)}")
    val multi = r2
    assert(multi.contains(0L)) // the query vector itself survives
    // every result is a genuinely scored vector from the corpus ranking
    val bruteAll = LlmOps.cosineTopK(embs, q, 500)
      .select("vec_id").as[Long].collect().toSet
    assert(multi.toSet.subsetOf(bruteAll))
  }

  test("IVF ANN searches exactly one probed cell, exactly") {
    val q = embs.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val ivf = LlmOps.annIvfTopK(embs, q, 64, 10)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(ivf.length === 10)
    // all results come from a single partition (the probed cell) ...
    val labels = embs.filter(col("vec_id").isin(ivf.map(_._1): _*))
      .select("label").as[Int].collect().toSet
    assert(labels.size === 1)
    // ... and within that cell the ranking is exact (= brute force there)
    val cellTop = LlmOps.cosineTopK(
      embs.filter(col("label") === labels.head), q, 10)
      .select("vec_id").as[Long].collect()
    assert(ivf.map(_._1).sorted === cellTop.sorted)
  }

  test("weightedSample: deterministic, k-bounded, weight-dominant row " +
       "always drawn") {
    val rows = (1L to 100L).map(i => (i, 1.0)) :+ (999L, 1e9)
    val df = rows.toDF("id", "w")
    def sample() = LlmOps.weightedSample(df, "id", col("w"), 10)
      .select("id").as[Long].collect().toSet
    val s1 = sample()
    assert(s1.size === 10)
    assert(s1 === sample()) // zero RNG state: bit-identical re-runs
    // key = ln(u)/w → the 1e9-weight row's key ≈ 0⁻ beats every w=1 row
    assert(s1.contains(999L))
    // k > n degenerates to the full set
    assert(LlmOps.weightedSample(df.limit(5), "id", col("w"), 50)
             .count() === 5)
  }

  test("near-dup operators tolerate empty and degenerate corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(LlmOps.ngramJaccardPairs(
      empty.withColumn("lang", lit("en")), "doc_id", "text", "lang", 3, 0.5)
      .count() === 0)
    assert(LlmOps.minhashNearDupPairs(empty, "doc_id", "text", 3, 32, 16, 0.5)
      .count() === 0)
    // one-token docs (shorter than the shingle width) produce no shingles
    val short = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(LlmOps.minhashNearDupPairs(short, "doc_id", "text", 3, 32, 16, 0.5)
      .count() === 0)
    assert(LlmOps.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b")).count() === 0)
  }

  test("connectedComponents propagates the min id across chains") {
    // chain 1-2-3 plus isolated pair 8-9; transitivity needs >1 hop
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("a", "b")
    val out = LlmOps.connectedComponents(pairs)
      .orderBy("node").as[(Long, Long)].collect()
    assert(out === Array((1L, 1L), (2L, 1L), (3L, 1L), (8L, 8L), (9L, 8L)))
  }

  test("mergeComponentLabels: a 3-batch incremental fold equals the " +
       "one-shot star run — including cross-batch bridges that merge " +
       "two stored components") {
    // full pair graph over nodes 1..12: component {1,2,3,7} forms only
    // once batch 3's bridge (3,7) arrives; {8,9} is history-only;
    // {10,11} is new-new within a batch; 5-6 spans batches 2/3
    val allPairs = Seq((1L, 2L), (2L, 3L), (8L, 9L),   // batch 1 mines
                       (4L, 7L), (10L, 11L),           // batch 2 mines
                       (3L, 7L), (5L, 6L)).toDF("a", "b") // batch 3 mines
    val oneShot = LlmOps.connectedComponentsStar(allPairs)
      .orderBy("node").as[(Long, Long)].collect()
    val b1 = LlmOps.connectedComponentsStar(
      Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("a", "b"))
    val b2 = LlmOps.mergeComponentLabels(
      b1, Seq((4L, 7L), (10L, 11L)).toDF("a", "b"))
    val b3 = LlmOps.mergeComponentLabels(
      b2, Seq((3L, 7L), (5L, 6L)).toDF("a", "b"))
    assert(b3.orderBy("node").as[(Long, Long)].collect() === oneShot)
    // the bridge really merged the two stored components under min id 1
    val byNode = b3.as[(Long, Long)].collect().toMap
    assert(byNode(7L) === 1L && byNode(4L) === 1L && byNode(8L) === 8L)
  }

  test("skewed chunk dedup: hot key pre-aggregates map-side and every " +
       "planted doc is flagged") {
    val q = SparkEntry.queries("q_dedup_chunks_skew")
    val df = q(spark, sf("documents"))
    // two-phase aggregate: the heavy chunk's counts combine BEFORE the
    // exchange (partial_count / partial agg in plan), so the hot key
    // costs its occurrence count, never a single-reducer pileup
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("Partial"),
           plan.take(3000))
    // every 3rd doc carries the planted heavy chunk → appears in output
    // with n_dup >= 1
    val flagged = df.select("doc_id").as[Long].collect().toSet
    val planted = Tables(spark, sf("documents"), "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(planted.subsetOf(flagged),
           s"missing planted docs: ${planted.diff(flagged).take(5)}")
  }

  test("langId discriminates a multi-vocabulary corpus") {
    // docs written in genuinely distinct marker vocabularies — unlike the
    // shared-vocabulary synthetic corpus, accuracy here is meaningful
    val corpus = Seq(
      ("en", "the cat sat of the mat and went to a house"),
      ("en", "a tale of the river and the long road to town"),
      ("de", "der hund und die katze liefen zu das haus und der baum"),
      ("de", "die frau und der mann gehen zu das fest"),
      ("es", "el perro y la casa de el rio que corre"),
      ("es", "la luna y el sol de la manana que brilla"),
      ("fr", "le chien et la maison de le fleuve que coule"),
      ("zh", "的 是 了 在 和 的 是 了 在 和")
    ).toDF("expected", "text")
    val out = corpus
      .withColumn("got", LlmOps.langId(LlmOps.tokens(col("text"))))
      .select("expected", "got").as[(String, String)].collect()
    // es/fr share 'la'/'de'/'que' markers; the extra el/le votes decide.
    val correct = out.count { case (e, g) => e == g }
    assert(correct === out.length,
           s"misclassified: ${out.filter { case (e, g) => e != g }.toSeq}")
  }

  test("langId votes by marker tokens with deterministic ties") {
    val out = Seq("the cat of the hat", "der hund und die katze",
                  "el perro y la casa que")
      .toDF("text")
      .select(LlmOps.langId(LlmOps.tokens(col("text"))))
      .as[String].collect()
    assert(out === Array("en", "de", "es"))
  }

  test("exact dedup collapses identical texts to min doc_id") {
    val df = Seq((10L, "x y z"), (20L, "x y z"), (30L, "other")).toDF("doc_id", "text")
    val out = df.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
      .select("keep", "n").as[(Long, Long)].collect().toSet
    assert(out === Set((10L, 2L), (30L, 1L)))
  }

  test("ngramsAll keeps duplicates in order; empty for short docs") {
    val out = Seq("a b a b", "a").toDF("text")
      .select(LlmOps.ngramsAll(LlmOps.tokens(col("text")), 2).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b", "b a", "a b")) // multiset, not distinct
    assert(out(1) === Seq.empty)
  }

  test("repetition signals: periodic text scores high, varied text low") {
    val df = Seq((0L, "x y x y x y x y"), (1L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        explode(LlmOps.ngramsAll(LlmOps.tokens(col("text")), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("mx"), sum("c").as("tot"))
      .select(col("doc_id"), (col("mx") / col("tot")).as("frac"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(out(0)._2 === 4.0 / 7.0) // "x y" appears 4 of 7 bigrams
    assert(out(1)._2 === 1.0 / 7.0) // all bigrams distinct
  }

  test("knn join via bounded-heap UDAF matches the window formulation") {
    val q = embs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val udafTop = SparkEntry.queries("q_knn_join")(spark, sf("embeddings"))
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val windowTop = {
      import org.apache.spark.sql.expressions.Window
      embs.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim_raw",
                    Functions.cosine(col("embedding"), col("q_emb")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("q_id")
            .orderBy(col("sim_raw").desc_nulls_last, col("vec_id"))))
        .filter(col("rn") <= 3)
        .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    }
    assert(udafTop === windowTop)
  }

  test("curation output is a deduped subset of the quality-filtered corpus") {
    val out = SparkEntry.queries("q_curation")(spark, sf("documents"))
    val rows = out.select("doc_id", "n_tok").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 30))
    // one row per content hash
    val hashes = out.select("h").as[String].collect()
    assert(hashes.distinct.length === hashes.length)
  }

  test("content-defined chunks survive an insertion that shifts every " +
       "fixed-width chunk") {
    // 200 distinct tokens; doc B = doc A with ONE token inserted at the
    // front. Boundaries are content-decided, so after the first boundary
    // both docs chunk identically; fixed 8-token windows all shift.
    val base = (0 until 200).map(i => s"w$i")
    val a = base.mkString(" ")
    val b = ("inserted" +: base).mkString(" ")
    val docs = Seq((0L, a), (1L, b)).toDF("doc_id", "text")

    def chunkSets(df: org.apache.spark.sql.DataFrame): (Set[String], Set[String]) = {
      val rows = df.as[(Long, String)].collect()
      (rows.filter(_._1 == 0L).map(_._2).toSet,
       rows.filter(_._1 == 1L).map(_._2).toSet)
    }
    val (cdcA, cdcB) = chunkSets(
      LlmOps.contentChunks(docs, "doc_id", "text", 8)
        .select(col("doc").cast("long"), col("chunk")))
    val fixed = docs.select(col("doc_id"),
      explode(LlmOps.chunksOf(LlmOps.tokens(col("text")), 8)).as("chunk"))
    val (fixA, fixB) = chunkSets(fixed.select(col("doc_id"), col("chunk")))

    val cdcShared = (cdcA intersect cdcB).size
    val fixShared = (fixA intersect fixB).size
    // every CDC chunk after the first boundary is shared; fixed-width
    // chunks are all shifted by one token and share nothing
    assert(cdcShared >= cdcA.size - 1,
           s"CDC chunks should realign after the first boundary: " +
             s"shared=$cdcShared of ${cdcA.size}")
    assert(fixShared === 0, s"fixed chunks unexpectedly aligned: $fixShared")
    assert(cdcShared > 0)
  }

  test("content-defined chunks conserve every token of every document") {
    val docs = Tables(spark, sf("documents"), "documents").limit(100)
    val fromChunks = LlmOps.contentChunks(docs, "doc_id", "text", 8)
      .select(col("doc").as("doc_id"),
              size(split(col("chunk"), " ")).as("n"))
      .groupBy("doc_id").agg(sum("n").as("n_tok"))
    val direct = docs.select(col("doc_id"),
      size(LlmOps.tokens(col("text"))).cast("long").as("n_tok"))
    val diff = fromChunks.join(direct, "doc_id")
      .filter(fromChunks("n_tok") =!= direct("n_tok")).count()
    assert(diff === 0)
    assert(fromChunks.count() === 100)
  }

  test("scrub removes exactly the marker tokens and renormalizes") {
    val df = Seq((0L, "the data x the y"), (1L, "x y z")).toDF("doc_id", "text")
    val cleaned = trim(regexp_replace(
      regexp_replace(col("text"), "\\b(the|a|data|row|query)\\b", " "),
      " +", " "))
    val out = df.select(col("doc_id"), cleaned.as("c"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out(0)._2 === "x y")
    assert(out(1)._2 === "x y z")
  }

  test("ngramLmScore: hand-computed add-1 bigram cross-entropy") {
    // corpus: "a b a", "b a", "x" → unigrams a:3 b:2 x:1, V=3
    // (doc3's lone token joins the vocabulary even though the doc is
    // too short to score); bigrams (a,b):1, (b,a):2.
    // doc1 = avg(-ln((1+1)/(3+3)), -ln((2+1)/(2+3))) ≈ 0.8047
    // doc2 = -ln(3/5) ≈ 0.5108; doc3 emits no bigram → dropped.
    val df = Seq((1L, "a b a"), (2L, "b a"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = LlmOps.ngramLmScore(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Double, Long)].collect()
    assert(out.map(_._1) === Array(1L, 2L))
    assert(math.abs(out(0)._2 -
      (-math.log(2.0 / 6) - math.log(3.0 / 5)) / 2) < 1e-12)
    assert(out(0)._3 === 2L)
    assert(math.abs(out(1)._2 - (-math.log(3.0 / 5))) < 1e-12)
  }

  test("nbClassify: recovers separable classes; ties break to the " +
       "earlier class") {
    val df = Seq(
      (1L, "en", "the cat and the dog"),
      (2L, "en", "a dog of the house"),
      (3L, "de", "der hund und die katze"),
      (4L, "de", "die katze und der haus")
    ).toDF("doc_id", "lang", "text")
    val out = LlmOps.nbClassify(df, "doc_id", "text", "lang",
                                Seq("de", "en"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out === Array((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de")))
    // one shared token, equal priors → equal scores → first class wins
    val tie = Seq((1L, "en", "x x"), (2L, "de", "x x"))
      .toDF("doc_id", "lang", "text")
    val t = LlmOps.nbClassify(tie, "doc_id", "text", "lang",
                              Seq("de", "en"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(t === Array((1L, "de"), (2L, "de")))
  }

  test("dsirWeights: target-distribution tokens score up, off-target " +
       "down; identical docs score identically") {
    // target = lang 'en'. 'alpha' lives (almost) only in the target
    // slice, 'beta' only outside it, so an alpha-doc must outscore a
    // beta-doc; two byte-identical docs must land on the same integer
    // score (the per-bucket floor makes the per-doc sum exact).
    val df = Seq(
      (1L, "en", "alpha alpha alpha"),
      (2L, "en", "alpha alpha alpha"),
      (3L, "xx", "beta beta beta"),
      (4L, "xx", "alpha beta beta")
    ).toDF("doc_id", "lang", "text")
    val out = LlmOps.dsirWeights(df, "doc_id", "text",
                                 col("lang") === "en", 64)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    val score = out.map(r => r._1 -> r._2).toMap
    assert(out.map(_._3).toSeq === Seq(3L, 3L, 3L, 3L))
    assert(score(1L) === score(2L))
    assert(score(1L) > score(3L))
    assert(score(4L) > score(3L) && score(4L) < score(1L))
  }

  test("exactSubstrCoverage: cross-doc passage, within-doc repeat, " +
       "interval union") {
    val uA = "qwertyuiopasdfghjklzxcvbnm0123456789QWERTYUIOPASDF" // 50
    val uB = "ZXCVBNMLKJHGFDSAPOIUYTREWQ9876543210zxcvbnmlkjhgfd" // 50
    val P = "The quick brown fox jumps over a lazy dog -- padded to 60 ch" // 60
    val Q = "Repeated block of forty-five characters 12345" // 45
    val filler = "##@@!!%%^^&&**(())__++==--[[]]" // 30
    require(uA.length == 50 && uB.length == 50 && P.length == 60 &&
            Q.length == 45 && filler.length == 30)
    val df = Seq(
      (1L, uA + P),          // shares P with doc 2
      (2L, uB + P),
      (3L, Q + filler + Q),  // within-doc repeat of Q
      (4L, "a unique line long enough to clear the window size")
    ).toDF("doc_id", "text")
    val out = LlmOps.exactSubstrCoverage(df, "doc_id", "text", 40)
      .orderBy("doc")
      .as[(Long, Long, Long)].collect()
    // Docs 1/2: the 40-char windows fully inside the shared 60-char P
    // start at offsets 50..70 → 21 duplicated positions whose union is
    // exactly P's 60 chars. Doc 3: windows inside either copy of the
    // 45-char Q → 6 + 6 positions, union 45 + 45 = 90 chars across two
    // islands. Doc 4: no duplicated window → absent from the op output
    // (the query layer re-joins zeros).
    assert(out === Array((1L, 21L, 60L), (2L, 21L, 60L), (3L, 12L, 90L)))
  }

  test("incremental ExactSubstr: batch-2 coverage equals the one-shot " +
       "run; compaction changes nothing") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val batch1 = docs.filter(col("doc_id") < 250)
    val batch2 = docs.filter(col("doc_id") >= 250)
    val oneShot = rows(LlmOps.exactSubstrCoverage(docs, "doc_id", "text", 40))
    def run(thr: Int) = {
      val store = java.nio.file.Files.createTempDirectory("graft-ss")
        .toString + "/store"
      val c1 = rows(LlmOps.exactSubstrIncremental(
        batch1, "doc_id", "text", store, 40, compactFileThreshold = thr))
      val c2 = rows(LlmOps.exactSubstrIncremental(
        batch2, "doc_id", "text", store, 40, compactFileThreshold = thr))
      (c1, c2, store)
    }
    val (c1, c2, store) = run(0)
    // batch 1 ran against an empty store → its coverage is the one-shot
    // rule applied to batch 1 alone
    assert(c1 === rows(LlmOps.exactSubstrCoverage(batch1, "doc_id", "text",
                                                  40)))
    // batch 2 sees history + itself → EXACTLY the one-shot full-corpus
    // rows restricted to batch-2 docs
    assert(c2 === oneShot.filter(_._1 >= 250))
    // the history path must have fired (some batch-2 span duplicated only
    // against batch 1)
    assert(c2 !== rows(LlmOps.exactSubstrCoverage(batch2, "doc_id", "text",
                                                  40)))
    // accumulated store = the full corpus's window count
    val totalWindows = docs
      .selectExpr("sum(greatest(length(text) - 39, 0)) AS n")
      .as[Long].head()
    assert(spark.read.parquet(store).selectExpr("sum(n)").as[Long].head()
             === totalWindows)
    // in-lifecycle compaction must not change either batch's rows
    val (a1, a2, _) = run(1)
    assert(a1 === c1 && a2 === c2)
  }

  test("exactSubstrCoverage: seeded random low-alphabet corpus matches a " +
       "brute-force reference (islands, abutments, whole-doc dups)") {
    // 3-letter alphabet + short windows force heavy window collisions,
    // multi-island docs, abutting/overlapping merges, and whole-doc
    // duplication — the edge space the planted fixture can't cover.
    val w = 8
    val rnd = new scala.util.Random(42)
    val corpus = (0L until 25L).map { id =>
      val len = rnd.nextInt(121)
      (id, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    def brute: Map[Long, (Long, Long)] = {
      val wins = for {
        (id, t) <- corpus; if t.length >= w
        p <- 0 to t.length - w
      } yield (id, p, t.substring(p, p + w))
      val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
      wins.filter(x => counts(x._3) > 1).groupBy(_._1).map {
        case (id, xs) =>
          val ps = xs.map(_._2).sorted
          var cover = 0L
          var curStart = -1; var curEnd = -1
          ps.foreach { p =>
            if (curEnd < 0 || p > curEnd) {
              if (curEnd >= 0) cover += curEnd - curStart
              curStart = p; curEnd = p + w
            } else curEnd = p + w
          }
          if (curEnd >= 0) cover += curEnd - curStart
          id -> (xs.size.toLong, cover)
      }
    }
    val got = LlmOps.exactSubstrCoverage(
        corpus.toDF("doc_id", "text"), "doc_id", "text", w)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === brute)
    assert(brute.nonEmpty, "low-alphabet corpus must collide")
  }

  test("sq8Codes: code range, max-axis saturation, reconstruction bound; " +
       "annSq8TopK self-hit") {
    val coded = LlmOps.sq8Codes(embs)
    // every code in [-127, 127], and the max-abs axis saturates to ±127
    assert(coded
      .withColumn("cmax", expr("aggregate(codes, 0, " +
                               "(a, x) -> greatest(a, abs(x)))"))
      .filter(col("cmax") =!= 127 ||
              expr("exists(codes, x -> abs(x) > 127)"))
      .count() === 0)
    // dequantize bound: |x - c·maxabs/127| <= maxabs/254 per axis
    assert(coded
      .withColumn("err", expr(
        "aggregate(zip_with(embedding, codes, " +
        "(x, c) -> abs(cast(x as double) - c * maxabs / 127.0)), " +
        "cast(0.0 as double), (a, e) -> greatest(a, e))"))
      .filter(col("err") > col("maxabs") / 254.0 + 1e-9)
      .count() === 0)
    // the query vector must retrieve itself first among its own corpus
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val top = LlmOps.annSq8TopK(embs, q, 10).as[Long].collect()
    assert(top.length === 10)
    assert(top.head === 0L)
  }

  test("binaryCodes: bit semantics incl. sign-bit wrap; Hamming rerank " +
       "self-retrieves and recalls >= 9/10") {
    // bit i == (x_i > 0); exact zero is NOT positive
    val tiny = Seq((1L, Array(0.5f, -0.1f, 0.0f, 2f)))
      .toDF("vec_id", "embedding")
    assert(LlmOps.binaryCodes(tiny).select("sig").as[Long].head()
             === (1L | (1L << 3)))
    // a positive 64th dim lands on the sign bit: all-positive → all bits
    val allPos = Seq((1L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    assert(LlmOps.binaryCodes(allPos).select("sig").as[Long].head() === -1L)
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    // raw Hamming: the query's own signature sits at distance 0 → first
    assert(LlmOps.annHammingTopK(embs, q, 1).as[Long].head() === 0L)
    // reranked serving path: recall@10 >= 9 vs exact cosine at
    // shortlist 200 (the certified floor)
    val exact = LlmOps.cosineTopK(embs, q, 10)
      .select("vec_id").as[Long].collect().toSet
    val rr = LlmOps.annHammingRerankTopK(embs, q, 10, 200)
      .select("vec_id").as[Long].collect().toSet
    assert(rr.intersect(exact).size >= 9)
    assert(rr.contains(0L))
  }

  test("chunkDedupRewrite: first occurrence survives, later copies " +
       "(cross- and within-doc) excised, trailing partial kept") {
    def words(p: String) = (1 to 8).map(p + _).mkString(" ")
    val A = words("a"); val B = words("b"); val C = words("c")
    val df = Seq(
      (1L, s"$A $B"),      // both chunks are corpus-first here
      (2L, s"$A $C"),      // A is a later copy → only C survives
      (3L, s"$B $B d1 d2") // B twice (doc-1 owns it) + a partial tail
    ).toDF("doc_id", "text")
    val out = LlmOps.chunkDedupRewrite(df, "doc_id", "text", 8)
      .orderBy("doc")
      .as[(Long, Long, Long, String)].collect()
    assert(out === Array(
      (1L, 2L, 2L, s"$A $B"),
      (2L, 2L, 1L, C),
      (3L, 3L, 1L, "d1 d2")))
  }

  test("annCascadeTopK: stage containment, self-retrieval, recall floor") {
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val stage1 = LlmOps.annHammingTopK(embs, q, 200)
      .as[Long].collect().toSet
    val cascade = LlmOps.annCascadeTopK(embs, q, 10, 200, 50)
      .select("vec_id").as[Long].collect()
    // every survivor came through the binary prefilter
    assert(cascade.toSet.subsetOf(stage1))
    assert(cascade.length === 10)
    // exact self-retrieval survives all three stages, ranked first
    assert(cascade.head === 0L)
    val exact = LlmOps.cosineTopK(embs, q, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(cascade.toSet.intersect(exact).size >= 9)
  }

  test("q_graph_pagerank: fixed-point scores respect the teleport floor " +
       "and total-mass ceiling, and some node beats the no-inlink score") {
    val out = SparkEntry.queries("q_graph_pagerank")(spark, sf("documents"))
      .select("pr").as[Long].collect()
    assert(out.length === 20)
    // every score >= the teleport base (0.15 in fixed-point)...
    assert(out.forall(_ >= 150000000L))
    // ...and bounded by the initial total mass (floor losses only shrink)
    val n = docs.count()
    assert(out.forall(_ <= n * 1000000000L))
    // the top-20 of a 500-node graph must contain genuinely linked-to
    // nodes: strictly above the score of a node with zero in-links
    assert(out.max > 150000000L)
  }

  test("bm25Scores: the fixed-point long sum is identical across " +
       "partitionings (integer addition is order-invariant)") {
    def scores(parts: Int) =
      LlmOps.bm25Scores(docs.repartition(parts), "doc_id", "text",
                        Seq("data", "query", "row"))
        .select("doc_id", "bm25_e6")
        .as[(Long, Long)].collect().toMap
    val a = scores(1)
    val b = scores(13)
    assert(a.nonEmpty && a.keySet === b.keySet)
    // exact equality, not a tolerance: per-term doubles integerize to
    // floor(×10⁶) BEFORE the sum, so partial-merge order cannot leak
    assert(a.forall { case (k, v) => v == b(k) })
  }

  test("bpeTrain: the textbook corpus learns (e,s), (es,t), (l,o) " +
       "in order, and the vocabulary reflects the applied merges") {
    // low x5, lower x2, newest x6, widest x3 — the Sennrich example
    // shape. Hand-computed: round 1 ties (e,s)=9 with (s,t)=9, broken
    // lexicographically; round 2 (es,t)=9; round 3 ties (l,o)=7 with
    // (o,w)=7, broken the same way.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val (merges, vocab) = LlmOps.bpeTrain(Seq(corpus).toDF("text"),
                                          "text", 3)
    val m = merges.orderBy("step")
      .select("a", "b", "total").as[(String, String, Long)].collect()
    assert(m.toSeq === Seq(("e", "s", 9L), ("es", "t", 9L),
                           ("l", "o", 7L)))
    val sym = vocab.select("word", "sym")
      .as[(String, Seq[String])].collect().toMap
    assert(sym("low") === Seq("lo", "w"))
    assert(sym("newest") === Seq("n", "e", "w", "est"))
    assert(sym("widest") === Seq("w", "i", "d", "est"))
    assert(sym("lower") === Seq("lo", "w", "e", "r"))
  }

  test("winnowFingerprints: docs sharing a >= w+k-1 token run share a " +
       "fingerprint; short docs yield none; density near 2/(w+1)") {
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val d = Seq(
      (1L, s"one two three $shared four five six seven eight nine"),
      (2L, s"red green blue $shared yellow purple orange pink cyan"),
      (3L, "tiny doc"), // < w+k-1 tokens → no full window
      (4L, (1 to 200).map(i => s"tok$i").mkString(" ")) // all-unique
    ).toDF("doc_id", "text")
    val fp = LlmOps.winnowFingerprints(d, "doc_id", "text")
      .select("doc_id", "h").as[(Long, Long)].collect()
    def hs(id: Long) = fp.filter(_._1 == id).map(_._2).toSet
    // the winnowing guarantee: the 7-token shared run (>= 4+3-1=6)
    // must yield at least one shared selected hash
    assert(hs(1L).intersect(hs(2L)).nonEmpty)
    assert(hs(3L).isEmpty)
    // density: 198 grams, 195 windows → expected ~2/(w+1)=0.4 of
    // positions selected; allow a generous band
    val n4 = hs(4L).size
    assert(n4 > 30 && n4 < 150)
  }

  test("fixedPointPropagate with seed teleport (TrustRank): nodes " +
       "unreachable from any seed score exactly zero, seed mass bounded") {
    import org.apache.spark.sql.DataFrame
    // 0 is the only seed; 0→1→2 chain; 3 links 0 and 4 links 3 but
    // nothing reaches 3 or 4 from the seed → both must score 0
    val base: DataFrame = Seq((0L, 100L), (1L, 0L), (2L, 0L), (3L, 0L),
                              (4L, 0L)).toDF("id", "b")
    val pr0 = Seq((0L, 1000L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L))
      .toDF("id", "pr")
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 0L), (4L, 3L))
      .toDF("src", "dst")
    val out = LlmOps.fixedPointPropagate(base, pr0, edges, 5, 3)
      .orderBy("id").as[(Long, Long)].collect().toMap
    assert(out(3L) === 0L && out(4L) === 0L)
    assert(out(0L) >= 100L && out(1L) > 0L && out(2L) > 0L)
    // floor losses only shrink: total ≤ initial mass + 5 rounds of base
    assert(out.values.sum <= 1000L + 5 * 100L)
  }

  test("prefix-filtered exact Jaccard == the all-pairs baseline on the " +
       "harness corpus (PPJoin filtering is lossless at the threshold)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    for (t <- Seq(0.5, 0.2)) {
      val pf = LlmOps.ngramJaccardPairsPrefix(docs, "doc_id", "text",
                                              "lang", 3, t)
        .collect().map(key).toSet
      val ap = LlmOps.ngramJaccardPairsAllPairs(docs, "doc_id", "text",
                                                "lang", 3, t)
        .collect().map(key).toSet
      assert(pf.nonEmpty, "fixture should contain planted near-dups")
      assert(pf === ap)
    }
  }

  test("prefix filter: one trigram planted in EVERY doc stays out of " +
       "all prefixes — candidates bounded by the true pairs, not n²") {
    // 3000 docs, each 12 unique tokens + the same hot trigram; docs 0/1
    // are near-identical so one true pair exists. The hot shingle's
    // df² = 9M blows the cost probe's budget, so the PUBLIC entry
    // dispatches to the prefix branch here (all-pairs would join the
    // hot shingle into ~9M candidate rows).
    val hot = "the quick fox"
    val base = (0 until 3000).map { i =>
      val uniq = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"$uniq $hot", "en")
    }
    val d = spark.createDataFrame(
      base.updated(1, (1L, base(0)._2.replace("w0_11", "zz"), "en")))
      .toDF("doc_id", "text", "lang")
    val out = LlmOps.ngramJaccardPairs(d, "doc_id", "text", "lang", 3, 0.5)
      .collect()
    assert(out.length === 1 && out.head.getLong(0) === 0L &&
           out.head.getLong(1) === 1L)
    // candidate bound: expose the internal candidate set on the same
    // relation and pin it to a handful of rows — the hot shingle is the
    // MOST frequent key, so it ranks last in every doc's (df, s) order
    // and never enters a prefix of length n - ceil(0.5 n) + 1 << n
    val rel = d
      .select(col("doc_id").as("doc"), col("lang").as("part"),
              explode(LlmOps.shingles(LlmOps.tokens(col("text")), 3))
                .as("s0"))
      .select(col("doc"), col("part"), xxhash64(col("s0")).as("s"))
    val nCand = LlmOps.prefixCandidates(
      LlmOps.prefixArrays(rel, 0.5)).count()
    assert(nCand <= 10L,
           s"hot shingle leaked into prefixes: $nCand candidates")
  }

  test("positional PPJoin filter: prunes occurrence rows on the real " +
       "fixture but keeps >= 1 surviving occurrence per qualifying pair") {
    val rel = docs
      .select(col("doc_id").as("doc"), col("lang").as("part"),
              explode(LlmOps.shingles(LlmOps.tokens(col("text")), 3))
                .as("s0"))
      .select(col("doc"), col("part"), xxhash64(col("s0")).as("s"))
    for (t <- Seq(0.5, 0.2)) {
      val occ = LlmOps.prefixOccurrences(rel, t).cache()
      try {
        val total = occ.count()
        val surviving = occ.filter(col("__survives")).count()
        assert(total > 0L)
        assert(surviving < total,
          s"t=$t: positional filter pruned nothing ($total occurrences)")
        // losslessness on real data: every qualifying pair keeps at
        // least one surviving occurrence (its first shared shingle)
        val qualifying = LlmOps.ngramJaccardPairsAllPairs(
          docs, "doc_id", "text", "lang", 3, t)
          .select("a", "b").as[(Long, Long)].collect().toSet
        val survivorPairs = occ.filter(col("__survives"))
          .select("a", "b").distinct().as[(Long, Long)].collect().toSet
        assert(qualifying.subsetOf(survivorPairs),
          s"t=$t: prune lost pairs ${qualifying.diff(survivorPairs)}")
      } finally occ.unpersist()
    }
  }

  test("annKmeansTopK: the query vector survives its own cell's top-k " +
       "at sim 1.0, every hit comes from ONE cell, and the index memo " +
       "serves repeat queries") {
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val out = LlmOps.annKmeansTopK(embs, q, 8, 3, 10,
                                   cacheKey = Some("spec/embeddings"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.contains(0L) && out(0L) === 1.0)
    // single-cell confinement: every returned id shares vec 0's cluster
    val assign = LlmOps.kmeansInteger(embs, 8, 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val cell = assign(0L)
    assert(out.keySet.forall(id => assign(id) == cell))
    // memoized index: a second serve must hit the cache, not re-fit
    val before = System.nanoTime()
    LlmOps.annKmeansTopK(embs, q, 8, 3, 10,
                         cacheKey = Some("spec/embeddings")).count()
    assert((System.nanoTime() - before) / 1e9 < 5.0)
  }

  test("ngramContainmentPairs: finds a short doc quoted inside a long " +
       "one that Jaccard misses at the same threshold") {
    val quote = "alpha beta gamma delta epsilon zeta"
    val long = (1 to 80).map(i => s"w$i").mkString(" ") + " " + quote
    val d = Seq((1L, quote, "en"), (2L, long, "en"),
                (3L, "totally unrelated words here now", "en"))
      .toDF("doc_id", "text", "lang")
    val cont = LlmOps.ngramContainmentPairs(d, "doc_id", "text", "lang",
                                            3, 0.9)
      .select("a", "b", "cont_ab").collect()
    assert(cont.length === 1 && cont.head.getLong(0) === 1L &&
           cont.head.getLong(1) === 2L)
    assert(cont.head.getDouble(2) === 1.0) // every quote shingle matches
    // symmetric Jaccard at the same bar sees nothing: union is huge
    assert(LlmOps.ngramJaccardPairsAllPairs(d, "doc_id", "text", "lang",
                                            3, 0.9).count() === 0L)
  }

  test("containment prefix branch == all-pairs on the harness corpus, " +
       "and a planted hot shingle routes the public entry through it " +
       "with bounded candidates") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val pf = LlmOps.ngramContainmentPrefix(docs, "doc_id", "text",
                                           "lang", 3, 0.6)
      .collect().map(key).toSet
    val ap = LlmOps.ngramContainmentAllPairs(docs, "doc_id", "text",
                                             "lang", 3, 0.6)
      .collect().map(key).toSet
    assert(ap.nonEmpty && pf === ap)
    // hot corpus (the jaccard spec's shape): 3000 docs share one
    // trigram; docs 0/1 near-identical. sum df^2 = 9M blows the budget
    // so the PUBLIC entry takes the asymmetric prefix branch — and
    // still finds exactly the planted pair
    val hot = "the quick fox"
    val base = (0 until 3000).map { i =>
      val uniq = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"$uniq $hot", "en")
    }
    val d = spark.createDataFrame(
      base.updated(1, (1L, base(0)._2.replace("w0_11", "zz"), "en")))
      .toDF("doc_id", "text", "lang")
    val out = LlmOps.ngramContainmentPairs(d, "doc_id", "text", "lang",
                                           3, 0.6).collect()
    assert(out.length === 1 && out.head.getLong(0) === 0L &&
           out.head.getLong(1) === 1L)
  }

  test("kmeansInteger: separates two planted blobs perfectly and " +
       "every distance is the exact integer SSD to the winner") {
    // blob A around +0.5 on dims 1-4, blob B around -0.5; tiny
    // deterministic jitter
    val rows = (0 until 60).map { k =>
      val sgn = if (k % 2 == 0) 1.0 else -1.0
      val vec = Array.tabulate(64) { i =>
        (if (i < 4) sgn * 0.5 + ((k * 13 + i) % 5 - 2) * 0.002
         else 0.0).toFloat
      }
      (k.toLong, vec)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val out = LlmOps.kmeansInteger(df, 2, 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect()
    val byParity = out.groupBy(_._1 % 2).mapValues(_.map(_._2).toSet)
    // each parity class (= blob) lands in exactly one cluster, and the
    // two blobs land in different clusters
    assert(byParity(0L).size === 1 && byParity(1L).size === 1)
    assert(byParity(0L) != byParity(1L))
  }

  test("pcaTopComponent: recovers a planted dominant axis (|cos| > " +
       "0.95) and the iterate stays on the +-1e5 grid") {
    // 200 vectors: t*u + deterministic small noise, u along (0.6, 0.8)
    // in dims 1-2 — variance along u dominates by ~1000x
    val u = Array.tabulate(64)(i =>
      if (i == 0) 0.6 else if (i == 1) 0.8 else 0.0)
    val rows = (0 until 200).map { k =>
      val t = (k % 21) - 10.0
      val vec = Array.tabulate(64) { i =>
        (t * u(i) + (((k * 31 + i * 7) % 11) - 5) * 0.004).toFloat
      }
      (k.toLong, vec)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val v = LlmOps.pcaTopComponent(df, 64, 8)
      .orderBy("dim").select("v").as[Long].collect().map(_.toDouble)
    assert(v.length === 64)
    assert(v.map(math.abs).max <= 100000.0)
    val dot = v.zip(u).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(v.map(x => x * x).sum) * math.sqrt(u.map(x => x * x).sum))
    assert(cos > 0.95, s"cos=$cos v=${v.take(4).mkString(",")}")
  }

  test("pcaTop2Components: recovers BOTH planted axes in variance " +
       "order and the components are near-orthogonal") {
    // axis 1 along dims 1-2 (amplitude 10), axis 2 along dims 3-4
    // (amplitude 4), deterministic jitter elsewhere
    val u1 = Array.tabulate(64)(i =>
      if (i == 0) 0.6 else if (i == 1) 0.8 else 0.0)
    val u2 = Array.tabulate(64)(i =>
      if (i == 2) 0.8 else if (i == 3) -0.6 else 0.0)
    val rows = (0 until 240).map { k =>
      val t1 = ((k % 21) - 10.0)
      val t2 = (((k * 7) % 17) - 8.0) * 0.4
      val vec = Array.tabulate(64) { i =>
        (t1 * u1(i) + t2 * u2(i) +
         (((k * 31 + i * 7) % 11) - 5) * 0.003).toFloat
      }
      (k.toLong, vec)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val out = LlmOps.pcaTop2Components(df, 8).orderBy("dim")
      .select("v1", "v2").as[(Long, Long)].collect()
    val v1 = out.map(_._1.toDouble); val v2 = out.map(_._2.toDouble)
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      math.abs(d) / (math.sqrt(a.map(x => x * x).sum) *
                     math.sqrt(b.map(x => x * x).sum))
    }
    assert(cos(v1, u1.map(_.toDouble)) > 0.95)
    assert(cos(v2, u2.map(_.toDouble)) > 0.9,
           s"v2 misaligned: ${cos(v2, u2.map(_.toDouble))}")
    assert(cos(v1, v2) < 0.2, s"components not orthogonal: ${cos(v1, v2)}")
  }

  test("q_mix_allocate: quotas sum EXACTLY to the budget (Hamilton " +
       "guarantee), each within one slot of the exact proportion, and " +
       "the greedy fill never exceeds its quota") {
    val out = SparkEntry.queries("q_mix_allocate")(spark, sf("documents"))
      .select("n_avail", "quota", "tok_sel")
      .as[(Long, Long, Long)].collect()
    val nTotal = out.map(_._1).sum
    val budget = nTotal / 2
    assert(out.map(_._2).sum === budget)
    out.foreach { case (avail, quota, sel) =>
      val exact = budget.toDouble * avail / nTotal
      assert(quota >= math.floor(exact).toLong &&
             quota <= math.ceil(exact).toLong,
             s"quota $quota outside [$exact] bracket")
      assert(sel <= quota, "greedy fill exceeded its quota")
      // greedy whole-doc fill leaves less than one max-doc gap only —
      // here just require it filled SOMETHING for nonzero quotas
      assert(quota == 0L || sel > 0L)
    }
  }

  test("hitsScores: a pure authority collects the hub mass, a node " +
       "with no in-links scores zero authority, pure hubs score hub>0") {
    // 1..4 all point at 0; 0 points at 5 (so 0 is also a small hub);
    // node 6 is isolated on the in-side
    val ids = (0L to 6L).toDF("id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 5L))
      .toDF("src", "dst")
    val out = LlmOps.hitsScores(ids, edges, 3, 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // all authority flows to 0 and 5; 6 (and the pure hubs) get none
    assert(out(6L)._1 === 0L)
    assert(out(1L)._1 === 0L)
    assert(out(0L)._1 > out(5L)._1, s"star center must dominate: $out")
    // hub scores: the pointers at the dominant authority are the hubs
    assert(out(1L)._2 > 0L && out(1L)._2 === out(2L)._2)
    // isolated node: no out-edges -> zero hub too
    assert(out(6L)._2 === 0L)
  }

  test("memo cache keys: a derived (filtered) frame NEVER shares the " +
       "raw frame's cluster-map entry, and a re-derived identical " +
       "frame DOES hit (plan-hash discipline)") {
    LlmOps.ccCache.clear()
    LlmOps.jaccardComponents(docs, "doc_id", "text", "lang", 3, 0.5)
    val afterRaw = LlmOps.ccCache.size
    assert(afterRaw === 1)
    // identical re-derivation (fresh Tables() call, new exprIds) must
    // reuse the artifact — canonicalization normalizes the ids
    LlmOps.jaccardComponents(
      Tables(spark, sf("documents"), "documents"),
      "doc_id", "text", "lang", 3, 0.5)
    assert(LlmOps.ccCache.size === afterRaw,
           "re-deriving the same frame must hit the memo, not miss")
    // a filtered consumer must get its OWN entry — sharing the raw
    // table's cluster map would silently serve wrong components
    LlmOps.jaccardComponents(docs.filter(col("doc_id") < 100),
                             "doc_id", "text", "lang", 3, 0.5)
    assert(LlmOps.ccCache.size === afterRaw + 1,
           "a filtered frame must key a distinct memo entry")
  }

  test("memo cache keys: two different in-memory corpora with the same " +
       "schema/knobs get distinct BPE entries (ADVICE r8: the \"\" " +
       "fingerprint fallback shared them)") {
    LlmOps.bpeCache.clear()
    val c1 = Seq("low low lower newest widest").toDF("text")
    val c2 = Seq("entirely different words here").toDF("text")
    LlmOps.bpeTrain(c1, "text", 2)
    LlmOps.bpeTrain(c2, "text", 2)
    assert(LlmOps.bpeCache.size === 2,
           "distinct in-memory corpora must not share a BPE model")
  }

  test("bpeTrain early stop: merges exhaust gracefully and a corpus " +
       "with no mergeable pair yields an EMPTY merge table (matching " +
       "the oracle's LEFT-JOIN chain), not an exception") {
    // "ab" merges once to a single symbol, then nothing remains:
    // asking for 5 rounds must return exactly 1 merge
    val (m1, v1) = LlmOps.bpeTrain(Seq("ab ab ab").toDF("text"), "text", 5)
    assert(m1.count() === 1L)
    assert(v1.select("sym").as[Seq[String]].head() === Seq("ab"))
    // "aa" has only the self-pair (a,a), excluded by the a != b rule:
    // zero merges, vocabulary stays fully symbolized
    val (m0, v0) = LlmOps.bpeTrain(Seq("aa aa").toDF("text"), "text", 3)
    assert(m0.count() === 0L)
    assert(v0.select("sym").as[Seq[String]].head() === Seq("a", "a"))
  }

  test("decontaminate flags exactly the training docs sharing a " +
       "k-shingle with the eval set, counts distinct hits, and keeps " +
       "the eval side broadcast") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the dog"), // hits 'quick brown fox'
      (2L, "completely unrelated words here today"),  // clean
      (3L, "quick brown fox quick brown fox again"),  // same hit twice
      (4L, "ab")                                      // < k tokens: no shingles
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "a quick brown fox appears")).toDF("doc_id", "text")
    val got = LlmOps.decontaminate(train, eval_, "doc_id", "text", 3)
      .select(col("doc").as("doc_id"), col("n_hits"))
      .as[(Long, Long)].collect().toMap
    // eval shingles: {a quick brown, quick brown fox, brown fox appears}
    // doc 1 shares 'quick brown fox' (1 hit); doc 3 contains it twice
    // but distinct-counts once; docs 2 and 4 are clean
    assert(got === Map(1L -> 1L, 3L -> 1L))
    // scale shape: the eval side is an explicit broadcast hash join
    val plan = LlmOps.decontaminate(train, eval_, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
           plan.contains("BroadcastExchange"), plan.take(2000))
  }
}
