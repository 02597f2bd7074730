package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators (SURVEY.md §2.10, L1-L7 + BASELINE.json
  * north_star): dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard,
  * embedding cosine), similarity search (brute-force + LSH-bucketed ANN),
  * and text analysis (token stats, quality, language-ID, fingerprints).
  *
  * Everything is built from codegen'd built-ins and higher-order functions
  * — no UDFs, no driver-side loops. The only shuffles are the
  * bucket/candidate-pair exchanges inherent to the algorithms, which is
  * what makes them 100 TB-viable: cost scales with bucket collision counts,
  * not with the quadratic all-pairs space.
  */
object LlmOps {

  def tokens(text: Column): Column = split(text, " ")

  /** Distinct k-token shingles of a token array (empty when < k tokens). */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
         array_distinct(transform(
           sequence(lit(0), size(toks) - k),
           i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature: for hash seed j, min over shingles of
    * xxhash64(j, shingle). One aggregate per seed (Scala-side loop keeps
    * the lambdas non-nested → clean codegen).
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { j =>
      aggregate(sh, lit(Long.MaxValue),
                (acc, s) => least(acc, xxhash64(lit(j), s)))
    }: _*)

  /** LSH band hashes: signature of length bands*rowsPerBand → one hash per
    * band. Docs sharing any band hash become candidate pairs.
    */
  def minhashBandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { i =>
      xxhash64(lit(i), slice(sig, i * rowsPerBand + 1, rowsPerBand))
    }: _*)

  /** L2 near-duplicate candidate pairs via MinHash+LSH, verified with exact
    * shingle Jaccard. Shuffle cost: one exchange on (band, bandHash) for
    * candidate generation + two broadcast-able joins to fetch shingle sets.
    */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          shingleK: Int, numHashes: Int, bands: Int,
                          minJaccard: Double): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSh = docs
      .select(col(idCol).as("doc"), col(textCol).as("text"))
      .withColumn("sh", shingles(tokens(col("text")), shingleK))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .withColumn("bandhash", minhashBandHashes(col("sig"), bands, rowsPerBand))
      .select(col("doc"), col("sh"), posexplode(col("bandhash"))
        .as(Seq("band", "bh")))
    val a = withSh.select(col("doc").as("a"), col("band"), col("bh"),
                          col("sh").as("sh_a"))
    val b = withSh.select(col("doc").as("b"), col("band"), col("bh"),
                          col("sh").as("sh_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("a") < col("b"))
      .select("a", "b", "sh_a", "sh_b").dropDuplicates("a", "b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact n-gram Jaccard pairs in relational form (explode + count
    * intersections) — the formulation that scales (and that a SQL oracle
    * can replicate row-for-row). `partCol` bounds the pair space (e.g.
    * same-language only).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        partCol: String, shingleK: Int,
                        minJaccard: Double): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc"), col(partCol).as("part"),
              explode(shingles(tokens(col(textCol)), shingleK)).as("s"))
    val counts = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col("doc").as("a"), col("part"), col("s"))
      .join(sh.select(col("doc").as("b"), col("part"), col("s")),
            Seq("part", "s"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("doc").as("a"), col("n_sh").as("na")), "a")
      .join(counts.select(col("doc").as("b"), col("n_sh").as("nb")), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash from a precomputed token-hash array column: bit k is
    * set when the sum over tokens of ±1 (by bit k of the token hash) is
    * positive.
    */
  def simhashFromHashes(tokenHashes: Column): Column =
    (0 until 64).map { k =>
      val contrib = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + (shiftright(h, k).bitwiseAND(lit(1L)) * 2 - 1))
      when(contrib > 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** SimHash near-dup pairs: band the 64-bit hash into 4×16-bit keys
    * (a pair within Hamming distance 3 must agree on ≥1 band), then filter
    * candidates by exact Hamming distance.
    */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int): DataFrame = {
    val hashed = docs
      .select(col(idCol).as("doc"), col(textCol).as("text"))
      .withColumn("th", transform(tokens(col("text")), t => xxhash64(t)))
      .withColumn("simhash", simhashFromHashes(col("th")))
      .withColumn("bands", array((0 until 4).map { i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))
      }: _*))
      .select(col("doc"), col("simhash"),
              posexplode(col("bands")).as(Seq("band", "bk")))
    val a = hashed.select(col("doc").as("a"), col("simhash").as("ha"),
                          col("band"), col("bk"))
    val b = hashed.select(col("doc").as("b"), col("simhash").as("hb"),
                          col("band"), col("bk"))
    a.join(b, Seq("band", "bk"))
      .filter(col("a") < col("b"))
      .select("a", "b", "ha", "hb").dropDuplicates("a", "b")
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }

  /** Brute-force cosine top-k against a single query vector (broadcast).
    * The scale path replaces the global sort with per-partition top-k; at
    * harness sizes TakeOrderedAndProject already does exactly that.
    */
  def cosineTopK(embeddings: DataFrame, query: DataFrame, k: Int): DataFrame =
    embeddings.crossJoin(broadcast(query))
      .withColumn("sim_raw", Functions.cosine(col("embedding"), col("q_emb")))
      .orderBy(col("sim_raw").desc_nulls_last, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("sim_raw"), 4).as("sim"))

  /** Deterministic random-hyperplane bucket id (numPlanes sign bits) for
    * LSH-bucketed ANN. Plane p's coefficients are ±1 derived from
    * xxhash64(p, dimension-index) — no stored model, identical on any
    * cluster.
    */
  def hyperplaneBucket(vec: Column, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
                 (x, i) => x.cast("double") *
                   (pmod(xxhash64(lit(p), i), lit(2)).cast("double") * 2 - 1)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** LSH-bucketed ANN: restrict the scan to the query's hyperplane bucket,
    * then exact cosine top-k within it. At 100 TB the bucket column is a
    * partition key — the query touches 1/2^planes of the data.
    */
  def annLshTopK(embeddings: DataFrame, query: DataFrame, numPlanes: Int,
                 k: Int): DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", hyperplaneBucket(col("embedding"), numPlanes))
    val qb = query
      .select(hyperplaneBucket(col("q_emb"), numPlanes).as("q_bucket"))
    val inBucket = bucketed
      .join(broadcast(qb), col("bucket") === col("q_bucket"), "left_semi")
      .drop("bucket")
    cosineTopK(inBucket, query, k)
  }

  /** Language ID by stopword voting: per-language marker-token counts,
    * argmax wins (deterministic tie-break by language order). A real
    * deployment swaps the marker lists; the operator shape — N conditional
    * counts + greatest() — is the scalable part.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "que"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  def langScores(toks: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, words) =>
      lang -> size(filter(toks,
        t => array_contains(array(words.map(lit): _*), t))).cast("long")
    }

  def langId(toks: Column): Column = {
    val scores = langScores(toks)
    // argmax with first-listed language winning ties
    scores.tail.foldLeft(
      (lit(scores.head._1), scores.head._2)) { case ((bestL, bestS), (l, s)) =>
      (when(s > bestS, lit(l)).otherwise(bestL),
       when(s > bestS, s).otherwise(bestS))
    }._1
  }
}
