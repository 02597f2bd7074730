package graft

import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("microsToTimestampSecond truncates sub-second micros (CH parity)") {
    // toDateTime(x / 1000000) floors: 1_999_999 µs → 1 s (README.md:226-227)
    val out = Seq(999999L, 1000000L, 1999999L, 2000000L).toDF("us")
      .select(Functions.microsToTimestampSecond(col("us")).cast("long"))
      .as[Long].collect()
    assert(out === Array(0L, 1L, 1L, 2L))
  }

  test("sortedIntersectCountBounded: exact when the pair can qualify, " +
       "filter-equivalent always (random sorted sets, several thresholds)") {
    val rnd = new scala.util.Random(7)
    val cases = (1 to 400).map { _ =>
      val universe = 200
      def set() = (0 until (1 + rnd.nextInt(80)))
        .map(_ => rnd.nextInt(universe).toLong).distinct.sorted.toArray
      (set(), set())
    }
    for (t <- Seq(0.1, 0.2, 0.5, 0.9)) {
      val out = cases.toDF("a", "b")
        .select(
          Functions.sortedIntersectCount(col("a"), col("b")).as("exact"),
          Functions.sortedIntersectCountBounded(col("a"), col("b"), t)
            .as("bounded"),
          size(col("a")).as("na"), size(col("b")).as("nb"))
        .as[(Long, Long, Int, Int)].collect()
      out.foreach { case (exact, bounded, na, nb) =>
        def jac(c: Long) = c.toDouble / (na + nb - c)
        // the contract: identical filter verdict at every threshold...
        assert((jac(exact) >= t) === (jac(bounded) >= t),
          s"t=$t: verdicts diverge (exact=$exact bounded=$bounded)")
        // ...and an exact count whenever the pair qualifies
        if (jac(exact) >= t)
          assert(bounded === exact,
            s"t=$t: qualifying pair got a bailed count")
        assert(bounded <= exact)
      }
    }
  }

  test("cosine is 1 for identical vectors, -1 for opposite, 0 for orthogonal") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(-1f, 0f, 0f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f))
    ).toDF("a", "b")
    val out = df.select(round(Functions.cosine(col("a"), col("b")), 9))
      .as[Double].collect()
    assert(out === Array(1.0, -1.0, 0.0))
  }

  test("cosine is symmetric and bounded on random float vectors") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 25).map { _ =>
      val n = 1 + rnd.nextInt(64)
      (Array.fill(n)(rnd.nextFloat() * 20 - 10),
       Array.fill(n)(rnd.nextFloat() * 20 - 10))
    }
    val out = cases.toDF("x", "y")
      .select(Functions.cosine(col("x"), col("y")).as("ab"),
              Functions.cosine(col("y"), col("x")).as("ba"))
      .as[(Double, Double)].collect()
    out.foreach { case (ab, ba) =>
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }
  }

  test("dotProduct matches hand computation") {
    val out = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
      .select(Functions.dotProduct(col("a"), col("b"))).as[Double].head()
    assert(out === 11.0)
  }

  test("contentHash is stable and distinguishes distinct strings") {
    val out = Seq("a", "a", "b").toDF("s")
      .select(Functions.contentHash(col("s"))).as[Long].collect()
    assert(out(0) === out(1))
    assert(out(0) !== out(2))
  }

  test("BoundedLevenshtein rewrites threshold predicates to the banded " +
       "early-exit form, results unchanged") {
    GraftExtensions.register(spark)
    // RDD-backed (a LocalRelation would be constant-folded before the
    // filter could show the rewrite)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("kitten", "sitting"),
        org.apache.spark.sql.Row("kitten", "kitten"),
        org.apache.spark.sql.Row("abc", "abcdefgh"),
        org.apache.spark.sql.Row("a", null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "x", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(
          "y", org.apache.spark.sql.types.StringType))))
    val filtered = df.filter(levenshtein(col("x"), col("y")) <= 3)
    val optimized = filtered.queryExecution.optimizedPlan.toString
    // the rewrite installed the length guard and the 3-arg levenshtein
    assert(optimized.contains("levenshtein(x#") &&
           optimized.contains("Some(3)) >= 0"), optimized)
    assert(optimized.contains("abs((length(x#"), optimized)
    // semantics identical to the unrewritten comparison: dist 3 and 0
    // pass, dist 5 and the null row don't
    assert(filtered.as[(String, String)].collect().toSet ===
           Set(("kitten", "sitting"), ("kitten", "kitten")))
  }

  test("SQL registry exposes dot_product / cosine_sim with native codegen") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .as[Double].head()
    assert(dot === 11.0)
    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D))")
      .as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
    // z-order interleave from SQL = the DataFrame helper's bit tree
    val z = spark.sql("SELECT zorder2(3L, 5L)").as[Long].head()
    assert(z === 39L) // spread(3)=5, spread(5)=17 → 5 | 17<<1
    // SQL form and DataFrame form are the same expression tree
    val viaDf = Seq((Array(1f, 2f, 3f), Array(9f, 8f, 7f))).toDF("a", "b")
      .select(Functions.cosine(col("a"), col("b"))).as[Double].head()
    val viaSql = {
      Seq((Array(1f, 2f, 3f), Array(9f, 8f, 7f))).toDF("a", "b")
        .createOrReplaceTempView("vecs")
      spark.sql("SELECT cosine_sim(a, b) FROM vecs").as[Double].head()
    }
    assert(viaDf === viaSql)
  }

  test("optimizer rule rewrites the HOF dot-product fold to native form") {
    GraftExtensions.register(spark)
    // parquet-backed input so constant folding can't collapse the plan
    val e = Tables(spark, sf("embeddings"), "embeddings")
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val df = e.select(
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
                lit(0.0), (acc, v) => acc + v).as("d"))
    assert(df.queryExecution.executedPlan.toString.contains("dot_product"),
           df.queryExecution.executedPlan.toString.take(800))
    // and the rewritten plan computes the same values as the native form
    val viaNative = e.select(Functions.dotProduct(col("v"), col("v")).as("d"))
    assert(df.as[Double].collect().toSeq ===
           viaNative.as[Double].collect().toSeq)
  }

  test("ipv4 functions: round-trip, edges, RFC-1918 ranges") {
    val df = Seq(0L, 4294967295L, 167772161L /* 10.0.0.1 */,
                 2886729728L /* 172.16.0.0 */, 3232235521L /* 192.168.0.1 */,
                 134744072L /* 8.8.8.8 */)
      .toDF("ip")
    val out = df.select(
        Functions.ipv4NumToString(col("ip")).as("s"),
        Functions.ipv4StringToNum(Functions.ipv4NumToString(col("ip")))
          .as("rt"),
        Functions.ipv4IsPrivate(col("ip")).as("p"))
      .as[(String, Long, Boolean)].collect()
    assert(out(0) === (("0.0.0.0", 0L, false)))
    assert(out(1) === (("255.255.255.255", 4294967295L, false)))
    assert(out(2) === (("10.0.0.1", 167772161L, true)))
    assert(out(3) === (("172.16.0.0", 2886729728L, true)))
    assert(out(4) === (("192.168.0.1", 3232235521L, true)))
    assert(out(5) === (("8.8.8.8", 134744072L, false)))
  }

  test("geohashEncode anchors and haversine identities") {
    val df = Seq((0.0, 0.0), (89.999999, 179.999999), (-90.0, -180.0))
      .toDF("lat", "lon")
    val gh = df.select(Functions.geohashEncode(col("lat"), col("lon")))
      .as[String].collect()
    // (0,0) quantizes to the half cell: first interleaved bits 11000 =
    // 's', everything after exact zero; the NE corner saturates to all
    // ones ('z'×8), the SW corner to all zeros.
    assert(gh === Array("s0000000", "zzzzzzzz", "00000000"))
    val d = df.limit(1).select(
        Functions.haversineKm(lit(48.85), lit(2.35), lit(48.85),
                              lit(2.35)).as("zero"),
        Functions.haversineKm(lit(0.0), lit(0.0), lit(0.0), lit(180.0))
          .as("anti"))
      .as[(Double, Double)].head()
    assert(d._1 === 0.0)
    // antipodal along the equator = half the circumference = π·6371
    assert(math.abs(d._2 - math.Pi * 6371.0) < 1e-6)
  }
}
