package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the hand-written merge/graph logic — the
  * pieces whose bugs the oracle gate would only catch on inputs the
  * harness data happens to produce.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val entries: Gen[List[(Long, Double)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(-100.0, 100.0)))

  test("TopKByScore: any partition split merges to the global top-k") {
    val agg = new Udafs.TopKByScore(5)
    check(forAll(entries, Gen.choose(0, 10)) { (xs, splitSeed) =>
      val expected = xs
        .sortBy(t => (-t._2, t._1)).take(5)
      // arbitrary split into partitions, reduce each, merge pairwise
      val parts = xs.grouped(math.max(1, splitSeed + 1)).toList
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == expected
    })
  }

  test("TopKByScore: reduce order never changes the result") {
    val agg = new Udafs.TopKByScore(3)
    check(forAll(entries) { xs =>
      val a = xs.foldLeft(agg.zero)(agg.reduce)
      val b = xs.reverse.foldLeft(agg.zero)(agg.reduce)
      agg.finish(a) == agg.finish(b)
    })
  }

  private val edgeList: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
      .map(_.filter { case (a, b) => a != b })

  /** Reference union-find for the distributed components loop. */
  private def bruteComponents(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElse(a, a); parent.getOrElse(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  test("connectedComponents equals union-find on random graphs") {
    val spark = SparkSpec.session
    import spark.implicits._
    // scalacheck's shrinker would re-run Spark jobs per shrink step; a
    // fixed sample of generated graphs keeps the test fast and still
    // property-driven
    val samples = Gen.listOfN(12, edgeList).sample.get
    samples.foreach { edges =>
      val expected = bruteComponents(edges)
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else LlmOps.connectedComponents(edges.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"edges=$edges")
    }
  }

  test("connectedComponentsStar equals union-find on random graphs") {
    val spark = SparkSpec.session
    import spark.implicits._
    val samples = Gen.listOfN(12, edgeList).sample.get
    samples.foreach { edges =>
      val expected = bruteComponents(edges)
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else LlmOps.connectedComponentsStar(edges.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"edges=$edges")
    }
  }

  test("mergeComponentLabels: any batch split of a random pair set " +
       "folds to the one-shot star labels") {
    val spark = SparkSpec.session
    import spark.implicits._
    val samples = Gen.listOfN(8,
      Gen.zip(edgeList.suchThat(_.nonEmpty), Gen.choose(1, 4))).sample.get
    samples.foreach { case (edges, nBatches) =>
      val expected = bruteComponents(edges)
      // slice the pair stream into batches; batch 1 seeds via the
      // one-shot star, the rest fold in incrementally
      val size = math.max(1, edges.size / nBatches)
      val batches = edges.grouped(size).toList
      var labels = LlmOps.connectedComponentsStar(
        batches.head.toDF("a", "b"))
      batches.tail.foreach { b =>
        labels = LlmOps.mergeComponentLabels(labels, b.toDF("a", "b"))
      }
      val got = labels.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"edges=$edges nBatches=$nBatches")
    }
  }

  test("globalRowNumberInPlan: random multisets with heavy ties rank " +
       "identically to the reference sort") {
    val spark = SparkSpec.session
    import spark.implicits._
    // values drawn from a TINY domain (0..5) force deep tie classes
    // and near-empty buckets; ids are made unique for a total order
    val rows: Gen[List[Long]] =
      Gen.nonEmptyListOf(Gen.choose(0L, 5L))
    val samples = Gen.listOfN(8, rows).sample.get
    samples.foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
        .toDF("v", "id")
      val expected = vs.zipWithIndex
        .sortBy { case (v, i) => (v, i.toLong) }
        .zipWithIndex
        .map { case ((_, id), rn) => id.toLong -> (rn + 1).toLong }
        .toMap
      import org.apache.spark.sql.functions.col
      val got = Relational.globalRowNumberInPlan(
          df, col("v"), Seq(col("v"), col("id")), buckets = 4)
        .select("id", "rn")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"vs=$vs")
    }
  }

  test("globalRowNumberAuto: random distributions — skewed or uniform, " +
       "whatever form the probe picks ranks identically to the " +
       "reference sort, and the probe measures the true max share") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // value domains from pathological (1 value = total skew) through
    // tiny (deep ties) to wide (near-uniform): the dispatch must be an
    // optimization, never a semantics change
    val domains = Seq(0L, 3L, 50L, 5000L)
    val gens = domains.map(d => Gen.nonEmptyListOf(Gen.choose(0L, d)))
    gens.foreach { g =>
      val vs = Gen.listOfN(3, g).sample.get
      vs.foreach { sample =>
        val df = sample.zipWithIndex.map { case (v, i) => (v, i.toLong) }
          .toDF("v", "id")
        val expected = sample.zipWithIndex
          .sortBy { case (v, i) => (v, i.toLong) }
          .zipWithIndex
          .map { case ((_, id), rn) => id.toLong -> (rn + 1).toLong }
          .toMap
        val got = Relational.globalRowNumberAuto(
            df, col("v"), Seq(col("v"), col("id")), buckets = 8)
          .select("id", "rn")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === expected, s"sample=$sample")
        // the probe is EXACT: recompute max bucket share by hand with
        // the same floor map the plan uses
        val lo = sample.min.toDouble
        val hi = sample.max.toDouble
        val byBucket = sample.groupBy(v =>
          math.min(7L, math.floor((v - lo) * 8 / (hi - lo + 1.0)).toLong))
        val trueShare =
          byBucket.values.map(_.size).max.toDouble / sample.size
        val probed = Relational.leadingBucketShare(df, col("v"), 8)
        assert(math.abs(probed - trueShare) < 1e-9,
               s"probe=$probed true=$trueShare sample=$sample")
      }
    }
  }

  test("ClickHouse type mapping: random nested array types round-trip " +
       "write-name -> read-type exactly (for the invertible scalar " +
       "subset)") {
    import org.apache.spark.sql.types._
    val d = ClickHouse.ClickHouseDialect
    val md = new MetadataBuilder()
    // scalars whose CH name maps back to the SAME catalyst type
    // (BooleanType -> UInt8 -> ShortType is deliberately lossy and
    // excluded; Date/Timestamp excluded only to keep the generator flat)
    val invertible: Gen[DataType] = Gen.oneOf(
      ShortType, IntegerType, LongType, FloatType, DoubleType,
      StringType, DecimalType(20, 0), DecimalType(9, 4))
    def arrays(depth: Int): Gen[DataType] =
      if (depth == 0) invertible
      else Gen.frequency(
        2 -> invertible,
        1 -> (for {
          inner <- arrays(depth - 1)
          // null ELEMENTS are only spellable for scalar elements
          // (Nullable(Array) is illegal in ClickHouse)
          cn <- if (inner.isInstanceOf[ArrayType]) Gen.const(false)
                else Gen.oneOf(true, false)
        } yield ArrayType(inner, cn)))
    check(forAll(arrays(3)) { dt =>
      d.getJDBCType(dt).forall { j =>
        d.getCatalystType(0, j.databaseTypeDefinition, 0, md)
          .contains(dt)
      } && d.getJDBCType(dt).nonEmpty
    })
  }

  test("long chains: label propagation refuses to truncate; " +
       "alternating-star converges in O(log^2 n) rounds") {
    val spark = SparkSpec.session
    import spark.implicits._
    // a path graph of diameter 100 — far beyond a maxIter=3 round budget
    val chain = (0L until 100L).sliding(2).map(s => (s(0), s(1))).toList
    val err = intercept[IllegalStateException] {
      LlmOps.connectedComponents(chain.toDF("a", "b"), maxIter = 3).collect()
    }
    assert(err.getMessage.contains("did not converge"))
    // the alternating-star algorithm needs only O(log^2 n) rounds: the
    // same 100-node chain collapses well within 15 rounds
    val star = LlmOps.connectedComponentsStar(chain.toDF("a", "b"),
                                              maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.size === 100 && star.values.forall(_ == 0L))
  }

  test("SkewKurtFormula: exact power sums reproduce closed-form " +
       "skewness/kurtosis on any integer sample (vs direct evaluation)") {
    val samples: Gen[List[Long]] =
      Gen.nonEmptyListOf(Gen.choose(0L, 50L)).suchThat(_.size >= 2)
    check(forAll(samples) { vs =>
      val n = vs.size.toDouble
      val mean = vs.sum / n
      val m2 = vs.map(v => v * v).sum / n - mean * mean
      // degenerate (constant) samples are excluded by the guard in-plan
      m2 <= 0 || {
        val m3d = vs.map(v => math.pow(v - mean, 3)).sum / n
        val m4d = vs.map(v => math.pow(v - mean, 4)).sum / n
        val skew = m3d / (m2 * math.sqrt(m2))
        val kurt = m4d / (m2 * m2)
        // replicate the formula's power-sum form
        val (s1, s2, s3, s4) = (vs.sum.toDouble,
          vs.map(v => v * v).sum.toDouble,
          vs.map(v => v * v * v).sum.toDouble,
          vs.map(v => v * v * v * v).sum.toDouble)
        val m3f = s3 / n - 3.0 * (s1 / n) * (s2 / n) +
          2.0 * (s1 / n) * (s1 / n) * (s1 / n)
        val m4f = s4 / n - 4.0 * (s1 / n) * (s3 / n) +
          6.0 * (s1 / n) * (s1 / n) * (s2 / n) -
          3.0 * math.pow(s1 / n, 4)
        val skewF = m3f / (m2 * math.sqrt(m2))
        val kurtF = m4f / (m2 * m2)
        // algebraically identical; floating cancellation stays tiny on
        // the bounded domain
        math.abs(skew - skewF) < 1e-6 && math.abs(kurt - kurtF) < 1e-6
      }
    })
  }
}
