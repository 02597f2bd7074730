package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Pins the r16 k-gram rewrite: the native [[KGrams]] loop must be
  * byte-identical to the interpreted HOF forms it replaced in
  * [[LlmOps.shingles]] / [[LlmOps.ngramsAll]] — same space join, same
  * concat_ws NULL-skip, same array_distinct first-occurrence dedup,
  * same empty-array result for short or NULL inputs.
  */
class KGramsSpec extends SparkSpec {

  /** The exact HOF forms shingles/ngramsAll used through r15. */
  private def hofAll(k: Int) = expr(
    s"CASE WHEN size(tk) >= $k THEN " +
    s"transform(sequence(0, size(tk) - $k), " +
    s"i -> concat_ws(' ', slice(tk, i + 1, $k))) " +
    "ELSE CAST(array() AS ARRAY<STRING>) END")
  private def hofDistinct(k: Int) = expr(
    s"CASE WHEN size(tk) >= $k THEN " +
    s"array_distinct(transform(sequence(0, size(tk) - $k), " +
    s"i -> concat_ws(' ', slice(tk, i + 1, $k)))) " +
    "ELSE CAST(array() AS ARRAY<STRING>) END")

  private def native(k: Int, distinct: Boolean) =
    ColumnBridge.column(
      KGrams(ColumnBridge.expression(col("tk")), k, distinct))

  private def compare(rows: Seq[Seq[String]], k: Int): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.zipWithIndex.map { case (a, i) =>
          org.apache.spark.sql.Row(i.toLong, a)
        }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "id", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "tk", org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, containsNull = true),
          nullable = true))))
    for (distinct <- Seq(false, true)) {
      val ref = if (distinct) hofDistinct(k) else hofAll(k)
      val got = df.select(col("id"), native(k, distinct).as("g"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      val want = df.select(col("id"), ref.as("g"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      assert(got.toSeq === want.toSeq, s"k=$k distinct=$distinct")
    }
  }

  test("KGrams matches the HOF forms on random token arrays " +
       "(small vocabulary forces duplicate grams)") {
    val rnd = new scala.util.Random(4321)
    val vocab = Vector("a", "bb", "ccc", "d", "", "ee")
    val rows = (1 to 400).map { _ =>
      Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length)))
    }
    for (k <- Seq(1, 2, 3, 5)) compare(rows, k)
  }

  test("KGrams matches the HOF forms with NULL tokens, empty and " +
       "short arrays, and NULL input") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("x", "yy", null, "z", "")
    val rows: Seq[Seq[String]] = (1 to 300).map { _ =>
      Seq.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length)))
    } ++ Seq(Seq.empty[String], Seq("one"), Seq("one", "two"),
             null.asInstanceOf[Seq[String]])
    compare(rows, 3)
  }

  test("shingles/ngramsAll keep their documented semantics end-to-end") {
    val docs = spark.createDataFrame(Seq(
      (1L, "a b a b c"), (2L, "a"), (3L, "x x x x")
    )).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
        LlmOps.shingles(LlmOps.tokens(col("text")), 2).as("s"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(sh(0) === Seq("a b", "b a", "b c")) // distinct, first occurrence
    assert(sh(1) === Seq.empty)                // < k tokens
    assert(sh(2) === Seq("x x"))               // all-duplicate grams
    val ng = docs.select(col("doc_id"),
        LlmOps.ngramsAll(LlmOps.tokens(col("text")), 2).as("g"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(ng(0) === Seq("a b", "b a", "a b", "b c")) // multiset kept
    assert(ng(2) === Seq("x x", "x x", "x x"))
  }
}
