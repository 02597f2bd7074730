package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Pins the r16 portable-hash rewrites: [[Md5PrefixLong]] must equal
  * `CAST(conv(substring(md5(x), 1, n), 16, 10) AS BIGINT)` value for
  * value (including NULL and multi-byte inputs), [[Md5KGramHashes]] must
  * equal the winnowing transform+array_join+conv chain element for
  * element, and the strided [[KGrams]] must reproduce the chunksOf HOF.
  */
class Md5NativeSpec extends SparkSpec {

  private def randStrings(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val pool = "abcXYZ019 _-äöüßλημ🌍汉字"
    (1 to n).map { _ =>
      if (rnd.nextInt(20) == 0) null
      else (0 until rnd.nextInt(12)).map(_ =>
        pool(rnd.nextInt(pool.length))).mkString
    }
  }

  test("Md5PrefixLong equals the conv(substring(md5)) chain for " +
       "nHex 8 and 15, with NULLs and multi-byte strings") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        randStrings(11, 500).zipWithIndex.map { case (s, i) =>
          org.apache.spark.sql.Row(i.toLong, s)
        }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "id", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "s", org.apache.spark.sql.types.StringType, nullable = true))))
    for (n <- Seq(8, 15)) {
      val got = df.select(ColumnBridge.column(
          Md5PrefixLong(ColumnBridge.expression(col("s")), n)).as("h"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      val want = df.select(
          expr(s"CAST(conv(substring(md5(s), 1, $n), 16, 10) AS BIGINT)")
            .as("h"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      assert(got.toSeq === want.toSeq, s"nHex=$n")
    }
  }

  private def tokenRows(seed: Int, n: Int,
                        withNulls: Boolean): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("a", "bb", "ccc", "ümlaut", "", "x y")
    (1 to n).map { _ =>
      Seq.fill(rnd.nextInt(14)) {
        if (withNulls && rnd.nextInt(8) == 0) null
        else vocab(rnd.nextInt(vocab.length))
      }
    } ++ Seq(Seq.empty[String], Seq("solo"), null.asInstanceOf[Seq[String]])
  }

  private def tokenDf(rows: Seq[Seq[String]]) =
    spark.createDataFrame(
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

  test("Md5KGramHashes equals the winnowing HOF gram-hash chain") {
    val df = tokenDf(tokenRows(23, 300, withNulls = true))
    for (k <- Seq(1, 3, 4)) {
      val got = df.select(col("id"), ColumnBridge.column(
          Md5KGramHashes(ColumnBridge.expression(col("tk")), k, 8))
          .as("hs"))
        .orderBy("id").collect()
        .map(r => if (r.isNullAt(1)) null else r.getSeq[Long](1))
      val want = df.select(col("id"), expr(
          s"transform(slice(tk, 1, greatest(size(tk) - ${k - 1}, 0)), " +
          "(x, i) -> CAST(conv(substring(md5(" +
          s"array_join(slice(tk, i + 1, $k), ' ')), 1, 8), 16, 10)" +
          " AS BIGINT))").as("hs"))
        .orderBy("id").collect()
        .map(r => if (r.isNullAt(1)) null else r.getSeq[Long](1))
      assert(got.toSeq === want.toSeq, s"k=$k")
    }
  }

  test("strided KGrams equals the chunksOf HOF (trailing partial " +
       "chunk dropped)") {
    val df = tokenDf(tokenRows(37, 300, withNulls = false))
    for (k <- Seq(1, 2, 8)) {
      val got = df.select(col("id"),
          LlmOps.chunksOf(col("tk"), k).as("c"))
        .orderBy("id").collect().map(_.getSeq[String](1))
      val want = df.select(col("id"), expr(
          s"CASE WHEN size(tk) >= $k THEN " +
          s"transform(sequence(0, CAST(size(tk) / $k AS INT) - 1), " +
          s"i -> concat_ws(' ', slice(tk, i * $k + 1, $k))) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END").as("c"))
        .orderBy("id").collect().map(_.getSeq[String](1))
      assert(got.toSeq === want.toSeq, s"k=$k")
    }
  }

  test("winnowFingerprints with the native gram hash keeps the " +
       "shared-run fingerprint guarantee") {
    val docs = spark.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "yesterday the quick brown fox jumps over a fence")
    )).toDF("doc_id", "text")
    val fp = LlmOps.winnowFingerprints(docs, "doc_id", "text")
    val a = fp.filter(col("doc_id") === 1L).select("h")
    val b = fp.filter(col("doc_id") === 2L).select("h")
    assert(a.intersect(b).count() >= 1)
  }
}
