package graft

import org.apache.spark.sql.functions._

/** Pins the r16 normalizing-tokenizer rewrite: the native [[TokensNorm]]
  * byte scan must equal the regex chain
  * `filter(split(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " "),
  * t -> t != "")` token for token — including Unicode lowering edge
  * cases (U+0130 lowers to "i" + combining dot: the "i" must survive as
  * a token character), multi-byte separators, digits, and empty/NULL
  * inputs.
  */
class TokensNormSpec extends SparkSpec {

  private val hof = expr(
    """filter(split(regexp_replace(lower(s), '[^a-z0-9 ]', ' '), ' '),
      |t -> t != '')""".stripMargin)

  private def compare(rows: Seq[String]): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.zipWithIndex.map { case (s, i) =>
          org.apache.spark.sql.Row(i.toLong, s)
        }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "id", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "s", org.apache.spark.sql.types.StringType, nullable = true))))
    val got = df.select(col("id"), LlmOps.tokens(col("s"), normalize = true)
        .as("tk"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) null else r.getSeq[String](1))
    val want = df.select(col("id"), hof.as("tk"))
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) null else r.getSeq[String](1))
    assert(got.toSeq === want.toSeq)
  }

  test("TokensNorm equals the regex chain on adversarial inputs") {
    compare(Seq(
      "Hello, World! 123",
      "  leading and trailing  ",
      "",
      " ",
      null,
      "ALLCAPS mixedCase x9y0z",
      "tabs\tand\nnewlines\r\nhere",
      "unicode: äöü ß λόγος 漢字 🌍 — dashes–and—emdash",
      "İstanbul İstanbul", // U+0130 lowers to i + combining dot
      "ΣΊΣΥΦΟΣ",                 // final-sigma lowering
      "a1b2c3 4d5e6f",
      "a  b   c", // separator runs
      "!@#$%^&*()",
      "ends with punct!",
      "!starts with punct"))
  }

  test("TokensNorm equals the regex chain on random Unicode soup") {
    val rnd = new scala.util.Random(2024)
    val pool = "abzAZ09 ._!äÖüλΣς漢🌍\t\n-İı"
    compare((1 to 500).map { _ =>
      (0 until rnd.nextInt(40)).map(_ =>
        pool(rnd.nextInt(pool.length))).mkString
    })
  }
}
