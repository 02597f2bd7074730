package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Pins the r16 winnow-selection rewrite: the native [[WinnowMinima]]
  * loop must reproduce the interpreted aggregate-HOF fold it replaced in
  * [[LlmOps.winnowFingerprints]] — same rightmost tie-break, same NULL
  * handling (a NULL hash never wins; an all-NULL window yields the
  * (-1, Long.MaxValue) sentinel), same array_distinct first-occurrence
  * dedup — on random arrays, tie-heavy arrays, NULL-studded arrays and
  * the short-array empty case.
  */
class WinnowMinimaSpec extends SparkSpec {

  /** The exact SQL form winnowFingerprints used through r15. */
  private def hofSql(w: Int): String =
    s"""CASE WHEN size(hs) >= $w THEN
       |  array_distinct(transform(sequence(0, size(hs) - $w),
       |    j -> aggregate(sequence(j, j + ${w - 1}),
       |      named_struct('pos', -1, 'h',
       |                   CAST(9223372036854775807 AS BIGINT)),
       |      (acc, i) -> IF(element_at(hs, i + 1) <= acc.h,
       |        named_struct('pos', i,
       |                     'h', element_at(hs, i + 1)),
       |        acc))))
       |ELSE array() END""".stripMargin

  private def nativeCol(w: Int) =
    ColumnBridge.column(
      WinnowMinima(ColumnBridge.expression(col("hs")), w))

  private def compare(rows: Seq[Seq[java.lang.Long]], w: Int): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.zipWithIndex.map { case (a, i) =>
          org.apache.spark.sql.Row(i.toLong, a)
        }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "id", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "hs", org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = true),
          nullable = true))))
    val got = df.select(col("id"), nativeCol(w).as("sel"))
      .select(col("id"), expr(
        "transform(sel, s -> concat(s.pos, ':', s.h))").as("sel"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val want = df.select(col("id"), expr(hofSql(w)).as("sel"))
      .select(col("id"), expr(
        "transform(sel, s -> concat(s.pos, ':', s.h))").as("sel"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(got.toSeq === want.toSeq)
  }

  test("WinnowMinima matches the HOF fold on random arrays " +
       "(small hash range forces ties)") {
    val rnd = new scala.util.Random(1234)
    val rows: Seq[Seq[java.lang.Long]] = (1 to 400).map { _ =>
      Seq.fill(rnd.nextInt(24))(java.lang.Long.valueOf(rnd.nextInt(7).toLong))
    }
    for (w <- Seq(1, 2, 4, 5)) compare(rows, w)
  }

  test("WinnowMinima matches the HOF fold with NULL hashes, " +
       "all-NULL windows and short arrays") {
    val rnd = new scala.util.Random(99)
    val rows: Seq[Seq[java.lang.Long]] = (1 to 300).map { _ =>
      Seq.fill(rnd.nextInt(16)) {
        if (rnd.nextInt(3) == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rnd.nextInt(5).toLong)
      }
    } ++ Seq(
      Seq.empty[java.lang.Long],                       // size 0
      Seq(java.lang.Long.valueOf(3L)),                 // size < w
      Seq[java.lang.Long](null, null, null, null, null), // all NULL
      // sentinel recurs NON-adjacently: null,null,null,null | 1 at the
      // edge | null,null,null,null — array_distinct must collapse both
      // sentinel windows to one entry
      Seq[java.lang.Long](null, null, null, null, 1L,
                          null, null, null, null))
    compare(rows, 4)
  }

  test("WinnowMinima on the winnowFingerprints relation matches the " +
       "HOF form end-to-end (shared-run guarantee intact)") {
    // two docs sharing a >= 6-token run must share a fingerprint
    val docs = spark.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "yesterday the quick brown fox jumps over a fence"),
      (3L, "completely unrelated words appear in this one here")
    )).toDF("doc_id", "text")
    val fp = LlmOps.winnowFingerprints(docs, "doc_id", "text")
    val a = fp.filter(col("doc_id") === 1L).select("h")
    val b = fp.filter(col("doc_id") === 2L).select("h")
    assert(a.intersect(b).count() >= 1)
    // and the relation itself equals the r15 HOF replay
    val hof = docs
      .select(col("doc_id"),
              LlmOps.tokens(col("text"), normalize = true).as("tk"))
      .select(col("doc_id"),
              expr("transform(slice(tk, 1, greatest(size(tk) - 2, 0)), " +
                   "(x, i) -> CAST(conv(substring(md5(" +
                   "array_join(slice(tk, i + 1, 3), ' ')), 1, 8), 16, 10)" +
                   " AS BIGINT))").as("hs"))
      .select(col("doc_id"), explode(expr(hofSql(4))).as("sel"))
      .select(col("doc_id"), col("sel.pos").as("pos"), col("sel.h").as("h"))
    assert(fp.orderBy("doc_id", "pos").collect().toSeq ===
           hof.orderBy("doc_id", "pos").collect().toSeq)
  }
}
