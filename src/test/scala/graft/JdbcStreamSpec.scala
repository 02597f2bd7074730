package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** S2 as an engine-owned Structured Streaming source ([[JdbcCdcSource]],
  * `format("graft-jdbc")`): schema inference over the JDBC type matrix,
  * cursor-granular admission control, rank-balanced range planning on a
  * skewed cursor, restart-resume from the checkpoint offset log, and
  * `startingCursor` semantics — all against embedded Derby, the same
  * stand-in discipline as [[JdbcSpec]].
  */
class JdbcStreamSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftstream;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val st = c.createStatement(); st.execute(sql); st.close() }
    finally c.close()
  }

  private def tmp(tag: String): String =
    sys.props("java.io.tmpdir") + s"/graft-jdbcstream-$tag-" +
      java.util.UUID.randomUUID().toString.take(8)

  override def beforeAll(): Unit = {
    super.beforeAll()
    exec("""CREATE TABLE feed (
           |  seq BIGINT NOT NULL,
           |  uid BIGINT,
           |  kind VARCHAR(20),
           |  amount DOUBLE)""".stripMargin)
    (1L to 20L).foreach { i =>
      exec(s"INSERT INTO feed VALUES ($i, ${i % 5}, 'k${i % 3}', ${i}.5)")
    }
  }

  private def readFeed(table: String, cursor: String,
                       extra: Map[String, String] = Map.empty) = {
    val r = spark.readStream.format("graft-jdbc")
      .option("url", url).option("table", table)
      .option("cursorColumn", cursor)
    extra.foldLeft(r)((b, kv) => b.option(kv._1, kv._2)).load()
  }

  private def drainTo(df: org.apache.spark.sql.DataFrame, out: String,
                      ckpt: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("schema inference covers the JDBC type matrix, values and NULLs " +
       "decode exactly") {
    exec("""CREATE TABLE typed (
           |  seq BIGINT NOT NULL,
           |  i INTEGER, sm SMALLINT, d DOUBLE, r REAL,
           |  s VARCHAR(40), c CHAR(3), b BOOLEAN,
           |  dcol DECIMAL(10,2), ts TIMESTAMP, dt DATE,
           |  bin VARCHAR(8) FOR BIT DATA)""".stripMargin)
    exec("INSERT INTO typed VALUES (1, 7, 3, 2.5, 1.25, 'hello', 'abc', " +
         "true, 1234.56, TIMESTAMP('2024-03-01 12:34:56.789'), " +
         "DATE('2024-03-02'), X'DEADBEEF')")
    exec("INSERT INTO typed VALUES (2, NULL, NULL, NULL, NULL, NULL, " +
         "NULL, NULL, NULL, NULL, NULL, NULL)")
    val out = tmp("typed-out"); val ckpt = tmp("typed-ckpt")
    drainTo(readFeed("typed", "seq"), out, ckpt)
    val got = spark.read.parquet(out)
    val byName = got.schema.fields.map(f => f.name.toLowerCase -> f.dataType)
      .toMap
    assert(byName("seq") === LongType)
    assert(byName("i") === IntegerType)
    assert(byName("sm") === ShortType)
    assert(byName("d") === DoubleType)
    assert(byName("r") === FloatType)
    assert(byName("s") === StringType)
    assert(byName("b") === BooleanType)
    assert(byName("dcol") === DecimalType(10, 2))
    assert(byName("ts") === TimestampType)
    assert(byName("dt") === DateType)
    assert(byName("bin") === BinaryType)
    val r1 = got.filter(col("SEQ") === 1).collect()(0)
    assert(r1.getAs[Int]("I") === 7)
    assert(r1.getAs[Short]("SM") === 3.toShort)
    assert(r1.getAs[Double]("D") === 2.5)
    assert(r1.getAs[Float]("R") === 1.25f)
    assert(r1.getAs[String]("S") === "hello")
    assert(r1.getAs[String]("C") === "abc")
    assert(r1.getAs[Boolean]("B") === true)
    assert(r1.getAs[java.math.BigDecimal]("DCOL")
      .compareTo(new java.math.BigDecimal("1234.56")) === 0)
    assert(r1.getAs[java.sql.Timestamp]("TS").toInstant.toString
             === "2024-03-01T12:34:56.789Z")
    assert(r1.getAs[java.sql.Date]("DT").toLocalDate.toString
             === "2024-03-02")
    assert(r1.getAs[Array[Byte]]("BIN").toSeq
             === Array(0xDE, 0xAD, 0xBE, 0xEF).map(_.toByte).toSeq)
    val r2 = got.filter(col("SEQ") === 2).collect()(0)
    (1 until r2.length).foreach(i => assert(r2.isNullAt(i),
      s"column $i of the NULL row must decode as null"))
  }

  test("admission cap paces the backlog into multiple micro-batches, " +
       "none larger than the cap (unique cursor)") {
    val out = tmp("cap-out"); val ckpt = tmp("cap-ckpt")
    val q = readFeed("feed", "seq", Map("maxRowsPerBatch" -> "6"))
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out).start()
    try q.processAllAvailable() finally q.stop()
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batches.sum === 20)
    assert(batches.length >= 4, s"expected >=4 paced batches: " +
      batches.mkString(","))
    assert(batches.forall(_ <= 6), s"a batch exceeded the cap: " +
      batches.mkString(","))
    assert(spark.read.parquet(out).count() === 20)
  }

  test("cursor ties at the admission boundary ride together — atomic " +
       "cursor values, no loss, no duplication") {
    exec("CREATE TABLE tied (seq BIGINT NOT NULL, v BIGINT)")
    // 4 distinct cursor values x 3 ties each; cap 2 forces every
    // boundary to land mid-tie
    for (s <- 1 to 4; t <- 1 to 3)
      exec(s"INSERT INTO tied VALUES ($s, ${s * 10 + t})")
    val out = tmp("tied-out"); val ckpt = tmp("tied-ckpt")
    val q = readFeed("tied", "seq", Map("maxRowsPerBatch" -> "2"))
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() === 12)
    assert(got.select("V").as[Long].collect().sorted.toSeq ===
      (for (s <- 1 to 4; t <- 1 to 3) yield (s * 10 + t).toLong).sorted)
    // every batch ends on a value boundary: each distinct seq appears
    // in exactly one batch => 3 rows per non-empty batch here
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(batches.forall(_ % 3 == 0),
      s"a tie group was split across batches: ${batches.mkString(",")}")
  }

  test("restart resumes from the checkpoint offset log: rows arriving " +
       "while the stream is down appear exactly once") {
    exec("CREATE TABLE resume_feed (seq BIGINT NOT NULL, v VARCHAR(10))")
    (1 to 8).foreach(i => exec(s"INSERT INTO resume_feed VALUES ($i, 'a$i')"))
    val out = tmp("res-out"); val ckpt = tmp("res-ckpt")
    drainTo(readFeed("resume_feed", "seq",
                     Map("maxRowsPerBatch" -> "3")), out, ckpt)
    // arrives across the seam, stream DOWN
    (9 to 14).foreach(i => exec(s"INSERT INTO resume_feed VALUES ($i, 'a$i')"))
    drainTo(readFeed("resume_feed", "seq",
                     Map("maxRowsPerBatch" -> "3")), out, ckpt)
    val got = spark.read.parquet(out).select("V").as[String].collect()
    assert(got.sorted.toSeq === (1 to 14).map(i => s"a$i").sorted)
  }

  test("startingCursor=latest skips the existing table, captures only " +
       "post-start changes") {
    exec("CREATE TABLE tail_feed (seq BIGINT NOT NULL, v VARCHAR(10))")
    (1 to 5).foreach(i => exec(s"INSERT INTO tail_feed VALUES ($i, 'old$i')"))
    val out = tmp("tail-out"); val ckpt = tmp("tail-ckpt")
    val q = readFeed("tail_feed", "seq",
                     Map("startingCursor" -> "latest"))
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out).start()
    try {
      q.processAllAvailable()
      (6 to 9).foreach(i =>
        exec(s"INSERT INTO tail_feed VALUES ($i, 'new$i')"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).select("V").as[String].collect()
    assert(got.sorted.toSeq === (6 to 9).map(i => s"new$i").sorted)
  }

  test("range planning splits a SKEWED cursor range at row-count rank " +
       "boundaries: disjoint cover, balanced within one rank step") {
    // 90% of rows clustered at the low end, a sparse tail at the top —
    // value-arithmetic splits would put everything in one range
    exec("CREATE TABLE skewed (seq BIGINT NOT NULL, v BIGINT)")
    (1 to 90).foreach(i => exec(s"INSERT INTO skewed VALUES ($i, $i)"))
    (1 to 10).foreach(i =>
      exec(s"INSERT INTO skewed VALUES (${1000000 + i * 1000}, $i)"))
    val opts = new CaseInsensitiveStringMap(Map(
      "url" -> url, "table" -> "skewed", "cursorColumn" -> "seq",
      "numPartitions" -> "4").asJava)
    val conf = JdbcCdcSource.confOf(opts)
    val schema = JdbcCdcSource.withConnection(conf)(
      JdbcCdcSource.inferSchema(_, conf))
    val stream = new JdbcMicroBatchStream(conf, schema)
    val parts = stream
      .planInputPartitions(JdbcCursorOffset(Long.MinValue),
                           JdbcCursorOffset(Long.MaxValue - 1))
      .map(_.asInstanceOf[JdbcRangePartition])
    assert(parts.length === 4)
    // contiguous disjoint cover of the planned span
    parts.sliding(2).foreach { case Array(a, b) =>
      assert(a.hi === b.lo, "ranges must be contiguous")
    }
    // each range holds 100/4 = 25 rows (+/- the tie-free exactness here)
    val counts = parts.map { p =>
      val c = DriverManager.getConnection(url)
      try {
        val st = c.createStatement()
        val rs = st.executeQuery("SELECT COUNT(*) FROM skewed WHERE " +
          s"seq > ${p.lo} AND seq <= ${p.hi}")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }
    assert(counts.sum === 100)
    assert(counts.forall(c => c >= 24 && c <= 26),
      s"rank-balanced split expected ~25 rows each: ${counts.mkString(",")}")
  }

  test("boundary planning issues O(p log range) count-bounded probes — " +
       "not the O(rank)-entry OFFSET walks — on a skewed key") {
    // same 90/10 skew shape as above; the pin is on the PLANNER's own
    // cost: probes <= p * (log2(range) + 2) + 1, each probe a COUNT over
    // a FETCH-FIRST-bounded derived table (<= n/p + 1 entries walked)
    exec("CREATE TABLE probes_t (seq BIGINT NOT NULL, v BIGINT)")
    (1 to 90).foreach(i => exec(s"INSERT INTO probes_t VALUES ($i, $i)"))
    (1 to 10).foreach(i =>
      exec(s"INSERT INTO probes_t VALUES (${1000000 + i * 1000}, $i)"))
    def plan(p: Int): (Seq[Long], Long) = {
      val opts = new CaseInsensitiveStringMap(Map(
        "url" -> url, "table" -> "probes_t", "cursorColumn" -> "seq",
        "numPartitions" -> p.toString).asJava)
      val conf = JdbcCdcSource.confOf(opts)
      val schema = JdbcCdcSource.withConnection(conf)(
        JdbcCdcSource.inferSchema(_, conf))
      val stream = new JdbcMicroBatchStream(conf, schema)
      val bounds = stream.splitBoundaries(0L, 1010001L)
      (bounds, stream.lastPlanProbes.get())
    }
    val range = 1010001L
    val log2 = 64 - java.lang.Long.numberOfLeadingZeros(range) // ceil-ish
    for (p <- Seq(4, 8)) {
      val (bounds, probes) = plan(p)
      assert(bounds.size === p - 1)
      assert(probes <= p.toLong * (log2 + 2) + 1,
        s"p=$p: $probes probes exceeds the p*log(range) planning bound")
    }
    // growth is ~linear in p (each boundary is one bisection), nothing
    // like the OFFSET planner's n*p/2 entry walks
    val (_, p4) = plan(4); val (_, p8) = plan(8)
    assert(p8 <= 3 * p4,
      s"probe growth p=4 -> p=8 should be ~2x, got $p4 -> $p8")
  }

  test("S1 composite: the balanced batch snapshot and the streaming leg " +
       "share ONE range planner end-to-end — snapshot partitions land on " +
       "splitBoundaries' bounds, the handoff cursor is the snapshot max, " +
       "and snapshot ∪ stream covers the table exactly once") {
    // skewed cursor so value-arithmetic partitioning would visibly fail
    exec("CREATE TABLE composite (seq BIGINT NOT NULL, v VARCHAR(10))")
    (1 to 45).foreach(i => exec(s"INSERT INTO composite VALUES ($i, 'a$i')"))
    (1 to 5).foreach(i =>
      exec(s"INSERT INTO composite VALUES (${500000 + i * 100}, 'b$i')"))
    // batch-snapshot leg: rank-balanced parallel read
    val snap = Sources.jdbcSnapshotBalanced(spark, url, "composite",
                                            partitionColumn = "seq",
                                            numPartitions = 4)
    // provenance: the snapshot's physical partitions carry EXACTLY the
    // (lo, hi] key ranges the streaming planner computes for the same
    // (table, cursor, p) — same conf, same splitBoundaries call
    val opts = new CaseInsensitiveStringMap(Map(
      "url" -> url, "table" -> "composite", "cursorColumn" -> "seq",
      "numPartitions" -> "4").asJava)
    val conf = JdbcCdcSource.confOf(opts)
    val schema = JdbcCdcSource.withConnection(conf)(
      JdbcCdcSource.inferSchema(_, conf))
    val stream = new JdbcMicroBatchStream(conf, schema)
    val bounds = stream.splitBoundaries(0L, 500500L) // (min-1, max]
    val los = 0L +: bounds
    val his = bounds :+ 500500L
    val perPart = snap.select(col("SEQ")).rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSet))
      .collect()
    assert(perPart.length === 4)
    perPart.zip(los.zip(his)).foreach { case (keys, (lo, hi)) =>
      assert(keys.forall(k => k > lo && k <= hi),
        s"snapshot partition strayed outside planner range ($lo, $hi]")
      assert(keys.size >= 12 && keys.size <= 13,
        s"rank balance ±1 expected, got ${keys.size} rows")
    }
    // handoff: the streaming leg starts at the snapshot's max cursor
    val handoff = snap.agg(max(col("SEQ"))).head().getLong(0)
    assert(handoff === 500500L)
    // rows committed after the snapshot
    (1 to 6).foreach(i =>
      exec(s"INSERT INTO composite VALUES (${600000 + i}, 'c$i')"))
    val out = tmp("composite-out"); val ckpt = tmp("composite-ckpt")
    drainTo(readFeed("composite", "seq",
                     Map("startingCursor" -> handoff.toString)), out, ckpt)
    val streamed = spark.read.parquet(out).select("SEQ").as[Long]
      .collect().toSet
    assert(streamed === (1 to 6).map(i => 600000L + i).toSet)
    val snapKeys = perPart.flatten.toSet
    assert(snapKeys.intersect(streamed).isEmpty)
    assert(snapKeys.size + streamed.size === 56)
  }

  test("lagWindow fences admission below the visible tip: a late-commit " +
       "row surfacing under the polled HWM is still captured") {
    // the commit-visibility race, simulated on single-writer Derby: a
    // writer allocated cursor 95 but its commit lands only after the
    // first poll. WITHOUT the fence the first poll would commit HWM=100
    // and 95 would be below the high-water mark forever; with
    // lagWindow=10 the first poll admits only (…, 90], and once the tip
    // advances past 105 the late row is inside the next admitted range.
    exec("CREATE TABLE lagged (seq BIGINT NOT NULL, v VARCHAR(10))")
    ((1 to 94) ++ (96 to 100)).foreach(i =>
      exec(s"INSERT INTO lagged VALUES ($i, 'r$i')"))
    val out = tmp("lag-out"); val ckpt = tmp("lag-ckpt")
    val opts = Map("lagWindow" -> "10")
    drainTo(readFeed("lagged", "seq", opts), out, ckpt)
    val first = spark.read.parquet(out).selectExpr("max(SEQ)").head().getLong(0)
    assert(first === 90L,
      s"fence must hold the HWM 10 under the tip (100): got $first")
    // the straggler becomes visible, then the tip advances past 95 + lag
    exec("INSERT INTO lagged VALUES (95, 'late')")
    (101 to 110).foreach(i => exec(s"INSERT INTO lagged VALUES ($i, 'r$i')"))
    drainTo(readFeed("lagged", "seq", opts), out, ckpt)
    val got = spark.read.parquet(out).select("V").as[String].collect().toSet
    assert(got.contains("late"),
      "late-visible row under the prior tip must be captured")
    assert(spark.read.parquet(out).selectExpr("max(SEQ)").head()
      .getLong(0) === 100L, "second poll fenced at 110 - 10")
    // every admitted row exactly once
    assert(spark.read.parquet(out).count() ===
      spark.read.parquet(out).select("SEQ").distinct().count())
  }

  test("Trigger.AvailableNow drains the backlog through the admission " +
       "cap and terminates") {
    exec("CREATE TABLE avnow (seq BIGINT NOT NULL, v BIGINT)")
    (1 to 10).foreach(i => exec(s"INSERT INTO avnow VALUES ($i, $i)"))
    val out = tmp("av-out"); val ckpt = tmp("av-ckpt")
    val q = readFeed("avnow", "seq", Map("maxRowsPerBatch" -> "4"))
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow must self-terminate")
    assert(spark.read.parquet(out).count() === 10)
  }
}
