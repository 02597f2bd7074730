package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

/** S1/S8 end-to-end against a real JDBC database (embedded Derby, which
  * ships with Spark): seed the reference's 3-row users table
  * (`/root/reference/README.md:108-112`), snapshot it in parallel through
  * the partitioned JDBC source, run the CDC latest-state view, and write
  * back through the JDBC sink — the full
  * "PostgreSQL → engine → ClickHouse" movement with Derby standing in for
  * both endpoints.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE users (
        |  user_id BIGINT PRIMARY KEY,
        |  username VARCHAR(50),
        |  account_type VARCHAR(20),
        |  updated_at BIGINT)""".stripMargin)
    Seq((1L, "user1", "Bronze", 1000000L), (2L, "user2", "Silver", 1000000L),
        (3L, "user3", "Gold", 1000000L), (4L, "user2b", "Gold", 2000000L))
      .foreach { case (id, n, a, t) =>
        st.execute(s"INSERT INTO users VALUES ($id, '$n', '$a', $t)")
      }
    st.close()
    conn.close()
  }

  test("S1: partitioned JDBC snapshot reads the source table in parallel") {
    val df = Sources.jdbcSnapshot(spark, url, "users",
      partitionColumn = "user_id", lowerBound = 0L, upperBound = 10L,
      numPartitions = 3)
    assert(df.rdd.getNumPartitions === 3)
    assert(df.count() === 4)
    assert(df.filter(col("account_type") === "Gold").count() === 2)
  }

  test("S1 at scale: rank-balanced snapshot splits a SKEWED key evenly " +
       "and reads every row exactly once") {
    // 90% of keys clustered low, sparse tail ×1000 higher — the value-
    // arithmetic splitter would put 90+ rows in partition 0
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE snap_skew (k BIGINT NOT NULL, v BIGINT)")
    (1 to 90).foreach(i => st.execute(
      s"INSERT INTO snap_skew VALUES ($i, $i)"))
    (1 to 10).foreach(i => st.execute(
      s"INSERT INTO snap_skew VALUES (${1000000 + i * 1000}, $i)"))
    st.close(); conn.close()
    val df = Sources.jdbcSnapshotBalanced(spark, url, "snap_skew",
                                          partitionColumn = "k",
                                          numPartitions = 4)
    assert(df.select(sum("K")).head().getLong(0) ===
      (1 to 90).map(_.toLong).sum +
        (1 to 10).map(i => 1000000L + i * 1000).sum)
    assert(df.count() === 100)
    val perPart = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.length === 4)
    assert(perPart.forall(c => c >= 24 && c <= 26),
      s"rank-balanced snapshot expected ~25 rows/partition: ${
        perPart.mkString(",")}")
    // the value-arithmetic splitter on the same data IS skewed (the
    // contrast that motivates the balanced form)
    val naive = Sources.jdbcSnapshot(spark, url, "snap_skew", "k",
                                     lowerBound = 1L,
                                     upperBound = 1010000L,
                                     numPartitions = 4)
    val naiveParts = naive.rdd.mapPartitions(it => Iterator(it.size))
      .collect()
    assert(naiveParts.max >= 90,
      s"expected value-split skew: ${naiveParts.mkString(",")}")
  }

  test("S2: incremental poll ships only rows past the cursor") {
    val delta = Sources.jdbcIncremental(spark, url, "users",
                                        "updated_at", 1000000L)
    assert(delta.select("user_id").as[Long].collect() === Array(4L))
  }

  test("S1->S2 handoff: first poll starts exactly at the snapshot's " +
       "cursor — no row lost, none duplicated") {
    // dedicated table: the scenario mutates it mid-test
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE users_handoff (
        |  user_id BIGINT PRIMARY KEY, updated_at BIGINT)""".stripMargin)
    Seq((1L, 1000000L), (2L, 1000000L), (3L, 2000000L)).foreach {
      case (id, t) => st.execute(
        s"INSERT INTO users_handoff VALUES ($id, $t)")
    }
    val (snap, cursor) = Sources.snapshotWithCursor(
      spark, url, "users_handoff", "updated_at")
    assert(cursor === Some(2000000L))
    val snapIds = snap.select("user_id").as[Long].collect().toSet
    assert(snapIds === Set(1L, 2L, 3L))
    // a row committed AFTER the snapshot bound
    st.execute("INSERT INTO users_handoff VALUES (4, 3000000)")
    st.close(); conn.close()
    val delta = Sources.jdbcIncremental(spark, url, "users_handoff",
                                        "updated_at", cursor.get)
    val deltaIds = delta.select("user_id").as[Long].collect().toSet
    assert(deltaIds === Set(4L))
    // continuity: snapshot ∪ poll covers the table exactly once
    assert((snapIds ++ deltaIds) === Set(1L, 2L, 3L, 4L))
    assert(snapIds.intersect(deltaIds).isEmpty)
    // empty-table handoff: no cursor, first poll takes over from MinValue
    val st2 = DriverManager.getConnection(url).createStatement()
    st2.execute(
      "CREATE TABLE users_empty (user_id BIGINT, updated_at BIGINT)")
    st2.close()
    val (emptySnap, noCursor) = Sources.snapshotWithCursor(
      spark, url, "users_empty", "updated_at")
    assert(noCursor === None && emptySnap.count() === 0)
  }

  test("S8: snapshot -> transform -> JDBC sink round-trips") {
    val snapshot = Sources.jdbcSnapshot(spark, url, "users",
      "user_id", 0L, 10L, 2)
    val transformed = snapshot
      .withColumn("updated_ts",
                  Functions.microsToTimestampSecond(col("updated_at")))
      .drop("updated_at")
    // create the sink table via the JDBC writer itself
    Sources.jdbcSink(transformed, url, "users_final")
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "users_final").load()
    assert(back.count() === 4)
    assert(back.schema("updated_ts").dataType ===
           org.apache.spark.sql.types.TimestampType)
  }

  test("S8b: JDBC upsert sink — one row per key, updates win, replay is " +
       "a no-op") {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE users_serve (
        |  user_id BIGINT PRIMARY KEY,
        |  account_type VARCHAR(20),
        |  updated_at BIGINT)""".stripMargin)
    st.close(); conn.close()

    def serveState(): Array[(Long, String, Long)] =
      spark.read.format("jdbc").option("url", url)
        .option("dbtable", "users_serve").load()
        .orderBy("user_id")
        .as[(Long, String, Long)].collect()

    val batch1 = Seq((1L, "Bronze", 1L), (2L, "Silver", 1L), (3L, "Gold", 1L))
      .toDF("user_id", "account_type", "updated_at")
    Sources.jdbcUpsertSink(batch1, url, "users_serve", Seq("user_id"))
    assert(serveState() === Array((1L, "Bronze", 1L), (2L, "Silver", 1L),
                                  (3L, "Gold", 1L)))

    // batch 2: update of user 2 + a new user 5
    val batch2 = Seq((2L, "Gold", 2L), (5L, "Bronze", 2L))
      .toDF("user_id", "account_type", "updated_at")
    Sources.jdbcUpsertSink(batch2, url, "users_serve", Seq("user_id"))
    val after = Array((1L, "Bronze", 1L), (2L, "Gold", 2L), (3L, "Gold", 1L),
                      (5L, "Bronze", 2L))
    assert(serveState() === after)

    // at-least-once redelivery of the SAME batch must change nothing
    Sources.jdbcUpsertSink(batch2, url, "users_serve", Seq("user_id"))
    assert(serveState() === after)
  }

  test("streaming CDC -> latest-state -> JDBC upsert: the reference " +
       "pipeline end-to-end, duplicate delivery included") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE users_stream (
        |  user_id BIGINT PRIMARY KEY,
        |  account_type VARCHAR(20),
        |  updated_at BIGINT)""".stripMargin)
    conn.close()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-jdbc-ckpt").toString
    val stream = MemoryStream[(Long, String, Long)]
    val df = stream.toDF().toDF("user_id", "account_type", "updated_at")
    val q = Streaming.jdbcUpsertStreamSink(df, url, "users_stream",
      Seq("user_id"), Seq("updated_at"), ckpt).start()
    // batch 1: three inserts, one with a duplicate delivery + newer version
    stream.addData(Seq((1L, "Bronze", 1L), (2L, "Silver", 1L),
                       (2L, "Gold", 2L), (2L, "Gold", 2L)))
    q.processAllAvailable()
    // batch 2: user 1 upgraded
    stream.addData(Seq((1L, "Silver", 3L)))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "users_stream").load()
      .orderBy("user_id").as[(Long, String, Long)].collect()
    assert(got === Array((1L, "Silver", 3L), (2L, "Gold", 2L)))
  }
}
