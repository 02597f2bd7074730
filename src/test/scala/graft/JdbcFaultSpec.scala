package graft

import java.sql.DriverManager

/** Database-layer fault sweep for the `graft-jdbc` streaming source —
  * the JDBC analog of RestFaultSpec's HTTP proxy and CrashInjectionSpec's
  * FaultFs: [[FaultJdbc]] counts every database touch a two-phase
  * streaming run performs (connection open, query execution, row-fetch
  * block — across offset planning, boundary probing, and partition
  * reads), then re-runs once per op index with a transient SQLException
  * armed there. Whatever the engine was doing at that moment fails; the
  * restarted stream must converge to the no-fault sink state
  * bit-for-bit — a transient database fault may abort a trigger but can
  * never lose, duplicate, or tear a row (the checkpoint offset log +
  * file-sink manifest own exactly-once; the DB fault tears neither).
  */
class JdbcFaultSpec extends SparkSpec {

  private val realUrl = "jdbc:derby:memory:graftjfault;create=true"
  private val faultUrl = s"jdbc:graftfault:s:$realUrl"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(realUrl)
    try { val st = c.createStatement(); st.execute(sql); st.close() }
    finally c.close()
  }

  private def count(table: String): Long = {
    val c = DriverManager.getConnection(realUrl)
    try {
      val st = c.createStatement()
      val rs = st.executeQuery(s"SELECT COUNT(*) FROM $table")
      rs.next(); rs.getLong(1)
    } catch { case _: java.sql.SQLException => -1L }
    finally c.close()
  }

  private def seedIdempotent(table: String, upto: Int, lo: Int,
                             hi: Int): Unit = {
    if (count(table) < 0)
      exec(s"CREATE TABLE $table (seq BIGINT NOT NULL, v VARCHAR(20))")
    if (count(table) < upto)
      (lo until hi).foreach(i =>
        exec(s"INSERT INTO $table VALUES ($i, 'v$i')"))
  }

  private def runStream(root: String, table: String): Unit = {
    val q = spark.readStream.format("graft-jdbc")
      .option("url", faultUrl).option("table", table)
      .option("cursorColumn", "seq")
      .option("maxRowsPerBatch", "4")
      .option("numPartitions", "2")
      .load()
      .selectExpr("seq", "v")
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$root/ckpt")
      .option("path", s"$root/out")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def tableOf(root: String) =
    "t" + Integer.toHexString(root.hashCode).replace('-', 'm')

  private def run(root: String): Unit = {
    val table = tableOf(root)
    seedIdempotent(table, 10, 0, 10)
    runStream(root, table)
    seedIdempotent(table, 16, 10, 16) // arrives across the seam
    runStream(root, table)
  }

  private def observe(root: String): Seq[String] =
    try spark.read.parquet(s"$root/out").collect()
      .map(_.toString).sorted.toSeq
    catch { case _: Exception => Seq("<unreadable>") }

  test("fault sweep: a transient SQLException at EVERY database touch " +
       "of the two-phase run converges bit-for-bit after restart") {
    FaultJdbc.registered
    val base = sys.props("java.io.tmpdir") + "/graft-jdbcfault-" +
      java.util.UUID.randomUUID().toString.take(8)

    val refRoot = s"$base/ref"
    FaultJdbc.disarm()
    run(refRoot)
    val want = observe(refRoot)
    assert(want.size == 16, s"reference run must sink 16 rows: $want")

    FaultJdbc.startCounting("s")
    val cntRoot = s"$base/cnt"
    run(cntRoot)
    val total = FaultJdbc.counter.get()
    val kinds = (1L to total)
      .map(k => FaultJdbc.ops.getOrDefault(k, "?")).toVector
    FaultJdbc.disarm()
    assert(observe(cntRoot) === want)
    assert(total > 0 && kinds.contains("connect") &&
           kinds.contains("query") && kinds.contains("fetch"),
           s"expected connect+query+fetch among $total ops: " +
             kinds.distinct.mkString(","))

    var fired = 0
    for (k <- 1L to total) {
      val root = s"$base/k$k"
      FaultJdbc.arm("s", k)
      var hit = false
      try run(root)
      catch {
        case t: Throwable if FaultJdbc.caused(t) => hit = true
        case t: Throwable => FaultJdbc.disarm(); throw t
      }
      FaultJdbc.disarm()
      if (hit) { fired += 1; run(root) } // plain restart — no repair
      assert(observe(root) === want,
             s"op $k (${kinds(k.toInt - 1)}) diverged (fired=$hit)")
    }
    assert(fired > 0, "no armed op ever fired — tag mismatch?")
    info(s"jdbcFault: ${total} ops swept, $fired faults fired")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
  }
}
