package graft

import java.sql.{Connection, DriverManager, ResultSet, Types}
import java.util
import java.util.Properties

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S2 as a FIRST-CLASS Structured Streaming source: a DataSource V2
  * `MicroBatchStream` over a cursor-monotonic JDBC table, registered as
  * `spark.readStream.format("graft-jdbc")`. This is the engine-owned
  * form of the polling CDC capture the reference delegates to Debezium
  * (`/root/reference/README.md:128` `pgoutput`,
  * `docker-compose.yml:129` `wal_level=logical`): where WAL access
  * isn't available, change capture becomes "rows whose monotonic cursor
  * column moved past the last committed position" — the same contract
  * as [[Sources.jdbcIncremental]], but with the STREAMING ENGINE owning
  * the cursor lifecycle. Planned cursor ranges ride the checkpoint's
  * offset log, restarts resume exactly where the last committed batch
  * ended, and the file-sink commit log makes sink-side output
  * exactly-once — no hand-rolled cursor store in the loop.
  *
  * Scale shape: the driver touches only METADATA queries at planning
  * time (`max(cursor)`, count-bounded bisection probes for the range
  * boundaries — each one index-served in a real database); the row
  * data flows executor-side,
  * one bounded `(lo, hi]` cursor range per input partition, so a
  * 1000-executor cluster fans the poll out exactly like the partitioned
  * snapshot source. Ranges are deterministic given (start, end], so
  * task retries and speculation re-read identical slices.
  *
  * Source contract (the polling-CDC invariant, documented rather than
  * assumed): rows are append-only with a `cursorColumn` monotonic in
  * COMMIT-VISIBILITY order, not merely assignment order. A WAL position
  * has this property by construction; a sequence or insert-timestamp
  * does NOT under concurrent writers — a transaction that allocated a
  * lower cursor value but commits AFTER a poll becomes visible below an
  * already-committed offset and would be silently skipped (the classic
  * polling-CDC visibility race that WAL reading doesn't have). Where
  * only an assignment-ordered cursor exists, set `lagWindow` > 0: the
  * admitted high-water mark is held `lagWindow` cursor units behind the
  * visible tip, so any transaction that commits within that window of
  * its cursor allocation is still captured. (`lagWindow` trades bounded
  * capture latency for correctness under bounded commit lag; it cannot
  * defend an unbounded straggler — that needs a true commit-ordered
  * cursor or a txid fence, which is exactly why the reference uses the
  * WAL.) The fence applies to every batch INCLUDING the earliest-start
  * snapshot batch 0 (snapshotting a live table races late commits the
  * same way), so with `lagWindow` = w a `Trigger.AvailableNow` drain of
  * a quiescent table intentionally stops w cursor units short of the
  * tip; those rows arrive on the next poll after the tip advances.
  * Admission caps are granular to CURSOR VALUES — rows tied at a
  * boundary value are admitted together (a cursor value is atomic,
  * exactly as a WAL position is), so a cap may overshoot by the tie
  * width but can never split or lose a cursor position.
  *
  * Options: `url`, `table`, `cursorColumn` (required); `numPartitions`
  * (per-batch read parallelism, default 4); `maxRowsPerBatch`
  * (admission cap per trigger — the backlog-drain knob; unset = all
  * available); `lagWindow` (cursor units held back from the visible
  * tip per the commit-visibility contract above; default 0 = trust the
  * cursor to be commit-ordered. USER-VISIBLE COROLLARY: the fence
  * applies to batch 0 too, so a one-shot `Trigger.AvailableNow` drain
  * of a QUIESCENT table with `lagWindow` = w terminates w cursor units
  * short of the tip and only delivers those rows if the tip later
  * advances — set `lagWindow` = 0 for one-shot snapshots of quiescent
  * tables, and reserve `lagWindow` > 0 for continuously-polled live
  * tables, which is the race it exists for); `startingCursor` = `earliest`
  * (default: the initial batch IS the snapshot — Debezium's
  * `snapshot.mode=initial`) | `latest` (capture only rows after stream
  * start) | a Long literal; `user`/`password`/`driver` (connection
  * plumbing). The schema is
  * inferred from JDBC metadata (`SELECT * WHERE 1=0`).
  */
class JdbcCdcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jdbc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = JdbcCdcSource.confOf(options)
    JdbcCdcSource.withConnection(conf)(JdbcCdcSource.inferSchema(_, conf))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new JdbcCdcTable(schema,
                     JdbcCdcSource.confOf(
                       new CaseInsensitiveStringMap(properties)))
}

/** Connection + contract knobs, resolved once and shipped to executors
  * (plain case class — serializable by construction).
  */
private[graft] case class JdbcCdcConf(url: String, table: String,
                                      cursorColumn: String,
                                      numPartitions: Int,
                                      maxRowsPerBatch: Option[Long],
                                      lagWindow: Long,
                                      startingCursor: String,
                                      user: Option[String],
                                      password: Option[String],
                                      driver: Option[String])

object JdbcCdcSource {
  private[graft] def confOf(o: CaseInsensitiveStringMap): JdbcCdcConf = {
    def required(k: String): String = {
      val v = o.get(k)
      require(v != null && v.nonEmpty,
              s"graft-jdbc: option '$k' is required")
      v
    }
    JdbcCdcConf(
      url = required("url"), table = required("table"),
      cursorColumn = required("cursorColumn"),
      numPartitions = Option(o.get("numPartitions")).map(_.toInt)
        .getOrElse(4),
      maxRowsPerBatch = Option(o.get("maxRowsPerBatch")).map(_.toLong),
      lagWindow = Option(o.get("lagWindow")).map(_.toLong).getOrElse(0L),
      startingCursor = Option(o.get("startingCursor"))
        .getOrElse("earliest"),
      user = Option(o.get("user")), password = Option(o.get("password")),
      driver = Option(o.get("driver")))
  }

  private[graft] def withConnection[T](conf: JdbcCdcConf)
                                      (f: Connection => T): T = {
    conf.driver.foreach(Class.forName)
    val props = new Properties()
    conf.user.foreach(props.setProperty("user", _))
    conf.password.foreach(props.setProperty("password", _))
    val c = DriverManager.getConnection(conf.url, props)
    try f(c) finally c.close()
  }

  /** Identifier quoting: every generated statement references columns by
    * the EXACT name JDBC metadata reports, double-quoted — so tables
    * created by Spark's JDBC writer (quoted lower-case columns) and
    * hand-written DDL (unquoted → uppercased by e.g. Derby/Postgres
    * folding) both resolve. The table name passes through as written,
    * matching [[Sources.jdbcIncremental]]'s trusted-identifier contract.
    */
  private[graft] def q(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  /** JDBC metadata → Catalyst schema for the supported CDC column types.
    * Unknown SQL types fail loudly at planning time rather than
    * miscarrying data.
    */
  private[graft] def inferSchema(conn: Connection,
                                 conf: JdbcCdcConf): StructType = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        s"SELECT * FROM ${conf.table} WHERE 1=0")
      val md = rs.getMetaData
      StructType((1 to md.getColumnCount).map { i =>
        val dt = md.getColumnType(i) match {
          case Types.BIGINT                       => LongType
          case Types.INTEGER                      => IntegerType
          case Types.SMALLINT | Types.TINYINT     => ShortType
          case Types.DOUBLE | Types.FLOAT         => DoubleType
          case Types.REAL                         => FloatType
          case Types.VARCHAR | Types.CHAR | Types.LONGVARCHAR |
               Types.CLOB                         => StringType
          case Types.BOOLEAN | Types.BIT          => BooleanType
          case Types.DECIMAL | Types.NUMERIC      =>
            DecimalType(md.getPrecision(i), md.getScale(i))
          case Types.TIMESTAMP                    => TimestampType
          case Types.DATE                         => DateType
          case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY |
               Types.BLOB                         => BinaryType
          case t => throw new IllegalArgumentException(
            s"graft-jdbc: unsupported SQL type $t for column " +
              md.getColumnName(i))
        }
        StructField(md.getColumnName(i), dt,
                    md.isNullable(i) != java.sql.ResultSetMetaData
                      .columnNoNulls)
      })
    } finally st.close()
  }

  /** The cursor column's exact stored name, resolved case-insensitively
    * against the inferred schema (user writes `event_id`, Derby stores
    * `EVENT_ID` — both must address the same column).
    */
  private[graft] def resolveCursor(schema: StructType,
                                   cursorColumn: String): String =
    schema.fields.map(_.name)
      .find(_.equalsIgnoreCase(cursorColumn))
      .getOrElse(throw new IllegalArgumentException(
        s"graft-jdbc: cursorColumn '$cursorColumn' not found among " +
          schema.fields.map(_.name).mkString(", ")))
}

/** The ReadLimit → per-unit admission cap mapping shared by the
  * engine-owned streaming edges ([[RestMicroBatchStream]] interprets it
  * per Kafka partition, [[JdbcMicroBatchStream]] per trigger): honor
  * the ENGINE-SUPPLIED limit — `maxRows` directly, the tightest member
  * of a composite, all-available otherwise.
  */
private[graft] object AdmissionLimits {
  def capOf(limit: ReadLimit): Option[Long] = limit match {
    case r: ReadMaxRows        => Some(r.maxRows())
    case _: ReadAllAvailable   => None
    case c: CompositeReadLimit =>
      c.getReadLimits.toSeq.flatMap(capOf).minOption
    case _                     => None
  }
}

private[graft] class JdbcCdcTable(schema0: StructType, conf: JdbcCdcConf)
    extends Table with SupportsRead {
  override def name(): String = s"graft-jdbc:${conf.table}"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema0
        override def toMicroBatchStream(loc: String): MicroBatchStream =
          new JdbcMicroBatchStream(conf, schema0)
      }
    }
}

/** Streaming offset = the cursor high-water mark already emitted — the
  * single number a WAL position reduces to under the polling contract,
  * serialized as the JSON object the checkpoint offset log stores.
  */
private[graft] case class JdbcCursorOffset(cursor: Long) extends Offset {
  override def json(): String = s"""{"cursor":$cursor}"""
}

private[graft] object JdbcCursorOffset {
  def fromJson(json: String): JdbcCursorOffset =
    JdbcCursorOffset(new ObjectMapper().readTree(json)
      .get("cursor").asLong())
}

private[graft] class JdbcMicroBatchStream(conf: JdbcCdcConf,
                                          schema: StructType)
    extends MicroBatchStream with SupportsAdmissionControl {
  import JdbcCdcSource.{q, withConnection}

  private val cursorName = JdbcCdcSource.resolveCursor(schema,
                                                       conf.cursorColumn)
  private def cursorSql = q(cursorName)

  private def scalarLong(sql: String): Option[Long] =
    withConnection(conf) { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(sql)
        rs.next()
        val v = rs.getLong(1)
        if (rs.wasNull()) None else Some(v)
      } finally st.close()
    }

  override def initialOffset(): Offset =
    JdbcCursorOffset(conf.startingCursor match {
      case "earliest" => Long.MinValue // batch 0 IS the snapshot
      case "latest"   =>
        scalarLong(s"SELECT MAX($cursorSql) FROM ${conf.table}")
          .getOrElse(Long.MinValue)
      case n          => n.toLong
    })

  override def getDefaultReadLimit: ReadLimit =
    conf.maxRowsPerBatch.map(ReadLimit.maxRows)
      .getOrElse(ReadLimit.allAvailable())

  // with SupportsAdmissionControl the engine always calls the
  // (start, limit) form; the argless form is unreachable by contract
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used instead")

  /** Admit up to cap rows past `start`, landing the batch end on a
    * CURSOR VALUE boundary: the end is `max(cursor)` over the first
    * `cap` rows in cursor order — ties at that value ride along in
    * planInputPartitions' `<=` bound (a cursor position is atomic; see
    * the class doc). With `lagWindow` > 0, admission is additionally
    * fenced at `max(cursor) - lagWindow` over the WHOLE table (the
    * visible tip), so an assignment-ordered cursor whose transaction
    * commits late — but within the window — still lands ahead of the
    * high-water mark instead of below it (class-doc visibility
    * contract). One or two metadata queries, each index-served on the
    * cursor.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[JdbcCursorOffset].cursor
    // The fence applies to EVERY batch, including the earliest-sentinel
    // snapshot batch 0: a snapshot of a LIVE table races late-committing
    // writers exactly like any later poll (a writer holding cursor k
    // under the snapshot tip whose commit lands after the snapshot read
    // would sit below the HWM forever) — JdbcStreamSpec's lagWindow test
    // pins this by planting the straggler UNDER the first poll's tip.
    // Corollary, by design: with lagWindow = w > 0, a
    // Trigger.AvailableNow drain of a quiescent table stops w cursor
    // units short of the tip — those rows are inside the visibility
    // window and are delivered by the next poll once the tip advances
    // (or immediately with lagWindow = 0, the right setting when the
    // cursor is commit-ordered and no fence is needed). See the class
    // doc's visibility contract.
    val fence =
      if (conf.lagWindow <= 0L) None
      else scalarLong(s"SELECT MAX($cursorSql) FROM ${conf.table}")
        .map(_ - conf.lagWindow)
    val fenceSql = fence.map(f => s" AND $cursorSql <= $f").getOrElse("")
    val end = AdmissionLimits.capOf(limit) match {
      case None      =>
        scalarLong(s"SELECT MAX($cursorSql) FROM ${conf.table} " +
                     s"WHERE $cursorSql > $s$fenceSql")
      case Some(cap) =>
        scalarLong(
          s"SELECT MAX(c) FROM (SELECT $cursorSql AS c FROM " +
            s"${conf.table} WHERE $cursorSql > $s$fenceSql " +
            s"ORDER BY $cursorSql FETCH FIRST $cap ROWS ONLY) b")
    }
    JdbcCursorOffset(end.getOrElse(s))
  }

  /** Split (start, end] into up to `numPartitions` contiguous cursor
    * ranges at equi-ROW-COUNT rank boundaries — value-arithmetic splits
    * would skew badly on sparse cursors (timestamps with gaps). Each
    * boundary comes from [[splitBoundaries]]'s count-bounded
    * value-bisection, index-served server-side; the driver never
    * touches row data.
    */
  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[JdbcCursorOffset].cursor
    val e = end.asInstanceOf[JdbcCursorOffset].cursor
    if (e <= s) return Array.empty
    val bounds = splitBoundaries(s, e)
    val los = s +: bounds
    val his = bounds :+ e
    los.zip(his).collect {
      case (lo, hi) if lo < hi =>
        JdbcRangePartition(conf, schema, cursorName, lo, hi)
    }.toArray
  }

  /** Planning probes issued by the last [[splitBoundaries]] call —
    * package-visible so the spec can pin probe-count growth (the
    * planner's own scalability) directly.
    */
  private[graft] val lastPlanProbes =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Interior boundaries (exclusive of both ends), strictly increasing.
    * Package-visible so the spec can pin range coverage and balance on
    * a skewed cursor distribution directly.
    *
    * Boundary i is the cursor value of the row at global rank i·n/p
    * (1-based, rows ordered by cursor within (s, e]) — the same value
    * the r14 `OFFSET rank FETCH 1` probe returned, found instead by
    * VALUE-BISECTION with COUNT-BOUNDED probes: the smallest v with
    * count(prev < cursor <= v) >= the rank increment, each probe a
    * `COUNT(*)` over a `FETCH FIRST k+1 ROWS` derived table so the
    * server walks at most k+1 ≈ n/p index entries per probe, however
    * wide the bisected value range is. Planning cost is therefore
    * O(p · log2(range)) probes touching O(n · log2(range)) index
    * entries total — vs the r14 OFFSET probes' Σ i·n/p ≈ n·p/2, which
    * at the 1000-executor snapshot (10⁹ rows, p = 1000) walked 500×
    * the table to plan reading it once. All probes share ONE
    * connection; each is index-served (range predicate on the cursor,
    * no row data). Rank semantics, tie handling (a duplicate-heavy
    * boundary value absorbs its ties via the exact per-subrange
    * count), and the returned boundary VALUES are identical to r14's.
    */
  private[graft] def splitBoundaries(s: Long, e: Long): Seq[Long] = {
    val p = conf.numPartitions
    if (p <= 1) return Seq.empty
    lastPlanProbes.set(0L)
    withConnection(conf) { c =>
      val st = c.createStatement()
      try {
        def scalar(sql: String): Long = {
          lastPlanProbes.incrementAndGet()
          val rs = st.executeQuery(sql)
          try { rs.next(); rs.getLong(1) } finally rs.close()
        }
        // rows with at most k+1 of them counted: the probe's server
        // cost is min(|subrange|, k+1) index entries, never the rank
        def boundedCount(lo: Long, v: Long, k: Long): Long =
          scalar(s"SELECT COUNT(*) FROM (SELECT $cursorSql FROM " +
            s"${conf.table} WHERE $cursorSql > $lo AND $cursorSql <= $v " +
            s"FETCH FIRST ${k + 1} ROWS ONLY) b")
        val n = scalar(
          s"SELECT COUNT(*) FROM ${conf.table} " +
            s"WHERE $cursorSql > $s AND $cursorSql <= $e")
        if (n <= 1) return Seq.empty
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        var prevBound = s
        var prevRank = 0L // exact rows in (s, prevBound]
        for (i <- 1 until p) {
          val target = i * n / p
          if (target > prevRank && prevBound < e) {
            val need = target - prevRank
            var lo = prevBound + 1
            var hi = e
            while (lo < hi) {
              // overflow-safe signed midpoint: (lo ^ hi) >> 1 + (lo & hi)
              // averages any two longs without (lo + hi) wrapping
              val mid = ((lo ^ hi) >> 1) + (lo & hi)
              if (boundedCount(prevBound, mid, need) >= need) hi = mid
              else lo = mid + 1
            }
            // lo = smallest v with >= need rows in (prevBound, v] — the
            // value of the row at global rank `target`, exactly what
            // the OFFSET probe returned
            if (lo < e) out += lo
            // ties at the boundary value count toward prevRank so later
            // global targets stay global — exact (unbounded) count, but
            // over the JUST-CLOSED subrange only: all p of these walk
            // each index entry once in total (≈ need + ties each)
            prevRank += scalar(
              s"SELECT COUNT(*) FROM ${conf.table} WHERE " +
                s"$cursorSql > $prevBound AND $cursorSql <= $lo")
            prevBound = lo
          }
        }
        out.toSeq
      } finally st.close()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JdbcRangeReaderFactory()

  override def deserializeOffset(json: String): Offset =
    JdbcCursorOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[graft] case class JdbcRangePartition(conf: JdbcCdcConf,
                                             schema: StructType,
                                             cursorName: String,
                                             lo: Long, hi: Long)
    extends InputPartition

private[graft] class JdbcRangeReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val ip = p.asInstanceOf[JdbcRangePartition]
    new PartitionReader[InternalRow] {
      import JdbcCdcSource.q
      ip.conf.driver.foreach(Class.forName)
      private val props = new Properties()
      ip.conf.user.foreach(props.setProperty("user", _))
      ip.conf.password.foreach(props.setProperty("password", _))
      private val conn =
        DriverManager.getConnection(ip.conf.url, props)
      // statement + query open AFTER the connection, under a guard that
      // closes the connection if they throw: executeQuery failing in the
      // constructor (exactly what JdbcFaultSpec injects) would otherwise
      // leak the connection on every task retry, because Spark only
      // close()es readers it finished constructing
      private val (st, rs) =
        try {
          val s = conn.createStatement()
          // explicit schema-ordered column list: the ResultSet maps
          // positionally onto the Catalyst row, whatever the table's
          // physical column order
          val r = s.executeQuery(
            s"SELECT ${ip.schema.fields.map(f => q(f.name)).mkString(", ")
              } FROM ${ip.conf.table} WHERE ${q(ip.cursorName)} > ${ip.lo} " +
              s"AND ${q(ip.cursorName)} <= ${ip.hi}")
          (s, r)
        } catch {
          case t: Throwable =>
            try conn.close() catch { case s: Throwable => t.addSuppressed(s) }
            throw t
        }

      override def next(): Boolean = rs.next()

      override def get(): InternalRow =
        InternalRow.fromSeq(ip.schema.fields.zipWithIndex.map {
          case (f, i) => JdbcRangeReaderFactory.value(rs, i + 1, f.dataType)
        }.toIndexedSeq)

      override def close(): Unit = {
        rs.close(); st.close(); conn.close()
      }
    }
  }
}

private[graft] object JdbcRangeReaderFactory {
  /** One JDBC column → Catalyst internal value (null-checked via
    * wasNull, the JDBC contract for primitive getters).
    */
  def value(rs: ResultSet, i: Int, dt: DataType): Any = {
    val v: Any = dt match {
      case LongType    => rs.getLong(i)
      case IntegerType => rs.getInt(i)
      case ShortType   => rs.getShort(i)
      case DoubleType  => rs.getDouble(i)
      case FloatType   => rs.getFloat(i)
      case BooleanType => rs.getBoolean(i)
      case StringType  => UTF8String.fromString(rs.getString(i))
      case BinaryType  => rs.getBytes(i)
      case d: DecimalType =>
        val bd = rs.getBigDecimal(i)
        if (bd == null) null
        else org.apache.spark.sql.types.Decimal(bd, d.precision, d.scale)
      case TimestampType =>
        val t = rs.getTimestamp(i)
        if (t == null) null
        // getTime carries millis (nanos' top 6 digits fold in); add the
        // sub-millisecond remainder for exact micros
        else Math.multiplyExact(t.getTime, 1000L) +
          (t.getNanos / 1000) % 1000
      case DateType =>
        val d = rs.getDate(i)
        if (d == null) null else d.toLocalDate.toEpochDay.toInt
      case other => throw new IllegalArgumentException(
        s"graft-jdbc: unsupported read type $other")
    }
    if (rs.wasNull()) null else v
  }
}
