package graft

import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, ResultSet, SQLException, SQLTransientConnectionException, Statement}
import java.util.Properties
import java.util.concurrent.atomic.AtomicLong
import java.util.logging.Logger

/** Fault-injecting JDBC driver for the `graft-jdbc` sweep — the database
  * analog of [[FaultFs]] (filesystem) and RestFaultSpec's HTTP proxy
  * (network). URLs of the form `jdbc:graftfault:<tag>:<real-url>`
  * delegate to the real driver, but every DATABASE TOUCH a source call
  * site performs — opening a connection, executing a query, advancing a
  * ResultSet — increments a global op counter; arming index k makes
  * that op throw a transient SQLException instead. A counting pass
  * enumerates the sites, then each index is armed once: whatever the
  * engine was doing at that moment (offset planning, boundary probing,
  * a partition read) fails exactly there, and the restarted stream must
  * converge to the no-fault state bit-for-bit.
  *
  * The tag keyed into the URL namespaces runs (mirror of FaultFs path
  * markers), so pooled/cached connections from other tests never count.
  */
object FaultJdbc {
  val counter = new AtomicLong(0)
  val ops = new java.util.concurrent.ConcurrentHashMap[Long, String]()
  @volatile private var armedTag: String = null
  @volatile private var armedAt: Long = -1L
  @volatile private var counting = false

  final class InjectedJdbcFault(site: Long, what: String)
      extends SQLTransientConnectionException(
        s"injected JDBC fault at op $site ($what)")

  def startCounting(tag: String): Unit = synchronized {
    armedTag = tag; armedAt = -1L; counting = true
    counter.set(0); ops.clear()
  }

  def arm(tag: String, k: Long): Unit = synchronized {
    armedTag = tag; armedAt = k; counting = false
    counter.set(0); ops.clear()
  }

  def disarm(): Unit = synchronized {
    armedTag = null; armedAt = -1L; counting = false
  }

  def caused(t: Throwable): Boolean =
    if (t == null) false
    else t.isInstanceOf[InjectedJdbcFault] ||
      Option(t.getMessage).exists(_.contains("injected JDBC fault")) ||
      caused(t.getCause) ||
      t.getSuppressed.exists(caused)

  private def touch(tag: String, what: String): Unit = {
    val at = armedTag
    if (at == null || tag != at) return
    val k = counter.incrementAndGet()
    if (counting) ops.put(k, what)
    else if (k == armedAt) throw new InjectedJdbcFault(k, what)
  }

  // ---- the delegating driver ----------------------------------------

  private val Prefix = "jdbc:graftfault:"

  object FaultDriver extends Driver {
    override def acceptsURL(url: String): Boolean =
      url != null && url.startsWith(Prefix)

    override def connect(url: String, info: Properties): Connection = {
      if (!acceptsURL(url)) return null
      val rest = url.stripPrefix(Prefix)
      val sep = rest.indexOf(':')
      val tag = rest.substring(0, sep)
      val real = rest.substring(sep + 1)
      touch(tag, "connect")
      new FaultConnection(tag, DriverManager.getConnection(real, info))
    }

    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger: Logger = Logger.getGlobal
    override def getPropertyInfo(url: String, info: Properties)
        : Array[DriverPropertyInfo] = Array.empty
  }

  // java.sql interfaces are wide; the source touches only this surface
  // (createStatement → executeQuery → next/getters → close), so the
  // wrappers implement it via Dynamic-free plain delegation and throw
  // on anything else — an unexpected call path would surface loudly.
  private class FaultConnection(tag: String, d: Connection)
      extends Connection {
    override def createStatement(): Statement =
      new FaultStatement(tag, d.createStatement())
    override def close(): Unit = d.close()
    override def isClosed: Boolean = d.isClosed
    override def getMetaData = d.getMetaData
    override def setAutoCommit(b: Boolean): Unit = d.setAutoCommit(b)
    override def getAutoCommit: Boolean = d.getAutoCommit
    override def commit(): Unit = d.commit()
    override def rollback(): Unit = d.rollback()
    override def prepareStatement(sql: String) = d.prepareStatement(sql)
    // everything below is unreachable from JdbcCdcSource
    private def nope = throw new UnsupportedOperationException(
      "not used by graft-jdbc")
    override def createStatement(a: Int, b: Int): Statement = nope
    override def createStatement(a: Int, b: Int, c: Int): Statement = nope
    override def prepareStatement(s: String, a: Int, b: Int) = nope
    override def prepareStatement(s: String, a: Int, b: Int, c: Int) = nope
    override def prepareStatement(s: String, a: Int) = nope
    override def prepareStatement(s: String, a: Array[Int]) = nope
    override def prepareStatement(s: String, a: Array[String]) = nope
    override def prepareCall(s: String) = nope
    override def prepareCall(s: String, a: Int, b: Int) = nope
    override def prepareCall(s: String, a: Int, b: Int, c: Int) = nope
    override def nativeSQL(s: String): String = nope
    override def setReadOnly(b: Boolean): Unit = d.setReadOnly(b)
    override def isReadOnly: Boolean = d.isReadOnly
    override def setCatalog(s: String): Unit = nope
    override def getCatalog: String = d.getCatalog
    override def setTransactionIsolation(i: Int): Unit =
      d.setTransactionIsolation(i)
    override def getTransactionIsolation: Int = d.getTransactionIsolation
    override def getWarnings = d.getWarnings
    override def clearWarnings(): Unit = d.clearWarnings()
    override def getTypeMap = nope
    override def setTypeMap(m: java.util.Map[String, Class[_]]): Unit = nope
    override def setHoldability(i: Int): Unit = nope
    override def getHoldability: Int = d.getHoldability
    override def setSavepoint() = nope
    override def setSavepoint(s: String) = nope
    override def rollback(s: java.sql.Savepoint): Unit = nope
    override def releaseSavepoint(s: java.sql.Savepoint): Unit = nope
    override def createClob() = nope
    override def createBlob() = nope
    override def createNClob() = nope
    override def createSQLXML() = nope
    override def isValid(t: Int): Boolean = d.isValid(t)
    override def setClientInfo(k: String, v: String): Unit = nope
    override def setClientInfo(p: Properties): Unit = nope
    override def getClientInfo(k: String): String = nope
    override def getClientInfo: Properties = nope
    override def createArrayOf(t: String, e: Array[AnyRef]) = nope
    override def createStruct(t: String, a: Array[AnyRef]) = nope
    override def setSchema(s: String): Unit = nope
    override def getSchema: String = d.getSchema
    override def abort(e: java.util.concurrent.Executor): Unit = nope
    override def setNetworkTimeout(e: java.util.concurrent.Executor,
                                   t: Int): Unit = nope
    override def getNetworkTimeout: Int = 0
    override def unwrap[T](c: Class[T]): T = d.unwrap(c)
    override def isWrapperFor(c: Class[_]): Boolean = d.isWrapperFor(c)
  }

  private class FaultStatement(tag: String, d: Statement)
      extends Statement {
    override def executeQuery(sql: String): ResultSet = {
      touch(tag, "query")
      new FaultResultSet(tag, d.executeQuery(sql))
    }
    override def execute(sql: String): Boolean = {
      touch(tag, "execute"); d.execute(sql)
    }
    override def close(): Unit = d.close()
    override def executeUpdate(s: String): Int = d.executeUpdate(s)
    private def nope = throw new UnsupportedOperationException(
      "not used by graft-jdbc")
    override def getMaxFieldSize: Int = d.getMaxFieldSize
    override def setMaxFieldSize(i: Int): Unit = nope
    override def getMaxRows: Int = d.getMaxRows
    override def setMaxRows(i: Int): Unit = d.setMaxRows(i)
    override def setEscapeProcessing(b: Boolean): Unit = nope
    override def getQueryTimeout: Int = d.getQueryTimeout
    override def setQueryTimeout(i: Int): Unit = d.setQueryTimeout(i)
    override def cancel(): Unit = d.cancel()
    override def getWarnings = d.getWarnings
    override def clearWarnings(): Unit = d.clearWarnings()
    override def setCursorName(s: String): Unit = nope
    override def getResultSet: ResultSet = d.getResultSet
    override def getUpdateCount: Int = d.getUpdateCount
    override def getMoreResults: Boolean = d.getMoreResults
    override def setFetchDirection(i: Int): Unit = nope
    override def getFetchDirection: Int = d.getFetchDirection
    override def setFetchSize(i: Int): Unit = d.setFetchSize(i)
    override def getFetchSize: Int = d.getFetchSize
    override def getResultSetConcurrency: Int = d.getResultSetConcurrency
    override def getResultSetType: Int = d.getResultSetType
    override def addBatch(s: String): Unit = nope
    override def clearBatch(): Unit = nope
    override def executeBatch(): Array[Int] = nope
    override def getConnection: Connection = nope
    override def getMoreResults(i: Int): Boolean = nope
    override def getGeneratedKeys: ResultSet = nope
    override def executeUpdate(s: String, a: Int): Int = nope
    override def executeUpdate(s: String, a: Array[Int]): Int = nope
    override def executeUpdate(s: String, a: Array[String]): Int = nope
    override def execute(s: String, a: Int): Boolean = nope
    override def execute(s: String, a: Array[Int]): Boolean = nope
    override def execute(s: String, a: Array[String]): Boolean = nope
    override def getResultSetHoldability: Int = d.getResultSetHoldability
    override def isClosed: Boolean = d.isClosed
    override def setPoolable(b: Boolean): Unit = nope
    override def isPoolable: Boolean = d.isPoolable
    override def closeOnCompletion(): Unit = nope
    override def isCloseOnCompletion: Boolean = false
    override def unwrap[T](c: Class[T]): T = d.unwrap(c)
    override def isWrapperFor(c: Class[_]): Boolean = d.isWrapperFor(c)
  }

  /** Row-advance faults fire once per FETCH BLOCK of 8 rows (every next()
    * would make the sweep quadratic in row count for no added coverage —
    * a mid-stream tear is a mid-stream tear).
    */
  private class FaultResultSet(tag: String, d: ResultSet)
      extends java.sql.ResultSet {
    private var n = 0L
    override def next(): Boolean = {
      if (n % 8 == 0) touch(tag, "fetch")
      n += 1
      d.next()
    }
    override def close(): Unit = d.close()
    override def wasNull(): Boolean = d.wasNull()
    override def getString(i: Int): String = d.getString(i)
    override def getBoolean(i: Int): Boolean = d.getBoolean(i)
    override def getByte(i: Int): Byte = d.getByte(i)
    override def getShort(i: Int): Short = d.getShort(i)
    override def getInt(i: Int): Int = d.getInt(i)
    override def getLong(i: Int): Long = d.getLong(i)
    override def getFloat(i: Int): Float = d.getFloat(i)
    override def getDouble(i: Int): Double = d.getDouble(i)
    override def getBigDecimal(i: Int): java.math.BigDecimal =
      d.getBigDecimal(i)
    override def getBytes(i: Int): Array[Byte] = d.getBytes(i)
    override def getDate(i: Int): java.sql.Date = d.getDate(i)
    override def getTime(i: Int): java.sql.Time = d.getTime(i)
    override def getTimestamp(i: Int): java.sql.Timestamp =
      d.getTimestamp(i)
    override def getMetaData = d.getMetaData
    // the long tail of the ResultSet surface — unused by the source
    private def nope = throw new UnsupportedOperationException(
      "not used by graft-jdbc")
    override def getAsciiStream(i: Int) = nope
    override def getUnicodeStream(i: Int) = nope
    override def getBinaryStream(i: Int) = nope
    override def getString(l: String): String = d.getString(l)
    override def getBoolean(l: String): Boolean = d.getBoolean(l)
    override def getByte(l: String): Byte = nope
    override def getShort(l: String): Short = nope
    override def getInt(l: String): Int = nope
    override def getLong(l: String): Long = d.getLong(l)
    override def getFloat(l: String): Float = nope
    override def getDouble(l: String): Double = nope
    override def getBigDecimal(l: String): java.math.BigDecimal = nope
    override def getBytes(l: String): Array[Byte] = nope
    override def getDate(l: String): java.sql.Date = nope
    override def getTime(l: String): java.sql.Time = nope
    override def getTimestamp(l: String): java.sql.Timestamp = nope
    override def getAsciiStream(l: String) = nope
    override def getUnicodeStream(l: String) = nope
    override def getBinaryStream(l: String) = nope
    override def getWarnings = d.getWarnings
    override def clearWarnings(): Unit = d.clearWarnings()
    override def getCursorName: String = nope
    override def getObject(i: Int): AnyRef = d.getObject(i)
    override def getObject(l: String): AnyRef = nope
    override def findColumn(l: String): Int = d.findColumn(l)
    override def getCharacterStream(i: Int) = nope
    override def getCharacterStream(l: String) = nope
    override def getBigDecimal(i: Int, s: Int) = nope
    override def getBigDecimal(l: String, s: Int) = nope
    override def isBeforeFirst: Boolean = nope
    override def isAfterLast: Boolean = nope
    override def isFirst: Boolean = nope
    override def isLast: Boolean = nope
    override def beforeFirst(): Unit = nope
    override def afterLast(): Unit = nope
    override def first(): Boolean = nope
    override def last(): Boolean = nope
    override def getRow: Int = nope
    override def absolute(r: Int): Boolean = nope
    override def relative(r: Int): Boolean = nope
    override def previous(): Boolean = nope
    override def setFetchDirection(i: Int): Unit = nope
    override def getFetchDirection: Int = d.getFetchDirection
    override def setFetchSize(i: Int): Unit = d.setFetchSize(i)
    override def getFetchSize: Int = d.getFetchSize
    override def getType: Int = d.getType
    override def getConcurrency: Int = d.getConcurrency
    override def rowUpdated(): Boolean = nope
    override def rowInserted(): Boolean = nope
    override def rowDeleted(): Boolean = nope
    override def updateNull(i: Int): Unit = nope
    override def updateBoolean(i: Int, v: Boolean): Unit = nope
    override def updateByte(i: Int, v: Byte): Unit = nope
    override def updateShort(i: Int, v: Short): Unit = nope
    override def updateInt(i: Int, v: Int): Unit = nope
    override def updateLong(i: Int, v: Long): Unit = nope
    override def updateFloat(i: Int, v: Float): Unit = nope
    override def updateDouble(i: Int, v: Double): Unit = nope
    override def updateBigDecimal(i: Int, v: java.math.BigDecimal): Unit =
      nope
    override def updateString(i: Int, v: String): Unit = nope
    override def updateBytes(i: Int, v: Array[Byte]): Unit = nope
    override def updateDate(i: Int, v: java.sql.Date): Unit = nope
    override def updateTime(i: Int, v: java.sql.Time): Unit = nope
    override def updateTimestamp(i: Int, v: java.sql.Timestamp): Unit =
      nope
    override def updateAsciiStream(i: Int, v: java.io.InputStream,
                                   l: Int): Unit = nope
    override def updateBinaryStream(i: Int, v: java.io.InputStream,
                                    l: Int): Unit = nope
    override def updateCharacterStream(i: Int, v: java.io.Reader,
                                       l: Int): Unit = nope
    override def updateObject(i: Int, v: AnyRef, s: Int): Unit = nope
    override def updateObject(i: Int, v: AnyRef): Unit = nope
    override def updateNull(l: String): Unit = nope
    override def updateBoolean(l: String, v: Boolean): Unit = nope
    override def updateByte(l: String, v: Byte): Unit = nope
    override def updateShort(l: String, v: Short): Unit = nope
    override def updateInt(l: String, v: Int): Unit = nope
    override def updateLong(l: String, v: Long): Unit = nope
    override def updateFloat(l: String, v: Float): Unit = nope
    override def updateDouble(l: String, v: Double): Unit = nope
    override def updateBigDecimal(l: String,
                                  v: java.math.BigDecimal): Unit = nope
    override def updateString(l: String, v: String): Unit = nope
    override def updateBytes(l: String, v: Array[Byte]): Unit = nope
    override def updateDate(l: String, v: java.sql.Date): Unit = nope
    override def updateTime(l: String, v: java.sql.Time): Unit = nope
    override def updateTimestamp(l: String, v: java.sql.Timestamp): Unit =
      nope
    override def updateAsciiStream(l: String, v: java.io.InputStream,
                                   x: Int): Unit = nope
    override def updateBinaryStream(l: String, v: java.io.InputStream,
                                    x: Int): Unit = nope
    override def updateCharacterStream(l: String, v: java.io.Reader,
                                       x: Int): Unit = nope
    override def updateObject(l: String, v: AnyRef, s: Int): Unit = nope
    override def updateObject(l: String, v: AnyRef): Unit = nope
    override def insertRow(): Unit = nope
    override def updateRow(): Unit = nope
    override def deleteRow(): Unit = nope
    override def refreshRow(): Unit = nope
    override def cancelRowUpdates(): Unit = nope
    override def moveToInsertRow(): Unit = nope
    override def moveToCurrentRow(): Unit = nope
    override def getStatement: Statement = nope
    override def getObject(i: Int, m: java.util.Map[String, Class[_]]) =
      nope
    override def getRef(i: Int) = nope
    override def getBlob(i: Int) = nope
    override def getClob(i: Int) = nope
    override def getArray(i: Int) = nope
    override def getObject(l: String,
                           m: java.util.Map[String, Class[_]]) = nope
    override def getRef(l: String) = nope
    override def getBlob(l: String) = nope
    override def getClob(l: String) = nope
    override def getArray(l: String) = nope
    override def getDate(i: Int, c: java.util.Calendar) = nope
    override def getDate(l: String, c: java.util.Calendar) = nope
    override def getTime(i: Int, c: java.util.Calendar) = nope
    override def getTime(l: String, c: java.util.Calendar) = nope
    override def getTimestamp(i: Int, c: java.util.Calendar) = nope
    override def getTimestamp(l: String, c: java.util.Calendar) = nope
    override def getURL(i: Int) = nope
    override def getURL(l: String) = nope
    override def updateRef(i: Int, v: java.sql.Ref): Unit = nope
    override def updateRef(l: String, v: java.sql.Ref): Unit = nope
    override def updateBlob(i: Int, v: java.sql.Blob): Unit = nope
    override def updateBlob(l: String, v: java.sql.Blob): Unit = nope
    override def updateClob(i: Int, v: java.sql.Clob): Unit = nope
    override def updateClob(l: String, v: java.sql.Clob): Unit = nope
    override def updateArray(i: Int, v: java.sql.Array): Unit = nope
    override def updateArray(l: String, v: java.sql.Array): Unit = nope
    override def getRowId(i: Int) = nope
    override def getRowId(l: String) = nope
    override def updateRowId(i: Int, v: java.sql.RowId): Unit = nope
    override def updateRowId(l: String, v: java.sql.RowId): Unit = nope
    override def getHoldability: Int = d.getHoldability
    override def isClosed: Boolean = d.isClosed
    override def updateNString(i: Int, v: String): Unit = nope
    override def updateNString(l: String, v: String): Unit = nope
    override def updateNClob(i: Int, v: java.sql.NClob): Unit = nope
    override def updateNClob(l: String, v: java.sql.NClob): Unit = nope
    override def getNClob(i: Int) = nope
    override def getNClob(l: String) = nope
    override def getSQLXML(i: Int) = nope
    override def getSQLXML(l: String) = nope
    override def updateSQLXML(i: Int, v: java.sql.SQLXML): Unit = nope
    override def updateSQLXML(l: String, v: java.sql.SQLXML): Unit = nope
    override def getNString(i: Int): String = nope
    override def getNString(l: String): String = nope
    override def getNCharacterStream(i: Int) = nope
    override def getNCharacterStream(l: String) = nope
    override def updateNCharacterStream(i: Int, v: java.io.Reader,
                                        x: Long): Unit = nope
    override def updateNCharacterStream(l: String, v: java.io.Reader,
                                        x: Long): Unit = nope
    override def updateAsciiStream(i: Int, v: java.io.InputStream,
                                   x: Long): Unit = nope
    override def updateBinaryStream(i: Int, v: java.io.InputStream,
                                    x: Long): Unit = nope
    override def updateCharacterStream(i: Int, v: java.io.Reader,
                                       x: Long): Unit = nope
    override def updateAsciiStream(l: String, v: java.io.InputStream,
                                   x: Long): Unit = nope
    override def updateBinaryStream(l: String, v: java.io.InputStream,
                                    x: Long): Unit = nope
    override def updateCharacterStream(l: String, v: java.io.Reader,
                                       x: Long): Unit = nope
    override def updateBlob(i: Int, v: java.io.InputStream,
                            x: Long): Unit = nope
    override def updateBlob(l: String, v: java.io.InputStream,
                            x: Long): Unit = nope
    override def updateClob(i: Int, v: java.io.Reader, x: Long): Unit =
      nope
    override def updateClob(l: String, v: java.io.Reader, x: Long): Unit =
      nope
    override def updateNClob(i: Int, v: java.io.Reader, x: Long): Unit =
      nope
    override def updateNClob(l: String, v: java.io.Reader, x: Long): Unit =
      nope
    override def updateNCharacterStream(i: Int, v: java.io.Reader): Unit =
      nope
    override def updateNCharacterStream(l: String,
                                        v: java.io.Reader): Unit = nope
    override def updateAsciiStream(i: Int, v: java.io.InputStream): Unit =
      nope
    override def updateBinaryStream(i: Int, v: java.io.InputStream): Unit =
      nope
    override def updateCharacterStream(i: Int, v: java.io.Reader): Unit =
      nope
    override def updateAsciiStream(l: String,
                                   v: java.io.InputStream): Unit = nope
    override def updateBinaryStream(l: String,
                                    v: java.io.InputStream): Unit = nope
    override def updateCharacterStream(l: String,
                                       v: java.io.Reader): Unit = nope
    override def updateBlob(i: Int, v: java.io.InputStream): Unit = nope
    override def updateBlob(l: String, v: java.io.InputStream): Unit = nope
    override def updateClob(i: Int, v: java.io.Reader): Unit = nope
    override def updateClob(l: String, v: java.io.Reader): Unit = nope
    override def updateNClob(i: Int, v: java.io.Reader): Unit = nope
    override def updateNClob(l: String, v: java.io.Reader): Unit = nope
    override def getObject[T](i: Int, t: Class[T]): T = nope
    override def getObject[T](l: String, t: Class[T]): T = nope
    override def unwrap[T](c: Class[T]): T = d.unwrap(c)
    override def isWrapperFor(c: Class[_]): Boolean = d.isWrapperFor(c)
  }

  lazy val registered: Unit = DriverManager.registerDriver(FaultDriver)
}
