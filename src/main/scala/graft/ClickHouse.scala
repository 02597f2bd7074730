package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** ClickHouse-dialect fidelity for the JDBC sink leg — the reference's
  * destination engine (`/root/reference/README.md:166-177`: final table
  * `shop.users ENGINE = ReplacingMergeTree ORDER BY (user_id,
  * updated_at)`; `docker-compose.yml:157` clickhouse 24.3.3).
  *
  * Two halves, both testable without a live server:
  *
  *  - [[ClickHouseDialect]] — a Spark `JdbcDialect` for
  *    `jdbc:clickhouse:` URLs: the exact type round-trip the reference
  *    configures. Unsigned integers WIDEN on read (`UInt32` → Spark
  *    `LongType` — Spark has no unsigned 32-bit; `UInt64` → `LongType`
  *    carrying the reference's kafka_offset range) and the Spark-side
  *    defaults map back to ClickHouse names on write
  *    (`TimestampType` → `DateTime`, second precision).
  *  - [[createTableDdl]] — `StructType` + sorting key → the
  *    `CREATE TABLE … ENGINE = ReplacingMergeTree ORDER BY (…)` text,
  *    reproducing the README block byte-for-byte for the users final
  *    schema (the SourcesSpec assertion). Nullability follows the
  *    StructType — and [[usersFinalSchema]] pins the reference's
  *    discipline that ONLY `kafka_time` is `Nullable` (`README.md:173`;
  *    every other final column is a bare ClickHouse type).
  *
  * Wired into the sink by [[clickHouseSink]]: register the dialect,
  * truncate timestamps to the second grid `DateTime` stores, issue
  * `CREATE TABLE IF NOT EXISTS` with the generated engine clause, then
  * append via the plain JDBC writer.
  */
object ClickHouse {

  /** Spark `JdbcDialect` for ClickHouse (`README.md:166-175` types).
    * Read side widens the unsigned columns the reference declares
    * (`UInt32 user_id`, `UInt64 kafka_offset`) into Spark `LongType`;
    * write side emits ClickHouse type names for Spark defaults. A
    * `UInt64` value past 2⁶³−1 would wrap in `LongType` — fine for the
    * reference's use (Kafka offsets, row versions); map such columns
    * to `Decimal(20, 0)` explicitly if full range is ever needed.
    */
  object ClickHouseDialect extends JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.toLowerCase(java.util.Locale.ROOT)
        .startsWith("jdbc:clickhouse:")

    /** Recursive ClickHouse-name → (catalyst type, inner nullability)
      * parse. `Nullable(...)` normally arrives via the driver's
      * nullable FLAG, not the type string — but accept the wrapped
      * spelling anywhere (some driver versions pass it through, and
      * inside `Array(Nullable(T))` it is the only representation).
      */
    private def parseChType(name: String): Option[(DataType, Boolean)] = {
      val t = name.trim
      if (t.startsWith("Nullable(") && t.endsWith(")"))
        parseChType(t.stripPrefix("Nullable(").stripSuffix(")"))
          .map { case (d, _) => (d, true) }
      else if (t.startsWith("Array(") && t.endsWith(")"))
        parseChType(t.stripPrefix("Array(").stripSuffix(")"))
          .map { case (d, n) => (ArrayType(d, containsNull = n), false) }
      else if (t.startsWith("Map(") && t.endsWith(")"))
        splitTopLevel(t.stripPrefix("Map(").stripSuffix(")")) match {
          case Seq(k, v) =>
            for {
              (kd, kNull) <- parseChType(k)
              (vd, vNull) <- parseChType(v)
              if !kNull // CH map keys are never Nullable
            } yield (MapType(kd, vd, valueContainsNull = vNull), false)
          case _ => None
        }
      else scalarChType(t).map((_, false))
    }

    /** split "K, V" on the top-level comma only — nested parameterized
      * types (`Map(String, Decimal(10, 2))`) carry commas of their own
      */
    private def splitTopLevel(s: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var depth = 0
      var start = 0
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 =>
            out += s.substring(start, i); start = i + 1
          case _ => ()
        }
        i += 1
      }
      out += s.substring(start)
      out.result().map(_.trim)
    }

    private def scalarChType(base: String): Option[DataType] = base match {
      case "UInt8" | "Int8" | "Int16"   => Some(ShortType)
      case "UInt16" | "Int32"           => Some(IntegerType)
      case "UInt32" | "Int64" | "UInt64" => Some(LongType)
      case "Float32"                    => Some(FloatType)
      case "Float64"                    => Some(DoubleType)
      case "String" | "FixedString"     => Some(StringType)
      case "Date" | "Date32"            => Some(DateType)
      case "DateTime"                   => Some(TimestampType)
      case n if n.startsWith("DateTime64") => Some(TimestampType)
      case n if n.startsWith("FixedString(") => Some(StringType)
      case n if n.startsWith("Decimal(") =>
        val Array(p, s) =
          n.stripPrefix("Decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
        Some(DecimalType(p, s))
      case _ => None
    }

    override def getCatalystType(sqlType: Int, typeName: String,
                                 size: Int,
                                 md: MetadataBuilder): Option[DataType] =
      parseChType(typeName).map(_._1)

    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case ShortType     => Some(JdbcType("Int16", java.sql.Types.SMALLINT))
      case IntegerType   => Some(JdbcType("Int32", java.sql.Types.INTEGER))
      case LongType      => Some(JdbcType("Int64", java.sql.Types.BIGINT))
      case FloatType     => Some(JdbcType("Float32", java.sql.Types.FLOAT))
      case DoubleType    => Some(JdbcType("Float64", java.sql.Types.DOUBLE))
      case StringType    => Some(JdbcType("String", java.sql.Types.VARCHAR))
      case BooleanType   => Some(JdbcType("UInt8", java.sql.Types.BOOLEAN))
      case DateType      => Some(JdbcType("Date", java.sql.Types.DATE))
      case TimestampType => Some(JdbcType("DateTime", java.sql.Types.TIMESTAMP))
      case d: DecimalType =>
        Some(JdbcType(s"Decimal(${d.precision}, ${d.scale})",
                      java.sql.Types.DECIMAL))
      // the engine's own embedding tables are ArrayType(FloatType) —
      // the north-star store needs Array(Float32) in both directions.
      // Null ELEMENTS wrap as Array(Nullable(T)); ClickHouse forbids
      // Nullable(Array(...)), so a nested array with containsNull has
      // no legal spelling and stays unmapped (clear error upstream).
      case ArrayType(et, containsNull) =>
        getJDBCType(et).collect {
          case inner if !(containsNull && et.isInstanceOf[ArrayType]) =>
            val elem = if (containsNull)
              s"Nullable(${inner.databaseTypeDefinition})"
            else inner.databaseTypeDefinition
            JdbcType(s"Array($elem)", java.sql.Types.ARRAY)
        }
      // the events table's parsed `props` shape is MapType(String,
      // String) — ClickHouse's native `Map(K, V)`. Keys are restricted
      // by CH to string/integer/date-time-ish types and are never
      // Nullable (Spark map keys can't be null either — aligned);
      // values may wrap as Nullable(V), but Nullable(Map(...)) and
      // Nullable/composite KEYS have no legal CH spelling and stay
      // unmapped (clear error upstream, same policy as Array).
      case MapType(kt, vt, valueContainsNull) =>
        val keyOk = kt match {
          case StringType | ShortType | IntegerType | LongType |
               DateType | TimestampType => true
          case _ => false
        }
        if (!keyOk) None
        else for {
          k <- getJDBCType(kt)
          v <- getJDBCType(vt)
          if !(valueContainsNull &&
               (vt.isInstanceOf[ArrayType] || vt.isInstanceOf[MapType]))
        } yield {
          val value = if (valueContainsNull)
            s"Nullable(${v.databaseTypeDefinition})"
          else v.databaseTypeDefinition
          JdbcType(s"Map(${k.databaseTypeDefinition}, $value)",
                   java.sql.Types.OTHER)
        }
      case _ => None
    }

    override def quoteIdentifier(colName: String): String = s"`$colName`"

    override def isCascadingTruncateTable(): Option[Boolean] = Some(false)
  }

  /** Register the dialect once per JVM (idempotent: re-registering
    * replaces the previous instance at the head of the lookup list).
    */
  def registerDialect(): Unit = {
    JdbcDialects.unregisterDialect(ClickHouseDialect)
    JdbcDialects.registerDialect(ClickHouseDialect)
  }

  /** Spark default → ClickHouse column type, `Nullable(...)`-wrapped
    * when the field is nullable. `typeOverrides` carries what a
    * StructType cannot express — the reference's unsigned narrowings
    * (`user_id UInt32`, `kafka_offset UInt64`, `README.md:169,174`).
    * The default mapping DELEGATES to [[ClickHouseDialect.getJDBCType]]
    * so the DDL generator and the dialect's write path can never
    * diverge — one source of truth for the type names.
    */
  private[graft] def chColumnType(
      f: StructField, typeOverrides: Map[String, String]): String = {
    val base = typeOverrides.getOrElse(f.name,
      ClickHouseDialect.getJDBCType(f.dataType)
        .map(_.databaseTypeDefinition)
        .getOrElse(throw new IllegalArgumentException(
          s"no ClickHouse mapping for column ${f.name}: ${f.dataType}")))
    if (f.nullable) {
      // ClickHouse rejects Nullable(Array(...)) and Nullable(Map(...))
      // — the CH idiom for an absent collection is the empty one; the
      // schema must say so
      require(!f.dataType.isInstanceOf[ArrayType] &&
              !f.dataType.isInstanceOf[MapType],
        s"column ${f.name}: ClickHouse does not support " +
        s"Nullable(${f.dataType.simpleString}) — mark the collection " +
        "column non-nullable (the empty collection is the ClickHouse " +
        "idiom for absent)")
      s"Nullable($base)"
    } else base
  }

  /** `CREATE TABLE` DDL for a MergeTree-family target — the
    * `README.md:164-177` block generated from a Spark schema + sorting
    * key. ClickHouse rejects `Nullable` sorting-key columns (and the
    * reference's key `(user_id, updated_at)` is bare), so the
    * generator enforces that the `orderBy` columns are non-nullable in
    * the schema up front.
    */
  def createTableDdl(table: String, schema: StructType,
                     orderBy: Seq[String],
                     engine: String = "ReplacingMergeTree",
                     typeOverrides: Map[String, String] = Map.empty)
      : String = {
    require(orderBy.nonEmpty, "MergeTree requires a sorting key")
    val byName = schema.fields.map(f => f.name -> f).toMap
    orderBy.foreach { k =>
      val f = byName.getOrElse(k, throw new IllegalArgumentException(
        s"ORDER BY column $k not in schema ${schema.fieldNames.toSeq}"))
      require(!f.nullable,
        s"ORDER BY column $k is nullable — ClickHouse rejects Nullable " +
        "sorting-key columns; mark it non-nullable in the StructType")
    }
    val cols = schema.fields
      .map(f => s"    ${f.name} ${chColumnType(f, typeOverrides)}")
      .mkString(",\n")
    s"""CREATE TABLE $table
       |(
       |$cols
       |)
       |ENGINE = $engine
       |ORDER BY (${orderBy.mkString(", ")});""".stripMargin
  }

  /** The reference's Kafka-side streaming-source table DDL
    * (`README.md:186-203`: `ENGINE = Kafka` + AvroConfluent +
    * registry). Column types follow the WIRE shape — Debezium ships
    * timestamps as epoch-micro longs, hence `UInt64` where the final
    * table has `DateTime` (`README.md:194-195`). The odd spacing of
    * the last SETTINGS line (no blanks around `=`) reproduces the
    * reference byte-for-byte.
    */
  def kafkaEngineDdl(table: String, schema: StructType, brokers: String,
                     topic: String, group: String, registryUrl: String,
                     typeOverrides: Map[String, String] = Map.empty)
      : String = {
    val cols = schema.fields
      .map(f => s"    ${f.name} ${chColumnType(f, typeOverrides)}")
      .mkString(",\n")
    s"""CREATE TABLE $table
       |(
       |$cols
       |)
       |ENGINE = Kafka
       |SETTINGS kafka_broker_list = '$brokers',
       |kafka_topic_list = '$topic',
       |kafka_group_name = '$group',
       |kafka_format = 'AvroConfluent',
       |format_avro_schema_registry_url='$registryUrl';""".stripMargin
  }

  /** The reference's materialized-view DDL (`README.md:210-231`):
    * the continuous `SELECT` from the Kafka table into the final,
    * converting each epoch-micro column with
    * `toDateTime(x / 1000000)` (second truncation) and surfacing the
    * Kafka virtual columns as real ones (`_timestamp AS kafka_time`,
    * `_offset AS kafka_offset`, `README.md:228-229`). `schema` is the
    * TARGET shape; `virtualCols` maps target names to source virtual
    * columns.
    */
  def materializedViewDdl(view: String, target: String,
                          schema: StructType, source: String,
                          microsCols: Seq[String],
                          typeOverrides: Map[String, String] = Map.empty,
                          virtualCols: Map[String, String] =
                            Map("kafka_time" -> "_timestamp",
                                "kafka_offset" -> "_offset")): String = {
    val cols = schema.fields
      .map(f => s"    ${f.name} ${chColumnType(f, typeOverrides)}")
      .mkString(",\n")
    val selects = schema.fields.map { f =>
      if (microsCols.contains(f.name))
        s"    toDateTime(${f.name} / 1000000) AS ${f.name}"
      else virtualCols.get(f.name) match {
        case Some(v) => s"    $v AS ${f.name}"
        case None    => s"    ${f.name}"
      }
    }.mkString(",\n")
    s"""CREATE MATERIALIZED VIEW $view TO $target
       |(
       |$cols
       |) AS
       |SELECT
       |$selects
       |FROM $source;""".stripMargin
  }

  /** The reference final-table schema (`README.md:166-175`) with its
    * exact nullability discipline: ClickHouse columns are non-nullable
    * by default and the reference declares ONLY `kafka_time` as
    * `Nullable(DateTime)` (`README.md:173`) — it is absent from the
    * Kafka envelope until the MV stamps `_timestamp`, every other
    * column always arrives.
    */
  val usersFinalSchema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("username", StringType, nullable = false),
    StructField("account_type", StringType, nullable = false),
    StructField("updated_at", TimestampType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("kafka_time", TimestampType, nullable = true),
    StructField("kafka_offset", LongType, nullable = false)))

  /** The unsigned narrowings the final DDL declares that a Spark
    * schema cannot (`README.md:169,174`).
    */
  val usersTypeOverrides: Map[String, String] =
    Map("user_id" -> "UInt32", "kafka_offset" -> "UInt64")

  /** The `shop.users` CREATE TABLE — must reproduce
    * `README.md:164-177` byte-for-byte (SourcesSpec pins it).
    */
  def usersFinalDdl: String =
    createTableDdl("shop.users", usersFinalSchema,
                   Seq("user_id", "updated_at"),
                   typeOverrides = usersTypeOverrides)

  /** The Kafka-side wire shape (`README.md:189-196`): epoch-micro
    * longs where the final has DateTime, no kafka virtual columns yet.
    */
  val usersKafkaSchema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("username", StringType, nullable = false),
    StructField("account_type", StringType, nullable = false),
    StructField("updated_at", LongType, nullable = false),
    StructField("created_at", LongType, nullable = false)))

  /** `kafka_shop.kafka__users` — must reproduce `README.md:186-203`
    * byte-for-byte (SourcesSpec pins it).
    */
  def usersKafkaDdl: String =
    kafkaEngineDdl("kafka_shop.kafka__users", usersKafkaSchema,
                   brokers = "broker:29092",
                   topic = "shop.public.users",
                   group = "clickhouse",
                   registryUrl = "http://schema-registry:8081",
                   typeOverrides = Map("user_id" -> "UInt32",
                                       "updated_at" -> "UInt64",
                                       "created_at" -> "UInt64"))

  /** `kafka_shop.consumer__users` — must reproduce `README.md:210-231`
    * byte-for-byte (SourcesSpec pins it).
    */
  def usersMvDdl: String =
    materializedViewDdl("kafka_shop.consumer__users", "shop.users",
                        usersFinalSchema,
                        source = "kafka_shop.kafka__users",
                        microsCols = Seq("updated_at", "created_at"),
                        typeOverrides = usersTypeOverrides)

  /** The complete reference topology as ordered DDL — databases, final
    * table, Kafka source table, materialized view (`README.md:164-231`
    * in execution order). `deployReferenceTopology` runs them over any
    * JDBC connection; each statement is also individually text-pinned
    * in SourcesSpec, so the deployment is reproducible from this
    * library alone.
    */
  def referenceTopologyDdls: Seq[String] = Seq(
    "CREATE DATABASE shop;",
    usersFinalDdl,
    "CREATE DATABASE kafka_shop;",
    usersKafkaDdl,
    usersMvDdl)

  def deployReferenceTopology(url: String,
                              props: Map[String, String] = Map.empty)
      : Unit =
    executeDdls(url, referenceTopologyDdls, props)

  /** One JDBC connection (with the caller's credentials/props — a DDL
    * statement needs them as much as a write does), all statements in
    * order.
    */
  private def executeDdls(url: String, ddls: Seq[String],
                          props: Map[String, String]): Unit = {
    val jp = new java.util.Properties()
    props.foreach { case (k, v) => jp.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, jp)
    try ddls.foreach { ddl =>
      val st = conn.createStatement()
      try st.execute(ddl) finally st.close()
    } finally conn.close()
  }

  /** Truncate every TimestampType column to second precision — what
    * ClickHouse `DateTime` stores (`README.md:172`; the reference MV's
    * `toDateTime(updated_at / 1000000)` lands on the same grid,
    * `README.md:226-227`). Applying it BEFORE the write keeps
    * Spark-side frames bit-identical to what a reader would get back
    * from the target, so replay comparisons don't drift on sub-second
    * micros the target would silently drop.
    */
  def truncateToDateTimeGrid(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.dataType == TimestampType =>
        acc.withColumn(f.name, date_trunc("second", col(f.name))
          .cast(TimestampType))
      case (acc, _) => acc
    }

  /** S8 with ClickHouse fidelity (`BASELINE.json` `spark_approach`:
    * "DataFrame JDBC source + ClickHouse sink"): register the dialect,
    * snap timestamps to the `DateTime` grid, `CREATE TABLE IF NOT
    * EXISTS` with the generated ReplacingMergeTree clause, then append
    * through [[Sources.jdbcSink]]. DDL goes through a plain JDBC
    * statement because Spark's own create path cannot express
    * per-column unsigned types or the engine clause.
    */
  def clickHouseSink(df: DataFrame, url: String, table: String,
                     orderBy: Seq[String],
                     engine: String = "ReplacingMergeTree",
                     typeOverrides: Map[String, String] = Map.empty,
                     props: Map[String, String] = Map.empty): Unit = {
    registerDialect()
    val ddl = createTableDdl(table, df.schema, orderBy, engine,
                             typeOverrides)
      .replaceFirst("^CREATE TABLE ", "CREATE TABLE IF NOT EXISTS ")
    executeDdls(url, Seq(ddl), props)
    Sources.jdbcSink(truncateToDateTimeGrid(df), url, table, props)
  }
}
