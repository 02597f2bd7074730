package graft

import org.apache.spark.sql.functions._

/** U1-U4 semantics against the reference's own demo scenario: the 3-row
  * seed (`/root/reference/README.md:108-112`) replayed as a CDC event
  * sequence — inserts, an update, and a duplicate delivery of that update
  * (at-least-once Kafka redelivery). Expected final state = what ClickHouse
  * `SELECT ... FINAL` would return from the ReplacingMergeTree table.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, username, account_type, updated_at_micros, kafka_offset)
  private def demo = Seq(
    (1L, "user1", "Bronze", 1000000L, 0L),
    (2L, "user2", "Silver", 1000000L, 1L),
    (3L, "user3", "Gold", 1000000L, 2L),
    (2L, "user2", "Gold", 2000000L, 3L), // update: user2 upgraded
    (2L, "user2", "Gold", 2000000L, 4L)  // duplicate delivery of the update
  ).toDF("user_id", "username", "account_type", "updated_at", "kafka_offset")

  test("latest collapses to one row per key, highest version wins") {
    val out = Cdc.latest(demo, Seq("user_id"),
                         Seq(col("updated_at"), col("kafka_offset")))
      .orderBy("user_id")
      .select("user_id", "account_type", "updated_at")
      .as[(Long, String, Long)].collect()
    assert(out === Array((1L, "Bronze", 1000000L), (2L, "Gold", 2000000L),
                         (3L, "Gold", 1000000L)))
  }

  test("latest is idempotent") {
    val once = Cdc.latest(demo, Seq("user_id"), Seq(col("updated_at"), col("kafka_offset")))
    val twice = Cdc.latest(once, Seq("user_id"), Seq(col("updated_at"), col("kafka_offset")))
    assert(once.orderBy("user_id").collect() ===
           twice.orderBy("user_id").collect())
  }

  test("dedupVersions keeps the full ORDER-BY-key history, one row per " +
       "(key, version), last arrival wins on exact duplicates") {
    val out = Cdc.dedupVersions(demo, Seq("user_id"), Seq("updated_at"),
                                col("kafka_offset"))
      .orderBy("user_id", "updated_at")
      .select("user_id", "updated_at", "kafka_offset")
      .as[(Long, Long, Long)].collect()
    // user2 retains BOTH versions (updated_at differs → both in the key),
    // but the duplicated delivery collapses to the later offset 4.
    assert(out === Array((1L, 1000000L, 0L), (2L, 1000000L, 1L),
                         (2L, 2000000L, 4L), (3L, 1000000L, 2L)))
  }

  test("historyStats counts versions per entity") {
    val out = Cdc.historyStats(demo, "user_id", col("updated_at"))
      .orderBy("user_id")
      .select("user_id", "n_versions")
      .as[(Long, Long)].collect()
    assert(out === Array((1L, 1L), (2L, 3L), (3L, 1L)))
  }

  test("latest handles null keys and empty input") {
    val withNull = demo.unionByName(
      Seq((null.asInstanceOf[java.lang.Long], "ghost", "None", 1L, 9L))
        .toDF("user_id", "username", "account_type", "updated_at",
              "kafka_offset"))
    // null key forms its own group (SQL window semantics) — no crash,
    // one row for the null entity
    val out = Cdc.latest(withNull, Seq("user_id"),
                         Seq(col("updated_at"), col("kafka_offset")))
    assert(out.count() === 4)
    assert(out.filter(col("user_id").isNull).count() === 1)
    // empty input → empty output
    val empty = Cdc.latest(demo.limit(0), Seq("user_id"),
                           Seq(col("updated_at")))
    assert(empty.count() === 0)
  }

  test("compact materializes the latest-state view clustered by key") {
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    Cdc.compact(demo, Seq("user_id"),
                Seq(col("updated_at"), col("kafka_offset")), out)
    val back = spark.read.parquet(out).orderBy("user_id")
      .select("user_id", "account_type").as[(Long, String)].collect()
    assert(back === Array((1L, "Bronze"), (2L, "Gold"), (3L, "Gold")))
  }

  test("delete tombstones: null after-image filtered by latest-state view") {
    // Debezium ExtractNewRecordState surfaces deletes as op='d' with null
    // payload (SURVEY.md §7.5); latest state must drop deleted entities.
    val withDelete = demo.withColumn("op", lit("u"))
      .unionByName(Seq((2L, null: String, null: String, 3000000L, 5L))
        .toDF("user_id", "username", "account_type", "updated_at",
              "kafka_offset")
        .withColumn("op", lit("d")))
    val alive = Cdc.latest(withDelete, Seq("user_id"),
                           Seq(col("updated_at"), col("kafka_offset")))
      .filter(col("op") =!= "d")
    assert(alive.select("user_id").as[Long].collect().sorted === Array(1L, 3L))
  }

  // CollapsingMergeTree scenario: (user_id, version, sign, payload)
  //  u1: state v1, cancel v1, state v2       → survives with v2, net 1
  //  u2: state v1, cancel v1                 → fully cancelled, deleted
  //  u3: state v1                            → survives with v1
  //  u4: lone cancel (malformed stream)      → net < 0, dropped
  private def collapsing = Seq(
    (1L, 1L, 1, "a"), (1L, 1L, -1, "a"), (1L, 2L, 1, "b"),
    (2L, 1L, 1, "c"), (2L, 1L, -1, "c"),
    (3L, 1L, 1, "d"),
    (4L, 1L, -1, "e")
  ).toDF("user_id", "v", "sign", "payload")

  test("collapse on an all-positive stream equals latest, with net = " +
       "version count") {
    val allState = demo.withColumn("sign", lit(1))
    val viaCollapse = Cdc.collapse(allState, Seq("user_id"), col("sign"),
        Seq("updated_at", "kafka_offset"), Seq("account_type"))
      .select("user_id", "updated_at", "kafka_offset", "account_type")
      .orderBy("user_id").collect()
    val viaLatest = Cdc.latest(demo, Seq("user_id"),
        Seq(col("updated_at"), col("kafka_offset")))
      .select("user_id", "updated_at", "kafka_offset", "account_type")
      .orderBy("user_id").collect()
    assert(viaCollapse === viaLatest)
    val nets = Cdc.collapse(allState, Seq("user_id"), col("sign"),
        Seq("updated_at", "kafka_offset"), Seq("account_type"))
      .select("user_id", "net").orderBy("user_id")
      .as[(Long, Long)].collect()
    assert(nets === Array((1L, 1L), (2L, 3L), (3L, 1L)))
  }

  test("ttl/retention rollups conserve row counts and additive sums") {
    val li = Tables(spark, sf("lineitem"), "lineitem")
    val totalRows = li.count()
    val totalQty = li.agg(sum(col("l_quantity").cast("decimal(18,4)")))
      .head().getDecimal(0)

    val ttl = Cdc.ttlRollup(li, "l_shipdate",
      lit("1996-01-01").cast("date"), Seq("l_returnflag"),
      date_trunc("month", col("l_shipdate")).cast("date"),
      Seq("l_quantity"))
    assert(ttl.agg(sum("n")).head().getLong(0) === totalRows)
    assert(ttl.agg(sum(col("l_quantity").cast("decimal(18,4)")))
             .head().getDecimal(0) === totalQty)

    val tiers = Cdc.retentionRollup(li, "l_shipdate", Seq("l_returnflag"),
      Seq("l_quantity"),
      Seq(lit("1998-01-01").cast("date") -> col("l_shipdate"),
          lit("1995-01-01").cast("date") ->
            date_trunc("month", col("l_shipdate")).cast("date")),
      date_trunc("year", col("l_shipdate")).cast("date"))
    assert(tiers.agg(sum("n")).head().getLong(0) === totalRows)
    assert(tiers.agg(sum(col("l_quantity").cast("decimal(18,4)")))
             .head().getDecimal(0) === totalQty)
    // tier buckets are coarser as they age: every yearly bucket is Jan 1
    val yearly = tiers.filter(col("l_shipdate") < lit("1995-01-01"))
      .select(month(col("l_shipdate")).as("m"), dayofmonth(col("l_shipdate")).as("d"))
      .distinct().as[(Int, Int)].collect()
    assert(yearly.forall(_ == ((1, 1))))
  }

  test("collapse plans as one partially-aggregated exchange, no window") {
    val plan = Cdc.collapse(demo.withColumn("sign", lit(1)),
        Seq("user_id"), col("sign"),
        Seq("updated_at", "kafka_offset"), Seq("account_type"))
      .queryExecution.executedPlan.toString
    // the scale claim vs the window-based `latest`: rows collapse to one
    // per key per partition BEFORE the single exchange (partial agg —
    // struct max plans as SortAggregate, whose local group-key sort is
    // per-partition, never a global order), and no per-key window pass
    // re-sorts the full stream after the shuffle.
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(plan.contains("partial_sum"),
           s"expected map-side partial aggregation:\n$plan")
    assert("Exchange".r.findAllIn(plan).size === 1,
           s"expected exactly one exchange:\n$plan")
  }

  test("collapse keeps the latest state row while net sign is positive") {
    val out = Cdc.collapse(collapsing, Seq("user_id"), col("sign"),
                           Seq("v"), Seq("payload"))
      .orderBy("user_id")
      .select("user_id", "v", "payload", "net")
      .as[(Long, Long, String, Long)].collect()
    assert(out === Array((1L, 2L, "b", 1L), (3L, 1L, "d", 1L)))
  }

  test("collapseVersioned cancels only within the same version tuple") {
    // u6: duplicate cancel of v1 then a later state v2. Plain collapse
    // nets to 0 and wrongly deletes the entity; the versioned form drops
    // only v1 and keeps v2 — the out-of-order/at-least-once safe read.
    val dupCancel = collapsing.unionByName(Seq(
      (6L, 1L, 1, "x"), (6L, 1L, -1, "x"), (6L, 1L, -1, "x"),
      (6L, 2L, 1, "y")
    ).toDF("user_id", "v", "sign", "payload"))

    val plain = Cdc.collapse(dupCancel, Seq("user_id"), col("sign"),
                             Seq("v"), Seq("payload"))
    assert(!plain.select("user_id").as[Long].collect().contains(6L))

    val versioned = Cdc.collapseVersioned(dupCancel, Seq("user_id"),
                                          Seq("v"), col("sign"),
                                          Seq("payload"))
      .orderBy("user_id", "v")
      .select("user_id", "v", "payload", "net")
      .as[(Long, Long, String, Long)].collect()
    assert(versioned === Array((1L, 2L, "b", 1L), (3L, 1L, "d", 1L),
                               (6L, 2L, "y", 1L)))
  }
}
