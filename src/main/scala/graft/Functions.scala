package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function layer (SURVEY.md §2.8).
  *
  * The reference's only in-flight scalar transform is
  * `toDateTime(updated_at / 1000000)` (`/root/reference/README.md:226-227`):
  * epoch-microseconds → second-precision DateTime, i.e. integer division
  * truncates the sub-second part. [[microsToTimestampSecond]] replicates
  * that bit-exactly; [[microsToTimestamp]] is the precision-preserving
  * variant for our own schemas.
  */
object Functions {

  /** ClickHouse-parity conversion: epoch micros → timestamp truncated to
    * whole seconds (`toDateTime(x / 1000000)`,
    * `/root/reference/README.md:226-227`).
    */
  def microsToTimestampSecond(c: Column): Column =
    timestamp_seconds(floor(c / 1000000L).cast("long"))

  /** Full-precision epoch-micros → timestamp. */
  def microsToTimestamp(c: Column): Column = timestamp_micros(c)

  /** Stable 64-bit content hash for dedup keys (L1). xxhash64 is Spark's
    * codegen'd native hash — no UDF.
    */
  def contentHash(c: Column): Column = xxhash64(c)

  /** Dot product of two equal-length numeric array columns — the native
    * codegen'd [[DotProduct]] expression (deterministic left-to-right
    * double accumulation; see its scaladoc for why not a HOF fold).
    */
  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a),
                                   ColumnBridge.expression(b)))
  }

  /** |A ∩ B| of two sorted long-array columns — the native codegen'd
    * [[SortedIntersectCount]] two-pointer merge (see its scaladoc for
    * why not `array_intersect` or a relational intersection).
    */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a),
                                             ColumnBridge.expression(b)))
  }

  /** [[sortedIntersectCount]] with a Jaccard-threshold early exit
    * ([[SortedIntersectCountBounded]]) — use ONLY when the count feeds
    * a `count / (size(a) + size(b) - count) >= minJaccard` filter;
    * emitted rows and values are then bit-identical to the unbounded
    * form (contract in the expression's scaladoc).
    */
  def sortedIntersectCountBounded(a: Column, b: Column,
                                  minJaccard: Double): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SortedIntersectCountBounded(
      ColumnBridge.expression(a), ColumnBridge.expression(b), minJaccard))
  }

  /** L2 norm of a numeric array column. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity between two array columns (SURVEY.md L3) — pure
    * built-in higher-order functions, fully codegen'd.
    */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** IPv4 number → dotted-quad string (ClickHouse `IPv4NumToString`) —
    * four codegen'd shift/mask extractions, no UDF.
    */
  def ipv4NumToString(ip: Column): Column =
    concat_ws(".",
              shiftright(ip, 24).bitwiseAND(255).cast("string"),
              shiftright(ip, 16).bitwiseAND(255).cast("string"),
              shiftright(ip, 8).bitwiseAND(255).cast("string"),
              ip.bitwiseAND(255).cast("string"))

  /** Dotted-quad string → IPv4 number (ClickHouse `IPv4StringToNum`). */
  def ipv4StringToNum(s: Column): Column = {
    val oct = split(s, "\\.")
    element_at(oct, 1).cast("long") * 16777216L +
      element_at(oct, 2).cast("long") * 65536L +
      element_at(oct, 3).cast("long") * 256L +
      element_at(oct, 4).cast("long")
  }

  /** RFC-1918 private-range predicate over an IPv4 number. */
  def ipv4IsPrivate(ip: Column): Column = {
    val a = shiftright(ip, 24).bitwiseAND(255)
    val b = shiftright(ip, 16).bitwiseAND(255)
    (a === 10) || (a === 172 && b >= 16 && b <= 31) ||
      (a === 192 && b === 168)
  }

  /** Haversine great-circle distance in km (ClickHouse
    * `greatCircleDistance`, R = 6371 km) — fixed IEEE expression, no UDF.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column,
                  lon2: Column): Column =
    lit(2.0 * 6371.0) * asin(sqrt(
      pow(sin(radians(lat2 - lat1) / 2), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) *
          pow(sin(radians(lon2 - lon1) / 2), 2)))

  private val geohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** 8-character geohash (ClickHouse `geohashEncode`) as a pure
    * relational expression: quantize lat/lon to 20 bits each, interleave
    * (lon first, per the geohash spec) into a 40-bit code with a
    * higher-order fold, then emit 8 base-32 digits. All bit surgery is
    * exact floor-division arithmetic on power-of-two divisors (divisions
    * of integers < 2⁵³ by 2ᵏ are exact in double), so a SQL oracle
    * reproduces the hash bit-for-bit — and no UDF leaves codegen.
    */
  def geohashEncode(lat: Column, lon: Column): Column = {
    val ilat = least(lit(1048575L),
                     floor((lat + 90.0) / 180.0 * 1048576.0).cast("long"))
    val ilon = least(lit(1048575L),
                     floor((lon + 180.0) / 360.0 * 1048576.0).cast("long"))
    def bitAt(v: Column, i: Column): Column =
      pmod(floor(v.cast("double") / pow(lit(2.0), lit(19) - i))
             .cast("long"), lit(2L))
    val h = aggregate(
      sequence(lit(0), lit(19)), lit(0L),
      (acc, i) => acc +
        bitAt(ilon, i) * pow(lit(2.0), lit(39) - i * 2).cast("long") +
        bitAt(ilat, i) * pow(lit(2.0), lit(38) - i * 2).cast("long"))
    val alpha = split(lit(geohashAlphabet), "")
    array_join(
      transform(sequence(lit(0), lit(7)),
                k => element_at(alpha,
                  (pmod(floor(h.cast("double") /
                          pow(lit(2.0), lit(35) - k * 5)).cast("long"),
                        lit(32L)) + 1).cast("int"))), "")
  }
}
