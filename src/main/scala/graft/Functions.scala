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

  /** L2 norm of a numeric array column. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity between two array columns (SURVEY.md L3) — pure
    * built-in higher-order functions, fully codegen'd.
    */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))
}
