package graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Winnowing window-minimum selection (Schleimer et al. 2003) over a
  * gram-hash array: for every sliding window of `w` consecutive hashes,
  * the minimum with ties broken to the RIGHTMOST position, duplicates
  * removed keeping first occurrence — exactly the value of the SQL form
  * it replaces in [[LlmOps.winnowFingerprints]]:
  *
  * {{{
  * CASE WHEN size(hs) >= w THEN
  *   array_distinct(transform(sequence(0, size(hs) - w),
  *     j -> aggregate(sequence(j, j + w - 1),
  *       named_struct('pos', -1, 'h', 9223372036854775807L),
  *       (acc, i) -> IF(element_at(hs, i + 1) <= acc.h,
  *                      named_struct('pos', i, 'h', element_at(hs, i + 1)),
  *                      acc))))
  * ELSE array() END
  * }}}
  *
  * Exists for the same reason as [[SqDistArgmin]]: Catalyst higher-order
  * functions are interpreted (CodegenFallback with a per-step lambda
  * dispatch), and the fold above allocates a `named_struct` per
  * comparison — O(n·w) interpreted steps and allocations per document.
  * This expression is one compiled two-level loop with two scalar locals
  * per window and no per-step allocation.
  *
  * Exactness contract (replicated from the SQL, verified term-for-term
  * by WinnowMinimaSpec against the HOF form):
  *  - ties → rightmost: a window element wins with `h <= best`, scanned
  *    left to right (the fold's `<=` keep-last semantics);
  *  - a NULL hash element never wins (the SQL's `NULL <= acc.h` is NULL,
  *    so the IF keeps the accumulator) — an all-NULL window yields the
  *    initial `(-1, Long.MaxValue)` sentinel, which is emitted and
  *    deduplicated like any other value;
  *  - dedup is array_distinct: first occurrence kept, in window order.
  *    `pos` determines `h` (`h = hs(pos)` for `pos >= 0`; the sentinel
  *    is the single other value), so a seen-set over positions realizes
  *    struct-equality dedup exactly;
  *  - fewer than `w` elements → empty array; NULL input → NULL (the SQL
  *    CASE yields an empty array there, but every consumer explodes the
  *    result, where NULL and empty produce identical rows).
  */
case class WinnowMinima(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(w >= 1, "winnow window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_minima requires array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(StructType(Seq(StructField("pos", IntegerType, nullable = false),
                             StructField("h", LongType, nullable = false))),
              containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    // winnow argmin positions are non-decreasing across windows, but the
    // all-NULL-window sentinel can recur non-adjacently, so dedup with a
    // true seen-set (array_distinct semantics), keyed by pos (which
    // determines h) with Long.MinValue standing in for the sentinel
    val seen = new java.util.HashSet[Long]()
    var j = 0
    val last = n - w
    while (j <= last) {
      var bestPos = -1
      var bestH = Long.MaxValue
      var i = j
      val end = j + w
      while (i < end) {
        if (!hs.isNullAt(i)) {
          val h = hs.getLong(i)
          if (h <= bestH) { bestPos = i; bestH = h }
        }
        i += 1
      }
      val key = if (bestPos >= 0) bestPos.toLong else Long.MinValue
      if (seen.add(key)) {
        out += new GenericInternalRow(Array[Any](bestPos, bestH))
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowMinima = copy(child = newChild)

  override def prettyName: String = "winnow_minima"
}
