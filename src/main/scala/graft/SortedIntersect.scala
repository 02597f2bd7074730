package graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd |A ∩ B| over two SORTED long-array columns — the
  * set-similarity verifier's hot loop. Two-pointer merge: O(|A| + |B|)
  * per pair, zero allocation, whole-stage-codegen'd — versus
  * `size(array_intersect(a, b))`, which builds a hash set per ROW
  * (interpreted, allocation per call: a GC storm at 10⁸ candidate
  * pairs), or the relational intersection (candidate ⋈ shingles ⋈
  * shingles), whose intermediate is Σ|A| rows PER CANDIDATE — the r14
  * third-decade probe measured that shape as a ~20-billion-row
  * intermediate with 26 GB of spill at 100× (SURVEY §6.1). Verifying
  * IN the candidate join (each side carries its sorted shingle-hash
  * array) removes both the candidate exchange and the shingle joins —
  * the same verify-in-join shape as the embedding path's in-bucket
  * cosine.
  *
  * Inputs MUST be sorted ascending with distinct elements (the
  * producer uses `sort_array(collect_set-equivalent)`); elements are
  * non-null by construction (xxhash64 output). Duplicate or unsorted
  * input degrades the count, never crashes.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}
