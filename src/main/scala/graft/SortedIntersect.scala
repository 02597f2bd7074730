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

/** [[SortedIntersectCount]] with a Jaccard-threshold EARLY EXIT — for
  * verifiers whose output feeds `count / (|A| + |B| − count) >= t`:
  * the merge loop stops as soon as even matching every remaining
  * element of the shorter side cannot reach `minPass`, the smallest
  * integer count whose Jaccard (in the EXACT double arithmetic of the
  * downstream filter) reaches `t`.
  *
  * Contract (what makes this lossless): for a pair that can still
  * qualify the loop never bails, so the returned count is EXACT; for a
  * pair that bails, the returned partial count c satisfies
  * c <= |A∩B| < minPass, and by minPass's definition every count below
  * it fails the double-division filter — so the filter's verdict, and
  * therefore the emitted row set AND every emitted jaccard value, are
  * bit-identical to the unbounded expression's. The win is skipped
  * steps on the overwhelmingly-dominant non-qualifying candidates
  * (at t = 0.2 on same-length docs the bail fires once the shorter
  * remainder drops under ~⅓ of the doc): measured §6.1, the verify
  * stage is 2.2 × 10⁹ candidate intersects at the 100× corpus with
  * ~4 × 10⁻⁵ precision, so nearly every loop is a non-qualifier.
  *
  * `minPass` is found by binary search over [0, min(|A|,|B|) + 1)
  * with the predicate evaluated in the same `(double) i / (na+nb−i)`
  * arithmetic the filter uses — ~6 double divisions per row, repaid
  * hundreds of times over in the loop.
  */
case class SortedIntersectCountBounded(left: Expression, right: Expression,
                                       minJaccard: Double)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count_bounded requires two array<bigint> " +
          s"inputs, got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val mn = math.min(nx, ny)
    var lo = 0
    var hi = mn + 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (mid.toDouble / (nx + ny - mid) >= minJaccard) hi = mid
      else lo = mid + 1
    }
    val minPass = lo // mn + 1 when even a full short-side match fails
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny &&
           c + math.min(nx - i, ny - j) >= minPass) {
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
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $lo = 0;
         |int $hi = java.lang.Math.min($nx, $ny) + 1;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ((double) $mid / ($nx + $ny - $mid) >= $minJaccard) {
         |    $hi = $mid;
         |  } else { $lo = $mid + 1; }
         |}
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny &&
         |       $c + java.lang.Math.min($nx - $i, $ny - $j) >= $lo) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression)
      : SortedIntersectCountBounded =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count_bounded"
}
