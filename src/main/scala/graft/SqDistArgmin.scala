package graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Nearest-centroid assignment over a BOUNDED centroid grid — the
  * per-row argmin of Σᵢ (xᵢ − cᵢ)² against k driver-collected integer
  * centroids, returning `struct(d, cid)` with the lower-cid tie-break.
  *
  * Exists because neither relational formulation survives the hot loop:
  * the broadcast-join form (r15 [[LlmOps.assignToCentroids]], kept for
  * the streaming per-batch path) re-shuffles corpus-sized exploded
  * coordinates and two aggregate passes per k-means round, while the
  * in-row `transform`/`zip_with`/`aggregate` HOF form is interpreted —
  * an r16 probe measured it at ~20 s of executor CPU per assignment
  * pass on the sf0.1 corpus — and a literal-unrolled k·dims expression
  * tree (≈3k nodes) moves the cost into per-round re-optimization and
  * codegen. This expression is one compiled two-level loop; the
  * centroid grid rides as constructor data (k·dims values, bounded by
  * construction and corpus-independent — the [[LlmOps.pcaFromPartials]]
  * bounded-collect discipline).
  *
  * Exactness contract (must hash-match the join+sum oracle replay): a
  * term contributes iff BOTH the coordinate and the centroid value at
  * that dimension exist and the coordinate is non-null — exactly the
  * rows the relational join on `i` produced, with `sum` skipping null
  * products; all arithmetic is exact BIGINT (|diff| ≤ 4·10⁴ per dim ⇒
  * d ≤ dims·1.6·10⁹, far inside Long). `cids` MUST be sorted ascending:
  * the strict `<` keep-first scan then realizes `min(struct(d, cid))`.
  *
  * CodegenFallback is deliberate: the per-row work IS the compiled
  * Scala loop below, so the single non-codegen boundary call costs
  * nothing measurable, while the generated source stays identical
  * across k-means rounds (the grid is reference data, not inline
  * literals), keeping Janino's cache warm.
  */
case class SqDistArgmin(child: Expression,
                        cids: Array[Long],
                        dims: Array[Array[Int]],
                        cvals: Array[Array[Long]])
    extends UnaryExpression with CodegenFallback {

  require(cids.nonEmpty && cids.length == dims.length &&
            cids.length == cvals.length &&
            (1 until cids.length).forall(i => cids(i - 1) < cids(i)),
          "centroid grid must be non-empty and cid-ascending")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sq_dist_argmin requires array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType =
    StructType(Seq(StructField("d", LongType, nullable = false),
                   StructField("cid", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var bestD = Long.MaxValue
    var bestC = Long.MaxValue
    var k = 0
    while (k < cids.length) {
      val idx = dims(k)
      val cv = cvals(k)
      var d = 0L
      var t = 0
      while (t < idx.length) {
        val i = idx(t)
        if (i < n && !xs.isNullAt(i)) {
          val diff = xs.getLong(i) - cv(t)
          d += diff * diff
        }
        t += 1
      }
      if (d < bestD) { bestD = d; bestC = cids(k) }
      k += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestC))
  }

  override protected def withNewChildInternal(
      newChild: Expression): SqDistArgmin = copy(child = newChild)

  override def prettyName: String = "sq_dist_argmin"
}
