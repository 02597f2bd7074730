package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined k-token grams of a token array — the compiled form of
  * the expression every shingle/n-gram fan-out in [[LlmOps]] evaluates
  * per document, replacing (r16):
  *
  * {{{
  * // distinct = false ([[LlmOps.ngramsAll]]):
  * CASE WHEN size(toks) >= k THEN
  *   transform(sequence(0, size(toks) - k),
  *             i -> concat_ws(' ', slice(toks, i + 1, k)))
  * ELSE array() END
  * // distinct = true ([[LlmOps.shingles]]): array_distinct( same )
  * }}}
  *
  * Exists for the same reason as [[WinnowMinima]]/[[SqDistArgmin]]:
  * Catalyst higher-order functions are interpreted, and the form above
  * pays, per gram, a lambda dispatch + a `slice` array allocation + an
  * interpreted `concat_ws` — on the dedup family this loop IS the
  * explode-side CPU (shingle fan-outs feed minhash signatures, PPJoin
  * prefixes, decontamination probes and repetition stats). This
  * expression is one compiled loop calling `UTF8String.concatWs`
  * directly (the same primitive Catalyst's ConcatWs bottoms out in, so
  * the produced strings are byte-identical).
  *
  * Exactness contract (pinned by KGramsSpec against the HOF forms):
  *  - gram i = tokens [i, i+k) joined with a single space; NULL tokens
  *    are SKIPPED by the join (concat_ws semantics — no empty slot, no
  *    doubled separator);
  *  - fewer than k tokens → empty array; NULL input array → empty array
  *    (the CASE's ELSE branch — this expression is never-null, matching
  *    the `when(...).otherwise(array())` wrapper it replaces);
  *  - `distinct = true` keeps the FIRST occurrence of each gram in
  *    array order (array_distinct semantics);
  *  - `stride` spaces the gram start positions: stride = 1 is the
  *    sliding-window form above; stride = k is the non-overlapping
  *    chunk form ([[LlmOps.chunksOf]] — `transform(sequence(0,
  *    (size(toks) div k) - 1), i -> concat_ws(' ', slice(toks,
  *    i*k + 1, k)))`, whose floor(n/k) full chunks equal the stride
  *    loop's floor((n-k)/k)+1 and the trailing partial chunk is
  *    dropped by both).
  */
case class KGrams(child: Expression, k: Int, distinct: Boolean,
                  stride: Int = 1)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "k-gram width must be >= 1")
  require(stride >= 1, "k-gram stride must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kgrams requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  private val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](n - k + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    val parts = new Array[UTF8String](k)
    var i = 0
    val last = n - k
    while (i <= last) {
      var j = 0
      while (j < k) {
        parts(j) =
          if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      // concatWs COPIES into a fresh UTF8String, so the emitted gram
      // never aliases the scan's reused row buffer
      val g = UTF8String.concatWs(sep, parts: _*)
      if (seen == null || seen.add(g)) out += g
      i += stride
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): KGrams = copy(child = newChild)

  override def prettyName: String =
    if (distinct) "kgrams_distinct" else "kgrams_all"
}
