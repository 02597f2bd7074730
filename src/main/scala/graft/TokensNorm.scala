package graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The normalizing tokenizer ([[LlmOps.tokens]] with `normalize = true`)
  * as one compiled pass, replacing (r16):
  *
  * {{{
  * filter(split(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " "),
  *        t -> t != "")
  * }}}
  *
  * which pays, per document: a regex-engine pass over every character, a
  * regex split materializing every empty segment, and an interpreted
  * filter HOF dispatching a lambda per segment.
  *
  * Equivalence (pinned by TokensNormSpec on adversarial Unicode):
  *  - lowercasing uses the SAME `UTF8String.toLowerCase` primitive
  *    Catalyst's `Lower` bottoms out in, so locale/Unicode behavior is
  *    identical by construction (e.g. U+0130 lowering to "i" + combining
  *    dot);
  *  - after lowering, the regex keeps exactly {a-z, 0-9, space} and
  *    turns every other CODEPOINT into one space; the split-then-drop-
  *    empties therefore yields exactly the maximal runs of [a-z0-9]
  *    codepoints. In UTF-8, a-z/0-9/space are single bytes and every
  *    byte of a multi-byte codepoint has the high bit set, so maximal
  *    [a-z0-9] BYTE runs are the same token boundaries (a multi-byte
  *    codepoint contributing one separator vs several consecutive ones
  *    is indistinguishable after empty-segment dropping);
  *  - NULL text → NULL (the SQL chain is NULL-propagating; every
  *    consumer explodes or sizes the array, where NULL behaves as the
  *    HOF chain's NULL did).
  */
case class TokensNorm(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tokens_norm requires string, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].toLowerCase.getBytes
    val n = b.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var i = 0
    var start = -1
    while (i <= n) {
      val tok = i < n && {
        val c = b(i)
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      }
      if (tok) { if (start < 0) start = i }
      else if (start >= 0) {
        val len = i - start
        val t = new Array[Byte](len)
        System.arraycopy(b, start, t, 0, len)
        out += UTF8String.fromBytes(t)
        start = -1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokensNorm = copy(child = newChild)

  override def prettyName: String = "tokens_norm"
}
