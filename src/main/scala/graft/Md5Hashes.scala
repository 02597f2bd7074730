package graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5 plumbing for the compiled portable-hash expressions: the
  * repo's portable-hash idiom is `conv(substring(md5(x), 1, n), 16, 10)`
  * — the first n hex digits of the md5 as a decimal BIGINT — because a
  * SQL oracle can replay it bit-for-bit. The interpreted form pays, per
  * value: a 32-char hex-string allocation, a substring, and a string
  * radix parse, on top of the digest itself. These expressions keep the
  * digest (the portable contract) and do the prefix extraction as nibble
  * arithmetic on the raw digest bytes.
  */
private[graft] object Md5Hashes {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First `nHex` hex nibbles of md5(bytes), as the decimal value
    * `conv(substring(md5, 1, nHex), 16, 10)` yields. nHex <= 15 keeps
    * every value strictly below 2^60, inside BIGINT exactly like the
    * SQL form.
    */
  def prefixLong(bytes: Array[Byte], nHex: Int): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < nHex) {
      val nib =
        if ((i & 1) == 0) (dig(i >> 1) >> 4) & 0xF
        else dig(i >> 1) & 0xF
      acc = (acc << 4) | nib
      i += 1
    }
    acc
  }
}

/** `CAST(conv(substring(md5(x), 1, nHex), 16, 10) AS BIGINT)` as one
  * compiled call — the portable md5-prefix hash ([[LlmOps.simhash60]]'s
  * per-token hash, [[LlmOps.contentChunks]]' boundary flag,
  * [[LlmOps.dsirWeights]]' bucket key) without the hex-string
  * round-trip. NULL in → NULL out, exactly like the SQL chain.
  * Md5NativeSpec pins value equality against the SQL form on random
  * multi-byte strings.
  */
case class Md5PrefixLong(child: Expression, nHex: Int)
    extends UnaryExpression with CodegenFallback {

  require(nHex >= 1 && nHex <= 15,
    s"md5 prefix must take 1..15 hex digits (got $nHex) to stay in BIGINT")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_prefix_long requires string, got ${other.sql}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Hashes.prefixLong(input.asInstanceOf[UTF8String].getBytes, nHex)

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixLong = copy(child = newChild)

  override def prettyName: String = "md5_prefix_long"
}

/** The winnowing gram-hash array ([[LlmOps.winnowFingerprints]]) as one
  * compiled loop — for each of the n−k+1 sliding k-token windows, the
  * 8-hex-digit md5 prefix of the space-joined gram:
  *
  * {{{
  * transform(slice(tk, 1, greatest(size(tk) - (k-1), 0)),
  *           (x, i) -> CAST(conv(substring(md5(
  *             array_join(slice(tk, i + 1, k), ' ')), 1, 8), 16, 10)
  *             AS BIGINT))
  * }}}
  *
  * The interpreted form pays per gram: two slice allocations, an
  * interpreted array_join, the hex round-trip, and the lambda dispatch.
  * Here the gram string is built once with `UTF8String.concatWs` (the
  * same primitive array_join bottoms out in — NULL tokens skipped, no
  * doubled separator) and hashed directly. NULL input array → NULL
  * (the HOF chain yields NULL there; every consumer explodes the
  * downstream selection, where NULL and empty are identical).
  * Md5NativeSpec pins element-for-element equality.
  */
case class Md5KGramHashes(child: Expression, k: Int, nHex: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "gram width must be >= 1")
  require(nHex >= 1 && nHex <= 15, "md5 prefix must take 1..15 hex digits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_kgram_hashes requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
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
      out(i) =
        Md5Hashes.prefixLong(UTF8String.concatWs(sep, parts: _*).getBytes,
                             nHex)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Md5KGramHashes = copy(child = newChild)

  override def prettyName: String = "md5_kgram_hashes"
}
