package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: position-ordered [[Hashing.h32]] hashes
  * of every character `k`-gram of the ASCII-CASE-FOLDED text — the
  * rolling hash stream under winnowing fingerprints and
  * content-defined segmentation (q79/q80/q91/q97, the engine's
  * md5-bound family).
  *
  * Semantics are bit-identical to the composed form it replaces
  * (`transform(charGramsAll(text, k), g => h32(g))`, which folds via
  * [[graft.operators.Dedup.asciiFold]]): Spark's `split(s, "")` yields
  * CODE POINTS and `md5(gram)` hashes the gram's UTF-8 bytes — so this
  * kernel folds A–Z in one byte pass (a 1:1 map on single-byte code
  * points; multi-byte sequences are untouched, so the byte structure
  * is IDENTICAL to the input's), records each code point's byte
  * offset, and feeds every k-gram's byte slice straight into one
  * thread-local MessageDigest. No per-gram string objects, no
  * slice/zip_with intermediate arrays, no interpreted lambda dispatch
  * — and the stage stays inside whole-stage codegen, which any
  * higher-order function would eject it from.
  *
  * ASCII-only fold, not `lower()`: the JVM's full Unicode lowercase
  * EXPANDS U+0130 while DuckDB's simple mapping does not, so a
  * lowered-text hash stream diverges cross-engine on such inputs
  * (caught by the adversarial-fixture parity gate). `translate`-style
  * folding is bit-identical everywhere — and removes the
  * expansion corner the previous kernel had to pin.
  *
  * Texts shorter than `k` code points yield an EMPTY array (the
  * descending-`sequence` guard of the composed form). h32 = the first
  * 8 md5 hex digits as an unsigned 32-bit value in a BIGINT — the
  * DuckDB twin is unchanged. NULL text propagates NULL at this
  * expression level; the [[graft.operators.Dedup.charGramHashes]]
  * helper coalesces to the composed form's empty array.
  */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 64, s"graft_gram_hashes: k in [1,64]; got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_gram_hashes requires string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(a: Any): Any =
    GramHashes.compute(a.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"${ev.value} = graft.functions.GramHashes.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Row kernel (static entry for the generated Java): ASCII-fold the
    * bytes (A–Z are single-byte code points, so the fold is a 1:1 byte
    * map that cannot change the code-point structure), index
    * code-point byte offsets, md5 each k-gram byte slice, take the
    * first 4 digest bytes as an unsigned 32-bit value. Gram count is
    * `numChars − (k−1)` — with no expansion possible, the folded
    * stream's count IS the original's (the composed form's
    * `length(text)` guard).
    */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val src = text.getBytes
    val nBytes = src.length
    val bytes = new Array[Byte](nBytes)
    var i = 0
    while (i < nBytes) {
      val b = src(i)
      bytes(i) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      i += 1
    }
    // code-point start offsets, plus the end sentinel
    var cp = 0
    i = 0
    while (i < nBytes) { i += utf8Len(bytes(i)); cp += 1 }
    val nGrams = cp - (k - 1)
    if (nGrams < 1) return new GenericArrayData(Array.empty[Long])
    val offsets = new Array[Int](cp + 1)
    i = 0
    var j = 0
    while (i < nBytes) { offsets(j) = i; i += utf8Len(bytes(i)); j += 1 }
    offsets(cp) = nBytes
    val md = digests.get()
    val out = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      md.reset()
      md.update(bytes, offsets(g), offsets(g + k) - offsets(g))
      val d = md.digest()
      out(g) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Byte length of the code point starting at `b` — DELEGATED to
    * Spark's own `UTF8String.numBytesForFirstByte` so malformed UTF-8
    * (a continuation byte 0x80–0xBF or invalid lead 0xF5+ at a lead
    * position, which Spark counts as a 1-byte char) segments exactly
    * like the composed `split('')`/`length()` path this kernel
    * replaces. The previous hand-rolled table treated continuation
    * leads as 2-byte, silently misaligning gram offsets on malformed
    * input instead of matching `numChars`.
    */
  private def utf8Len(b: Byte): Int =
    UTF8String.numBytesForFirstByte(b)
}
