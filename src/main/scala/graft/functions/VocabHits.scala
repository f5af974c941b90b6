package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: number of single-space-delimited tokens
  * of `text` that belong to a small literal vocabulary — the
  * marker-word / stopword counter under language ID and quality
  * scoring (q26/q27 and the affinity family's lang facets).
  *
  * Semantics are identical to the composed form it replaces
  * (`size(filter(split(text, " "), t => t.isin(vocab: _*)))`): Spark's
  * `split` on the literal single-space pattern yields the runs between
  * 0x20 bytes INCLUDING empty tokens (consecutive/leading/trailing
  * spaces), and `isin` is exact case-sensitive equality. Empty tokens
  * can only count if the vocabulary contains "" — callers don't, and
  * the kernel honors it either way. Splitting on the raw 0x20 byte is
  * UTF-8-safe: no multi-byte code point contains a 0x20 byte.
  *
  * One walk over the text's bytes, each token compared against ≤ a
  * handful of vocabulary byte strings — no token array, no per-token
  * string objects, no interpreted lambda dispatch, and the stage stays
  * inside whole-stage codegen (HOF `filter` evaluates interpreted and
  * ejects its stage).
  */
case class VocabHits(child: Expression, vocab: Seq[String]) extends UnaryExpression {
  require(vocab.nonEmpty && vocab.size <= 64, s"graft_vocab_hits: 1..64 vocab words; got ${vocab.size}")

  private lazy val vocabBytes: Array[Array[Byte]] =
    vocab.map(_.getBytes("UTF-8")).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_vocab_hits requires string, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_vocab_hits"

  override protected def nullSafeEval(a: Any): Any =
    VocabHits.compute(a.asInstanceOf[UTF8String], vocabBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocab", vocabBytes, "byte[][]")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"${ev.value} = graft.functions.VocabHits.compute($a, $vocabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VocabHits {

  /** Row kernel (static entry for the generated Java): walk the bytes,
    * close a token at each 0x20 and at end-of-string, count tokens
    * byte-equal to any vocabulary entry.
    */
  def compute(text: UTF8String, vocab: Array[Array[Byte]]): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    var count = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        val len = i - start
        var v = 0
        var matched = false
        while (v < vocab.length && !matched) {
          val w = vocab(v)
          if (w.length == len) {
            var j = 0
            while (j < len && w(j) == bytes(start + j)) j += 1
            matched = j == len
          }
          v += 1
        }
        if (matched) count += 1L
        start = i + 1
      }
      i += 1
    }
    count
  }
}
