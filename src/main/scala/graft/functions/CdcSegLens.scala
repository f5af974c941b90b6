package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: content-defined segment LENGTHS from a
  * rolling-hash stream — the boundary/diff stage of
  * [[graft.operators.TextAnalysis.cdcSegmentStats]] (q91). A boundary
  * sits at 1-based gram position `i` where `hs[i-1] % mod == 0`; the
  * result is the consecutive diffs of `0 ++ boundaries ++ textLen`
  * (always ≥ 1 element: an empty stream yields `[textLen]`, one whole
  * segment).
  *
  * Replaces the composed zip_with(index-mark) → filter(isNotNull) →
  * concat → two slices → zip_with(subtract) chain — five interpreted
  * HOF/array stages and their transient arrays per row — with one
  * walk of the hash array. Element semantics match the composed form
  * exactly: `%` is Java remainder on both paths (negative hashes
  * behave identically), and a NULL hash element marks no boundary
  * (the composed `when` maps it to null and the filter drops it).
  * NULL in either child (hash array or length) null-propagates (SQL
  * convention); [[graft.operators.TextAnalysis.cdcSegmentStats]]
  * coalesces to the composed form's `[null]` for NULL text, the same
  * pattern as [[graft.operators.Dedup.charGramHashes]].
  */
case class CdcSegLens(left: Expression, right: Expression, mod: Int)
    extends BinaryExpression {
  require(mod >= 1, s"graft_cdc_lens: mod >= 1; got $mod")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cdc_lens requires (array<bigint>, bigint), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_cdc_lens"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CdcSegLens.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Long], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"${ev.value} = graft.functions.CdcSegLens.compute($a, $b, $mod);")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CdcSegLens {

  /** Row kernel (static entry for the generated Java): one walk marks
    * boundaries and emits diffs in place.
    */
  def compute(hs: ArrayData, textLen: Long, mod: Int): ArrayData = {
    val n = hs.numElements()
    // first pass: count boundaries (exact output sizing, no buffer)
    var nb = 0
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i) && hs.getLong(i) % mod == 0) nb += 1
      i += 1
    }
    val out = new Array[Long](nb + 1)
    var prev = 0L
    var o = 0
    i = 0
    while (i < n) {
      if (!hs.isNullAt(i) && hs.getLong(i) % mod == 0) {
        val b = i + 1L // 1-based gram position
        out(o) = b - prev
        prev = b
        o += 1
      }
      i += 1
    }
    out(o) = textLen - prev
    new GenericArrayData(out)
  }
}
