package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: minima of every sliding window of `w`
  * consecutive elements of a BIGINT array — the window-min stage of
  * winnowing fingerprints (q79/q80/q97), emitting `max(0, n−w+1)`
  * elements.
  *
  * Replaces the composed `w` aligned slices reduced with
  * `zip_with(least)` — w−1 interpreted lambda passes and their
  * transient arrays per row — with one monotonic-deque walk (O(n)
  * regardless of `w`, where the slice chain is O(n·w)). Element
  * semantics match the composed form exactly: `least` skips nulls, so
  * a window's minimum is the least NON-NULL member and an all-null
  * window yields a null element; arrays shorter than `w` yield an
  * EMPTY array (the composed form's descending-guard `otherwise`).
  * One deliberate divergence: a NULL input ARRAY null-propagates here
  * (SQL convention), where the composed `when` guard falls through to
  * `otherwise(empty)` — callers needing the legacy []-on-null
  * contract coalesce, exactly like
  * [[graft.operators.Dedup.charGramHashes]] does for its kernel
  * (winnowFingerprints is protected through that same coalesce).
  */
case class WindowMins(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1 && w <= 4096, s"graft_win_mins: w in [1,4096]; got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_win_mins requires array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_win_mins"

  override protected def nullSafeEval(a: Any): Any =
    WindowMins.compute(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"${ev.value} = graft.functions.WindowMins.compute($a, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowMins {

  /** Row kernel (static entry for the generated Java): monotonic-deque
    * sliding minimum over the non-null elements; index deque holds
    * positions of candidate minima in increasing value order.
    */
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    val m = n - (w - 1)
    if (m < 1) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var anyNullOut = false
    val nullOut = new Array[Boolean](m)
    // deque of indices with ascending values; head = current window min
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
        dq(tail) = i
        tail += 1
      }
      // evict candidates that left the window [i-w+1, i]
      while (tail > head && dq(head) < i - (w - 1)) head += 1
      if (i >= w - 1) {
        val o = i - (w - 1)
        if (tail > head) out(o) = arr.getLong(dq(head))
        else { nullOut(o) = true; anyNullOut = true } // all-null window
      }
      i += 1
    }
    if (!anyNullOut) new GenericArrayData(out)
    else {
      val boxed = new Array[Any](m)
      var o = 0
      while (o < m) {
        boxed(o) = if (nullOut(o)) null else java.lang.Long.valueOf(out(o))
        o += 1
      }
      new GenericArrayData(boxed)
    }
  }
}
