package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: highest multiplicity of any element in
  * an `array<string>` (0 for empty) — the hot kernel of the Gopher
  * repetition signals (q163's top-word fraction).
  *
  * Why an Expression and not the `aggregate(sort_array(...))` fold it
  * replaces: higher-order functions evaluate their lambdas
  * interpreted — one closure call per element, per pass — AND exclude
  * the whole stage from codegen, so every co-resident column in the
  * projection pays interpreter speed too. This expression sorts the
  * row's elements once (binary UTF8 order, the same ordering
  * `sort_array` uses on strings) and takes the longest equal-run in a
  * tight loop, via one static call the generated code inlines into the
  * stage — q163 stays inside WholeStageCodegen end to end.
  *
  * Semantics are IDENTICAL to the fold it replaces, including the null
  * corner: a null element never extends a run and contributes
  * multiplicity 1 (the fold's three-valued `x === prev` comparison
  * falls through to `otherwise(1)` for every null). The value is a
  * COUNT, not a winning element, so no tie-break exists to diverge
  * cross-engine.
  */
case class ArrayMaxMultiplicity(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"graft_max_mult requires array<string>, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_max_mult"

  override protected def nullSafeEval(a: Any): Any =
    ArrayMaxMultiplicity.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"${ev.value} = graft.functions.ArrayMaxMultiplicity.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayMaxMultiplicity {

  /** Binary order, nulls first (like `sort_array` ascending) — a
    * single shared instance so the per-row kernel allocates nothing
    * beyond its working array.
    */
  private val NullsFirstBinary: java.util.Comparator[UTF8String] =
    new java.util.Comparator[UTF8String] {
      override def compare(x: UTF8String, y: UTF8String): Int =
        if (x == null && y == null) 0
        else if (x == null) -1
        else if (y == null) 1
        else x.compareTo(y)
    }

  /** Row kernel (also the static entry the generated Java calls via
    * the companion's forwarder): copy out the row's UTF8Strings, sort
    * binary (nulls first, like `sort_array` ascending), scan for the
    * longest equal-run of non-null elements.
    */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val items = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      items(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(items, NullsFirstBinary)
    var best = 0L
    var run = 0L
    var prev: UTF8String = null
    i = 0
    while (i < n) {
      val cur = items(i)
      run = if (cur == null || prev == null || !cur.equals(prev)) 1L else run + 1L
      if (run > best) best = run
      prev = cur
      i += 1
    }
    best
  }
}
