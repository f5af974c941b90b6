package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: DECIMAL-exact dot product of two
  * `array<float>` (or `array<double>`, any mix) columns — the
  * codegen'd twin of the interpreted higher-order-function fold
  * `aggregate(zip_with(a, b, (x,y) => CAST(x·y AS DECIMAL(28,10))),
  * 0, (acc,x) => acc+x)` that [[graft.operators.Similarity]]
  * originally used. The double-element form serves derived vectors
  * (e.g. k-means difference vectors n·x − s) whose components are no
  * longer floats.
  *
  * Bit-parity contract (what makes this oracle-gateable where
  * [[DotProductFloat]]'s sequential double accumulation is not): each
  * element product is computed in double and rounded ONCE to 10
  * decimal places exactly as Spark's `Cast(double → DECIMAL(28,10))`
  * does — `BigDecimal.valueOf(p)` (shortest decimal representation,
  * what scala.math.BigDecimal(double) wraps) then
  * `setScale(10, HALF_UP)` — and the rounded terms are accumulated
  * EXACTLY (long unscaled units, BigInteger beyond ±2^63), so the
  * result is independent of element order, partitioning, and engine:
  * identical to both the HOF fold and DuckDB's
  * `SUM(CAST(a*b AS DECIMAL(28,10)))`.
  *
  * Null semantics replicate the HOF fold: arrays of different lengths
  * (zip_with pads with null) or any null element → null result; empty
  * arrays → 0.0.
  *
  * Why it's fast: higher-order functions evaluate interpreted — one
  * lambda dispatch plus Decimal boxing per element, outside
  * whole-stage codegen. This expression is a single static call on
  * Tungsten array data inside the generated loop; the per-element cost
  * is one BigDecimal rounding, ~10× cheaper than the interpreted fold
  * and fused into the surrounding stage.
  */
case class DotProductDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot_dec requires (array<float|double>, array<float|double>), got ($l, $r)")
    }

  private def isDoubleArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_dec"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductDecimal.compute(
      a.asInstanceOf[ArrayData], isDoubleArr(left),
      b.asInstanceOf[ArrayData], isDoubleArr(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotDec")
      s"""
         |java.lang.Double $tmp = graft.functions.DotProductDecimal.compute($a, ${isDoubleArr(left)}, $b, ${isDoubleArr(right)});
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object DotProductDecimal {

  /** Static worker the generated code calls. Returns null for the
    * null-producing shapes (length mismatch, null element) so the
    * wrapper can propagate SQL null.
    */
  def compute(x: ArrayData, xDouble: Boolean, y: ArrayData, yDouble: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var accLong = 0L
    var accBig: BigInteger = null // engaged only if long accumulation overflows
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yDouble) y.getDouble(i) else y.getFloat(i).toDouble
      val p = xv * yv
      // Exactly Spark's Cast(double -> DECIMAL(28,10)): shortest decimal
      // representation, then HALF_UP to 10 fractional digits.
      val scaled = JBigDecimal.valueOf(p).setScale(10, RoundingMode.HALF_UP)
      if (accBig == null) {
        try accLong = Math.addExact(accLong, scaled.unscaledValue().longValueExact())
        catch {
          case _: ArithmeticException =>
            accBig = BigInteger.valueOf(accLong).add(scaled.unscaledValue())
        }
      } else accBig = accBig.add(scaled.unscaledValue())
      i += 1
    }
    val unscaled = if (accBig == null) BigInteger.valueOf(accLong) else accBig
    new JBigDecimal(unscaled, 10).doubleValue()
  }
}
