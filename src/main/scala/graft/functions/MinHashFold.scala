package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the k-member MinHash signature of a
  * pre-hashed shingle array in ONE pass — element `j` of the result is
  * `min over h of (a_j·h + b_j) mod P` with the engine's fixed affine
  * family (a_j = 2j+3, b_j = 5j+7, P = [[Hashing.AffineP]]).
  *
  * Replaces k independent `array_min(transform(hs, h => affine(h,
  * j)))` columns — k interpreted lambda dispatches and k transient
  * arrays per row — with a single kernel that keeps the k running
  * minima in registers while walking the hash array once. Same
  * per-member semantics: a null input element contributes to no
  * minimum (`transform` maps null→null and `array_min` skips nulls),
  * and a member with no non-null inputs (empty shingle set) is a NULL
  * element, exactly like `array_min` of an empty array.
  *
  * PRECONDITION (h32-range inputs): the affine products are computed
  * in raw 64-bit arithmetic, identical to the composed form's BIGINT
  * math only while `|h·a_j|` stays under 2^63 — guaranteed for the
  * engine's unsigned-32-bit [[Hashing.h32]] values (≤ 2^32·131 <
  * 2^40). Feeding arbitrary 64-bit hashes could overflow-wrap where
  * ANSI mode would throw.
  */
case class MinHashFold(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 64, s"graft_minhash: k in [1,64]; got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash requires array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(a: Any): Any =
    MinHashFold.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"${ev.value} = graft.functions.MinHashFold.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFold {

  /** Row kernel (static entry for the generated Java). */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](k)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        // Loud contract enforcement (one compare per element): the
        // affine products are raw 64-bit math, identical to the
        // composed ANSI form only for the engine's h32 range. An
        // out-of-contract SQL caller (graft_minhash is session-
        // registered) must fail like ANSI would, not wrap silently.
        if (h < 0L || h > (1L << 33)) {
          throw new IllegalArgumentException(
            s"graft_minhash: input hash $h outside the h32 contract [0, 2^33] — " +
              "raw affine math would overflow-wrap where ANSI arithmetic throws")
        }
        var j = 0
        while (j < k) {
          val v = (h * (2L * j + 3L) + (5L * j + 7L)) % Hashing.AffineP
          if (!any || v < mins(j)) mins(j) = v
          j += 1
        }
        any = true
      }
      i += 1
    }
    if (!any) {
      new GenericArrayData(new Array[Any](k)) // k null members
    } else {
      new GenericArrayData(mins)
    }
  }
}
