package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar column builders replicating the reference's helper semantics
  * (reference: lib/helpers.js), written as Catalyst `Column` expressions
  * so they stay inside whole-stage codegen.
  *
  * The falsy-null traps of SURVEY.md §2.10 are centralized here so every
  * operator shares one tested definition.
  */
object Scalars {

  /** Exact-sum column: cast a (deterministic, per-row) double expression
    * to DECIMAL(18,4) so the subsequent SUM is exact and associative —
    * the aggregate result is then bit-identical regardless of partition
    * count or accumulation order (required for oracle hash-parity, and
    * the right call at 100 TB where partial aggregation order is
    * nondeterministic).
    */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** SUM(dec4(c)) surfaced as double. Exact decimal accumulation, final
    * cast to double for a stable cross-engine surface type.
    */
  def sumDec(c: Column): Column = sum(dec4(c)).cast("double")

  /** AVG via exact decimal sum / count — avoids double-accumulation
    * nondeterminism of a plain `avg`.
    */
  def avgDec(c: Column): Column = sum(dec4(c)).cast("double") / count(lit(1))

  /** Money (2-decimal) and small-factor (x.xx) decimal casts. Products
    * of these stay exact in decimal arithmetic — no double rounding at
    * any point, so multi-factor revenue sums are bit-identical across
    * engines and partitionings. (A double product cast to decimal hits
    * rounding-tie divergence: exact products often land on 4-decimal
    * midpoints.)
    */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  def factor(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact `SUM(price * (1 - disc))` via decimal factors. */
  def sumDiscPrice(price: Column, disc: Column): Column =
    sum(money(price) * factor(lit(1.0) - disc)).cast("double")

  /** Exact `SUM(price * (1 - disc) * (1 + tax))` via decimal factors. */
  def sumCharge(price: Column, disc: Column, tax: Column): Column =
    sum(money(price) * factor(lit(1.0) - disc) * factor(lit(1.0) + tax)).cast("double")

  /** JS-semantics double division for non-null inputs: x/0 ⇒ ±Infinity,
    * 0/0 ⇒ NaN — works under Spark 4's default ANSI mode (where a bare
    * `/` by zero throws) and is session-config-independent. The division
    * only evaluates in the nonzero branch, so no ANSI error is reachable.
    * A NULL numerator or denominator yields NULL (SQL semantics) — JS
    * would coerce null to 0; callers needing that coerce with `coalesce`
    * before calling.
    */
  def jsDiv(n: Column, d: Column): Column =
    when(
      d === lit(0.0),
      when(n === lit(0.0) || n.isNull, lit(Double.NaN))
        .when(n > lit(0.0), lit(Double.PositiveInfinity))
        .otherwise(lit(Double.NegativeInfinity)))
      .otherwise(n / d)

  /** `percentChangeAbs(o, n) = abs((n-o)/abs(o))*100`
    * (reference: helpers.js:234-240). o=0 yields Infinity, matching the
    * reference's JS division semantics.
    */
  def percentChangeAbs(oldV: Column, newV: Column): Column =
    abs(jsDiv(newV - oldV, abs(oldV))) * lit(100.0)

  /** Symmetric percent difference `((a-b)/((a+b)/2))*100`
    * (reference: helpers.js:296-302). Both zero ⇒ NaN (0/0), matching JS.
    */
  def percentDifference(a: Column, b: Column): Column =
    jsDiv(a - b, (a + b) / lit(2.0)) * lit(100.0)

  /** The reference's falsy guard (helpers.js:309-321, SURVEY.md §2.10-1):
    * if estimated or actual is null **or zero**, delta and
    * delta_percentage are null — NOT 0 / ±100. A plain IS NULL check is
    * wrong; this is `IS NULL OR = 0`.
    */
  private def falsy(c: Column): Column = coalesce(c, lit(0.0)) === lit(0.0)

  /** `delta = estimated - actual` under the falsy guard
    * (reference: helpers.js:313-317).
    */
  def deltaCol(estimated: Column, actual: Column): Column =
    when(falsy(estimated) || falsy(actual), lit(null))
      .otherwise(estimated - actual)

  /** `delta_percentage = percentDifference(estimated, actual)` under the
    * same falsy guard (reference: helpers.js:318-319).
    */
  def deltaPercentageCol(estimated: Column, actual: Column): Column =
    when(falsy(estimated) || falsy(actual), lit(null))
      .otherwise(percentDifference(estimated, actual))

  /** hours→seconds with null→0 coalesce: `parseFloat(x || 0) * 3600`
    * (reference: helpers.js:278). The reference mutates estimate fields
    * to seconds in place before load (helpers.js:281, SURVEY.md §2.10-4).
    */
  def hoursToSeconds(c: Column): Column =
    coalesce(c.cast("double"), lit(0.0)) * lit(3600.0)

  /** Empty-array → null normalization (reference: helpers.js:115-117,
    * SURVEY.md §2.10-2): an empty worklog array is stored as null, not
    * as an empty aggregate.
    */
  def emptyToNull(arr: Column): Column =
    when(size(arr) === 0, lit(null)).otherwise(arr)
}
