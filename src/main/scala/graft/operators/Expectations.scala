package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the Deequ / Great
  * Expectations shape: a set of named constraints over a table,
  * evaluated in ONE aggregation pass, reported as per-constraint
  * verdicts. The generalization of the reference's single
  * error-threshold gate (Q1, `Relational.qualityGate`) into the
  * constraint DSL a production pipeline actually runs before
  * publishing a dataset version.
  *
  * Exactness contract: every metric is reported as an INTEGER
  * fraction (numerator, denominator) and every threshold comparison
  * is the cross-product `num·t_den ≥ den·t_num` — no float rate ever
  * materializes, so verdicts are bit-identical in the SQL oracle and
  * across partitionings. Bound checks compare the column's own values
  * (min/max) against literal bounds.
  *
  * Scale shape: ALL constraints fold into one `agg` over the table —
  * `count_if` per rate constraint, min/max per bound, one
  * `count_distinct` per uniqueness constraint (multiple distincts
  * share Spark's single Expand pass, the q71/q33 shape). One scan, one
  * 1-row reduce; the per-constraint report rows are exploded from
  * that single row.
  */
object Expectations {

  sealed trait Expectation { def name: String }

  /** Null-free rate of `colName` must be ≥ tNum/tDen. */
  final case class NotNull(name: String, colName: String, tNum: Long = 1, tDen: Long = 1)
      extends Expectation

  /** Distinct-over-total rate of `colName` must be ≥ tNum/tDen
    * (1/1 = fully unique key).
    */
  final case class Unique(name: String, colName: String, tNum: Long = 1, tDen: Long = 1)
      extends Expectation

  /** Rate of rows whose `colName` is in `values` must be ≥ tNum/tDen
    * (nulls count as out-of-domain).
    */
  final case class InSet(
      name: String,
      colName: String,
      values: Seq[String],
      tNum: Long = 1,
      tDen: Long = 1)
      extends Expectation

  /** Every value within [lo, hi] (inclusive); reported fraction is
    * in-bounds rows over total.
    */
  final case class Bounded(name: String, colName: String, lo: Double, hi: Double)
      extends Expectation

  /** One row per expectation: (check, metric_num, metric_den, pass). */
  def report(df: DataFrame, specs: Seq[Expectation]): DataFrame = {
    require(specs.nonEmpty, "need at least one expectation")
    require(specs.map(_.name).distinct.size == specs.size, "duplicate expectation names")
    def hit(e: Expectation): Column = e match {
      case NotNull(_, c, _, _)   => count_if(col(c).isNotNull)
      case Unique(_, c, _, _)    => count_distinct(col(c))
      case InSet(_, c, vs, _, _) => count_if(col(c).isin(vs.map(_.asInstanceOf[Any]): _*))
      case Bounded(_, c, lo, hi) => count_if(col(c) >= lo && col(c) <= hi)
    }
    val aggs = count(lit(1)).cast("long").as("__n") +:
      specs.zipWithIndex.map { case (e, i) => hit(e).cast("long").as(s"__m$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = specs.zipWithIndex.map { case (e, i) =>
      val (tn, td) = e match {
        case NotNull(_, _, n, d)   => (n, d)
        case Unique(_, _, n, d)    => (n, d)
        case InSet(_, _, _, n, d)  => (n, d)
        case Bounded(_, _, _, _)   => (1L, 1L)
      }
      struct(
        lit(e.name).as("check"),
        col(s"__m$i").as("metric_num"),
        col("__n").as("metric_den"),
        // num/den >= tn/td  ⇔  num·td >= den·tn — integer, division-free
        (col(s"__m$i") * lit(td) >= col("__n") * lit(tn)).as("pass"))
    }
    one
      .select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.check"), col("__r.metric_num"), col("__r.metric_den"), col("__r.pass"))
  }
}
