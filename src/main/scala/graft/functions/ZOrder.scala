package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) clustering keys: bit-interleave two dimensions so
  * that sorting/range-partitioning on the single z-value co-locates
  * rows that are close in BOTH dimensions — the multi-dimensional
  * data-clustering trick behind Delta/Iceberg `ZORDER BY`. Files (or
  * partitions) written in z order carry narrow min/max ranges on BOTH
  * source columns, so a predicate on either dimension prunes most of
  * them; a plain sort on one column gives pruning on that column only.
  *
  * Pure integer bit arithmetic (`shiftright`/`and`/`shiftleft`/`or`)
  * — codegen'd per row, reproducible in any engine, no UDF.
  */
object ZOrder {

  /** Interleave the low `bits` bits of non-negative `a` and `b`:
    * bit `i` of `a` lands at z-bit `2i`, bit `i` of `b` at `2i+1`.
    * Values are masked to `bits` bits first, so out-of-range inputs
    * wrap rather than collide across tiles.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val am = a.bitwiseAND(lit(mask))
    val bm = b.bitwiseAND(lit(mask))
    (0 until bits)
      .flatMap { i =>
        Seq(
          shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i),
          shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
      .reduce((x, y) => x.bitwiseOR(y))
  }

  /** The matching DuckDB SQL fragment for [[zValue]] over column
    * expressions `a` and `b` — kept next to the implementation so the
    * two stay in lockstep.
    */
  def zValueSql(a: String, b: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    // Each term fully parenthesized: Postgres-family grammars give
    // user-level operators like << and | EQUAL precedence (left
    // associative), so an unparenthesized `x << 1 | y << 3` parses as
    // `((x << 1) | y) << 3` and overflows.
    (0 until bits)
      .flatMap { i =>
        Seq(
          s"((((($a) & $mask) >> $i) & 1) << ${2 * i})",
          s"((((($b) & $mask) >> $i) & 1) << ${2 * i + 1})")
      }
      .mkString(" | ")
  }
}
