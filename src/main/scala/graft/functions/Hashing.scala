package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hash primitives.
  *
  * Every dedup / LSH operator in this engine needs a hash function that
  * the DuckDB oracle can reproduce bit-for-bit. Spark's `hash()`
  * (murmur3) and `xxhash64` have no DuckDB equivalent, so the shared
  * primitive is md5 — both engines emit the identical lowercase hex —
  * with a fixed-width prefix reinterpreted as a positive BIGINT.
  *
  * All arithmetic downstream of these (mins, parities, band grouping)
  * is integer math, so signatures are bit-identical across engines and
  * across partitionings — the property the driver's hash-parity gate
  * requires, and equally the property that makes a 100 TB dedup run
  * reproducible between reruns.
  */
object Hashing {

  /** 60-bit positive hash: first 15 hex digits of md5 as a BIGINT.
    * DuckDB twin: `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 48-bit variant (12 hex digits) — leaves headroom for SimHash bit
    * re-assembly in a signed 64-bit value.
    * DuckDB twin: `CAST('0x' || substr(md5(s), 1, 12) AS BIGINT)`.
    */
  def h48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Hash-family member `j`: `h60(s + "#j")` — the salt makes the k
    * MinHash functions independent while staying reproducible in SQL.
    */
  def h60Salted(c: Column, j: Int): Column =
    h60(concat(c, lit("#" + j)))
}
