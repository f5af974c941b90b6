package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV) distinct-count sketch as a typed
  * `Aggregator` — the deterministic sketch counterpart to
  * `approx_count_distinct` (HLL), whose estimate is not reproducible
  * across engines and therefore cannot be oracle-gated.
  *
  * KMV keeps the k smallest DISTINCT hash values of the group; with a
  * uniform hash over [0, 2^60) (see [[Hashing.h60]]) the k-th smallest
  * value h_k yields the unbiased estimate `(k-1) * 2^60 / h_k`
  * (Bar-Yossef et al., "Counting distinct elements in a data stream",
  * RANDOM 2002). Every step is integer comparison on deterministic
  * hashes, so — unlike HLL — the estimate is bit-identical across
  * engines, partition counts, and merge orders, which is what lets the
  * DuckDB oracle reproduce it exactly (q43).
  *
  * Scale shape: the buffer is bounded at k longs, so partial
  * aggregation ships k values per group per partition (map-side
  * combine), never the full distinct set — the property that makes a
  * distinct-cardinality estimate over 100 TB a single cheap
  * aggregation with no distinct shuffle.
  */
class KMinValues(k: Int) extends Aggregator[Long, Seq[Long], Option[Long]] with Serializable {

  // Buffers are kept sorted ascending and distinct, at most k long.
  private def insert(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.length == k && h >= buf.last) buf // common case: not in the bottom-k
    else if (buf.contains(h)) buf
    else ((buf :+ h).sorted).take(k)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = insert(buf, h)

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    (b1 ++ b2).distinct.sorted.take(k)

  /** The k-th smallest distinct hash, or None when the group holds
    * fewer than k distinct values (callers fall back to the exact
    * count — below k the buffer IS the exact distinct set).
    */
  override def finish(r: Seq[Long]): Option[Long] =
    if (r.length == k) Some(r.last) else None

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Option[Long]] = ExpressionEncoder()
}

/** [[KMinValues]]' sibling that returns the WHOLE k-min set instead of
  * the k-th value — the bottom-k sketch itself. That set is a uniform
  * fixed-size sample of the group's distinct hash space, so two
  * groups' sketches can be INTERSECTED to estimate their overlap
  * (Beyer et al., "On synopses for distinct-value estimation under
  * multiset operations", SIGMOD 2007) — the primitive behind
  * [[graft.operators.TextAnalysis.sourceOverlapKmv]]'s cross-source
  * corpus-overlap matrix.
  *
  * Same buffer discipline as [[KMinValues]] (sorted, distinct, ≤ k
  * longs): duplicate inputs are absorbed by the buffer's membership
  * check, so callers DON'T need a distinct shuffle first — one pass,
  * map-side combine, k longs per group per partition on the wire.
  */
class KMinList(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] with Serializable {

  private def insert(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.length == k && h >= buf.last) buf
    else if (buf.contains(h)) buf
    else ((buf :+ h).sorted).take(k)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = insert(buf, h)

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    (b1 ++ b2).distinct.sorted.take(k)

  /** The sorted k smallest distinct hashes (fewer when the group holds
    * fewer than k distinct values — then it IS the distinct set).
    */
  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
