package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.11 marks UDF/UDAF absent in the
  * reference; §7.3 calls for `Aggregator` where sketches are needed).
  *
  * Bounded top-k by value per group: the buffer holds at most k
  * entries sorted by (value desc, key asc), so partial aggregation
  * ships k rows per group per partition instead of the whole group —
  * the map-side-combine property that makes per-group top-k viable at
  * 100 TB without a full sort or window over the fact table.
  *
  * Deterministic: ties break on the key, so reduce/merge order never
  * changes the result.
  */
case class KV(key: Long, value: Double)

class TopKByValue(k: Int) extends Aggregator[KV, Seq[KV], Seq[KV]] with Serializable {

  private def lt(a: KV, b: KV): Boolean =
    a.value > b.value || (a.value == b.value && a.key < b.key)

  private def bounded(s: Seq[KV]): Seq[KV] = s.sortWith(lt).take(k)

  override def zero: Seq[KV] = Seq.empty

  override def reduce(buf: Seq[KV], a: KV): Seq[KV] = bounded(buf :+ a)

  override def merge(b1: Seq[KV], b2: Seq[KV]): Seq[KV] = bounded(b1 ++ b2)

  override def finish(r: Seq[KV]): Seq[KV] = r

  override def bufferEncoder: Encoder[Seq[KV]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[KV]] = ExpressionEncoder()
}
