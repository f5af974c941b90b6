package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The web-corpus intake chain (q182) factored as an operator, so the
  * SAME per-row stages run batch (q182's one lazy plan) and streaming
  * (the r12 verdict's Next #6: a crawl is operationally a stream —
  * EventStreams drives [[perDocStats]] through an AvailableNow file
  * stream into the idempotent batch sink, and StreamingSpec pins
  * bit-parity of the landed records' rollup against the q182 batch
  * result).
  *
  * Scale shape: [[perDocStats]] is pure per-row — HTML block
  * extraction ([[HtmlExtract]]), mojibake repair, encoding screen all
  * fuse into the scan of each micro-batch or partition; ONLY the
  * source-grain statistics of [[rollup]] ever shuffle.
  */
object Intake {

  /** Per-document intake record over `(doc_id, source, html)` rows:
    * extracted char count, whether the mojibake repair fired, whether
    * the encoding screen still suspects the repaired text, and the
    * boilerplate-drop counts. Doc-grain, per-row only.
    */
  def perDocStats(docsWithHtml: DataFrame): DataFrame = {
    val ext = HtmlExtract.extractText(docsWithHtml, "html")
    val rep = ext.select(
      col("doc_id") +: col("source") +: col("n_short") +: col("n_linky") +:
        TextAnalysis.mojibakeRepair(col("text")): _*)
    rep.select(
      col("doc_id"),
      col("source"),
      col("n_short"),
      col("n_linky"),
      col("fixed"),
      length(col("repaired")).cast("long").as("n_chars"),
      TextAnalysis.encodingDiagnostics(col("repaired")).last.as("suspect"))
  }

  /** q182's source-grain rollup of [[perDocStats]] records. */
  def rollup(stats: DataFrame): DataFrame =
    stats
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars_out"),
        sum(when(col("fixed"), 1L).otherwise(0L)).as("n_fixed"),
        sum(when(col("suspect"), 1L).otherwise(0L)).as("n_suspect"),
        sum(col("n_short") + col("n_linky")).as("n_dropped_blocks"))
}
