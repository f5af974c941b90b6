package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, TextAnalysis}
import graft.queries.CoreQueries.Q

/** Round-4 surface: edge-semantics gates for the text operators
  * (empty / sub-width documents), banded SimHash candidate generation,
  * and the remaining robustness items from the round-3 verdict.
  *
  * Same determinism contract as the other catalogs: exact decimal for
  * accumulations, md5-derived hashes shared with the DuckDB oracle, no
  * engine-private RNG, ties always broken by a unique key.
  */
object Round4Queries {

  /** q75 — text-operator EDGE semantics pinned by oracle: for texts of
    * length 0..6 (derived deterministically from the fixture via
    * `substr(text, 1, doc_id % 7)`), count char-3-shingles, word
    * 2-grams, and window-3/stride-2 chunks. Pins the policy that
    * empty/sub-width texts yield EMPTY shingle/n-gram sets and that an
    * empty document yields ZERO chunks — the inputs where Spark's
    * descending `sequence()` previously fabricated phantom rows.
    */
  val q75EdgeText: Q = (s, d) => {
    val base = Tables
      .documents(s, d)
      .select(
        col("doc_id"),
        col("text").substr(lit(1), (col("doc_id") % 7).cast("int")).as("t"))
    val perDoc = base.select(
      col("doc_id"),
      length(col("t")).cast("long").as("len"),
      size(Dedup.charShingles(col("t"), 3)).cast("long").as("n_shingles"),
      size(Dedup.wordNGrams(col("t"), 2)).cast("long").as("n_ngrams"))
    val chunkCounts = TextAnalysis
      .chunk(base, "t", window = 3, stride = 2)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"))
    perDoc
      .join(chunkCounts, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("len"),
        col("n_shingles"),
        col("n_ngrams"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"))
      .orderBy(col("doc_id"))
  }

  val q75Sql: String =
    """WITH b AS (SELECT doc_id, substr(text, 1, CAST(doc_id % 7 AS INT)) AS t FROM documents),
      |w AS (SELECT doc_id, t, string_split(t, ' ') AS ws FROM b),
      |sh AS (SELECT doc_id,
      |  CAST(length(t) AS BIGINT) AS len,
      |  CAST(len(list_distinct([substr(lower(t), i, 3) for i in range(1, CAST(length(t)-1 AS BIGINT))])) AS BIGINT) AS n_shingles,
      |  CAST(len(list_distinct([ws[i]||' '||ws[i+1] for i in range(1, CAST(len(ws) AS BIGINT))])) AS BIGINT) AS n_ngrams
      |  FROM w),
      |c AS (SELECT doc_id, CAST(greatest(floor((length(t)-1)/2.0)+1, 0) AS BIGINT) AS n_chunks FROM b)
      |SELECT sh.doc_id, len, n_shingles, n_ngrams, c.n_chunks
      |FROM sh JOIN c ON sh.doc_id = c.doc_id
      |ORDER BY sh.doc_id NULLS FIRST""".stripMargin

  val all: Map[String, Q] = Map(
    "q75_edge_text" -> q75EdgeText
  )

  val oracles: Map[String, String] = Map(
    "q75_edge_text" -> q75Sql
  )
}
