package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Relational, TextAnalysis}
import graft.queries.CoreQueries.Q

/** Round-5 surface: block-level boilerplate removal, distributed
  * global row numbering, deterministic weighted sampling,
  * content-defined (rolling-hash) segmentation, and a composite
  * C4-style quality filter.
  *
  * Same determinism contract as the other catalogs: integer/decimal
  * outputs only, md5-derived hashes shared with the DuckDB oracle, no
  * engine-private RNG, ties always broken by a unique key.
  */
object Round5Queries {

  /** q88 — BLOCK-level boilerplate stats (the passage-granular twin of
    * document dedup — CCNet/Gopher drop repeated paragraphs, not whole
    * documents): split each document into non-overlapping 3-token
    * blocks, count each block's corpus document-frequency, and report
    * per document how many of its blocks are rare (df ≤ 2) — the
    * blocks a boilerplate-removal pass would KEEP. Candidate shape is
    * the equi-join on block text (LSH shape; the df filter bounds
    * every join bucket), df counting is one shuffle on the block hash.
    */
  val q88BlockBoilerplate: Q = (s, d) => {
    val b = 3
    // __toks referenced ≥2× (block builder + block count) so the
    // per-row split stays a materialized column, not a lambda inline
    // (HOF bodies re-evaluate per element — Dedup.charGramsAll note).
    val blocks = Tables
      .documents(s, d)
      .withColumn("__toks", split(col("text"), " "))
      .withColumn("__nb", expr(s"(size(__toks) + ${b - 1}) div $b"))
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(0L), col("__nb").cast("long") - 1),
            i => array_join(slice(col("__toks"), (i * b + 1).cast("int"), lit(b)), " ")))
          .as("block"))
    val dfreq = blocks
      .groupBy(col("block"))
      .agg(countDistinct(col("doc_id")).as("dfreq"))
    blocks
      .join(dfreq, "block")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        count(when(col("dfreq") <= 2, 1)).as("n_kept"))
      .orderBy(col("doc_id"))
  }

  val q88Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |b AS (SELECT doc_id,
      |  unnest([array_to_string(ws[3*i+1 : 3*i+3], ' ')
      |          for i in range(0, CAST((len(ws)+2)//3 AS BIGINT))]) AS block
      | FROM w),
      |f AS (SELECT block, COUNT(DISTINCT doc_id) AS dfreq FROM b GROUP BY 1)
      |SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocks,
      |  CAST(COUNT(*) FILTER (WHERE f.dfreq <= 2) AS BIGINT) AS n_kept
      |FROM b JOIN f USING (block)
      |GROUP BY 1 ORDER BY doc_id NULLS FIRST""".stripMargin

  /** q89 — distributed global row numbering
    * ([[Relational.globalRowNumber]]): the same total order as
    * `row_number() OVER (ORDER BY doc_id)` but computed with
    * range-partition + per-partition offsets instead of the
    * single-reducer window — only the P partition counts touch the
    * driver. The PlanAudit asserts no single-partition Window appears.
    */
  val q89GlobalRn: Q = (s, d) =>
    Relational
      .globalRowNumber(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id",
        numPartitions = 8)
      .orderBy(col("rn"))

  val q89Sql: String =
    """SELECT doc_id, lang,
      |  CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS rn
      |FROM documents ORDER BY rn NULLS FIRST""".stripMargin

  /** q90 — DETERMINISTIC weighted Bernoulli sampling: select each
    * document with probability ∝ its token count, with the coin being
    * the document's own md5 — `h60("wsamp:"+id) < n_tok · C` is pure
    * integer arithmetic, so the sample is bit-identical across
    * engines, partitionings, and reruns (rejection-free, no RNG state;
    * the property `rand()`-based sampling cannot give a resumable
    * 100 TB pipeline). C = ⌊2^60 / 400⌋ targets rate ≈ n_tok/400.
    */
  val q90WeightedSample: Q = (s, d) => {
    val C = 2882303761517117L // floor(2^60 / 400)
    Tables
      .documents(s, d)
      .select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("n_tok"),
        graft.functions.Hashing.h60(concat(lit("wsamp:"), col("doc_id"))).as("__h"))
      .filter(col("__h") < col("n_tok") * lit(C))
      .select(col("doc_id"), col("n_tok"))
      .orderBy(col("doc_id"))
  }

  val q90Sql: String =
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |FROM documents
      |WHERE CAST('0x'||substr(md5('wsamp:'||CAST(doc_id AS VARCHAR)),1,15) AS BIGINT)
      |      < CAST(len(string_split(text, ' ')) AS BIGINT) * 2882303761517117
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** q91 — content-defined segmentation
    * ([[TextAnalysis.cdcSegmentStats]]): rolling-hash boundaries
    * (h32 of the char-8-gram ≡ 0 mod 64) give segments that survive
    * upstream edits — per-document n_seg and longest-segment length.
    */
  val q91CdcSegments: Q = (s, d) =>
    TextAnalysis
      .cdcSegmentStats(Tables.documents(s, d), "text", k = 8, mod = 64)
      .select(col("doc_id"), col("n_seg"), col("max_seg"))
      .orderBy(col("doc_id"))

  val q91Sql: String =
    """WITH g AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS L,
      |  [substr(lower(text), i, 8) for i in range(1, CAST(length(text)-6 AS BIGINT))] AS gs
      | FROM documents),
      |h AS (SELECT doc_id, L,
      |  list_transform(gs, t -> CAST('0x'||substr(md5(t),1,8) AS BIGINT)) AS hs FROM g),
      |b AS (SELECT doc_id, L,
      |  [CAST(i AS BIGINT) for i in range(1, len(hs)+1) if hs[i] % 64 = 0] AS bnd FROM h),
      |a AS (SELECT doc_id,
      |  list_concat(list_concat([CAST(0 AS BIGINT)], bnd), [L]) AS ab FROM b),
      |sg AS (SELECT doc_id, [ab[j+1] - ab[j] for j in range(1, len(ab))] AS lens FROM a)
      |SELECT doc_id, CAST(len(lens) AS BIGINT) AS n_seg, list_max(lens) AS max_seg
      |FROM sg ORDER BY doc_id NULLS FIRST""".stripMargin

  /** q92 — composite C4-style QUALITY FILTER: the conjunctive
    * keep/drop verdict every pretraining pipeline applies before
    * tokenization — minimum length, maximum length, stopword evidence
    * ('the' as the English-function-word proxy), and a max-word-length
    * sanity rule — with the per-rule flags exposed so drops are
    * attributable (the filter-debugging contract: never a bare
    * boolean). Pure per-row expressions; at scale this is a
    * shuffle-free map over the corpus.
    */
  val q92QualityFilter: Q = (s, d) => {
    val toks = col("__toks")
    Tables
      .documents(s, d)
      .withColumn("__toks", split(col("text"), " "))
      .withColumn("wc", size(toks).cast("long"))
      .withColumn("f_min_len", col("wc") >= 30)
      .withColumn("f_max_len", length(col("text")) <= 500)
      .withColumn("f_stopword", array_contains(toks, "the"))
      .withColumn("f_word_len", aggregate(toks, lit(0), (m, t) => greatest(m, length(t))) <= 12)
      .withColumn("keep", col("f_min_len") && col("f_max_len") && col("f_stopword") && col("f_word_len"))
      .select(col("doc_id"), col("wc"), col("f_min_len"), col("f_max_len"), col("f_stopword"), col("f_word_len"), col("keep"))
      .orderBy(col("doc_id"))
  }

  val q92Sql: String =
    """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
      |f AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS wc,
      |  len(ws) >= 30 AS f_min_len,
      |  length(text) <= 500 AS f_max_len,
      |  list_contains(ws, 'the') AS f_stopword,
      |  list_max(list_transform(ws, t -> length(t))) <= 12 AS f_word_len
      | FROM w)
      |SELECT doc_id, wc, f_min_len, f_max_len, f_stopword, f_word_len,
      |  (f_min_len AND f_max_len AND f_stopword AND f_word_len) AS keep
      |FROM f ORDER BY doc_id NULLS FIRST""".stripMargin

  val all: Map[String, Q] = Map(
    "q88_block_boilerplate" -> q88BlockBoilerplate,
    "q89_global_rn" -> q89GlobalRn,
    "q90_weighted_sample" -> q90WeightedSample,
    "q91_cdc_segments" -> q91CdcSegments,
    "q92_quality_filter" -> q92QualityFilter)

  val oracles: Map[String, String] = Map(
    "q88_block_boilerplate" -> q88Sql,
    "q89_global_rn" -> q89Sql,
    "q90_weighted_sample" -> q90Sql,
    "q91_cdc_segments" -> q91Sql,
    "q92_quality_filter" -> q92Sql)
}
