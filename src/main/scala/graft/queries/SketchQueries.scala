package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Relational, Similarity, TextAnalysis}
import graft.queries.CoreQueries.Q

/** Round-8 closing surface — frequency sketching, hybrid retrieval,
  * and event-sequence observability:
  *
  *  - q136 count-min sketch token-frequency estimation (the third
  *    mergeable sketch beside KMV/q112 and HLL/q130 — counter sums,
  *    gated against its exact twin with the overestimate property);
  *  - q137 reciprocal-rank fusion of the lexical (BM25, q119) and
  *    dense (centroid relevance, q126) retrieval rankings — the
  *    standard hybrid-search combinator, integer-exact contributions;
  *  - q138 ordered event funnel (strictly-after stage recurrence
  *    with per-stage survivor counts and exact conversion lags).
  *
  * Same determinism contract as the rest of the catalog: md5-derived
  * hashes, integer counts/ranks/lags, ties always broken by a unique
  * id — bit-identical to the DuckDB oracle under any partitioning.
  */
object SketchQueries {

  /** q136 — count-min sketch frequency estimation
    * ([[Relational.countMinSketch]], d = 4 × w = 512) over the
    * whitespace-token occurrences of the document corpus, probed at
    * the 30 highest-frequency tokens and reported beside the exact
    * counts. The gate checks the full estimator pipeline (salted
    * hashing, counter sums, min-over-rows) bit-for-bit; the
    * overestimate invariant (`cms_est >= n_exact`, collisions only
    * ADD) is asserted in `SelectionSpec`.
    *
    * Scale: the sketch pass reduces the corpus to ≤ d·w = 2048
    * counter rows via map-side combine — the exact-count pass exists
    * here only to produce the gate's twin column (at 100 TB you keep
    * the sketch and drop the exact pass; that trade is the point).
    */
  val q136Cms: Q = (s, d) => {
    val occ = Tables
      .documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
    val sketch = Relational.countMinSketch(occ, "tok", depth = 4, width = 512)
    val top = occ
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok"))
      .limit(30)
    Relational
      .cmsEstimate(sketch, top, "tok", depth = 4, width = 512)
      .orderBy(col("n_exact").desc, col("tok"))
  }

  /** Oracle: identical salted-md5 bucket hash, counter sums, and
    * min-over-depth — all integer arithmetic.
    */
  val q136Sql: String =
    """WITH occ AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
      |sk AS (SELECT js.j,
      |              (CAST('0x' || substr(md5('cms' || CAST(js.j AS VARCHAR) || ':' || occ.tok), 1, 15) AS BIGINT) % 512) AS bucket,
      |              COUNT(*) AS cnt
      |       FROM occ, js GROUP BY 1, 2),
      |ex AS (SELECT tok, COUNT(*) AS n_exact FROM occ GROUP BY 1
      |       ORDER BY n_exact DESC, tok LIMIT 30),
      |pe AS (SELECT ex.tok, ex.n_exact, js.j,
      |              (CAST('0x' || substr(md5('cms' || CAST(js.j AS VARCHAR) || ':' || ex.tok), 1, 15) AS BIGINT) % 512) AS bucket
      |       FROM ex, js)
      |SELECT pe.tok, pe.n_exact, MIN(sk.cnt) AS cms_est
      |FROM pe JOIN sk ON sk.j = pe.j AND sk.bucket = pe.bucket
      |GROUP BY 1, 2
      |ORDER BY n_exact DESC, tok NULLS FIRST""".stripMargin

  /** q137 — reciprocal-rank fusion (Cormack et al., SIGIR 2009) of
    * the two retrieval rankings this catalog already gates: the
    * lexical BM25 seed-query scores (q119's integer fractions) and
    * the dense eval-centroid relevance (q126's decimal-exact dots).
    * Each list is cut to its top 100 (TakeOrderedAndProject — the
    * only corpus-grain ordering), ranked on the bounded frame, and
    * fused as `Σ 10⁹ div (60 + rank)` — the float-free twin of the
    * standard 1/(60+r) formula, so the fused ordering is
    * bit-identical across engines. Top 20 by (rrf, id).
    *
    * Scale: both score passes are the already-audited corpus shapes
    * (BM25 = map-side folds + 1-row broadcast; centroid = broadcast
    * crossJoin + native dot); everything after the two `limit(100)`s
    * is driver-trivial. The single-partition `row_number` windows run
    * on 100-row frames — bounded by construction, not by data.
    */
  val q137Rrf: Q = (s, d) => {
    // Lexical side: q119's scorer verbatim (raw scan — cheap per-row
    // folds, the round-8 rule for single-pass corpus projections).
    val lex = TextAnalysis
      .bm25Scores(Tables.table(s, d, "documents"), "text", "doc_id", Seq("spark", "join", "filter", "hash"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(100)
    val lexR = lex.select(
      col("doc_id").as("id"),
      row_number()
        .over(Window.partitionBy(lit(0)).orderBy(col("bm25").desc, col("doc_id")))
        .cast("long")
        .as("r_lex"))
    // Dense side: q126's centroid scorer verbatim.
    val emb = Tables.embeddings(s, d)
    val cent = emb
      .filter(col("vec_id") % 10 === 0)
      .select(posexplode(col("embedding")).as(Seq("pos", "__x")))
      .groupBy(col("pos"))
      .agg(sum(col("__x").cast("double").cast("decimal(28,10)")).as("__s"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("pos"), col("__s")))).as("__raw"))
      .select(transform(col("__raw"), p => p.getField("__s").cast("double")).as("cent"))
    val den = emb
      .filter(col("vec_id") % 10 =!= 0)
      .crossJoin(broadcast(cent))
      .select(col("vec_id"), Similarity.dot(col("embedding"), col("cent")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(100)
    val denR = den.select(
      col("vec_id").as("id"),
      row_number()
        .over(Window.partitionBy(lit(0)).orderBy(col("rel").desc, col("vec_id")))
        .cast("long")
        .as("r_cent"))
    lexR
      .join(denR, Seq("id"), "full_outer")
      .select(
        col("id"),
        col("r_lex"),
        col("r_cent"),
        (coalesce(expr("1000000000 div (60 + r_lex)"), lit(0L)) +
          coalesce(expr("1000000000 div (60 + r_cent)"), lit(0L))).as("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(20)
  }

  /** Oracle: q119's HUGEINT BM25 fraction + q126's decimal dot, each
    * top-100 with the same tie-break, ROW_NUMBER on the bounded
    * frames, identical integer RRF contributions.
    */
  val q137Sql: String = {
    val terms = Seq("spark", "join", "filter", "hash")
    val tfCols = terms.indices
      .map(i => s"len(list_filter(toks, x -> x = '${terms(i)}')) AS tf$i")
      .mkString(",\n      |         ")
    val dfCols = terms.indices
      .map(i => s"COUNT(*) FILTER (WHERE tf$i > 0) AS df$i")
      .mkString(",\n      |         ")
    val scoreTerms = terms.indices
      .map(i =>
        s"((CAST(1000000 AS HUGEINT) * (((2 * n) - (2 * df$i)) + 1) * 44 * s * tf$i) // (((2 * df$i) + 1) * (((20 * s) * tf$i) + (6 * s) + ((18 * dl) * n))))")
      .mkString("\n      |  + ")
    s"""WITH base AS (
      |  SELECT doc_id, len(toks) AS dl,
      |         $tfCols
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
      |tot AS (
      |  SELECT COUNT(*) AS n, SUM(dl) AS s,
      |         $dfCols
      |  FROM base),
      |sc AS (SELECT doc_id, CAST(
      |  $scoreTerms
      |  AS BIGINT) AS bm25 FROM base, tot),
      |lex AS (SELECT doc_id, bm25 FROM sc ORDER BY bm25 DESC, doc_id LIMIT 100),
      |lexr AS (SELECT doc_id AS id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex FROM lex),
      |x AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |             generate_subscripts(embedding, 1) AS pos
      |      FROM embeddings),
      |ev AS (SELECT pos, SUM(CAST(v AS DECIMAL(28,10))) AS s FROM x WHERE (vec_id % 10) = 0 GROUP BY pos),
      |den AS (SELECT x.vec_id,
      |         CAST(SUM(CAST(x.v * CAST(ev.s AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE) AS rel
      |        FROM x JOIN ev ON ev.pos = x.pos WHERE (x.vec_id % 10) <> 0 GROUP BY x.vec_id
      |        ORDER BY rel DESC, vec_id LIMIT 100),
      |denr AS (SELECT vec_id AS id, ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) AS r_cent FROM den)
      |SELECT COALESCE(lexr.id, denr.id) AS id, lexr.r_lex, denr.r_cent,
      |       (COALESCE(CAST(1000000000 AS BIGINT) // (60 + lexr.r_lex), 0) +
      |        COALESCE(CAST(1000000000 AS BIGINT) // (60 + denr.r_cent), 0)) AS rrf
      |FROM lexr FULL OUTER JOIN denr ON denr.id = lexr.id
      |ORDER BY rrf DESC, id NULLS FIRST LIMIT 20""".stripMargin
  }

  /** q138 — ordered event funnel view → click → purchase
    * ([[Relational.funnelStages]]): per-stage survivor counts plus
    * the EXACT total conversion lag (Σ of first-qualifying-event
    * gaps, integer microseconds — a float average would be
    * summation-order-sensitive and un-gateable). The strictly-after
    * recurrence is the semantics product funnels need: a click
    * before the user's first view does not count, so per-type global
    * mins (one scan, no joins) would be WRONG — the per-stage
    * survivor join is the price of correctness, not a plan accident.
    */
  val q138Funnel: Q = (s, d) => {
    val st = Relational.funnelStages(
      Tables.events(s, d),
      "user_id",
      "event_type",
      "ts_us",
      Seq("view", "click", "purchase"))
    st.agg(
        count(col("t1")).as("u1"),
        count(col("t2")).as("u2"),
        count(col("t3")).as("u3"),
        coalesce(sum(col("t2") - col("t1")), lit(0L)).as("l2"),
        coalesce(sum(col("t3") - col("t2")), lit(0L)).as("l3"))
      .select(
        explode(
          array(
            struct(
              lit(1L).as("stage"),
              lit("view").as("step"),
              col("u1").as("users"),
              lit(0L).as("total_lag_us")),
            struct(
              lit(2L).as("stage"),
              lit("click").as("step"),
              col("u2").as("users"),
              col("l2").as("total_lag_us")),
            struct(
              lit(3L).as("stage"),
              lit("purchase").as("step"),
              col("u3").as("users"),
              col("l3").as("total_lag_us")))).as("r"))
      .select(col("r.*"))
      .orderBy(col("stage"))
  }

  /** Oracle: the same strictly-after MIN recurrence as chained CTEs.
    * DuckDB's SUM(BIGINT) widens to HUGEINT — cast back.
    */
  val q138Sql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, MIN(e.us) AS t2 FROM e JOIN s1 ON s1.user_id = e.user_id
      |       WHERE e.event_type = 'click' AND e.us > s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, MIN(e.us) AS t3 FROM e JOIN s2 ON s2.user_id = e.user_id
      |       WHERE e.event_type = 'purchase' AND e.us > s2.t2 GROUP BY 1),
      |j AS (SELECT s1.user_id, s1.t1, s2.t2, s3.t3
      |      FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
      |              LEFT JOIN s3 ON s3.user_id = s2.user_id)
      |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step, COUNT(t1) AS users, CAST(0 AS BIGINT) AS total_lag_us FROM j
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'click', COUNT(t2), CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) FROM j
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), 'purchase', COUNT(t3), CAST(COALESCE(SUM(t3 - t2), 0) AS BIGINT) FROM j
      |ORDER BY stage""".stripMargin

  def all: Map[String, Q] = Map(
    "q136_cms_freq" -> q136Cms,
    "q137_rrf_fusion" -> q137Rrf,
    "q138_event_funnel" -> q138Funnel)

  def oracles: Map[String, String] = Map(
    "q136_cms_freq" -> q136Sql,
    "q137_rrf_fusion" -> q137Sql,
    "q138_event_funnel" -> q138Sql)
}
