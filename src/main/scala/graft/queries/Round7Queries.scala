package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity}
import graft.queries.CoreQueries.Q

/** Round-7 surface: the semantic-dedup keep-list — embedding near-dup
  * pairs composed through connected components into the per-document
  * keep/drop verdict a pipeline executes (the "SemDeDup" shape:
  * cluster by embedding similarity, keep one canonical per cluster).
  *
  * Same determinism contract as the other catalogs: decimal-exact
  * cosine, min-id canonical (no RNG), ties impossible by construction
  * (ids are unique).
  */
object Round7Queries {

  /** q104 — semantic-dedup keep-list ([[Dedup.keepList]]): q23's
    * decimal-exact cosine pairs (≥ 0.35) over the q51 slice, clustered
    * via [[Dedup.connectedComponents]], every document labeled with
    * its canonical id, cluster size, and the keep verdict — singletons
    * (no near-dup edge) keep themselves. This is the full-corpus
    * ACTION q51's component map implies: one call from embeddings to
    * "which rows survive dedup". The exact pair generator is the
    * oracle-friendly gate; at corpus scale the same keep-list runs off
    * [[Similarity.srpAnnTopKInt8]] candidates instead (q102's plan —
    * every stage a bucketed equi-join).
    */
  val q104SemanticKeepList: Q = (s, d) => {
    val emb = Tables.embeddings(s, d).filter(col("vec_id") < 150)
    val pairs = Similarity
      .nearDupPairs(emb, "vec_id", "embedding", 0.35)
      .select(col("vec_a"), col("vec_b"))
    Dedup.keepList(emb, "vec_id", pairs).orderBy(col("vec_id"))
  }

  /** Oracle: q51's recursive-CTE components extended with the
    * keep-list labeling (left join for singletons, size count,
    * keep ⇔ id = canonical).
    */
  val q104Sql: String =
    """WITH RECURSIVE
      |e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 150),
      |x AS (SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding,1) AS pos FROM e),
      |n AS (SELECT vec_id, CAST(SUM(CAST(CAST(v AS DOUBLE)*CAST(v AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE) AS sq
      |      FROM x GROUP BY vec_id),
      |dp AS (SELECT a.vec_id AS va, b.vec_id AS vb,
      |        CAST(SUM(CAST(CAST(a.v AS DOUBLE)*CAST(b.v AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE) AS dot
      |       FROM x a JOIN x b ON a.pos = b.pos AND a.vec_id < b.vec_id GROUP BY 1, 2),
      |pairs AS (SELECT va, vb FROM dp JOIN n na ON dp.va = na.vec_id JOIN n nb ON dp.vb = nb.vec_id
      |          WHERE dot/(sqrt(na.sq)*sqrt(nb.sq)) >= 0.35),
      |edges AS (SELECT va AS src, vb AS dst FROM pairs UNION SELECT vb, va FROM pairs),
      |walk(node, comp) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e2.dst, w.comp FROM walk w JOIN edges e2 ON e2.src = w.node),
      |comp AS (SELECT node, MIN(comp) AS component FROM walk GROUP BY node),
      |lab AS (SELECT e.vec_id, COALESCE(c.component, e.vec_id) AS canonical_id
      |        FROM e LEFT JOIN comp c ON e.vec_id = c.node),
      |sz AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM lab GROUP BY canonical_id)
      |SELECT CAST(l.vec_id AS BIGINT) AS vec_id,
      | CAST(l.canonical_id AS BIGINT) AS canonical_id,
      | CAST(sz.cluster_size AS BIGINT) AS cluster_size,
      | l.vec_id = l.canonical_id AS keep
      |FROM lab l JOIN sz USING (canonical_id)
      |ORDER BY vec_id NULLS FIRST""".stripMargin

  val all: Map[String, Q] = Map(
    "q104_semantic_keeplist" -> q104SemanticKeepList
  )

  val oracles: Map[String, String] = Map(
    "q104_semantic_keeplist" -> q104Sql
  )
}
