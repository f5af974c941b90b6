package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-mode projections of bipartite incidence frames — the
  * item-item co-occurrence move behind market-basket lift (q146),
  * co-supply centrality (q150/q151), and the temporal influence
  * projection (q156).
  *
  * The family's one scale hazard lives here, so the GUARD lives here
  * too (in the operator, not the queries): the self-join on the
  * aggregator key costs C(k, 2) pairs for a key with k incidence
  * rows, BEFORE any support floor prunes. TPC-H-shaped fixtures keep
  * k in the handfuls, but one hub key with 10⁵ items at 100× scale
  * emits 5·10⁹ pairs for that single key — the same heavy-hitter
  * class [[Dedup.editDistancePairs]] gates with `maxBlockRows` and
  * q118's triangle count defuses by degree orientation. Every
  * projection below therefore counts incidence rows per key FIRST
  * and throws over `maxKeyRows` (degenerate keys are an EXPECTED
  * failure mode to surface loudly, not a hang to discover in a stage
  * timeline). Callers facing a legitimately heavy key should cap or
  * sample that key upstream — silently dropping pairs is not this
  * operator's call to make.
  *
  * Scale shape: the incidence is persisted once (gate pass + both
  * self-join sides read it), the self-join is co-located on the key,
  * and the pair aggregate is map-side-combined. The gate's driver
  * cost is one max over per-key counts. Caches release with the
  * session sweep; the throw path unpersists before surfacing,
  * mirroring the graph loops' cleanup.
  */
object Bipartite {

  /** Max per-key incidence rows before [[pairProjection]] /
    * [[temporalPairProjection]] refuse to fan out. C(10⁴, 2) ≈
    * 5·10⁷ pairs for one key is the most a single aggregator key may
    * contribute before the projection's cost story stops holding.
    */
  val DefaultMaxKeyRows: Long = 10000L

  /** Throws if any `keyCol` group of `inc` exceeds `maxKeyRows`.
    * One aggregate + a 1-row driver fetch; `inc` should already be
    * persisted so the pass is amortized against the join reads.
    */
  private def gateKeyFanout(inc: DataFrame, keyCol: String, maxKeyRows: Long, op: String): Unit = {
    val biggestRow = inc.groupBy(col(keyCol)).count().agg(max(col("count"))).first()
    val biggest = if (biggestRow.isNullAt(0)) 0L else biggestRow.getLong(0)
    require(
      biggest <= maxKeyRows,
      s"$op: largest '$keyCol' group has $biggest incidence rows > maxKeyRows=$maxKeyRows — " +
        "per-key pairing is quadratic in group size; cap or sample hub keys upstream")
  }

  /** Unordered item co-occurrence pairs over a bipartite incidence:
    * for each `keyCol` group, every item pair (item_a < item_b) with
    * its shared-key count `w`, support-floored at `minSupport`.
    * `incidence` must already be DISTINCT on (key, item) — the
    * operator projects it as given; duplicate incidence rows would
    * inflate `w`.
    *
    * Returns (item_a, item_b, w).
    */
  def pairProjection(
      incidence: DataFrame,
      keyCol: String,
      itemCol: String,
      minSupport: Long,
      maxKeyRows: Long = DefaultMaxKeyRows): DataFrame = {
    require(minSupport >= 1, s"pairProjection: minSupport >= 1; got $minSupport")
    require(maxKeyRows >= 1, s"pairProjection: maxKeyRows >= 1; got $maxKeyRows")
    val inc = incidence.select(col(keyCol).as("__k"), col(itemCol).as("__i")).persist()
    try {
      gateKeyFanout(inc, "__k", maxKeyRows, "pairProjection")
      inc
        .select(col("__k"), col("__i").as("item_a"))
        .join(inc.select(col("__k"), col("__i").as("item_b")), Seq("__k"))
        .filter(col("item_a") < col("item_b"))
        .groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= minSupport)
    } catch {
      case t: Throwable => inc.unpersist(); throw t
    }
  }

  /** Time-respecting directed projection: for each `keyCol` group,
    * every ordered item pair (src ≠ dst) where the key touched `src`
    * at `dep` and LATER touched `dst` at `arr` (`arr > dep`) — the
    * edge build [[Graph.earliestArrival]] consumes. Duplicate timed
    * edges (different keys producing the same (src, dst, dep, arr))
    * are NOT collapsed here: the downstream min-fold is
    * duplicate-invariant, and a distinct over the fanned-out edge set
    * is a full extra shuffle (measured ~2 s on q156 at sf0.1) that
    * buys nothing — callers needing a deduped edge list distinct it
    * themselves.
    *
    * Returns (src, dst, dep, arr).
    */
  def temporalPairProjection(
      incidence: DataFrame,
      keyCol: String,
      itemCol: String,
      timeCol: String,
      maxKeyRows: Long = DefaultMaxKeyRows): DataFrame = {
    require(maxKeyRows >= 1, s"temporalPairProjection: maxKeyRows >= 1; got $maxKeyRows")
    val inc = incidence
      .select(col(keyCol).as("__k"), col(itemCol).as("__i"), col(timeCol).as("__t"))
      .persist()
    try {
      gateKeyFanout(inc, "__k", maxKeyRows, "temporalPairProjection")
      inc
        .select(col("__k"), col("__i").as("src"), col("__t").as("dep"))
        .join(
          inc.select(col("__k"), col("__i").as("dst"), col("__t").as("arr")),
          Seq("__k"))
        .filter(col("arr") > col("dep") && col("src") =!= col("dst"))
        .select(col("src"), col("dst"), col("dep"), col("arr"))
    } catch {
      case t: Throwable => inc.unpersist(); throw t
    }
  }
}
