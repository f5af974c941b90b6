package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing._

/** Deduplication operators for large-scale document corpora — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and fingerprint dedup.
  *
  * The reference has no dedup surface (SURVEY.md §2.11); these are the
  * green-field LLM-data-pipeline operators the engine adds, built the
  * Spark-first way:
  *
  *  - signatures are per-row `Column` expressions (whole-stage codegen,
  *    no UDFs) over array columns;
  *  - candidate generation is a shuffle on (band, bandValue) — the LSH
  *    trick that replaces the O(n²) all-pairs comparison with a
  *    hash-partitioned equi-join, which is exactly what survives 100 TB:
  *    each band bucket is tiny, so the join never materializes the
  *    quadratic pair space;
  *  - only candidate pairs (a vanishing fraction) pay the exact-Jaccard
  *    verification cost.
  *
  * All hashing goes through [[graft.functions.Hashing]] so the DuckDB
  * oracle reproduces signatures bit-for-bit.
  */
object Dedup {

  /** Distinct character `w`-shingles of the lowercased text. The
    * shingle space is large (≈ alphabet^w), so unrelated documents
    * share few shingles — the precondition for LSH banding to have low
    * false-positive rates.
    */
  def charShingles(text: Column, w: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), length(text) - (w - 1)),
        i => lower(text).substr(i, lit(w))))

  /** Distinct whitespace tokens (the word-set view of a document). */
  def tokenSet(text: Column): Column = array_distinct(split(text, " "))

  /** Word `n`-grams (sequence-sensitive, distinct): shingle i is the
    * space-join of tokens i..i+n-1.
    */
  def wordNGrams(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
  }

  /** Exact dedup bookkeeping: group by full content hash, keep the
    * minimum id as the canonical row ("keep first"), count copies.
    * One shuffle on the 128-bit hash — uniform by construction, so no
    * skew at any scale.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** MinHash signature: adds columns mh0..mh{k-1}, where
    * `mh_j = min over shingles s of (a_j·h32(s) + b_j) mod P`. Each
    * shingle is md5-hashed ONCE; the k family members are cheap affine
    * transforms of that base hash (k× fewer md5 evaluations — the
    * dominant cost at scale). Pure per-row array math — no shuffle, no
    * UDF. `df` must already carry the shingle array under
    * `shinglesCol` (kept in the output for downstream exact-Jaccard
    * verification). The base-hash projection is a separate select so
    * Catalyst's CollapseProject (which never duplicates non-cheap
    * aliases) keeps the md5 pass single.
    */
  def minHashSignature(df: DataFrame, idCol: String, shinglesCol: String, k: Int): DataFrame =
    df.select(
      col(idCol),
      col(shinglesCol),
      transform(col(shinglesCol), t => h32(t)).as("__hs"))
      .select(
        col(idCol) +:
          col(shinglesCol) +:
          (0 until k).map(j =>
            array_min(transform(col("__hs"), h => affine(h, j))).as(s"mh$j")): _*)

  /** LSH banding: split the k-row signature into `nBands` bands of
    * k/nBands rows, hash each band, and emit candidate pairs that agree
    * on at least one band. The join key is (band, bandHash) — documents
    * only meet inside a bucket, so the pair space never materializes.
    * Probability a pair with Jaccard j becomes a candidate:
    * 1 - (1 - j^(k/nBands))^nBands.
    */
  def lshCandidates(sig: DataFrame, idCol: String, k: Int, nBands: Int): DataFrame = {
    val rpb = k / nBands
    require(rpb * nBands == k, s"bands ($nBands) must divide signature length ($k)")
    val bandStructs = (0 until nBands).map { b =>
      struct(
        lit(b).as("band"),
        md5(concat_ws("_", (b * rpb until (b + 1) * rpb).map(j => col(s"mh$j")): _*)).as("bv"))
    }
    val exploded = sig
      .select(col(idCol), explode(array(bandStructs: _*)).as("bd"))
      .select(col(idCol), col("bd.band").as("band"), col("bd.bv").as("bv"))
    exploded
      .select(col(idCol).as("id_a"), col("band"), col("bv"))
      .join(exploded.select(col(idCol).as("id_b"), col("band"), col("bv")), Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact Jaccard similarity of two (already-distinct) array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** SimHash: `bits`-bit locality-sensitive fingerprint. Every token
    * occurrence votes ±1 per bit position according to its 48-bit hash;
    * the fingerprint bit is 1 iff the vote sum is positive. Near-
    * identical documents land within a few bits of Hamming distance.
    *
    * Shape: explode tokens → explode bit positions → two hash
    * aggregations. The shuffles are on (id, bit) then (id) — both
    * uniform. At 100 TB the first explode is the dominant cost and is
    * purely map-side until the partial agg combines per (id, bit).
    */
  def simHash(df: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    require(bits <= 48, "simhash uses 48-bit token hashes")
    df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol), h48(col("tok")).as("hv"))
      .select(col(idCol), col("hv"), explode(sequence(lit(0), lit(bits - 1))).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(sum(when(expr("shiftright(hv, b) & 1") === 1, 1L).otherwise(-1L)).as("s"))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L))
          .as("simhash"))
  }

  /** All pairs within `maxHamming` of each other by SimHash. The
    * self-join is O(n²) in candidate generation; at true scale the
    * banding trick applies here too (join on simhash chunks) — kept
    * direct here because callers bound the input set.
    */
  def simHashPairs(sh: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val a = sh.select(col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = sh.select(col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), expr("bit_count(sh_a ^ sh_b)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Order-insensitive document fingerprint: md5 of the sorted distinct
    * token set. Documents that are permutations / repetitions of the
    * same vocabulary collide — the cheap first pass of near-dedup.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(text, " "))), " "))

  /** Connected components over an undirected edge list — the cluster
    * step that turns near-dup PAIRS (LSH candidates that survived
    * verification) into duplicate GROUPS, so a corpus can keep one
    * canonical document per group. Component id = min node id in the
    * component.
    *
    * Algorithm: iterative min-label propagation. Labels are seeded at
    * `min(self, neighbors)` (one aggregation — already the fixpoint for
    * star components, the overwhelmingly common near-dup shape), then
    * each round every node takes the minimum label among itself and its
    * neighbors until fixpoint, reached in O(diameter) rounds. Each
    * round is one shuffle-join plus one aggregation — no driver-side
    * graph, no collect — and label frames are localCheckpoint()ed so
    * the lineage (and plan size) stays constant across rounds.
    * Convergence is detected from the SUM of labels (monotonically
    * non-increasing; unchanged ⇔ fixpoint) — one cheap scan of the
    * checkpointed frame instead of a join against the previous round.
    * At 100 TB the edge set is a vanishing fraction of the corpus and
    * components are tiny, so this converges in a handful of rounds.
    *
    * @param edges two-column DataFrame of undirected edges (any names)
    * @return (node: long, component: long)
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val Array(srcName, dstName) = edges.columns
    val e = edges.select(col(srcName).cast("long").as("src"), col(dstName).cast("long").as("dst"))
    // Undirected: propagate both ways (self-loops fall out of least()).
    val ud = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .persist()
    // Decimal sum: label sums can exceed Long at planetary node counts,
    // and Spark 4 ANSI mode would throw on long-sum overflow.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
    var labels = ud
      .groupBy(col("src").as("node"))
      .agg(min(least(col("src"), col("dst"))).as("component"))
      .localCheckpoint()
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbor = ud
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("component"))
      val next = labels
        .unionByName(viaNeighbor)
        .groupBy("node")
        .agg(min(col("component")).as("component"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    ud.unpersist()
    labels
  }
}
