package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Relational, Similarity}

/** Round-9 operators: blocked edit-distance entity pairs (record
  * linkage candidates) and the integer-rescaled power-iteration
  * dominant Gram eigendirection.
  */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, appName = "round9-spec")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long)] = {
    import spark.implicits._
    df.as[(String, String, Long)].collect().toSet
  }

  test("editDistancePairs: blocking limits pairs, distances hand-checked, dups collapse") {
    import spark.implicits._
    // "red plate"/"red plates" are 1 edit apart but land in DIFFERENT
    // blocks (plate vs plates) — the blocking tradeoff, asserted.
    val e = Seq(
      "red plate", "old plate", "red plates", "blue widget", "red widget",
      "red plate", "old plate" // duplicate mentions must collapse first
    ).toDF("name")
    val out = pairs(
      Dedup.editDistancePairs(e, "name", n => regexp_extract(n, "[^ ]+$", 0), maxDist = 4))
    assert(out == Set(
      ("old plate", "red plate", 2L),
      ("blue widget", "red widget", 4L)))
    // tighter budget drops the 4-edit pair
    val tight = pairs(
      Dedup.editDistancePairs(e, "name", n => regexp_extract(n, "[^ ]+$", 0), maxDist = 3))
    assert(tight == Set(("old plate", "red plate", 2L)))
  }

  test("editDistancePairs: null names dropped, guards, degenerate-block gate") {
    import spark.implicits._
    val e = Seq(Some("aa x"), None, Some("ab x"), Some("ac x")).toDF("name")
    val out = pairs(Dedup.editDistancePairs(e, "name", n => lit("k"), maxDist = 1))
    assert(out == Set(("aa x", "ab x", 1L), ("aa x", "ac x", 1L), ("ab x", "ac x", 1L)))
    intercept[IllegalArgumentException](
      Dedup.editDistancePairs(e, "name", n => lit("k"), maxDist = 0))
    // one giant block over the size gate throws instead of going quadratic
    val big = (1 to 40).map(i => s"name_$i").toDF("name")
    val ex = intercept[IllegalArgumentException](
      Dedup.editDistancePairs(big, "name", n => lit("k"), maxDist = 2, maxBlockRows = 10L))
    assert(ex.getMessage.contains("blocking key too coarse"))
  }

  test("editDistancePairs distanceOn: raw universe stays unmerged; fold applies only in the predicate") {
    import spark.implicits._
    // Two names differing ONLY in different non-ASCII characters
    // (ç vs ñ): with the q158 ASCII-sentinel fold as `distanceOn`,
    // they must remain DISTINCT entities (the r9 fold-before-distinct
    // bug merged them) and surface as a dist-0 candidate pair under
    // the folded metric — while the default (no fold) keeps the true
    // code-point distance of 1.
    val e = Seq("çold brew", "ñold brew", "cold brew").toDF("name")
    val fold: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => regexp_replace(c, "[^\\x00-\\x7F]", "")
    val folded = pairs(Dedup.editDistancePairs(
      e, "name", n => regexp_extract(n, "[^ ]+$", 0), maxDist = 3, distanceOn = fold))
    // all three names pair up; ç/ñ pair at folded distance 0
    assert(folded == Set(
      ("çold brew", "ñold brew", 0L),
      ("cold brew", "çold brew", 1L),
      ("cold brew", "ñold brew", 1L)))
    // default keeps true code-point distances: ç vs ñ is 1 edit
    val raw = pairs(Dedup.editDistancePairs(
      e, "name", n => regexp_extract(n, "[^ ]+$", 0), maxDist = 3))
    assert(raw == Set(
      ("çold brew", "ñold brew", 1L),
      ("cold brew", "çold brew", 1L),
      ("cold brew", "ñold brew", 1L)))
  }

  test("editDistancePairs: invariant under adversarial repartitioning") {
    import spark.implicits._
    val e = (1 to 200).map(i => s"ent ${i % 37}").toDF("name")
    val f: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => length(n).cast("string")
    val a = pairs(Dedup.editDistancePairs(e.repartition(1), "name", f, maxDist = 2))
    val b = pairs(Dedup.editDistancePairs(e.repartition(13), "name", f, maxDist = 2))
    assert(a == b && a.nonEmpty)
  }

  private def dirs(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    import spark.implicits._
    df.as[(Long, Long)].collect().toMap
  }

  test("powerIterationDirection: hand-computed 2-dim rounds, positive case") {
    import spark.implicits._
    // Gram of [[1,0],[1,0],[0,1]] = [[2,0],[0,1]] -> quantized
    // [[2e6,0],[0,1e6]]. v0=(1e6,1e6); w1=(2e12,1e12) -> v1=(1e6,5e5);
    // w2=(2e12,5e11) -> v2=(1e6,25e4).
    val e = Seq(Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)).toDF("embedding")
    assert(dirs(Similarity.powerIterationDirection(e, "embedding", iterations = 1)) ==
      Map(0L -> 1000000L, 1L -> 500000L))
    assert(dirs(Similarity.powerIterationDirection(e, "embedding", iterations = 2)) ==
      Map(0L -> 1000000L, 1L -> 250000L))
  }

  test("powerIterationDirection: negative components exercise the sign-safe rescale") {
    import spark.implicits._
    // Gram of [[1,-1],[1,0]] = [[2,-1],[-1,1]]: w1=(1e12, 0) ->
    // v1=(1e6, 0); w2=(2e12, -1e12) -> v2=(1e6, -5e5): the w<0 branch
    // must floor |w| (non-negative div == oracle //), then re-sign.
    val e = Seq(Seq(1.0f, -1.0f), Seq(1.0f, 0.0f)).toDF("embedding")
    assert(dirs(Similarity.powerIterationDirection(e, "embedding", iterations = 2)) ==
      Map(0L -> 1000000L, 1L -> -500000L))
  }

  test("powerIterationDirection: degenerate Gram throws and releases; guards; invariance") {
    import spark.implicits._
    GraftSession.releaseAllCaches(spark)
    // [[1,-1]] alone: Gram [[1,-1],[-1,1]], v0=(s,s) -> w1=(0,0) -> degenerate
    val degenerate = Seq(Seq(1.0f, -1.0f)).toDF("embedding")
    val ex = intercept[IllegalArgumentException](
      Similarity.powerIterationDirection(degenerate, "embedding", iterations = 1))
    assert(ex.getMessage.contains("degenerate Gram"))
    assert(spark.sharedState.cacheManager.isEmpty)
    intercept[IllegalArgumentException](
      Similarity.powerIterationDirection(degenerate, "embedding", iterations = 0))
    val e = (1 to 60)
      .map(i => Seq(0.1f * (i % 7), -0.05f * (i % 5), 0.02f * i))
      .toDF("embedding")
    val a = dirs(Similarity.powerIterationDirection(e.repartition(1), "embedding"))
    val b = dirs(Similarity.powerIterationDirection(e.repartition(11), "embedding"))
    assert(a == b && a.size == 3)
    // release handle drains every persisted frame
    GraftSession.releaseAllCaches(spark)
    val (out, release) = Similarity.powerIterationDirectionReleasable(e, "embedding")
    out.count()
    assert(!spark.sharedState.cacheManager.isEmpty)
    release()
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("zOrderValue: hand-interleaved bits, prefix locality, high-bit masking, guard") {
    import spark.implicits._
    // x=0b101 -> bits at 0,4 = 17; y=0b011 -> bits at 1,3 = 10; zv=27
    val one = Seq((5L, 3L)).toDF("x", "y")
      .select(Relational.zOrderValue(col("x"), col("y"), 3).as("zv"))
    assert(one.collect()(0).getLong(0) == 27L)
    // every point of one 2^k-aligned square shares the zv prefix above 2k bits
    val square = (16 until 32).flatMap(x => (48 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
      .select((Relational.zOrderValue(col("x"), col("y"), 6) / 256).cast("long").as("pfx"))
      .distinct()
    assert(square.count() == 1L)
    // bits above the budget are masked: (x, y) and (x + 2^bits, y) agree
    val masked = Seq((5L, 3L, 5L + 8L)).toDF("x", "y", "x2")
      .select(
        Relational.zOrderValue(col("x"), col("y"), 3).as("a"),
        Relational.zOrderValue(col("x2"), col("y"), 3).as("b"))
      .collect()(0)
    assert(masked.getLong(0) == masked.getLong(1))
    intercept[IllegalArgumentException](Relational.zOrderValue(col("x"), col("y"), 0))
  }

  test("zOrderRepartition: each range partition covers a small 2-D bounding box") {
    import spark.implicits._
    // 64x64 grid, one point per cell, shuffled in by the hash of the pair
    val pts = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
      .repartition(7)
    val laid = Relational.zOrderRepartition(pts, "x", "y", bits = 6, numPartitions = 16)
    val boxes = laid
      .withColumn("pid", spark_partition_id())
      .groupBy(col("pid"))
      .agg(
        (max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"),
        count(lit(1)).as("n"))
      .collect()
    assert(boxes.map(_.getLong(boxes(0).fieldIndex("n"))).sum == 4096L)
    // a random/hash layout would give every partition the FULL 63-wide
    // extent in both dims; z-range partitions must stay well under half
    val worstArea = boxes.map(r =>
      (r.getLong(r.fieldIndex("dx")) + 1) * (r.getLong(r.fieldIndex("dy")) + 1)).max
    assert(worstArea <= 1024L, s"worst partition bounding box area $worstArea > 1024")
  }

  test("rendezvousShard: in-range, deterministic, minimal-disruption on shard removal") {
    import spark.implicits._
    val keys = (0L until 2000L).toDF("k")
    val assigned = keys
      .select(
        col("k"),
        Relational.rendezvousShard(col("k"), 16).as("s16"),
        Relational.rendezvousShard(col("k"), 15).as("s15"))
      .collect()
    assert(assigned.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 15))
    assert(assigned.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 14))
    // HRW's defining property: withdrawing shard 15 re-homes ONLY the
    // keys it owned — every other key keeps its winner, because the
    // removed shard's entry simply drops out of each key's greatest fold.
    val stayers = assigned.filter(_.getLong(1) != 15L)
    assert(stayers.nonEmpty)
    assert(stayers.forall(r => r.getLong(1) == r.getLong(2)))
    val moved = assigned.count(_.getLong(1) == 15L)
    // ~1/16 of 2000 keys; loose bounds just reject degenerate hashing
    assert(moved > 40 && moved < 300, s"shard 15 owned $moved of 2000 keys")
    // balance: every shard gets a non-degenerate share
    val byShard = assigned.groupBy(_.getLong(1)).view.mapValues(_.length)
    assert(byShard.size == 16 && byShard.values.min > 30, s"imbalance: $byShard")
    intercept[IllegalArgumentException](Relational.rendezvousShard(col("k"), 1))
  }

  test("prefixFilterSimilarityJoin: exactly the brute-force pair set, no false negatives") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => f"w$i%02d")
    // random subsets, plus planted near-identical pairs so the ≥-t set is non-empty
    val base = (0 until 50).map { id =>
      (id.toLong, rnd.shuffle(vocab).take(8 + rnd.nextInt(12)).toSet)
    }
    val planted = base.take(6).map { case (id, s) =>
      (id + 100L, if (s.size > 1) s - s.head else s) // drop one token → high Jaccard twin
    }
    val docs = (base ++ planted).map { case (id, s) => (id, s.toArray.sorted) }
    val (tNum, tDen) = (3, 4)
    val expected = (for {
      (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      uni = sa.length + sb.length - inter
      if inter * tDen >= uni * tNum
    } yield (ia, ib, inter.toLong, uni.toLong)).toSet
    assert(expected.nonEmpty, "fixture must plant qualifying pairs")
    val got = graft.operators.Dedup
      .prefixFilterSimilarityJoin(docs.toDF("doc_id", "toks"), "doc_id", "toks", tNum, tDen)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    // invariant under adversarial partitioning — the determinism
    // contract every pair generator in the catalog carries
    val got2 = graft.operators.Dedup
      .prefixFilterSimilarityJoin(
        docs.toDF("doc_id", "toks").repartition(17), "doc_id", "toks", tNum, tDen)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got2 == expected)
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.prefixFilterSimilarityJoin(docs.toDF("doc_id", "toks"), "doc_id", "toks", 5, 4)
    }
  }

  test("prefixSum: matches the window formulation, exclusive, invariant, guarded") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 500L).map(k => (k, rnd.nextInt(100).toLong))
    val df = rows.toDF("k", "w").repartition(13) // adversarial layout
    val got = Relational.prefixSum(df, "k", "w", numPartitions = 5)
      .select("k", "cumw").as[(Long, Long)].collect().toMap
    // exclusive prefix: reference by plain scala scan in key order
    var acc = 0L
    rows.sortBy(_._1).foreach { case (k, w) =>
      assert(got(k) == acc, s"k=$k"); acc += w
    }
    // partition-count invariance
    val got2 = Relational.prefixSum(df.repartition(3), "k", "w", numPartitions = 11)
      .select("k", "cumw").as[(Long, Long)].collect().toMap
    assert(got2 == got)
    // negative and null weights throw inside the pass
    intercept[org.apache.spark.SparkException] {
      Seq((1L, -5L)).toDF("k", "w")
        .transform(Relational.prefixSum(_, "k", "w", 2)).collect()
    }
    intercept[org.apache.spark.SparkException] {
      Seq((1L, Some(1L)), (2L, None)).toDF("k", "w")
        .transform(Relational.prefixSum(_, "k", "w", 2)).collect()
    }
    // non-long weight rejected loudly at plan time
    intercept[IllegalArgumentException] {
      Relational.prefixSum(Seq((1L, 1)).toDF("k", "w"), "k", "w", 2)
    }
  }

  test("weighted systematic sampling arithmetic: hand-checked strata") {
    import spark.implicits._
    // weights [3,1,2,6,2], W=14, stride 2 → points 2,4,6,8,10,12,14:
    // hits per doc = 1,1,1,3,1 (doc 4 spans [6,12) → points 8,10,12? no:
    // (6+6)//2 - 6//2 = 6-3 = 3 → points 8,10,12)
    val docs = Seq((1L, 3L), (2L, 1L), (3L, 2L), (4L, 6L), (5L, 2L)).toDF("k", "w")
    val c = Relational.prefixSum(docs, "k", "w", 2)
    val stride = 14L / 7L
    val hits = c.select(
      col("k"),
      expr(s"(cumw + w) div $stride - cumw div $stride").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 1L))
    assert(hits.values.sum == 7L) // exactly k draws when stride divides W
  }

  test("tableChecksum: order/partition-invariant, cell-sensitive, null-vs-empty distinct") {
    import spark.implicits._
    val base = Seq((1L, "a", "x"), (2L, "b", null), (3L, "c", "")).toDF("id", "s", "t")
    def ck(df: org.apache.spark.sql.DataFrame): (Long, Long) =
      Relational.tableChecksum(df, Seq("id", "s", "t")).as[(Long, Long)].collect()(0)
    val (n0, c0) = ck(base)
    assert(n0 == 3L)
    // any layout of the same rows checksums identically
    assert(ck(base.repartition(7)) == ((n0, c0)))
    assert(ck(base.orderBy(col("id").desc)) == ((n0, c0)))
    // one changed cell moves the sum
    val mutated = Seq((1L, "a", "x"), (2L, "b", null), (3L, "c", "!")).toDF("id", "s", "t")
    assert(ck(mutated)._2 != c0)
    // a dropped or duplicated row moves it too
    assert(ck(base.limit(2))._2 != c0)
    assert(ck(base.unionAll(base.limit(1)))._2 != c0)
    // the NUL sentinel keeps null != empty string
    val nulled = Seq((1L, "a", "x"), (2L, "b", ""), (3L, "c", "")).toDF("id", "s", "t")
    assert(ck(nulled)._2 != c0)
  }

  test("repetitionMetrics: hand-checked counts, short-doc and empty-token edges") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq(
      // 4 words, 2 distinct, top mult 3; trigrams: "a a a","a a b" → 2 distinct
      (1L, "a a a b"),
      // 3 words all same; one trigram
      (2L, "x x x"),
      // under 3 words → no trigrams
      (3L, "y z"),
      // double space → empty token counts as a word (string_split parity)
      (4L, "p  p")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df, "text")
      .select("doc_id", "n_words", "n_distinct_words", "top_word_mult", "n_trigrams", "n_distinct_trigrams")
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(m(0) == ((1L, 4L, 2L, 3L, 2L, 2L)))
    assert(m(1) == ((2L, 3L, 1L, 3L, 1L, 1L)))
    assert(m(2) == ((3L, 2L, 2L, 1L, 0L, 0L)))
    assert(m(3) == ((4L, 3L, 2L, 2L, 1L, 1L)))
    // maxMultiplicity on an empty array is 0, not a crash
    val empty = Seq(Tuple1(Array.empty[String])).toDF("a")
      .select(TextAnalysis.maxMultiplicity(col("a")).as("m"))
      .collect()(0).getLong(0)
    assert(empty == 0L)
  }

  test("redaction regex: word-boundary alternation counts and mask delta hand-checked") {
    import spark.implicits._
    // "customers" must NOT match \bcustomer\b (trailing word char);
    // mask delta = sum over hits of (len("[REDACTED]") - len(term))
    val df = Seq(
      ("customer customers vector", 2L, (10L - 8L) + (10L - 6L)),
      ("spark sparkly spark", 2L, 2L * (10L - 5L)),
      ("no denied terms here", 0L, 0L)
    ).toDF("text", "want_hits", "want_delta")
    val pat = "\\b(customer|vector|spark)\\b"
    val got = df.select(
      regexp_count(col("text"), lit(pat)).cast("long").as("hits"),
      (length(regexp_replace(col("text"), pat, "[REDACTED]")) - length(col("text")))
        .cast("long").as("delta"),
      col("want_hits"), col("want_delta")).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(2), s"hits: $r")
      assert(r.getLong(1) == r.getLong(3), s"delta: $r")
    }
  }
}
