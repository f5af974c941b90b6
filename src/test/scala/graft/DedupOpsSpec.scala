package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Dedup operator semantics: banded SimHash candidate generation must
  * be lossless vs the exact all-pairs scan, and the exact O(n²)
  * baselines must refuse unbounded input.
  */
class DedupOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("banded simHashPairs is lossless: identical pair set to the exact all-pairs scan") {
    import spark.implicits._
    // Deterministic pseudo-fingerprints spanning near and far Hamming
    // distances: base patterns plus 1-, 3-, and 5-bit perturbations.
    val base = 0x0000a5a5a5a5L
    val rows = Seq(
      1L -> base,
      2L -> (base ^ 1L),                  // hamming 1 from base
      3L -> (base ^ ((1L << 13) | (1L << 29) | (1L << 47))), // hamming 3
      4L -> (base ^ 0x1fL),               // hamming 5 — beyond threshold
      5L -> 0x0000ffff0000L,
      6L -> (0x0000ffff0000L ^ (1L << 20) ^ (1L << 21)),     // hamming 2 from 5
      7L -> 0x000000000000L
    ).toDF("doc_id", "simhash")
    val banded = pairs(Dedup.simHashPairs(rows, "doc_id", maxHamming = 3))
    val exact = pairs(Dedup.simHashPairsExact(rows, "doc_id", maxHamming = 3))
    assert(banded == exact)
    assert(exact.contains((1L, 2L, 1L)) && exact.contains((1L, 3L, 3L)) && exact.contains((5L, 6L, 2L)))
    assert(!exact.exists { case (a, b, _) => (a, b) == ((1L, 4L)) })
  }

  test("banded simHashPairs plans an equi-join, not a nested-loop pair scan") {
    import spark.implicits._
    val rows = (1L to 50L).map(i => i -> (i * 2654435761L % (1L << 48))).toDF("doc_id", "simhash")
    val p = Dedup.simHashPairs(rows, "doc_id", 3).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("winnowing: shared substrings share fingerprints; short/empty docs get empty sets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "xxxx hello world yyyy"),
      (2L, "zzzz hello world wwww"),
      (3L, "totally unrelated words here"),
      (4L, ""),
      (5L, "abcdefg")) // 7 chars < k+w-1 = 8 -> grams exist but no full window
      .toDF("id", "text")
    val fp = Dedup
      .winnowFingerprints(docs, "text", k = 5, w = 4, outCol = "fps")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("fps")).toSet)
      .toMap
    // guarantee: shared substring of length >= k+w-1 shares >= 1 fingerprint
    assert(fp(1L).intersect(fp(2L)).nonEmpty)
    assert(fp(1L).intersect(fp(3L)).isEmpty)
    assert(fp(4L).isEmpty && fp(5L).isEmpty)
  }

  test("winnowing: linear in document length under BOTH plan shapes (environment-calibrated)") {
    import spark.implicits._
    // The quadratic regression this guards against only fired in the
    // multi-consumer plan (explode feeding an aggregation and a
    // self-join, q80's shape) — the optimizer inlined the hash-array
    // alias into a per-window lambda, re-evaluating the FULL per-doc
    // hash array per window: O(L²) per document instead of O(L) (one
    // sf0.1 task burned 28 CPU-minutes before the slices+least
    // rewrite). An absolute wall-clock threshold proved environment-
    // sensitive (round 6: 102.9 s on a container whose disk, not CPU,
    // was 4–7× slow — a red suite with a green plan). The calibrated
    // form cancels machine speed by SCALING DOC LENGTH in the same
    // JVM: linear plan → 600-char docs cost ≤ ~4× the 150-char docs;
    // the O(L²) re-evaluation → 16× relative (and ~150× absolute),
    // so a ratio bound of 10 keeps full power against the bug while
    // ignoring how slow the iron is.
    def timeBoth(len: Int): Double = {
      val docs = (1L to 1000L)
        .map(i => (i, (s"doc$i word$i common text here " * 25).take(len)))
        .toDF("doc_id", "text")
      val t0 = System.nanoTime()
      val nSimple = Dedup
        .winnowFingerprints(docs, "text", 5, 4, "fps")
        .agg(sum(size(col("fps"))))
        .collect()(0)
        .getLong(0)
      val nPairs = Dedup
        .winnowCandidatePairs(docs, "doc_id", "text", k = 5, w = 4, maxDocFreq = 10)
        .count()
      GraftSession.releaseAllCaches(spark)
      assert(nSimple > 0 && nPairs >= 0)
      (System.nanoTime() - t0) / 1e9
    }
    timeBoth(150) // untimed JIT/codegen warmup of both plan shapes
    val long1 = timeBoth(600)
    // Fast path: even a CONTENDED linear run stays under 45 s, while
    // the quadratic plan is O(minutes) on any hardware (≥ ~150× the
    // linear hash work, interpreted) — no calibration needed.
    if (long1 >= 45.0) {
      val short = math.min(timeBoth(150), timeBoth(150))
      val long = math.min(long1, timeBoth(600))
      assert(
        long < short * 10.0 + 15.0,
        s"winnowing 600-char docs took ${long}s vs ${short}s for 150-char — " +
          "superlinear in doc length: hash array is being re-evaluated per window")
    }
  }

  test("keepList: clusters keep min-id canonical, singletons keep themselves") {
    import spark.implicits._
    val corpus = (1L to 6L).toDF("id")
    // {1,2,3} chained transitively, {5,6} direct, 4 untouched.
    val prs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val out = Dedup
      .keepList(corpus, "id", prs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out == Map(
      1L -> ((1L, 3L, true)),
      2L -> ((1L, 3L, false)),
      3L -> ((1L, 3L, false)),
      4L -> ((4L, 1L, true)),
      5L -> ((5L, 2L, true)),
      6L -> ((5L, 2L, false))))
    // Empty pair list: everything is a kept singleton.
    val all = Dedup.keepList(corpus, "id", prs.filter(col("a") < 0)).collect()
    assert(all.length == 6 && all.forall(r => r.getBoolean(3) && r.getLong(2) == 1L))
  }

  test("leakageSafeSplit: a near-dup cluster never straddles train/val") {
    import spark.implicits._
    val corpus = (1L to 6L).toDF("id")
    val prs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val out = Dedup
      .leakageSafeSplit(corpus, "id", prs, valPermille = 500)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    // Cluster members share canonical AND split — the leakage property.
    assert(out(1L) == out(2L) && out(2L) == out(3L) && out(1L)._1 == 1L)
    assert(out(5L) == out(6L) && out(5L)._1 == 5L)
    assert(out(4L)._1 == 4L)
    // The split is the pinned pure function of the canonical id: the
    // same h32(canonical) % 1000 < valPermille coin, computed here
    // independently of the operator.
    val coin = corpus.select(
      col("id"),
      (graft.functions.Hashing.h32(col("id").cast("string")) % 1000 < 500).as("v"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    out.foreach { case (_, (canon, split)) =>
      assert(split == (if (coin(canon)) "val" else "train"))
    }
    val bad = intercept[IllegalArgumentException] {
      Dedup.leakageSafeSplit(corpus, "id", prs, valPermille = 1001)
    }
    assert(bad.getMessage.contains("valPermille"))
  }

  test("spanDedupStats: first occurrence wins, boilerplate counts distinct docs, short docs clean") {
    import spark.implicits._
    // w=4, s=2. d1: spans (a b c d)(c d e f)(e f g h); d2: (a b c d)
    // (c d x y)(x y z w); d3: 5 tokens -> one span (a b c d); d4: too
    // short -> zero spans. "a b c d" is in 3 distinct docs: first
    // occurrence is d1's, so d2/d3's copies are dups; ALL of its
    // occurrences are boilerplate at K=3.
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x y z w"),
      (3L, "a b c d q"),
      (4L, "p q")
    ).toDF("doc_id", "text")
    val out = Dedup
      .spanDedupStats(docs, "doc_id", "text", window = 4, stride = 2, boilerplateDocs = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(1L) == ((3L, 0L, 1L, 0.0)))
    assert(out(2L) == ((3L, 1L, 1L, 1.0 / 3.0)))
    assert(out(3L) == ((1L, 1L, 1L, 1.0)))
    assert(out(4L) == ((0L, 0L, 0L, 0.0)))
    val bad = intercept[IllegalArgumentException] {
      Dedup.spanDedupStats(docs, "doc_id", "text", window = 1, stride = 2, boilerplateDocs = 3)
    }
    assert(bad.getMessage.contains("window >= stride"))
  }

  test("exact all-pairs baselines refuse input larger than maxRows") {
    import spark.implicits._
    val sh = (1L to 30L).map(i => i -> i).toDF("doc_id", "simhash")
    val exGuard = intercept[IllegalArgumentException] {
      Dedup.simHashPairsExact(sh, "doc_id", 3, maxRows = 10)
    }
    assert(exGuard.getMessage.contains("O(n²)"))
    val emb = (1L to 30L).map(i => i -> Array(1.0f, 0.0f)).toDF("vec_id", "embedding")
    val exNd = intercept[IllegalArgumentException] {
      Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.9, maxRows = 10)
    }
    assert(exNd.getMessage.contains("O(n²)"))
  }

  /** Messages down the cause chain — the in-job bucket gate's
    * raise_error arrives wrapped (SparkException → SparkRuntimeException).
    */
  private def messageChain(t: Throwable): String = {
    val b = new StringBuilder
    var cur: Throwable = t
    while (cur != null) { b.append(Option(cur.getMessage).getOrElse("")).append('\n'); cur = cur.getCause }
    b.toString
  }

  /** A signature frame where every doc in [lo, hi] carries the SAME
    * k-row signature `v` — an exact-duplicate cluster (agrees on every
    * band), the degenerate input the bucket gate exists for.
    */
  private def constSig(lo: Long, hi: Long, v: Long, k: Int) = {
    val base = spark.range(lo, hi + 1).toDF("doc_id")
    base.select(col("doc_id") +: (0 until k).map(j => lit(v).as(s"mh$j")): _*)
  }

  test("lshCandidates: a planted 10^4-doc exact-dup mega-cluster trips the in-job bucket gate") {
    // 10 001 identical signatures — every band bucket holds 10 001 docs,
    // one over the DEFAULT gate. Without the gate this self-join would
    // emit ~5·10⁷ pairs per band; with it, the counts stage raises
    // before the fan-out materializes.
    val sig = constSig(1L, 10001L, 7L, k = 12)
    val e = intercept[Exception] {
      Dedup.lshCandidates(sig, "doc_id", k = 12, nBands = 3).count()
    }
    val msg = messageChain(e)
    assert(msg.contains("maxBucketDocs"), msg)
    assert(msg.contains("10001"), msg) // the offending bucket's size is named
    assert(msg.contains("exactDedup"), msg) // and the remedy
  }

  test("lshCandidates: dropOversizeBuckets removes the mega-cluster, keeps honest candidates") {
    // An exact-dup cluster over the gate plus a 3-doc cluster under it:
    // drop mode must silently retire the former (it agrees on EVERY
    // band, so it leaves the candidate set entirely) and still emit
    // the latter's C(3,2) pairs.
    val mega = constSig(1L, 60L, 7L, k = 12)
    val small = constSig(101L, 103L, 9L, k = 12)
    val out = Dedup
      .lshCandidates(mega.unionByName(small), "doc_id", k = 12, nBands = 3,
        maxBucketDocs = 50L, dropOversizeBuckets = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(out === Set((101L, 102L), (101L, 103L), (102L, 103L)))
    // and an un-degenerate corpus passes the default gate untouched
    val honest = Dedup
      .lshCandidates(mega.filter(col("doc_id") <= 3L).unionByName(small), "doc_id", 12, 3)
      .count()
    assert(honest === 6L) // two 3-cliques
  }

  test("simHashPairs: a planted 10^4-doc identical-hash cluster trips the in-job chunk gate") {
    import spark.implicits._
    // 10 001 docs sharing ONE simhash — an exact-dup cluster agrees on
    // every pigeonhole chunk, so every (c, cv) bucket holds 10 001
    // docs, one over the DEFAULT gate. Without it the self-join emits
    // ~5·10⁷ pairs per chunk (×4 chunks); with it, the counts stage
    // raises before the fan-out materializes.
    val sh = spark.range(1, 10002).toDF("doc_id").select(col("doc_id"), lit(0xa5a5a5a5a5L).as("simhash"))
    val e = intercept[Exception] {
      Dedup.simHashPairs(sh, "doc_id", maxHamming = 3).count()
    }
    val msg = messageChain(e)
    assert(msg.contains("simHashPairs"), msg)
    assert(msg.contains("maxBucketDocs"), msg)
    assert(msg.contains("10001"), msg) // the offending bucket's size is named
    assert(msg.contains("exactDedup"), msg) // and the remedy
  }

  test("simHashPairs: dropOversizeBuckets retires the mega-cluster, keeps honest near-dups") {
    import spark.implicits._
    // A 60-doc exact-dup cluster over a maxBucketDocs=50 gate plus an
    // honest hamming-1 pair in different buckets: drop mode retires
    // the cluster entirely (it is oversize in EVERY chunk) and still
    // finds the honest pair through its untouched chunks.
    val mega = spark.range(1, 61).toDF("doc_id").select(col("doc_id"), lit(0xa5a5a5a5a5L).as("simhash"))
    val honest = Seq(101L -> 0x0000ffff0000L, 102L -> (0x0000ffff0000L ^ 1L)).toDF("doc_id", "simhash")
    val out = pairs(
      Dedup.simHashPairs(mega.unionByName(honest), "doc_id", maxHamming = 3,
        maxBucketDocs = 50L, dropOversizeBuckets = true))
    assert(out === Set((101L, 102L, 1L)))
    // and the same corpus under the default gate keeps the cluster's pairs
    val under = pairs(
      Dedup.simHashPairs(mega.filter(col("doc_id") <= 3L).unionByName(honest), "doc_id", 3))
    assert(under === Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L), (101L, 102L, 1L)))
  }

  test("simHashIncremental: batch×corpus pairs equal the exact cross scan; never batch×batch") {
    import spark.implicits._
    val base = 0x0000a5a5a5a5L
    val batch = Seq(1L -> base, 2L -> (base ^ 1L)).toDF("doc_id", "simhash")
    val corpus = Seq(
      101L -> base,                 // hamming 0 / 1 from the batch
      102L -> (base ^ 0x0fL),       // hamming 4 from doc 1, 3 from doc 2
      103L -> 0x0000ffff0000L,      // far from everything
      104L -> (base ^ ((1L << 3) | (1L << 17) | (1L << 29) | (1L << 41))) // hamming 4 spread over chunks
    ).toDF("doc_id", "simhash")
    val got = Dedup.simHashIncremental(batch, corpus, "doc_id", maxHamming = 7, bits = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact cross scan, computed by hand: every (batch, corpus) pair ≤ 7
    def hm(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b).toLong
    val expected = (for {
      (bi, bh) <- Seq(1L -> base, 2L -> (base ^ 1L))
      (ci, ch) <- Seq(101L -> base, 102L -> (base ^ 0x0fL), 103L -> 0x0000ffff0000L,
        104L -> (base ^ ((1L << 3) | (1L << 17) | (1L << 29) | (1L << 41))))
      if hm(bh, ch) <= 7
    } yield (bi, ci, hm(bh, ch))).toSet
    assert(got === expected)
    assert(expected.exists(_._3 == 0L) && expected.exists(_._3 >= 4L)) // non-trivial spread
    // batch-internal near-dups (1 vs 2 at hamming 1) must NOT appear
    assert(!got.exists { case (a, b, _) => b < 100L || a > 100L })
    // the prepare-once path (the streaming / repeated-batch shape)
    // returns the identical pair set, and its handle drops the cache
    val (prepared, release) = Dedup.prepareSimHashCorpus(corpus, "doc_id", 7, bits = 48)
    val viaPrepared = Dedup.simHashIncrementalPrepared(batch, prepared, "doc_id", 7, bits = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaPrepared === expected)
    release()
  }

  test("simHashIncremental: a corpus-side mega-bucket trips the gate; drop mode degrades") {
    import spark.implicits._
    val batch = Seq(1L -> 7L).toDF("doc_id", "simhash")
    val corpus = spark.range(1001, 1101).toDF("doc_id").select(col("doc_id"), lit(7L).as("simhash"))
    val e = intercept[Exception] {
      Dedup.simHashIncremental(batch, corpus, "doc_id", 3, maxBucketDocs = 50L).count()
    }
    val msg = messageChain(e)
    assert(msg.contains("simHashIncremental(corpus)"), msg)
    // drop mode: the corpus mega-bucket is retired; a distinct corpus
    // fingerprint in other buckets still meets the batch.
    val corpus2 = corpus.unionByName(Seq(2001L -> 0x0000ffff0000L).toDF("doc_id", "simhash"))
    val batch2 = batch.unionByName(Seq(11L -> (0x0000ffff0000L ^ 2L)).toDF("doc_id", "simhash"))
    val out = Dedup
      .simHashIncremental(batch2, corpus2, "doc_id", 3, maxBucketDocs = 50L, dropOversizeBuckets = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((11L, 2001L, 1L)))
  }

  test("lshCandidatesReleasable: handle drops the banded cache on success and after a gate abort") {
    def persistedCount(): Int = spark.sparkContext.getPersistentRDDs.size
    GraftSession.releaseAllCaches(spark)
    // success path: pairs materialize, cache present, release clears it
    val small = constSig(1L, 3L, 9L, k = 12)
    val (out, release) = Dedup.lshCandidatesReleasable(small, "doc_id", k = 12, nBands = 3)
    assert(out.count() === 3L)
    assert(persistedCount() > 0)
    release()
    assert(persistedCount() === 0)
    // throw path: the gate aborts the action; release must still clear
    val mega = constSig(1L, 60L, 7L, k = 12)
    val (bad, release2) = Dedup.lshCandidatesReleasable(mega, "doc_id", 12, 3, maxBucketDocs = 50L)
    intercept[Exception] { bad.count() }
    release2()
    assert(persistedCount() === 0)
    // incrementalCandidatesReleasable: one handle covers both sides
    val (inc, release3) =
      Dedup.incrementalCandidatesReleasable(small, constSig(101L, 103L, 9L, k = 12), "doc_id", 12, 3)
    assert(inc.count() === 9L)
    assert(persistedCount() > 0)
    release3()
    assert(persistedCount() === 0)
  }

  test("incrementalCandidates: a corpus-side mega-bucket trips the gate; drop mode degrades") {
    val batch = constSig(1L, 5L, 7L, k = 12)
    val corpus = constSig(1001L, 1100L, 7L, k = 12)
    val e = intercept[Exception] {
      Dedup.incrementalCandidates(batch, corpus, "doc_id", 12, 3, maxBucketDocs = 50L).count()
    }
    val msg = messageChain(e)
    assert(msg.contains("incrementalCandidates(corpus)"), msg)
    assert(msg.contains("100"), msg)
    // drop mode: the corpus mega-bucket is retired; a small corpus
    // cluster in a different bucket still meets the batch.
    val corpus2 = corpus.unionByName(constSig(2001L, 2003L, 9L, k = 12))
    val batch2 = batch.unionByName(constSig(11L, 11L, 9L, k = 12))
    val out = Dedup
      .incrementalCandidates(batch2, corpus2, "doc_id", 12, 3,
        maxBucketDocs = 50L, dropOversizeBuckets = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(out === Set((11L, 2001L), (11L, 2002L), (11L, 2003L)))
  }
}
