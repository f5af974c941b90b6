package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, TextAnalysis}

/** Hand-verified semantics of the data-selection operators (BM25
  * retrieval scoring, deterministic k-means).
  */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bm25Scores: hand-computed integer scores, zero for term-free docs") {
    import spark.implicits._
    // Corpus: doc1 "a a b" (dl=3), doc2 "a c" (dl=2), doc3 "c c c"
    // (dl=3). N=3, S=8. Terms (a, b): df(a)=2, df(b)=1.
    //   idf(a) = (2·3−2·2+1)/(2·2+1) = 3/5; idf(b) = 5/3.
    // doc1·a (tf=2): 10⁶·3·44·8·2 // 5·(20·8·2+6·8+18·3·3)
    //   = 2112000000 // 2650 = 796981
    // doc1·b (tf=1): 10⁶·5·44·8 // 3·(160+48+162) = 1760000000 // 1110
    //   = 1585585
    // doc2·a (tf=1, dl=2): 10⁶·3·44·8 // 5·(160+48+108)
    //   = 1056000000 // 1580 = 668354
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c")).toDF("doc_id", "text")
    val out = TextAnalysis
      .bm25Scores(docs, "text", "doc_id", Seq("a", "b"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out == Map(1L -> (796981L + 1585585L), 2L -> 668354L, 3L -> 0L))
  }

  test("bm25Scores: guards reject empty, duplicate, and oversized term sets") {
    import spark.implicits._
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](TextAnalysis.bm25Scores(docs, "text", "doc_id", Seq.empty))
    intercept[IllegalArgumentException](TextAnalysis.bm25Scores(docs, "text", "doc_id", Seq("a", "a")))
    intercept[IllegalArgumentException](
      TextAnalysis.bm25Scores(docs, "text", "doc_id", (1 to 65).map(i => s"t$i")))
  }

  test("kmeansAssign: tie to smaller centroid id, round-2 update flips the boundary point") {
    import spark.implicits._
    // 1-D geometry embedded in dim 2. Seeds: id0 at 0, id50 at 20.
    // Low-side mass at 8, 9 pulls centroid A to 17/3 after round 1;
    // id9 at 10.5 starts closer to B (90.25 < 110.25) but flips to A
    // in round 2 (23.36 < 50.77). id10 at exactly 10 is equidistant
    // in round 1 — the tie must go to the smaller centroid id.
    val pts = Seq(
      (0L, Seq(0f, 0f)),
      (50L, Seq(20f, 0f)),
      (1L, Seq(20f, 0f)),
      (2L, Seq(20f, 0f)),
      (3L, Seq(8f, 0f)),
      (4L, Seq(9f, 0f)),
      (9L, Seq(10.5f, 0f))
    ).toDF("vec_id", "embedding")
    val seed = col("vec_id").isin(0L, 50L)
    val r1 = Similarity
      .kmeansAssign(pts, "vec_id", "embedding", seed, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(0L -> 0L, 3L -> 0L, 4L -> 0L, 9L -> 50L, 1L -> 50L, 2L -> 50L, 50L -> 50L))
    val r2 = Similarity
      .kmeansAssign(pts, "vec_id", "embedding", seed, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(0L -> 0L, 3L -> 0L, 4L -> 0L, 9L -> 0L, 1L -> 50L, 2L -> 50L, 50L -> 50L))

    val tie = pts.union(Seq((10L, Seq(10f, 0f))).toDF("vec_id", "embedding"))
    val rt = Similarity
      .kmeansAssign(tie, "vec_id", "embedding", seed, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rt(10L) == 0L, "equidistant point must pick the smaller centroid id")
  }

  test("kmeansAssign: empty seed set is rejected") {
    import spark.implicits._
    val pts = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](
      Similarity.kmeansAssign(pts, "vec_id", "embedding", col("vec_id") < 0, rounds = 1))
  }

  test("maxTokenRun: hand cases — runs, non-adjacent repeats, single token, empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"), //       run of 3
      (2L, "a b a b a"), //     alternating: never adjacent -> 1
      (3L, "x"), //             single token -> 1
      (4L, "b b c c c c a"), // best run is the c block -> 4
      (5L, "") //               split("") = [""] -> one run of 1
    ).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"), operators.TextAnalysis.maxTokenRun(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 1L))
  }

  test("phraseMatch: alignment counts, overlap, conjunctive-only zero, short-doc guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"), // two alignments of "a b"
      (2L, "b a"), //       both terms present, never adjacent -> 0
      (3L, "x y"), //       missing terms -> filtered out entirely
      (4L, "a b") //        exactly the phrase -> 1
    ).toDF("doc_id", "text")
    val out = operators.TextAnalysis
      .phraseMatch(docs, "text", "doc_id", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 0L, 4L -> 1L))

    // repeated-word phrase: overlapping occurrences each count, and a
    // doc shorter than the phrase survives the (distinct) prefilter
    // but must hit the descending-sequence guard, not throw
    val rep = Seq((1L, "a a a"), (2L, "a")).toDF("doc_id", "text")
    val out2 = operators.TextAnalysis
      .phraseMatch(rep, "text", "doc_id", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == Map(1L -> 2L, 2L -> 0L))

    intercept[IllegalArgumentException](
      operators.TextAnalysis.phraseMatch(docs, "text", "doc_id", Seq("a")))
  }

  test("jlProject: bit-equal to the interpreted decimal fold; norms preserved in expectation") {
    val emb = Tables
      .embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 50)
    val out = operators.Similarity.jlProject(emb, "vec_id", "embedding", 8, 64)
    // parity twin for one output row: the HOF decimal fold with the
    // same md5-parity weights (the contract graft_dot_dec replaces)
    val w3 = (0 until 64).map(p =>
      if (functions.Hashing.h60Local(s"jl_3_$p") % 2 == 0) 1.0 else -1.0)
    val dec = "decimal(28,10)"
    val twin = emb.select(
      col("vec_id"),
      aggregate(
        zip_with(col("embedding"), typedLit(w3), (x, wv) => (x.cast("double") * wv).cast(dec)),
        lit(0).cast(dec),
        (a, v) => (a + v).cast(dec)).cast("double").as("t"))
    out.select(col("vec_id"), col("y3")).join(twin, "vec_id").collect().foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"vec ${r.getLong(0)}")
    }
    // JL contract: E||y||^2 = k*||x||^2 for +-1 rows — the mean ratio
    // over 50 fixture vectors should sit near 1
    val rows = out
      .join(operators.Similarity.withSqNorm(emb, "embedding").select(col("vec_id"), col("sq_norm")), "vec_id")
      .collect()
    val ratios = rows.map { r =>
      val y2 = (1 to 8).map(i => math.pow(r.getDouble(i), 2)).sum
      y2 / (8.0 * r.getAs[Double]("sq_norm"))
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"norm-preservation ratio drifted: $mean")
  }

  test("hllDistinct: duplicate-insensitive, within the m=64 error envelope, replay-exact") {
    import spark.implicits._
    val keys = (1 to 2000).map(i => ("g", s"key_$i")) ++ (1 to 50).map(i => ("h", s"other_$i"))
    val df = keys.toDF("grp", "k")
    val est = operators.Relational.hllDistinct(df, "grp", "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // raw-regime group: 2000 distinct, sigma ~ 1.04/sqrt(64) = 13% — allow 3 sigma
    assert(math.abs(est("g") - 2000) / 2000.0 < 0.4, s"estimate drifted: ${est("g")}")
    // duplicates must not move a register: the sketch of df UNION df
    // is bit-identical (max of the same ranks)
    val dup = operators.Relational.hllDistinct(df.union(df), "grp", "k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dup == est)
    // driver-side replay of the register algebra (same md5 hash path)
    val ranks = keys.filter(_._1 == "g").map { case (_, k) =>
      val h = functions.Hashing.h60Local(k)
      (h % 64, { val w = h / 64; if (w == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w)) })
    }
    val regs = (0L until 64L).map(r => ranks.filter(_._1 == r).map(_._2).foldLeft(0)(math.max))
    val mx = regs.max
    val num = regs.map(m => 1L << (mx - m)).sum
    val expect = 0.709 * 4096.0 * (1L << mx).toDouble / num.toDouble
    assert(est("g") == expect)
  }

  test("mergeAggStates: merge ≡ recompute, associative, single-side keys pass through") {
    import spark.implicits._
    val df = Seq(("a", 1.5), ("a", 2.25), ("b", -3.0), ("c", 7.0), ("a", 0.125))
      .toDF("k", "v")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    val full = operators.Relational.aggState(df, Seq("k"), "v")
    val s1 = df.filter(col("v") >= 2.0) // a:2.25, c:7 — c exists ONLY here
    val s2 = df.filter(col("v") < 2.0 && col("k") === "a")
    val s3 = df.filter(col("v") < 2.0 && col("k") =!= "a")
    def st(d: org.apache.spark.sql.DataFrame) = operators.Relational.aggState(d, Seq("k"), "v")
    val m12 = operators.Relational.mergeAggStates(st(s1), st(s2), Seq("k"))
    val m123 = operators.Relational.mergeAggStates(m12, st(s3), Seq("k"))
    val m321 = operators.Relational.mergeAggStates(
      st(s3), operators.Relational.mergeAggStates(st(s2), st(s1), Seq("k")), Seq("k"))
    // normalize the decimal sum to double for set compare (aggState's
    // first-level sum is decimal(38,10), merged re-casts to (28,10))
    def norm(d: org.apache.spark.sql.DataFrame) =
      rows(d.select(col("k"), col("n").cast("long"), col("sum_v").cast("double"), col("min_v"), col("max_v")))
    assert(norm(m123) == norm(full))
    assert(norm(m321) == norm(full))
  }

  test("Expectations.report: hand verdicts — nulls, fractional thresholds, both directions") {
    import spark.implicits._
    import operators.Expectations
    import operators.Expectations._
    val df = Seq(
      (Some("a"), Some(1L)),
      (Some("a"), Some(2L)),
      (Some("b"), None: Option[Long]),
      (None: Option[String], Some(5L))
    ).toDF("k", "v")
    val out = Expectations
      .report(df, Seq(
        NotNull("k_nn_3of4", "k", 3, 4), //    3/4 ≥ 3/4 → pass at the boundary
        NotNull("k_nn_all", "k"), //           3/4 < 1   → fail
        Unique("k_half_unique", "k", 1, 2), // 2 distinct / 4 rows ≥ 1/2 → pass
        InSet("k_mostly_a", "k", Seq("a"), 1, 2), // 2/4 ≥ 1/2 → pass
        Bounded("v_in_1_4", "v", 1.0, 4.0) //  1,2 in bounds; null+5 out → 2/4 fail
      ))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out("k_nn_3of4") == ((3L, 4L, true)))
    assert(out("k_nn_all") == ((3L, 4L, false)))
    assert(out("k_half_unique") == ((2L, 4L, true)))
    assert(out("k_mostly_a") == ((2L, 4L, true)))
    assert(out("v_in_1_4") == ((2L, 4L, false)))
    intercept[IllegalArgumentException](Expectations.report(df, Seq.empty))
    intercept[IllegalArgumentException](
      Expectations.report(df, Seq(NotNull("x", "k"), NotNull("x", "v"))))
  }

  test("kmeansAssign: matches a driver-side double replay on seeded random points") {
    import spark.implicits._
    // Values are small integers scaled by 1/4 — exactly representable
    // in float, double AND decimal(28,10), so the operator's decimal
    // path and this double replay compute identical distances.
    val rnd = new scala.util.Random(11)
    val pts = (0L until 60L).map(i => (i, Seq.fill(4)(rnd.nextInt(41).toFloat / 4f)))
    val df = pts.toDF("vec_id", "embedding")
    val out = Similarity
      .kmeansAssign(df, "vec_id", "embedding", col("vec_id") % 20 === 0, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replay: rational centroids (n, sum), dist = sum((n·x − s)²)/n²
    var cents: Map[Long, (Long, Seq[Double])] =
      pts.filter(_._1 % 20 == 0).map { case (id, v) => id -> ((1L, v.map(_.toDouble))) }.toMap
    var assign: Map[Long, Long] = Map.empty
    for (r <- 1 to 3) {
      assign = pts.map { case (id, v) =>
        val best = cents.toSeq.map { case (cid, (n, s)) =>
          val d = v.zip(s).map { case (x, si) => val t = n * x.toDouble - si; t * t }.sum / (n.toDouble * n)
          (d, cid)
        }.min
        id -> best._2
      }.toMap
      if (r < 3) {
        cents = assign.groupBy(_._2).map { case (cid, m) =>
          val members = m.keys.toSeq.map(id => pts(id.toInt)._2.map(_.toDouble))
          cid -> ((members.size.toLong, members.transpose.map(_.sum)))
        }
      }
    }
    assert(out == assign)
  }

  // ------------------------------------------------- classifier filter

  /** Driver-side h32-bucket replica (Hashing.h32's md5 derivation). */
  private def bucketOf(bigram: String, buckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bigram.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % buckets).toInt
  }

  test("classifierKeepRule: hand-computed integer scores and verdicts") {
    import spark.implicits._
    val buckets = 16
    // doc 1 "x y" → one bigram "x y"; doc 2 "x" → no bigram;
    // doc 3 "x y z" → bigrams "x y", "y z"; doc 4 null text.
    val bXY = bucketOf("x y", buckets)
    val bYZ = bucketOf("y z", buckets)
    val w = Array.fill(buckets)(0L)
    w(bXY) = 5L
    if (bYZ != bXY) w(bYZ) = -2L
    val wXY = w(bXY); val wYZ = w(bYZ)
    val docs = Seq(
      (1L, "x y"), (2L, "x"), (3L, "x y z"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis
      .classifierKeepRule(docs, "text", "doc_id", w, biasMicro = -1L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // doc1: raw=w(xy), n=1 → score w(xy)−1
    assert(out(1L) == ((wXY - 1L, 1L, wXY - 1L > 0)))
    // doc2/doc4: no bigrams → score 0, not kept (too short to judge)
    assert(out(2L) == ((0L, 0L, false)))
    assert(out(4L) == ((0L, 0L, false)))
    // doc3: raw=w(xy)+w(yz), n=2 → score raw−2
    assert(out(3L) == ((wXY + wYZ - 2L, 2L, wXY + wYZ - 2L > 0)))
  }

  test("classifierKeepRule: checked-in model distills the q26 marker verdict (non-vacuous)") {
    val (bias, w) = TextAnalysis.qualityClassifier
    assert(w.length == 1024 && w.exists(_ != 0L))
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.classifierKeepRule(docs, "text", "doc_id", w, bias)
    // the q26-style distillation target, engine-side
    val tgt = docs.select(
      col("doc_id"),
      (TextAnalysis.cjkCount(col("text")) === 0L &&
        !(TextAnalysis.markerHits(col("text"), TextAnalysis.markers("de")) >= TextAnalysis.markerHits(col("text"), TextAnalysis.markers("en")) &&
          TextAnalysis.markerHits(col("text"), TextAnalysis.markers("de")) >= TextAnalysis.markerHits(col("text"), TextAnalysis.markers("es")) &&
          TextAnalysis.markerHits(col("text"), TextAnalysis.markers("de")) >= TextAnalysis.markerHits(col("text"), TextAnalysis.markers("fr"))) &&
        TextAnalysis.markerHits(col("text"), TextAnalysis.markers("en")) >= TextAnalysis.markerHits(col("text"), TextAnalysis.markers("es")) &&
        TextAnalysis.markerHits(col("text"), TextAnalysis.markers("en")) >= TextAnalysis.markerHits(col("text"), TextAnalysis.markers("fr"))).as("tgt"))
    val joined = out.join(tgt, Seq("doc_id")).select(col("keep"), col("tgt")).collect()
    val n = joined.length
    val agree = joined.count(r => r.getBoolean(0) == r.getBoolean(1))
    val kept = joined.count(_.getBoolean(0))
    // both classes present (anti-vacuity) and distillation holds well
    // above chance on docs the trainer never saw (sf0.001 ≠ sf0.01)
    assert(kept > 0 && kept < n, s"one-sided verdict: $kept/$n")
    assert(agree * 100 >= n * 75, s"distillation agreement ${agree * 100 / n}% < 75%")
  }
}
