package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.KMinValues
import graft.operators.{Dedup, Relational, TextAnalysis}

/** Edge semantics of the round-2 extension operators (salted join,
  * chunking, KMV sketch).
  */
class ExtOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("saltedJoin: result-identical to the plain join on skewed input") {
    import spark.implicits._
    val fact = ((1 to 500).map(_ => (1L, "hot")) ++ (1 to 50).map(i => (i.toLong % 7 + 2, "cold")))
      .toDF("k", "tag")
      .repartition(8)
    val dim = (1 to 9).map(i => (i.toLong, s"d$i")).toDF("k", "dv")
    val plain = fact.join(dim, Seq("k")).groupBy("k", "dv").count()
    val salted = Relational.saltedJoin(fact, dim, Seq("k"), salts = 4).groupBy("k", "dv").count()
    assert(salted.collect().toSet == plain.collect().toSet)
  }

  test("contaminationScreen: exact hit rates, eval self-overlap, short docs clean") {
    import spark.implicits._
    // w0..w9 gives 8 distinct 3-grams; doc 2 (w0..w5) has 4 grams, all
    // of them in doc 1's set. doc 3 is disjoint; doc 4 is shorter
    // than n.
    val corpus = Seq(
      (1L, (0 to 9).map(i => s"w$i").mkString(" ")), // the eval doc itself
      (2L, (0 to 5).map(i => s"w$i").mkString(" ")), // subset: all 4 grams hit
      (3L, "x y z q r s"), //                           disjoint: 0 hits
      (4L, "a b") //                                    < n words: 0 grams
    ).toDF("doc_id", "text")
    val evalSet = corpus.filter(col("doc_id") === 1L)
    val out = TextAnalysis
      .contaminationScreen(corpus, evalSet, "doc_id", "text", 3, 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) == ((8L, 8L, 1.0, true))) // eval doc: fully contaminated
    assert(out(2L) == ((4L, 4L, 1.0, true))) // subset doc: every gram in eval
    assert(out(3L) == ((4L, 0L, 0.0, false)))
    assert(out(4L) == ((0L, 0L, 0.0, false))) // no grams -> clean, no div-by-zero
  }

  test("collocationLift: exact integer lift, count floor, component counts") {
    import spark.implicits._
    // Tokens: x,y,x,y | x,y,z -> N1=7, c(x)=3 c(y)=3 c(z)=1.
    // Bigrams (multiplicity): "x y","y x","x y" | "x y","y z" -> N2=5,
    // c("x y")=3. lift("x y") = 3*7*7/(5*3*3) = 147/45.
    val docs = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val (scored, release) = TextAnalysis.collocationLiftReleasable(docs, "text", minCount = 2)
    try {
      val out = scored.collect()
      assert(out.length == 1)
      val r = out.head
      assert(r.getString(0) == "x y" && r.getLong(1) == 3L && r.getLong(2) == 3L && r.getLong(3) == 3L)
      assert(r.getDouble(4) == 147.0 / 45.0)
    } finally release() // targeted: drops exactly the two count tables
    val bad = intercept[IllegalArgumentException] {
      TextAnalysis.collocationLift(docs, "text", minCount = 0)
    }
    assert(bad.getMessage.contains("minCount"))
  }

  test("packSequences: greedy fill, overflow opens a bin, shard reset, oversize cap") {
    import spark.implicits._
    // Shard 0 (ids 0,2,4,6): tokens 4,4,3,20(cap 10) with L=10 ->
    // bins 0,0,1,2 (4+4 fits, +3 overflows, capped 10 fills alone).
    // Shard 1 (ids 1,3): tokens 9,2 -> bins 0,1 (state reset per shard).
    def words(k: Int) = (1 to k).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (0L, words(4)), (2L, words(4)), (4L, words(3)), (6L, words(20)),
      (1L, words(9)), (3L, words(2))
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .packSequences(docs, "doc_id", "text", seqLen = 10, nShards = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(0L) == ((0, 4L, 0L)))
    assert(out(2L) == ((0, 4L, 0L)))
    assert(out(4L) == ((0, 3L, 1L)))
    assert(out(6L) == ((0, 10L, 2L))) // 20 tokens capped at seqLen, own bin
    assert(out(1L) == ((1, 9L, 0L)))
    assert(out(3L) == ((1, 2L, 1L)))
  }

  test("saltedJoin: left join keeps unmatched fact rows exactly once") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (99L, "miss")).toDF("k", "tag")
    val dim = Seq((1L, "d1"), (2L, "d2")).toDF("k", "dv")
    val out = Relational.saltedJoin(fact, dim, Seq("k"), salts = 3, joinType = "left")
    assert(out.count() == 3)
    assert(out.filter(col("k") === 99 && col("dv").isNull).count() == 1)
  }

  test("chunk: every char covered, stride/window geometry, short docs get one chunk") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 10), (2L, "y" * 150), (3L, "z" * 151), (4L, "w" * 400))
      .toDF("id", "text")
    val chunks = TextAnalysis.chunk(docs, "text", window = 200, stride = 150)
    val byId = chunks
      .groupBy("id")
      .agg(count(lit(1)).as("n"), sum(length(col("chunk"))).as("chars"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byId(1L)._1 == 1) // len 10  -> 1 chunk
    assert(byId(2L)._1 == 1) // len 150 -> 1 chunk (stride boundary)
    assert(byId(3L)._1 == 2) // len 151 -> second chunk of 1 char
    assert(byId(4L)._1 == 3) // len 400 -> starts 1,151,301
    // doc 4: chunks cover [1,200],[151,350],[301,400] -> lengths 200+200+100
    assert(byId(4L)._2 == 500)
    // overlap: consecutive chunks share window-stride chars
    val c4 = chunks.filter(col("id") === 4).orderBy("chunk_id").select("chunk").as[String].collect()
    assert(c4(0).takeRight(50) == c4(1).take(50))
  }

  test("chunk: empty document yields ZERO chunk rows (descending-sequence guard)") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "a"), (3L, "ab")).toDF("id", "text")
    val chunks = TextAnalysis.chunk(docs, "text", window = 3, stride = 2)
    val byId = chunks.groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byId.contains(1L)) // empty doc: no chunks, no phantom chunk_id -1
    assert(byId(2L) == 1)      // len 1 -> one chunk "a"
    assert(byId(3L) == 1)      // len 2 (== stride) -> one chunk "ab"
    assert(chunks.filter(col("chunk_id") < 0).count() == 0)
  }

  test("charShingles/wordNGrams: texts shorter than the width yield EMPTY arrays") {
    import spark.implicits._
    val df = Seq((0L, ""), (1L, "a"), (2L, "ab"), (3L, "abc"), (4L, "one two"))
      .toDF("id", "t")
      .select(
        col("id"),
        Dedup.charShingles(col("t"), 3).as("sh"),
        Dedup.wordNGrams(col("t"), 2).as("ng"))
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getSeq[String](1).length).toSeq == Seq(0, 0, 0, 1, 5)) // "one two": 7 chars -> 5 shingles
    // "one two" has 2 tokens -> one 2-gram; others have <2 tokens -> none
    assert(rows.map(_.getSeq[String](2).length).toSeq == Seq(0, 0, 0, 0, 1))
    assert(rows(3).getSeq[String](1) == Seq("abc"))
    assert(rows(4).getSeq[String](2) == Seq("one two"))
  }

  test("KMinValues: kth smallest distinct hash, None below k, merge-order invariant") {
    import spark.implicits._
    val kmv = udaf(new KMinValues(4))
    // values with duplicates; distinct = {10,20,30,40,50} -> 4th smallest = 40
    val df = Seq(50L, 10L, 20L, 10L, 30L, 40L, 20L, 50L).toDF("h").repartition(5)
    val kth = df.agg(kmv(col("h"))).collect()(0).getLong(0)
    assert(kth == 40L)
    // below k distinct -> null
    val small = Seq(7L, 7L, 8L).toDF("h")
    assert(small.agg(kmv(col("h"))).collect()(0).isNullAt(0))
  }

  test("ZOrder.zValue: known interleavings, mask wrap, and tile locality") {
    import spark.implicits._
    import graft.functions.ZOrder
    val df = Seq((5L, 3L), (0L, 0L), (7L, 7L), (8L, 0L)).toDF("a", "b")
    val got = df.select(ZOrder.zValue(col("a"), col("b"), 3)).as[Long].collect().toSeq
    // a=5(101)→z bits 0,4; b=3(011)→z bits 1,3 ⇒ 1+16+2+8 = 27
    // a=7,b=7 → all 6 bits ⇒ 63; a=8 masked to 3 bits wraps to 0
    assert(got == Seq(27L, 0L, 63L, 0L))
    // locality: points in the same 2x2 cell share z div 4
    val z = (x: Long, y: Long) =>
      Seq((x, y)).toDF("a", "b").select(ZOrder.zValue(col("a"), col("b"), 3)).as[Long].head()
    assert(z(4, 2) / 4 == z(5, 3) / 4)
    assert(z(4, 2) / 4 != z(4, 4) / 4)
  }

  test("bloomPrefilter: NULL big-side keys are dropped, matching the exact join") {
    import spark.implicits._
    import graft.operators.Relational
    val big = Seq(Some(1L), None, Some(2L), Some(99L)).map(Tuple1(_)).toDF("k")
    val small = Seq(1L, 2L).map(Tuple1(_)).toDF("sk")
    val pruned = Relational.bloomPrefilter(big, "k", small, "sk")
    // NULL never equi-joins, so dropping it agrees with the exact join
    assert(pruned.filter(col("k").isNull).count() == 0)
    val kept = pruned.filter(col("k").isNotNull).collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(2L))
    val joined = big.join(small, col("k") === col("sk")).count()
    val prunedJoined = Relational.bloomPrefilter(big, "k", small, "sk")
      .join(small, col("k") === col("sk")).count()
    assert(joined == prunedJoined)
  }

  test("importanceKeepRule: exact hits/norm, keep iff above corpus target share, no-bigram docs dropped") {
    import spark.implicits._
    // Disjoint a*/b* bigram vocabularies (no hash-bucket collision at
    // 4096 — verdicts below are exact). Target docs 1,2 use a*; doc 3
    // is pure b*; doc 4 mixes; doc 5 has one token (no bigram).
    val corpus = Seq(
      (1L, "a1 a2 a3 a1 a2", true),
      (2L, "a2 a3 a1", true),
      (3L, "b1 b2 b3 b4", false),
      (4L, "a1 a2 b1 b2", false),
      (5L, "solo", false)
    ).toDF("doc_id", "text", "tgt")
    val (out, release) =
      TextAnalysis.importanceKeepRuleReleasable(corpus, "text", "doc_id", col("tgt"), 4096)
    val m = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    release()
    // T=6 of C=12 bigram occurrences are target → threshold share 1/2.
    assert(m(1L) == ((8L, 10L, true))) //  8/10 ≥ 1/2
    assert(m(2L) == ((4L, 4L, true))) //   4/4  ≥ 1/2
    assert(m(3L) == ((0L, 4L, false))) //  0/4  < 1/2
    assert(m(4L) == ((2L, 6L, false))) //  2/6  < 1/2
    assert(!m.contains(5L)) //             no bigram → no evidence row
  }

  test("importanceKeepRule: all-target corpus keeps every document (share ties keep)") {
    import spark.implicits._
    val corpus = Seq((1L, "p q r"), (2L, "s t u v")).toDF("doc_id", "text")
    val (df, release) =
      TextAnalysis.importanceKeepRuleReleasable(corpus, "text", "doc_id", lit(true), 64)
    val out = df.collect()
    release()
    assert(out.length == 2 && out.forall(_.getBoolean(3)))
  }

  test("sourceOverlapKmv: identical sources share the full sketch, disjoint none, multiplicity absorbed") {
    import spark.implicits._
    val corpus = Seq(
      ("sA", "t1 t2 t3 t4 t5"),
      ("sB", "t1 t2 t3 t4 t5"), // same content as sA
      ("sB", "t1 t2 t3 t4 t5"), // duplicate doc — sketch must not change
      ("sC", "u1 u2 u3 u4 u5") //  disjoint vocabulary
    ).toDF("source", "text")
    val (out, release) =
      TextAnalysis.sourceOverlapKmvReleasable(corpus, "text", "source", n = 3, k = 64)
    val m = out.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    release()
    // 5 tokens → 3 distinct 3-shingles, all within k=64.
    assert(m == Map(("sA", "sB") -> 3L))
  }

  test("sourceOverlapKmv: k truncates to the bottom-k, so overlap is capped at k") {
    import spark.implicits._
    val corpus = Seq(
      ("sA", (1 to 20).map(i => s"w$i").mkString(" ")),
      ("sB", (1 to 20).map(i => s"w$i").mkString(" "))
    ).toDF("source", "text")
    val (df, release) =
      TextAnalysis.sourceOverlapKmvReleasable(corpus, "text", "source", n = 3, k = 2)
    val out = df.collect()
    release()
    assert(out.length == 1 && out.head.getLong(2) == 2L)
  }
}
