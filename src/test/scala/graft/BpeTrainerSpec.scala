package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BpeTokens
import graft.operators.BpeTrainer

/** In-engine distributed BPE training: the decisive gate is
  * CROSS-IMPLEMENTATION equality — the engine-trained merge table
  * over the sf0.01 corpus must equal `graft/bpe_merges.txt`, the
  * checked-in artifact produced by `tools/make_bpe.py` (an
  * independently written python trainer). Plus hand cases for the
  * greedy recurrence, tie-breaks, the min-count stop, and the
  * control-char skip.
  */
class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, appName = "bpe-trainer-spec")

  test("hand case: counts, greedy order, and the non-overlapping fold") {
    import spark.implicits._
    // "aaab" x2, "ab" x1: pairs (a,a) c=4, (a,b) c=3.
    // merge1 = (a,a): "aaab" -> [aa, a, b] (LEFT-TO-RIGHT NON-OVERLAP).
    // then pairs: (aa,a) c=2, (a,b) c=3 -> merge2 = (a,b).
    // then: (aa,ab) c=2 -> merge3; then (aaab? ) "aaab"->[aaab] x2,
    // "ab"->[ab]: no pair with c>=2 -> stop.
    val docs = Seq("aaab aaab ab").toDF("text")
    val got = BpeTrainer.train(docs, "text", nMerges = 10)
    assert(got == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("tie-break: equal counts pick the lexicographically smallest (l, r)") {
    import spark.implicits._
    // "xy" x2 and "ab" x2: both pairs count 2 -> (a,b) first (l ASC),
    // then (x,y).
    val docs = Seq("xy ab xy ab").toDF("text")
    val got = BpeTrainer.train(docs, "text", nMerges = 2)
    assert(got == Seq(("a", "b"), ("x", "y")))
  }

  test("stop conditions: min pair count and empty corpus") {
    import spark.implicits._
    // every word unique, every pair count 1 -> zero merges at the
    // default minPairCount = 2
    assert(BpeTrainer.train(Seq("ab cd ef").toDF("text"), "text", 5) == Seq.empty)
    // null/empty text -> no words -> no merges
    assert(BpeTrainer.train(
      Seq(null.asInstanceOf[String], "").toDF("text"), "text", 5) == Seq.empty)
    // minPairCount = 1 admits singletons
    assert(BpeTrainer.train(Seq("ab ab cd").toDF("text"), "text", 1, minPairCount = 1L)
      == Seq(("a", "b")))
  }

  test("control-char pairs are skipped (kernel pair-key contract)") {
    import spark.implicits._
    // words "a\u0001b" x2: pairs (a, U+0001) and (U+0001, b) both
    // count 2 but contain a control char -> ineligible; (z,z) trains
    val docs = Seq("a\u0001b a\u0001b zz zz").toDF("text")
    val got = BpeTrainer.train(docs, "text", nMerges = 4)
    assert(got == Seq(("z", "z")))
  }

  test("cross-implementation: engine training reproduces the python-trained fixture on sf0.01") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val got = BpeTrainer.train(docs, "text", nMerges = BpeTokens.merges.length)
    assert(
      got == BpeTokens.merges.toSeq,
      s"first divergence at rank ${got.zip(BpeTokens.merges).indexWhere { case (a, b) => a != b }}")
  }

  test("cross-implementation, BYTE alphabet: engine training reproduces make_bpe.py --bytes on sf0.01") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val got = BpeTrainer.train(
      docs, "text", nMerges = BpeTokens.bytesMerges.length, byteAlphabet = true)
    assert(
      got == BpeTokens.bytesMerges.toSeq,
      s"first divergence at rank ${got.zip(BpeTokens.bytesMerges).indexWhere { case (a, b) => a != b }}")
  }

  test("arm equality: incremental delta counts ≡ full re-aggregate (both alphabets, sf0.001)") {
    // the r12 incremental pair-count maintenance must be bit-equal to
    // the full per-round recount (GRAFT_BPE_INCR=off arm) — including
    // the subtle path where a pair's count RISES later because two
    // merge paths produce the same symbol string
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    for (byteMode <- Seq(false, true)) {
      val full = BpeTrainer.train(docs, "text", 24, byteAlphabet = byteMode, incremental = Some(false))
      val incr = BpeTrainer.train(docs, "text", 24, byteAlphabet = byteMode, incremental = Some(true))
      assert(
        incr == full,
        s"byteMode=$byteMode first divergence at rank ${incr.zip(full).indexWhere { case (a, b) => a != b }}")
    }
  }

  test("arm equality: same-string symbol from two merge paths (count rises after threshold)") {
    import spark.implicits._
    // 'abc' can arise as (a)(bc) or (ab)(c); the incremental table must
    // credit BOTH paths to the same (x, abc)-style string keys exactly
    // as a recount would. Corpus engineered so merges pass through both.
    val docs = Seq("abc abc abc xab xab cy cy bc bc bc bc ab ab ab").toDF("text")
    val full = BpeTrainer.train(docs, "text", 8, minPairCount = 1L, incremental = Some(false))
    val incr = BpeTrainer.train(docs, "text", 8, minPairCount = 1L, incremental = Some(true))
    assert(incr == full)
  }

  test("local arm: hand cases (greedy order, tie-break, stops, control-char skip)") {
    import spark.implicits._
    def loc(corpus: String, m: Int, minC: Long = 2L) =
      BpeTrainer.train(Seq(corpus).toDF("text"), "text", m, minPairCount = minC,
        local = Some(true))
    assert(loc("aaab aaab ab", 10) == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    assert(loc("xy ab xy ab", 2) == Seq(("a", "b"), ("x", "y")))
    assert(loc("ab cd ef", 5) == Seq.empty)
    assert(loc("ab ab cd", 1, minC = 1L) == Seq(("a", "b")))
    assert(loc("ab ab zz zz", 4) == Seq(("z", "z")))
  }

  test("local arm cross-implementation: reproduces the python-trained fixture on sf0.01") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val got = BpeTrainer.train(
      docs, "text", nMerges = BpeTokens.merges.length, local = Some(true))
    assert(
      got == BpeTokens.merges.toSeq,
      s"first divergence at rank ${got.zip(BpeTokens.merges).indexWhere { case (a, b) => a != b }}")
  }

  test("arm equality: driver-side local arm ≡ full recount at 512 merges (byte alphabet, sf0.001)") {
    // the r12 verdict's production-vocab ask: the local arm must stay
    // bit-equal to the distributed recurrence DEEP into the merge
    // sequence — 512 merges, byte alphabet (the production form),
    // minPairCount 1 so exhaustion doesn't cut the sequence short.
    // The real sf0.001 corpus exhausts at 127 merges (measured — the
    // fixture vocabulary is deliberately small), so the corpus here is
    // the ScaleCheck bigVocabCorpus construction at 3000 DISTINCT
    // deterministic hex words: rich enough for 512+, vocab-sized
    // rounds cheap enough for the suite. Covers rise-after-threshold,
    // tie-breaks in the U+0100..U+01FF mapped alphabet, and the lazy
    // heap's stale-entry discipline over a long sequence.
    val docs = spark
      .range(3000)
      .select(
        concat_ws(
          " ",
          array_repeat(
            substring(md5(col("id").cast("string")), lit(1), (pmod(col("id"), lit(8)) + 8).cast("int")),
            (lit(1) + pmod(col("id"), lit(3))).cast("int")))
          .as("text"))
    val full = BpeTrainer.train(
      docs, "text", 512, minPairCount = 1L, byteAlphabet = true,
      incremental = Some(false), local = Some(false))
    val loc = BpeTrainer.train(
      docs, "text", 512, minPairCount = 1L, byteAlphabet = true, local = Some(true))
    assert(
      loc == full,
      s"length loc=${loc.length} full=${full.length}; first divergence at rank " +
        s"${loc.zip(full).indexWhere { case (a, b) => a != b }}")
    assert(loc.length >= 512, s"corpus exhausted early (${loc.length}) — deepen the fixture")
  }

  test("local arm: observed-vocabulary guard refuses an over-ceiling collect") {
    import spark.implicits._
    // the guard trips on the OBSERVED count BEFORE any collect (the
    // Relational.scala pre-collect-count idiom) — drive trainLocal
    // with a reported vocabulary one past the ceiling
    val words = Seq((2L, Seq("a", "b"))).toDF("n", "syms")
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.trainLocal(words, 1, 2L, BpeTrainer.LocalVocabCeil + 1)
    }
    assert(e.getMessage.contains("driver-collect ceiling"))
    assert(e.getMessage.contains("GRAFT_BPE_LOCAL=off"))
    // and the positive path: explicit local on a tiny corpus trains
    assert(BpeTrainer.train(Seq("ab ab").toDF("text"), "text", 1, local = Some(true))
      == Seq(("a", "b")))
  }

  test("byte alphabet: base symbols are the chr(256+b) mapping of the UTF-8 bytes") {
    import spark.implicits._
    // 'İ' (U+0130) is 2 UTF-8 bytes (C4 B0): pre-token "İİ" has 4 byte
    // symbols; merging trains on the mapped alphabet
    val docs = Seq("İİ İİ").toDF("text")
    val got = BpeTrainer.train(docs, "text", nMerges = 1, byteAlphabet = true)
    assert(got.size == 1)
    val (l, r) = got.head
    assert((l + r).forall(c => c >= 0x100 && c <= 0x1FF), s"unmapped symbols in ($l,$r)")
  }
}
