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
