package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BpeTokens

/** The merge-rank BPE kernel (q167/q168): fixture sanity, hand-traced
  * merge sequences, a driver-side reference replay over random words
  * (same greedy lowest-rank + left-to-right fold contract the DuckDB
  * oracle implements), code-point alphabet edges (astral, combining,
  * unseen chars), and SQL-registration + codegen plumbing.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, appName = "bpe-spec")

  /** Driver-side reference: the same loop, independently written. */
  private def refEncode(word: String): List[String] = {
    val ranks = BpeTokens.merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    var syms = {
      val b = List.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cc = Character.charCount(word.codePointAt(i))
        b += word.substring(i, i + cc)
        i += cc
      }
      b.result()
    }
    var done = false
    while (!done && syms.size > 1) {
      val cands = syms.zip(syms.tail).flatMap(p => ranks.get(p))
      if (cands.isEmpty) done = true
      else {
        val (l, r) = BpeTokens.merges(cands.min)
        val out = List.newBuilder[String]
        var rest = syms
        while (rest.nonEmpty) {
          rest match {
            case a :: b :: t if a == l && b == r => out += (l + r); rest = t
            case a :: t => out += a; rest = t
            case Nil => ()
          }
        }
        syms = out.result()
      }
    }
    syms
  }

  private def enc(word: String): Seq[String] = {
    import spark.implicits._
    Seq(word)
      .toDF("w")
      .select(call_function("graft_bpe", col("w")).as("t"))
      .collect()(0)
      .getSeq[String](0)
  }

  test("fixture loads: at least 16 merges, none containing control chars or tabs") {
    assert(BpeTokens.merges.length >= 16)
    BpeTokens.merges.foreach { case (l, r) =>
      assert((l + r).forall(c => c >= ' '), s"control char in merge ($l,$r)")
      assert(l.nonEmpty && r.nonEmpty)
    }
  }

  test("hand cases against the fixture's own merge ranks") {
    // empty + single chars: nothing to merge
    assert(enc("") == Seq.empty)
    assert(enc("a") == Seq("a"))
    assert(enc("Z") == Seq("Z")) // unseen char stays a single token
    // every corpus word reproduces the trainer's final state shape:
    // token concatenation restores the word
    for (w <- Seq("customer", "data", "fast", "agg", "the", "join")) {
      val t = enc(w)
      assert(t.mkString == w, s"$w -> $t")
      assert(t == refEncode(w), s"$w: kernel ${t} != reference ${refEncode(w)}")
    }
  }

  test("matches the driver-side reference on random words over the merge alphabet") {
    val alpha = "abcdefghijklmnopqrstuvwxyz "
    val rnd = new scala.util.Random(10101)
    val words = Seq.fill(300)((1 to (1 + rnd.nextInt(12))).map(_ => alpha(rnd.nextInt(alpha.length - 1))).mkString) ++
      Seq("joinjoin", "hashhash", "thethethe", "aaaa", "scanscan", "xyzzy")
    import spark.implicits._
    val got = words
      .toDF("w")
      .select(col("w"), call_function("graft_bpe", col("w")).as("t"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList)
    got.foreach { case (w, t) =>
      assert(t == refEncode(w), s"$w: kernel $t != reference ${refEncode(w)}")
      assert(t.mkString == w, s"$w: tokens don't reassemble")
    }
  }

  test("code-point alphabet: astral and combining chars segment like the oracle's string_split") {
    // U+1D11E (astral, surrogate pair in UTF-16) must be ONE symbol;
    // e + combining acute are TWO code points hence two symbols.
    assert(enc("a𝄞b") == Seq("a", "𝄞", "b"))
    assert(enc("é") == Seq("e", "́"))
    // unseen chars interleaved with mergeable ones: merges still fire
    val t = enc("Xthe")
    assert(t.head == "X" && t.mkString == "Xthe")
    assert(t == refEncode("Xthe"))
  }

  test("null text is null; kernel runs inside whole-stage codegen") {
    // range source, not a local Seq: ConvertToLocalRelation would fold
    // a literal projection at plan time and the assert would inspect a
    // LocalTableScan instead of the generated stage.
    val df = spark
      .range(2)
      .select(when(col("id") === 0, lit("data")).otherwise(lit(null)).as("w"))
      .select(call_function("graft_bpe", col("w")).as("t"))
    val rows = df.orderBy(col("t").desc_nulls_last).collect()
    assert(rows(0).getSeq[String](0).nonEmpty && rows(1).isNullAt(0))
    // `*(n)` is the WholeStageCodegen stage marker in the compact plan
    // string — the projection carrying graft_bpe must sit inside one.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"graft_bpe fell out of codegen:\n$plan")
  }
}
