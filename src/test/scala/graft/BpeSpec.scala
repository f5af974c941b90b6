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

  // ---------------------------------------------------------------- bytes

  /** Driver-side reference for the BYTE kernel: chr(256+b) mapping +
    * the same greedy loop, independently written.
    */
  private def refEncodeBytes(word: String): List[String] = {
    val ranks = BpeTokens.bytesMerges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    var syms = word.getBytes("UTF-8").toList.map(b => (0x100 + (b & 0xFF)).toChar.toString)
    var done = false
    while (!done && syms.size > 1) {
      val cands = syms.zip(syms.tail).flatMap(p => ranks.get(p))
      if (cands.isEmpty) done = true
      else {
        val (l, r) = BpeTokens.bytesMerges(cands.min)
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

  private def encB(word: String): Seq[String] = {
    import spark.implicits._
    Seq(word)
      .toDF("w")
      .select(call_function("graft_bpe_bytes", col("w")).as("t"))
      .collect()(0)
      .getSeq[String](0)
  }

  /** Map a chr(256+b) token back to its raw UTF-8 bytes. */
  private def unmap(tok: String): Array[Byte] =
    tok.map(c => (c - 0x100).toByte).toArray

  test("bytes fixture loads: symbols all chr-mapped at U+0100..U+01FF") {
    assert(BpeTokens.bytesMerges.length >= 16)
    BpeTokens.bytesMerges.foreach { case (l, r) =>
      assert((l + r).forall(c => c >= 0x100 && c <= 0x1FF), s"unmapped symbol in ($l,$r)")
    }
  }

  test("bytes: tokens reassemble to the exact UTF-8 bytes, incl. multi-byte") {
    // U+0130 (2 bytes), astral U+1D11E (4 bytes), combining acute (2
    // bytes), plus plain corpus words — the adversarial-fixture family
    // where code-point counts drift from byte counts.
    for (w <- Seq("customer", "İstanbul", "a𝄞b", "é", " the", "'s", "\n", "")) {
      val t = encB(w)
      val bytes = t.flatMap(unmap).toArray
      assert(
        java.util.Arrays.equals(bytes, w.getBytes("UTF-8")),
        s"${w.getBytes("UTF-8").toList} != reassembled ${bytes.toList} for $w")
      assert(t == refEncodeBytes(w), s"$w: kernel $t != reference ${refEncodeBytes(w)}")
    }
  }

  test("bytes: multi-byte chars are billed at byte granularity, not code points") {
    // U+0130 is one code point but TWO bytes; unseen in merges, each
    // byte stays its own symbol — n_toks 2 where graft_bpe says 1.
    assert(encB("İ").size == 2)
    assert(enc("İ").size == 1)
    // astral: one code point, four bytes
    assert(encB("𝄞").size == 4)
    assert(enc("𝄞").size == 1)
  }

  test("bytes: matches the driver-side reference on random words incl. non-ASCII") {
    val alpha = "abcdefghijklmnopqrstuvwxyz Işé𝄞"
    val rnd = new scala.util.Random(11011)
    val words = Seq.fill(300) {
      val n = 1 + rnd.nextInt(12)
      // build by code point so surrogate pairs never split
      val cps = alpha.codePoints().toArray
      (1 to n).map(_ => new String(Character.toChars(cps(rnd.nextInt(cps.length))))).mkString
    } ++ Seq(" the the", "'s'll", "scan scan", "data,data")
    import spark.implicits._
    val got = words
      .toDF("w")
      .select(col("w"), call_function("graft_bpe_bytes", col("w")).as("t"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList)
    got.foreach { case (w, t) =>
      assert(t == refEncodeBytes(w), s"$w: kernel $t != reference ${refEncodeBytes(w)}")
      assert(java.util.Arrays.equals(t.flatMap(unmap).toArray, w.getBytes("UTF-8")))
    }
  }

  test("pre-tokenizer: GPT-2-style contractions and leading-space words, Java-regex side") {
    import spark.implicits._
    val got = Seq("we'll scan, won't we?  yes\n12x")
      .toDF("s")
      .select(regexp_extract_all(col("s"), lit(BpeTokens.preTokenPattern), lit(0)).as("t"))
      .collect()(0)
      .getSeq[String](0)
      .toList
    assert(
      got == List("we", "'ll", " scan", ",", " won", "'t", " we", "?", "  ", "yes", "\n", "12", "x"),
      got.toString)
    // concatenation restores the input — the pre-tokenizer drops nothing
    assert(got.mkString == "we'll scan, won't we?  yes\n12x")
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

  test("byte kernel: null propagates; runs inside whole-stage codegen") {
    val df = spark
      .range(2)
      .select(when(col("id") === 0, lit("data")).otherwise(lit(null)).as("w"))
      .select(call_function("graft_bpe_bytes", col("w")).as("t"))
    val rows = df.orderBy(col("t").desc_nulls_last).collect()
    assert(rows(0).getSeq[String](0).nonEmpty && rows(1).isNullAt(0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"graft_bpe_bytes fell out of codegen:\n$plan")
  }

  test("runtime-table kernel: graft_bpe_table with the fixture spec ≡ the static kernels") {
    import spark.implicits._
    val charSpec = BpeTokens.mergesSpecOf(BpeTokens.merges.toSeq)
    val byteSpec = BpeTokens.mergesSpecOf(BpeTokens.bytesMerges.toSeq)
    val words = Seq("data", "İstanbul", "the merge", "🚀x", "").toDF("w")
    val diff = words
      .select(
        call_function("graft_bpe", col("w")).as("a"),
        call_function("graft_bpe_table", col("w"), lit(charSpec), lit(false)).as("b"),
        call_function("graft_bpe_bytes", col("w")).as("c"),
        call_function("graft_bpe_table", col("w"), lit(byteSpec), lit(true)).as("d"))
      .filter(col("a") =!= col("b") || col("c") =!= col("d"))
      .count()
    assert(diff === 0L)
  }

  test("runtime-table kernel: a trained table drives tokenization and stays in codegen") {
    // a 2-merge custom table: (a,b)->ab then (ab,c)->abc
    val spec = BpeTokens.mergesSpecOf(Seq(("a", "b"), ("ab", "c")))
    val df = spark
      .range(1)
      .select(lit("abcab").as("w"))
      .select(call_function("graft_bpe_table", col("w"), lit(spec), lit(false)).as("t"))
    assert(df.collect().head.getSeq[String](0) === Seq("abc", "ab"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"graft_bpe_table fell out of codegen:\n$plan")
  }
}
