package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Hand cases for the UTF-8/mojibake screen (q179): each classic
  * double-encode artifact fires EXACTLY its width class, clean
  * accented text does NOT fire (the false-positive guard), and the
  * U+FFFD count is per replacement char. The artifacts are built by
  * the same encode-then-misdecode path a real corpus suffers, not by
  * hand-picking code points.
  */
class EncodingScreenSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(2, appName = "encoding-screen-spec")

  private def diag(text: String): (Long, Long, Long, Long, Boolean) = {
    import spark.implicits._
    val r = Seq(text)
      .toDF("text")
      .select(TextAnalysis.encodingDiagnostics(col("text")): _*)
      .collect()
      .head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
  }

  private def moji(s: String, cs: String): String = new String(s.getBytes("UTF-8"), cs)

  test("latin-1 double-encode of 2-byte chars fires moji2 only") {
    // three é's (café + résumé×2) → three Ã© signatures
    val (repl, m2, m3, m4, sus) = diag(moji("café résumé", "ISO-8859-1"))
    assert((repl, m2, m3, m4, sus) === ((0L, 3L, 0L, 0L, true)))
  }

  test("cp1252 double-encode of 3-byte chars (smart quote, em dash) fires moji3") {
    val (repl, m2, m3, m4, sus) = diag(moji("it’s — fine", "windows-1252"))
    assert(m3 === 2L && repl === 0L && sus)
  }

  test("latin-1 double-encode of astral emoji fires moji4") {
    val (_, _, _, m4, sus) = diag(moji("go 🚀 now", "ISO-8859-1"))
    assert(m4 === 1L && sus)
  }

  test("the Â-nbsp artifact fires moji2") {
    val (_, m2, _, _, _) = diag(moji("a\u00A0b", "ISO-8859-1"))
    assert(m2 === 1L)
  }

  test("false-positive guard: clean accented text and lead-range chars before ASCII stay silent") {
    for (clean <- Seq("café résumé naïve", "Ã la carte Ã propos", "straße örtlich", "深度学习")) {
      val (repl, m2, m3, m4, sus) = diag(clean)
      assert(
        (repl, m2, m3, m4, sus) === ((0L, 0L, 0L, 0L, false)),
        s"false positive on clean text: $clean")
    }
  }

  test("U+FFFD counts per replacement char") {
    val (repl, _, _, _, sus) = diag("a � b �� c")
    assert(repl === 3L && sus)
  }

  private def repair(text: String): (String, Boolean) = {
    import spark.implicits._
    val r = Seq(text)
      .toDF("text")
      .select(TextAnalysis.mojibakeRepair(col("text")): _*)
      .collect()
      .head
    (r.getString(0), r.getBoolean(1))
  }

  test("repair: latin-1 and cp1252 double-encodes round-trip back to the original") {
    for (orig <- Seq("caf\u00e9 r\u00e9sum\u00e9 na\u00efve", "it\u2019s \u2014 fine", "rocket \ud83d\ude80 launch", "a\u00a0b")) {
      for (cs <- Seq("ISO-8859-1", "windows-1252")) {
        val g = new String(orig.getBytes("UTF-8"), cs)
        val (rep, fixed) = repair(g)
        assert(rep === orig, s"$cs failed to invert: ${g.take(40)}")
        assert(fixed)
      }
    }
  }

  test("repair: clean text, mixed scripts, and malformed sequences pass through unchanged") {
    for (clean <- Seq(
        "caf\u00e9 r\u00e9sum\u00e9 na\u00efve", // legit accents: lead char + ASCII -> ineligible
        "\u00c3 la carte \u00c3 propos", // lead-range chars before ASCII
        "\u6df1\u5ea6\u5b66\u4e60 spark", // real CJK -> unmappable -> ineligible
        "caf\u00c3\u00a9 next to \u4e2d\u6587", // mojibake MIXED with CJK -> whole-doc scope skips
        "\u00e0\u0080\u0080", // E0 80 80: OVERLONG 3-byte -> ineligible
        "\u00ed\u00a0\u0080", // ED A0 80: UTF-16 surrogate -> ineligible
        "\u00c3", // truncated: lead with no continuation
        "")) {
      val (rep, fixed) = repair(clean)
      assert(rep === clean && !fixed, s"spurious repair of: $clean")
    }
  }

  test("repair kernel is total: direct call on unmappable input returns it unchanged") {
    import org.apache.spark.unsafe.types.UTF8String
    val in = UTF8String.fromString("emoji 🚀 untouched")
    assert(graft.functions.FixMojibake.repair(in) === in)
  }
}
