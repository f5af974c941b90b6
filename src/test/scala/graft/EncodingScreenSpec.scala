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
}
