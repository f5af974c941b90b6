package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HtmlExtract

/** Hand cases for the HTML→text extraction operator (q178's engine
  * side): entity decode ORDER, boilerplate thresholds at their exact
  * boundaries, script/style/comment removal, and defined
  * malformed-markup behavior. The cross-engine behavior is pinned by
  * q178's DuckDB-oracle hash gate; these cases pin the CONTRACT so a
  * refactor that shifts a threshold or reorders decoding fails with a
  * named reason.
  */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(2, appName = "html-extract-spec")

  private def run(html: String, minLen: Int = 25, linkPct: Int = 30) = {
    import spark.implicits._
    HtmlExtract
      .extractText(Seq(html).toDF("html"), "html", minLen, linkPct)
      .select("text", "n_blocks", "n_short", "n_linky")
      .collect()
      .head
  }

  test("entity decode order: &amp; decodes LAST, so &amp;lt; yields literal &lt;") {
    val row = run(
      "<p>&amp;lt; stays literal and &lt;tag&gt; decodes here with &quot;q&quot; &#39;a&#39; &nbsp;&copy; padding words</p>")
    assert(row.getString(0) ===
      "&lt; stays literal and <tag> decodes here with \"q\" 'a'  © padding words")
  }

  test("script, style, and comments never leak — even with block tags inside") {
    val row = run(
      "<style>p {x:1}</style><script>if (a<b) { hide(); }</script>" +
        "<!-- secret <p>comment paragraph</p> -->" +
        "<p>only this paragraph survives the removal passes</p>")
    assert(row.getString(0) === "only this paragraph survives the removal passes")
    assert(row.getLong(1) === 1L) // one visible block
  }

  test("short threshold is exact: 24 visible chars drop, 25 keep") {
    val keep25 = "a" * 25
    val drop24 = "b" * 24
    val row = run(s"<p>$keep25</p><p>$drop24</p>")
    assert(row.getString(0) === keep25)
    assert(row.getLong(1) === 2L && row.getLong(2) === 1L && row.getLong(3) === 0L)
  }

  test("link-density threshold is exact at linkChars*100 >= visibleLen*30") {
    // 30 visible chars; 9 link chars → 900 >= 900 → linky (dropped)
    val linky = "<p><a href=\"/x\">123456789</a>" + "c" * 21 + "</p>"
    // 8 link chars → 800 < 900 → kept
    val kept = "<p><a href=\"/x\">12345678</a>" + "d" * 22 + "</p>"
    val row = run(linky + kept)
    assert(row.getString(0) === "12345678" + "d" * 22)
    assert(row.getLong(3) === 1L, "exactly the 9/30 block is linky")
  }

  test("malformed markup is defined: unterminated < stays literal, <br/> splits blocks") {
    val row = run(
      "<p>an unterminated < bracket stays right here in the text</p>" +
        "<p>" + "x" * 30 + "<br/>" + "y" * 30 + "</p>")
    assert(row.getString(0) ===
      "an unterminated < bracket stays right here in the text\n" +
        "x" * 30 + "\n" + "y" * 30)
    assert(row.getLong(1) === 3L)
  }

  test("nested anchors count once, inline tags inside anchors are stripped for density") {
    // anchor inner "<b>12345</b>6789" strips to 9 link chars of 30 → linky
    val row = run("<p><a href=\"/\"><b>12345</b>6789</a>" + "z" * 21 + "</p>")
    assert(row.getLong(3) === 1L)
    assert(row.getString(0) === "")
  }
}
