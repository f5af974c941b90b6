package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction with line/link-density boilerplate removal —
  * the intake stage every web corpus passes before ANY of the text
  * operators here (dedup, quality, tokenization) see a byte. Shape
  * follows the public boilerplate-removal literature (jusText,
  * Kohlschütter et al. 2010 "Boilerpipe"; trafilatura): segment the
  * document into blocks at block-level tags, compute per-block visible
  * length and LINK DENSITY (chars inside <a> / visible chars), and
  * drop short or link-dense blocks — navigation, footers, tag clouds.
  *
  * Deliberately regex-based, in the Java∩RE2 subset the repo's
  * pre-tokenizer already polices, so the DuckDB oracle replays the
  * EXACT pipeline (q178): no DOM parser on either side, malformed
  * markup degrades identically (an unterminated `<` never matches
  * `<[^>]*>` and survives as literal text on both engines).
  *
  * Pipeline (order is load-bearing and part of the contract):
  *  1. drop `<script>`/`<style>` blocks and `<!-- -->` comments
  *     (non-greedy, case-insensitive, DOTALL);
  *  2. rewrite block-level tags (p, div, li, h1-6, tr, br, ...) to
  *     newlines, split into blocks on newline runs;
  *  3. per block: strip remaining (inline) tags, decode the fixed
  *     entity set (&lt; &gt; &quot; &#39; &apos; &nbsp; &copy; with
  *     &amp; LAST — decoding &amp; first would double-decode
  *     `&amp;lt;`), trim — the block's VISIBLE text;
  *  4. link chars = Σ visible length of `<a>...</a>` inner texts
  *     (computed on the raw block, BEFORE inline-tag stripping
  *     destroys the anchors);
  *  5. classify: empty → ignored; visible length < `minLen` → short
  *     (dropped); linkChars·100 ≥ visibleLen·`linkPctMax` → linky
  *     (dropped); else kept. Kept blocks join with '\n'.
  *
  * Scale shape: pure per-row column expressions — no shuffle, no UDF,
  * linear in document length (each regex pass is one scan; the HOF
  * lambdas reference only their own element, so the per-element
  * re-evaluation hazard does not apply). The block array is
  * materialized ONCE per row as a projected column referenced from
  * every output (CollapseProject keeps multi-referenced columns), not
  * rebuilt per output column. Interpreted HOF eval is the cost of
  * oracle-replayability; a native kernel (the `graft_*` pattern) is
  * the drop-in upgrade if extraction ever dominates a profile.
  */
object HtmlExtract {

  /** Pass 1: script/style/comment removal. `(?is)` leads the whole
    * alternation; `\b` keeps `<scripted>` out of scope (ASCII word
    * boundary — identical in Java and RE2 on tag names).
    */
  final val ScriptStylePat: String =
    "(?is)<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>|<!--.*?-->"

  /** Pass 2: block-level tags (opening, closing, or self-closing —
    * `[^>]*` eats the `/` of `<br/>`) become block separators.
    */
  final val BlockTagPat: String =
    "(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|blockquote|pre|section|article|aside|header|footer|nav|form|hr)\\b[^>]*>"

  /** Pass 3: any remaining (inline) tag. Unterminated `<` never
    * matches and stays literal — malformed-markup behavior is defined,
    * not accidental.
    */
  final val InlineTagPat: String = "<[^>]*>"

  /** Anchor inner text (group 1), non-greedy, for link density. */
  final val AnchorPat: String = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** The fixed entity set, decode order load-bearing (&amp; last). */
  final val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&apos;" -> "'",
    "&nbsp;" -> " ",
    "&copy;" -> "©",
    "&amp;" -> "&")

  private def entityDecode(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }

  private def stripTags(c: Column): Column = regexp_replace(c, InlineTagPat, "")

  /** Per-block stats struct: visible text, its length, link chars. */
  private def blockStats(b: Column): Column = {
    val vis = trim(entityDecode(stripTags(b)))
    val linkChars = aggregate(
      transform(
        regexp_extract_all(b, lit(AnchorPat), lit(1)),
        inner => length(entityDecode(stripTags(inner)))),
      lit(0),
      (acc, x) => acc + x)
    struct(vis.as("vis"), length(vis).as("n"), linkChars.as("link"))
  }

  /** Adds `text` (extracted), `n_blocks`, `n_short`, `n_linky` from
    * `htmlCol`. Thresholds are integers so the density rule is exact
    * on both engines: drop when linkChars·100 ≥ visibleLen·linkPctMax.
    */
  def extractText(
      df: DataFrame,
      htmlCol: String,
      minLen: Int = 25,
      linkPctMax: Int = 30): DataFrame = {
    require(minLen >= 1, s"minLen >= 1; got $minLen")
    require(linkPctMax >= 1 && linkPctMax <= 100, s"linkPctMax in [1,100]; got $linkPctMax")
    val blocks = split(
      regexp_replace(
        regexp_replace(col(htmlCol), ScriptStylePat, ""),
        BlockTagPat,
        "\n"),
      "\n+")
    val isShort = (s: Column) => s.getField("n") < minLen
    // 64-bit density arithmetic: link/n are IntegerType, so link*100
    // (or n*linkPctMax) would wrap past ~21M link chars in ONE block —
    // the oracle computes the same rule in BIGINT, so a wrap here is a
    // silent keep/drop divergence, not just an overflow (r12 ADVICE).
    val isLinky = (s: Column) =>
      s.getField("n") >= minLen &&
        s.getField("link").cast("long") * 100 >= s.getField("n").cast("long") * linkPctMax
    df.withColumn(
        "__present",
        filter(transform(blocks, b => blockStats(b)), s => s.getField("n") > 0))
      .withColumn(
        "text",
        array_join(
          transform(
            filter(col("__present"), s => !isShort(s) && !isLinky(s)),
            s => s.getField("vis")),
          "\n"))
      .withColumn("n_blocks", size(col("__present")).cast("long"))
      .withColumn("n_short", size(filter(col("__present"), isShort)).cast("long"))
      .withColumn("n_linky", size(filter(col("__present"), isLinky)).cast("long"))
      .drop("__present")
  }
}
