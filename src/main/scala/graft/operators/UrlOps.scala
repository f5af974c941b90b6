package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization and domain extraction — the crawl-side companion
  * to [[HtmlExtract]]: every web corpus dedups on CANONICAL URLs and
  * caps per-domain document counts (the FineWeb/CommonCrawl intake
  * shape) before any content operator runs.
  *
  * Normalization contract (deliberately a DOCUMENTED SUBSET of
  * RFC 3986, chosen so every step is a regex/string op that Java and
  * RE2 evaluate identically — no lookahead, engine-specific
  * backreference syntax kept OUT of shared pattern strings):
  *  1. strip the fragment (everything from the first `#`);
  *  2. lowercase the SCHEME and AUTHORITY only (path/query keep case —
  *     they are case-sensitive on real servers);
  *  3. strip default ports (`:80` for http, `:443` for https);
  *  4. strip `utm_*` tracking parameters, then tidy separators
  *     (`?&`→`?`, `&&`→`&`, trailing `?`/`&` dropped);
  *  5. strip ONE trailing slash from a non-root path.
  *  Dot-segment resolution (`/a/../b`) is NOT performed — out of
  *  scope, documented.
  *
  * `domainOf` is the last two host labels — a PSL-free approximation
  * (good for .com/.org; wrong for ccSLDs like .co.uk, documented).
  *
  * Scale shape: all pure per-row codegen'd expressions; URL-dup
  * detection and domain caps are hash-bucket equi-joins / partitioned
  * windows on the normalized key — no global funnel.
  */
object UrlOps {

  private val SchemeAuthPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** Steps 1–5 above as one column expression chain. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "(?s)#.*", "")
    // lowercase scheme://authority, keep the rest as-is
    val lowered = concat(
      lower(regexp_extract(noFrag, SchemeAuthPat, 0)),
      regexp_replace(noFrag, SchemeAuthPat, ""))
    // default ports: the captured separator (or end) rides along.
    // NOTE Spark replacement syntax ($1) — the oracle writes \1;
    // patterns are shared, replacement strings are per-engine.
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]*):80([/?#]|$)", "$1$2"),
      "^(https://[^/:?#]*):443([/?#]|$)",
      "$1$2")
    // utm params: non-final occurrences match WITHOUT their leading
    // separator ("utm_…=…&") so the global left-to-right scan catches
    // ADJACENT params in one pass (a leading-separator pattern would
    // skip every second one — the scan resumes after the match end);
    // a final occurrence takes its leading separator with it. The
    // value-contains-"utm_…=…&" false positive is the documented
    // subset boundary.
    val noUtm = regexp_replace(
      regexp_replace(noPort, "utm_[A-Za-z0-9_]*=[^&#]*&", ""),
      "[?&]?utm_[A-Za-z0-9_]*=[^&#]*$",
      "")
    val tidy = regexp_replace(
      regexp_replace(regexp_replace(noUtm, "\\?&+", "?"), "&&+", "&"),
      "[?&]+$",
      "")
    // ONE trailing slash (root included: https://h/ → https://h); a
    // double slash stays — group 1 must end on a non-slash
    regexp_replace(tidy, "^([^?]*[^/?])/(\\?.*)?$", "$1$2")
  }

  /** Lowercased host (authority minus port and userinfo). */
  def hostOf(normUrl: Column): Column =
    regexp_extract(normUrl, "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)

  /** Last two host labels — the PSL-free registrable-domain proxy. */
  def domainOf(host: Column): Column =
    when(host.rlike("[^.]+\\.[^.]+$"), regexp_extract(host, "[^.]+\\.[^.]+$", 0))
      .otherwise(host)
}
