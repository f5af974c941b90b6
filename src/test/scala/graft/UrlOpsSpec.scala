package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UrlOps

/** Hand cases pinning the URL-normalization subset contract (q183):
  * each rule at its boundary, plus the documented non-goals (no
  * dot-segment resolution, PSL-free domains). Cross-engine equality
  * is the q183/q184 hash gates; these pin the CONTRACT.
  */
class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(2, appName = "url-ops-spec")

  private def norm(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(UrlOps.normalizeUrl(col("u"))).collect().head.getString(0)
  }

  private def hostDomain(url: String): (String, String) = {
    import spark.implicits._
    val r = Seq(url)
      .toDF("u")
      .select(UrlOps.hostOf(UrlOps.normalizeUrl(col("u"))).as("h"))
      .select(col("h"), UrlOps.domainOf(col("h")))
      .collect()
      .head
    (r.getString(0), r.getString(1))
  }

  test("scheme and authority lowercase; path and query keep case") {
    assert(norm("HTTPS://WWW.Example.COM/Path/File?Q=Mixed") ===
      "https://www.example.com/Path/File?Q=Mixed")
  }

  test("default ports strip only on the matching scheme") {
    assert(norm("http://a.com:80/x") === "http://a.com/x")
    assert(norm("https://a.com:443/x") === "https://a.com/x")
    assert(norm("https://a.com:80/x") === "https://a.com:80/x") // NOT https' default
    assert(norm("http://a.com:8080/x") === "http://a.com:8080/x")
    assert(norm("https://a.com:443") === "https://a.com")
  }

  test("fragment strips; utm params strip in leading, adjacent, and trailing positions") {
    assert(norm("https://a.com/p#frag?not=query") === "https://a.com/p")
    assert(norm("https://a.com/p?utm_source=x&id=1") === "https://a.com/p?id=1")
    assert(norm("https://a.com/p?utm_a=1&utm_b=2&id=3") === "https://a.com/p?id=3")
    assert(norm("https://a.com/p?id=1&utm_z=9") === "https://a.com/p?id=1")
    assert(norm("https://a.com/p?utm_only=1") === "https://a.com/p")
  }

  test("one trailing slash strips; a double slash is left alone") {
    assert(norm("https://a.com/p/") === "https://a.com/p")
    assert(norm("https://a.com/") === "https://a.com")
    assert(norm("https://a.com/p/?id=1") === "https://a.com/p?id=1")
    assert(norm("https://a.com/p//") === "https://a.com/p//")
  }

  test("documented non-goals of the BASE normalize: dot segments stay; domains are PSL-free") {
    assert(norm("https://a.com/x/../y") === "https://a.com/x/../y")
    assert(hostDomain("https://user:pw@Sub.Shop.co.uk:443/x") ===
      (("sub.shop.co.uk", "co.uk"))) // the proxy; Psl.withRegistrableDomain says shop.co.uk
  }

  private def full(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(UrlOps.normalizeUrlFull(col("u"))).collect().head.getString(0)
  }

  test("pct normalization: unreserved octets decode, others uppercase, malformed stay") {
    assert(full("https://a.com/%7Euser") === "https://a.com/~user")
    assert(full("https://a.com/%41lpha") === "https://a.com/Alpha")
    assert(full("https://a.com/a%2fb") === "https://a.com/a%2Fb") // '/' is NOT unreserved
    assert(full("https://a.com/p?q=%41%2f") === "https://a.com/p?q=A%2F")
    assert(full("https://a.com/p%") === "https://a.com/p%") // stray % untouched
    assert(full("https://a.com/p%zz") === "https://a.com/p%zz") // non-hex untouched
    assert(full("https://a.com/%2E%2E/x") === "https://a.com/x") // %2E decodes to '.' THEN resolves
    // pct runs BEFORE the lowercase step: a decoded letter in the
    // AUTHORITY still lowercases (else %41.com and a.com split)
    assert(full("https://%41.com/x") === "https://a.com/x")
  }

  test("dot segments resolve (RFC 3986 remove_dot_segments on the path)") {
    assert(full("https://a.com/a/./b") === "https://a.com/a/b")
    assert(full("https://a.com/a/b/../c") === "https://a.com/a/c")
    assert(full("https://a.com/a/../../b") === "https://a.com/b") // pop past root drops
    assert(full("https://a.com/a/..") === "https://a.com") // '/' then trailing-slash rule
    assert(full("https://a.com/a/b/..") === "https://a.com/a")
    assert(full("https://a.com/a/.") === "https://a.com/a")
    assert(full("https://a.com/a//b/./c") === "https://a.com/a//b/c") // '//' preserved
    assert(full("https://a.com/...") === "https://a.com/...") // not a dot segment
    assert(full("https://a.com/x/../y?id=1&utm_z=2#f") === "https://a.com/y?id=1")
  }

  test("host extraction drops userinfo and port") {
    assert(hostDomain("HTTP://u@WWW.A-B.example.ORG:8080/p") ===
      (("www.a-b.example.org", "example.org")))
  }
}
