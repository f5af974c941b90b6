package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Psl

/** publicsuffix.org algorithm cases over the checked-in snapshot —
  * each rule KIND at its boundary (normal, wildcard, exception,
  * implicit `*`), plus the registrable-NULL edges (host IS a suffix,
  * single label, empty). Cross-engine equality is the q186 hash gate;
  * these pin the CONTRACT.
  */
class PslSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(2, appName = "psl-spec")

  private def dom(hosts: String*): Seq[Option[String]] = {
    import spark.implicits._
    val df = hosts.toDF("host").withColumn("__ord", monotonically_increasing_id())
    Psl
      .withRegistrableDomain(df, "host", "d")
      .orderBy(col("__ord"))
      .collect()
      .toSeq
      .map(r => Option(r.getAs[String]("d")))
  }

  test("snapshot parses; join keys bounded") {
    assert(Psl.rules.nonEmpty)
    assert(Psl.maxKeyLabels === 3) // s3.amazonaws.com
    assert(Psl.rules.exists(_.score >= 1000)) // the !www.ck exception
  }

  test("normal rules: gTLD and ccSLD registrable domains") {
    assert(dom("example.com", "www.example.com", "a.b.news.example.com") ===
      Seq(Some("example.com"), Some("example.com"), Some("example.com")))
    assert(dom("sub.shop.co.uk", "shop.co.uk") ===
      Seq(Some("shop.co.uk"), Some("shop.co.uk")))
    assert(dom("news.site.co.jp", "x.com.au") ===
      Seq(Some("site.co.jp"), Some("x.com.au")))
  }

  test("private-section rules: github.io sites are their own domains") {
    assert(dom("alice.github.io", "www.alice.github.io", "bucket.s3.amazonaws.com") ===
      Seq(Some("alice.github.io"), Some("alice.github.io"), Some("bucket.s3.amazonaws.com")))
  }

  test("wildcard *.ck: every child is a public suffix; exception !www.ck wins") {
    assert(dom("a.b.ck") === Seq(Some("a.b.ck"))) // ps = b.ck (wildcard)
    assert(dom("b.ck") === Seq(None)) // host IS a public suffix
    assert(dom("www.ck") === Seq(Some("www.ck"))) // exception: ps = ck
    assert(dom("sub.www.ck") === Seq(Some("www.ck")))
    assert(dom("ck") === Seq(None)) // shorter than the wildcard needs
  }

  test("implicit * rule: unknown TLDs fall back to last-two-labels") {
    assert(dom("foo.unknowntld") === Seq(Some("foo.unknowntld")))
    assert(dom("a.foo.unknowntld") === Seq(Some("foo.unknowntld")))
  }

  test("NULL edges: bare suffixes, single labels, empty host") {
    assert(dom("co.uk", "com", "localhost", "") === Seq(None, None, None, None))
  }
}
