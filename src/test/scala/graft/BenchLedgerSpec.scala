package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-exonerating outlier protocol is only as good as
  * its ledger coverage: a query with no BASELINE.md line silently
  * escapes the >2× retry/exoneration pass (the r14 defect — a regex
  * that consumed the shared column separator dropped q133–q163,
  * including the iterative tail the extension existed to cover).
  * These tests pin (a) the parser against the packed 3-pair table
  * format, and (b) FULL ledger coverage of the query surface — adding
  * a query without a (provisional) ledger line fails the build, not a
  * future forensics session.
  */
class BenchLedgerSpec extends AnyFunSuite {

  test("parseLedger reads every column of packed multi-pair table rows") {
    // The extension table's 3-pair rows share their separators; the
    // middle pair must not be lost to a consumed trailing pipe.
    val ledger = Bench.parseLedger()
    assert(ledger.contains("q102"), "first extension column")
    assert(ledger.contains("q133"), "middle extension column (the r14 drop)")
    assert(ledger.contains("q148"), "the r13 regression line the protocol must cover")
    assert(ledger.contains("q164"), "last extension column")
    assert(ledger.contains("q01") && ledger.contains("q101"), "original table intact")
    // spot values parse as positive seconds (the extension regenerates
    // per round, so no literal pins — structure is the invariant)
    assert(ledger("q133") > 0 && ledger("q148") > 0)
    assert(ledger("q01") === 1.158) // the original table is immutable
  }

  test("every SparkEntry query has a BASELINE.md ledger line") {
    val ledger = Bench.parseLedger()
    val missing = SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toVector.distinct
      .filterNot(ledger.contains)
      .sorted
    assert(
      missing.isEmpty,
      s"queries with NO ledger line (outlier retry protocol blind there — add a " +
        s"provisional min-of-5 line to BASELINE.md): ${missing.mkString(", ")}")
  }

  test("ledger segments are declared, ordered, and cover the whole ledger") {
    val segments = Bench.parseLedgerSegments()
    assert(segments.nonEmpty, "LEDGER_SEGMENTS line missing from BASELINE.md")
    assert(segments.forall { case (lo, hi, c) => lo <= hi && c > 0 })
    // every ledger line falls in exactly one declared segment
    val ledger = Bench.parseLedger()
    val uncovered = ledger.keys.toVector.filter { q =>
      val n = q.drop(1).toInt
      segments.count { case (lo, hi, _) => n >= lo && n <= hi } != 1
    }
    assert(uncovered.isEmpty, s"ledger lines outside any (or in multiple) segments: $uncovered")
  }
}
