package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis}

/** Property-style cross-check: the Column implementations of the text
  * operators must agree with straightforward Scala reference
  * implementations on hundreds of seeded-random strings — empty
  * strings, runs of spaces, sub-width texts, and everything between.
  * This pins the edge semantics (q75) over a much wider input space
  * than the fixtures reach. ASCII alphabet on purpose: the engine's
  * oracle-parity contract is ASCII-stable (`lower`/regex differ across
  * engines outside it).
  */
class TextPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // Seeded generator: reproducible failures. Alphabet weighted toward
  // spaces to exercise empty tokens and space runs.
  private val cases: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    // uppercase A/B exercise the ASCII fold; İ and É pin that NON-ASCII
    // letters pass through UNfolded (full lower() would map them
    // engine-divergently — the adversarial-parity finding)
    val alphabet = "abc x yz AB İÉ"
    (0L until 300L).map { i =>
      val len = rnd.nextInt(41)
      i -> (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
  }

  /** Independent twin of [[Dedup.asciiFold]]: A–Z only, 1:1. */
  private def refFold(s: String): String =
    s.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)

  private def refShingles(s: String, w: Int): Seq[String] =
    refFold(s).sliding(w).filter(_.length == w).toSeq.distinct

  private def refNGrams(s: String, n: Int): Seq[String] =
    s.split(" ", -1).toSeq.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq.distinct

  private def refChunkCount(s: String, stride: Int): Long =
    if (s.isEmpty) 0L else (s.length - 1) / stride + 1L

  private def h32Ref(s: String): Long = {
    val hex = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  private def refWinnow(s: String, k: Int, w: Int): Seq[Long] =
    refFold(s).sliding(k).filter(_.length == k).map(h32Ref).toSeq
      .sliding(w).filter(_.length == w).map(_.min).toSeq.distinct.sorted

  test("charShingles / wordNGrams / chunk / winnow agree with reference implementations on 300 random strings") {
    import spark.implicits._
    val df = cases.toDF("id", "t")
    val got = df
      .select(
        col("id"),
        Dedup.charShingles(col("t"), 3).as("sh"),
        Dedup.wordNGrams(col("t"), 2).as("ng"))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getSeq[String](2)))
      .toMap
    val chunkCounts = TextAnalysis
      .chunk(df, "t", window = 5, stride = 3)
      .groupBy("id")
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val winnow = Dedup
      .winnowFingerprints(df, "t", k = 3, w = 2, outCol = "fps")
      .collect()
      .map(r => r.getLong(r.fieldIndex("id")) -> r.getSeq[Long](r.fieldIndex("fps")))
      .toMap
    cases.foreach { case (id, s) =>
      assert(got(id)._1 == refShingles(s, 3), s"shingles id=$id text='$s'")
      assert(got(id)._2 == refNGrams(s, 2), s"ngrams id=$id text='$s'")
      assert(chunkCounts.getOrElse(id, 0L) == refChunkCount(s, 3), s"chunks id=$id text='$s'")
      assert(winnow(id) == refWinnow(s, 3, 2), s"winnow id=$id text='$s'")
    }
  }

  test("token counts and normalize agree with reference implementations") {
    import spark.implicits._
    val df = cases.toDF("id", "t")
    val got = df
      .select(
        col("id"),
        TextAnalysis.wsTokenCount(col("t")).as("ws"),
        TextAnalysis.regexTokenCount(col("t")).as("rx"),
        TextAnalysis.normalize(col("t")).as("nm"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val tokRe = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")
    cases.foreach { case (id, s) =>
      assert(got(id)._1 == s.split(" ", -1).length.toLong, s"ws id=$id '$s'")
      val m = tokRe.matcher(s)
      var n = 0L
      while (m.find()) n += 1
      assert(got(id)._2 == n, s"rx id=$id '$s'")
      assert(got(id)._3 == s.toLowerCase.replaceAll("\\s+", " ").trim, s"nm id=$id '$s'")
    }
  }

  // Reference h32: first 8 md5 hex digits as a long (Hashing.h32 twin).
  private def refH32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Reference content-defined segmentation: boundary at 1-based gram
    * position i where h32(ASCII-folded k-gram at i) % mod == 0;
    * segment lengths are diffs over 0 ++ boundaries ++ len.
    */
  private def refCdc(s: String, k: Int, mod: Int): (Long, Long) = {
    val low = refFold(s)
    val bnd =
      if (low.length < k) Seq.empty[Long]
      else (1 to (low.length - k + 1))
        .filter(i => refH32(low.substring(i - 1, i - 1 + k)) % mod == 0)
        .map(_.toLong)
    val cuts = 0L +: bnd :+ s.length.toLong
    val lens = cuts.sliding(2).map(p => p(1) - p(0)).toSeq
    (lens.length.toLong, lens.max)
  }

  test("cdcSegmentStats agrees with the reference implementation (incl. empty/short texts)") {
    import spark.implicits._
    // Small mod so boundaries actually occur at these lengths.
    val got = TextAnalysis
      .cdcSegmentStats(cases.toDF("id", "t"), "t", k = 3, mod = 4)
      .select(col("id"), col("n_seg"), col("max_seg"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    cases.foreach { case (id, s) =>
      assert(got(id) == refCdc(s, 3, 4), s"cdc id=$id text='$s'")
    }
  }

  test("cdcSegmentStats: an edit changes only local segments (the content-defined property)") {
    import spark.implicits._
    // Flip one char in the middle of a long text: segment boundaries
    // more than k-1 chars away must be unchanged positions.
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val edit = base.updated(5, 'x')
    def bounds(s: String): Seq[Long] = {
      val low = refFold(s)
      (1 to (low.length - 2)).filter(i => refH32(low.substring(i - 1, i + 2)) % 4 == 0).map(_.toLong)
    }
    val (b0, b1) = (bounds(base), bounds(edit))
    // boundaries untouched by the edit window [6-2, 6+2] coincide
    assert(b0.filter(i => i < 4 || i > 8) == b1.filter(i => i < 4 || i > 8))
  }
}
