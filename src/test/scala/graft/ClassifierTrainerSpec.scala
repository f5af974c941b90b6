package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ClassifierTrainer, TextAnalysis}

/** In-engine classifier training (q177): the decisive gate is
  * CROSS-IMPLEMENTATION equality — the engine-trained weight table
  * over the sf0.01 corpus must equal `graft/quality_classifier_int.txt`,
  * the checked-in artifact of `tools/make_classifier.py --int` (the
  * independently written python integer trainer). Plus hand cases for
  * the fixed-point arithmetic (floor divisions on negatives, the
  * hard-sigmoid clamp, the bias-as-bucket−1 trick) and a
  * does-it-actually-learn distillation check.
  */
class ClassifierTrainerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("hand case: one positive, one negative doc — first-epoch update is the closed form") {
    import spark.implicits._
    // Two docs, each one bigram occurrence, in disjoint buckets.
    // n=2, n_pos=n_neg=1 -> cwp=cwn=10^6 (balanced). All w=0 at epoch
    // 1: dot=0, p4=2e12 for both. Positive doc: e1=fd(2e12-4e12,1e6)
    // = -2e6, e2=fd(-2e6*1e6,1e6) = -2e6. Negative doc: e1=2e6,
    // e2=2e6. Bias gradient: (-2e6+2e6)*1e6 = 0 -> bias stays 0.
    // Each doc's own bucket: g = e2*1e6 (its x is 10^6: single
    // bigram). delta = fd(8e5 * ±2e12, 2*4e12) = ±200000.
    // So w[posBucket] = +200000, w[negBucket] = -200000 after 1 epoch.
    val docs = Seq(
      (1L, "the the"), // en-marker bigram -> y=1
      (2L, "el que")   // es-dominant -> y=0
    ).toDF("doc_id", "text")
    val w = ClassifierTrainer.train(docs, "text", "doc_id", buckets = 1024, epochs = 1)
      .toMap
    assert(w(-1) == 0L, s"bias: ${w(-1)}")
    assert(w.values.count(_ != 0L) == 2, w.filter(_._2 != 0L).toString)
    // 1025 entries (bias + 1024 buckets): the two touched buckets
    // ("the the" -> 924, "el que" -> 145, disjoint by md5)
    assert(w.values.toSeq.sorted == Seq.fill(1023)(0L).prepended(-200000L).appended(200000L))
    assert(w(924) == 200000L && w(145) == -200000L)
  }

  test("degenerate label split throws (single-class corpus)") {
    import spark.implicits._
    val allEn = Seq((1L, "the and of"), (2L, "the is to")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      ClassifierTrainer.train(allEn, "text", "doc_id", buckets = 64, epochs = 1)
    }
    assert(e.getMessage.contains("degenerate label split"), e.getMessage)
  }

  test("docs with fewer than two tokens are excluded from training") {
    import spark.implicits._
    // "word" has no bigram; only the two 2-token docs train (n=2).
    val docs = Seq(
      (1L, "the the"), (2L, "el que"), (3L, "word"), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val w = ClassifierTrainer.train(docs, "text", "doc_id", buckets = 1024, epochs = 1).toMap
    // identical to the two-doc hand case: the singleton doc changed nothing
    assert(w.values.count(_ != 0L) == 2)
    assert(w.values.max == 200000L && w.values.min == -200000L)
  }

  test("arm equality: driver-side local arm ≡ distributed arm at 16 epochs (sf0.001)") {
    // The r13 verdict Next #4 gate: the collected-arrays GD loop and
    // the distributed epoch loop must produce the identical weight
    // table at the q177/q185 epoch count. Both arms forced explicitly
    // (an explicit request is never rerouted by the auto-select).
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val loc = ClassifierTrainer.train(
      docs, "text", "doc_id", buckets = 1024, epochs = 16, local = Some(true))
    val dist = ClassifierTrainer.train(
      docs, "text", "doc_id", buckets = 1024, epochs = 16, local = Some(false))
    assert(loc.size == dist.size)
    val diverge = loc.zip(dist).filter { case (a, b) => a != b }
    assert(diverge.isEmpty, s"${diverge.size} weights diverge; first: ${diverge.headOption}")
  }

  test("local arm: observed feature-count guard refuses an over-ceiling collect") {
    import spark.implicits._
    val f = Seq((1L, -1L, 1000000L)).toDF("__id", "__b", "__x")
    val dd = Seq((1L, 1L)).toDF("__id", "__y")
    val e = intercept[IllegalArgumentException] {
      ClassifierTrainer.trainLocalArm(
        f, dd, buckets = 4, epochs = 1, lrMicro = 800000L, n = 1L,
        cwp = 1000000L, cwn = 1000000L, nFeat = ClassifierTrainer.LocalFeatCeil + 1)
    }
    assert(e.getMessage.contains("driver-collect ceiling"), e.getMessage)
  }

  test("cross-implementation: engine training reproduces make_classifier.py --int on sf0.01") {
    // Auto-selects the LOCAL arm at this scale — so this gate now
    // pins the local arm against the independent python trainer while
    // the arm-equality test above ties the distributed arm to it.
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val got = ClassifierTrainer.train(
      docs, "text", "doc_id", buckets = 1024, epochs = 48)
    val want = ClassifierTrainer.trainedIntFixture
    assert(got.size == want.size, s"${got.size} vs ${want.size}")
    val diverge = got.zip(want).filter { case (a, b) => a != b }
    assert(
      diverge.isEmpty,
      s"${diverge.size} weights diverge; first: got=${diverge.headOption.map(_._1)} " +
        s"want=${diverge.headOption.map(_._2)}")
  }

  test("the trained model actually learns: balanced agreement with the marker target >= 0.85") {
    // Distillation quality on the training corpus (the python twin
    // reports 0.941 balanced acc): score every sf0.01 doc with the
    // CHECKED-IN int weights via the exact inference rule and compare
    // with the marker verdict. Guards against a fixture or arithmetic
    // drift that keeps cross-impl equality (both implementations
    // drifting together is impossible — the artifact is pinned) but
    // degenerates the verdict.
    val fixture = ClassifierTrainer.trainedIntFixture.toMap
    val bias = fixture(-1)
    val w = Array.tabulate(1024)(b => fixture(b))
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    // The trained model's z includes the ppm normalization; the
    // inference here replays it directly rather than via
    // classifierKeepRule (whose score is the UNnormalized occurrence
    // sum — a different but monotonically-related parameterization).
    val scored = docs
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        explode(graft.operators.Dedup.wordNGramsAll(col("text"), 2)).as("__g"),
        TextAnalysis.predictLang(
          TextAnalysis.cjkCount(col("text")),
          TextAnalysis.markerHits(col("text"), TextAnalysis.markers("de")),
          TextAnalysis.markerHits(col("text"), TextAnalysis.markers("en")),
          TextAnalysis.markerHits(col("text"), TextAnalysis.markers("es")),
          TextAnalysis.markerHits(col("text"), TextAnalysis.markers("fr"))).as("lang"))
      .select(
        col("doc_id"), col("lang"),
        (graft.functions.Hashing.h32(col("__g")) % 1024).as("b"))
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("c"))
      .collect()
    val perDoc = scored.groupBy(r => (r.getLong(0), r.getString(1))).map { case ((_, lang), rows) =>
      val n = rows.map(_.getLong(3)).sum
      val dot = BigInt(bias) * BigInt(1000000L) +
        rows.map(r => BigInt(w(r.getLong(2).toInt)) * BigInt(r.getLong(3) * 1000000L / n)).sum
      (lang == "en", dot > 0)
    }.toSeq
    val pos = perDoc.filter(_._1)
    val neg = perDoc.filterNot(_._1)
    assert(pos.nonEmpty && neg.nonEmpty)
    val balanced =
      (pos.count(_._2).toDouble / pos.size + neg.count(!_._2).toDouble / neg.size) / 2
    assert(balanced >= 0.85, f"balanced agreement $balanced%.3f")
  }
}
