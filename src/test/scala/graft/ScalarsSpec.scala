package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Scalars._

object SparkTestSession {
  lazy val spark: SparkSession = {
    // The library entry point IS the test session: every spec runs
    // under the same configs (and extensions) a user of GraftSession
    // gets.
    val s = GraftSession
      .builder("local[4]", shufflePartitions = 4)
      // saveAsTable targets (bucketed-join specs) land in a temp
      // warehouse, never the repo working directory
      .config(
        "spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Null-trap semantics from SURVEY.md §2.10 — the behaviors the oracle
  * gate punishes if drifted (reference: helpers.js:309-321, 296-302,
  * 234-240, 115-117).
  */
class ScalarsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def deltas(est: java.lang.Double, act: java.lang.Double): (Option[Double], Option[Double]) = {
    val df = Seq((est, act))
      .toDF("est", "act")
      .select(
        deltaCol($"est", $"act").cast("double").as("delta"),
        deltaPercentageCol($"est", $"act").cast("double").as("dp"))
    val r = df.collect()(0)
    (Option(r.get(0)).map(_.asInstanceOf[Double]), Option(r.get(1)).map(_.asInstanceOf[Double]))
  }

  test("delta: normal case (helpers.js:313-319)") {
    val (d, dp) = deltas(300.0, 100.0)
    assert(d.contains(200.0))
    assert(dp.contains(100.0)) // (300-100)/((300+100)/2)*100
  }

  test("delta: zero estimate is null, not 0 (§2.10-1 falsy guard)") {
    assert(deltas(0.0, 100.0) == (None, None))
  }

  test("delta: zero actual is null, not ±100") {
    assert(deltas(300.0, 0.0) == (None, None))
  }

  test("delta: null actual is null") {
    assert(deltas(300.0, null) == (None, None))
  }

  test("percentChangeAbs formula (helpers.js:234-240)") {
    val r = Seq((10.0, 8.0))
      .toDF("o", "n")
      .select(percentChangeAbs($"o", $"n").as("p"))
      .collect()(0)
      .getDouble(0)
    assert(r == 20.0)
  }

  test("percentDifference: both zero is NaN (JS 0/0 parity)") {
    val r = Seq((0.0, 0.0))
      .toDF("a", "b")
      .select(percentDifference($"a", $"b").as("p"))
      .collect()(0)
      .getDouble(0)
    assert(r.isNaN)
  }

  test("hoursToSeconds: null coalesces to 0 (helpers.js:278)") {
    val df = Seq((Some(1.5), Option.empty[Double])).toDF("a", "b")
    val r = df.select(hoursToSeconds($"a"), hoursToSeconds($"b")).collect()(0)
    assert(r.getDouble(0) == 5400.0 && r.getDouble(1) == 0.0)
  }

  test("emptyToNull: empty array becomes null (helpers.js:115-117)") {
    val df = Seq((Seq.empty[Int], Seq(1, 2))).toDF("a", "b")
    val r = df.select(emptyToNull($"a"), emptyToNull($"b")).collect()(0)
    assert(r.isNullAt(0) && r.getSeq[Int](1) == Seq(1, 2))
  }
}
