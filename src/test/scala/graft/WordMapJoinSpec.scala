package graft

import org.scalatest.funsuite.AnyFunSuite

/** The budgeting family's word-map join (q168/q169/q171–q173/q180 —
  * `Round10Queries.joinWordMap`) must be ADAPTIVE, not forced: the
  * r12 verdict's one `weak` was a hard-coded `broadcast()` on the
  * distinct-pretoken token map, whose cardinality is the corpus
  * vocabulary — 10⁸–10⁹ rows on a real 100 TB crawl, past any
  * broadcast limit. This spec pins BOTH runtime behaviors of the
  * hint-free join:
  *
  *  1. small vocabulary (every test SF): AQE converts the join to a
  *     broadcast-hash join at runtime — the fast path is not lost;
  *  2. huge vocabulary (simulated by disabling both broadcast
  *     thresholds, which is exactly the branch AQE takes when the
  *     measured map exceeds them): the join degrades to a shuffled
  *     join and produces the SAME rows — no OOM, no failure, no
  *     result drift.
  */
class WordMapJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def q168Rows(): Array[org.apache.spark.sql.Row] =
    SparkEntry.queries("q168_bpe_budget")(spark, sf).collect()

  private def executedPlanOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect(): Unit // run it so AQE finalizes the physical plan
    df.queryExecution.executedPlan.toString
  }

  test("small vocab: AQE converts the hint-free word-map join to broadcast") {
    GraftSession.releaseAllCaches(spark)
    val p = executedPlanOf("q168_bpe_budget")
    assert(p.contains("BroadcastHashJoin"),
      s"expected AQE to broadcast the small word map at sf0.001; plan:\n$p")
  }

  test("huge vocab (thresholds disabled): degrades to a shuffled join, same rows") {
    GraftSession.releaseAllCaches(spark)
    val baseline = q168Rows()
    val staticThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeThresh = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = executedPlanOf("q168_bpe_budget")
      assert(!p.contains("BroadcastHashJoin"),
        s"thresholds disabled yet a broadcast join survived — the hint is back:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffled join fallback; plan:\n$p")
      val degraded = q168Rows()
      assert(degraded.toSeq == baseline.toSeq,
        "shuffled-join fallback changed the q168 result")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", staticThresh)
      aqeThresh match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}
