package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** Bucketed co-located joins: the pay-the-shuffle-once-at-ingest
  * optimization. The spec proves the plan property the operator exists
  * for — NO shuffle exchange on either side of the bucketed join —
  * and result parity with the plain-join formulation.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("bucketed tables equi-join with no Exchange; results match the plain join") {
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    Sinks.writeBucketed(orders, "b_orders", Seq("o_orderkey"), nBuckets = 8)
    Sinks.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem",
      Seq("o_orderkey"),
      nBuckets = 8)

    val bo = spark.table("b_orders")
    val bl = spark.table("b_lineitem")
    // disable broadcast so the planner's only shuffle-free option is the
    // bucket-co-located sort-merge join — the property under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bo
        .join(bl, Seq("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must consume the bucketed scans directly: no
      // ShuffleExchange between scan and join (the agg may still shuffle)
      val joinSection = plan.split("HashAggregate").last
      assert(
        !joinSection.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")

      val plain = orders
        .join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(joined.collect().toSet == plain.collect().toSet)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
