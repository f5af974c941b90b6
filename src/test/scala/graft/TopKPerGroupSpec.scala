package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** The whole-operator extension stack (hint → ResolveTopKHint →
  * TopKPerGroupNode → TopKPerGroupStrategy → TopKPerGroupExec):
  * result parity with the Window formulation it replaces, the plan
  * shape (custom exec, no Window, one hash exchange), and the
  * determinism contract.
  */
class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def windowTopK(
      df: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  test("topKPerGroup: result-identical to the Window row_number formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1L to 5000L)
      .map(i => (i, s"g${rnd.nextInt(17)}", rnd.nextInt(1000).toLong))
      .toDF("id", "g", "v")
      .repartition(11)
    val ours = Relational.topKPerGroup(df, 5, "g", "v", "id")
    assert(ours.collect().map(_.toSeq).toSet == windowTopK(df, 5).collect().map(_.toSeq).toSet)
  }

  test("topKPerGroup: plans as the custom exec — no Window, exactly one hash exchange") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"g${i % 4}", i % 13)).toDF("id", "g", "v")
    val plan = Relational.topKPerGroup(df, 3, "g", "v", "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("hashpartitioning(g"), plan)
  }

  test("topKPerGroup: groups smaller than k pass through whole; ties break on the tie column") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L), // all tied on v
      (4L, "b", 1L) //                                   group smaller than k
    ).toDF("id", "g", "v")
    val out = Relational.topKPerGroup(df, 2, "g", "v", "id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // tie -> smallest ids kept
    assert(out == Set((1L, "a"), (2L, "a"), (4L, "b")))
  }

  test("topKPerGroup: partitioning-invariant row set") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = (1L to 2000L).map(i => (i, s"g${rnd.nextInt(7)}", rnd.nextInt(50).toLong)).toDF("id", "g", "v")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val a = rows(Relational.topKPerGroup(df.repartition(1), 4, "g", "v", "id"))
    val b = rows(Relational.topKPerGroup(df.repartition(13, col("id")), 4, "g", "v", "id"))
    assert(a == b)
  }

  test("topKPerGroup: malformed hint parameters fail analysis loudly") {
    import spark.implicits._
    val df = Seq((1L, "a", 1L)).toDF("id", "g", "v")
    intercept[Exception](
      Relational.topKPerGroup(df, 3, "nope", "v", "id").collect())
  }
}
