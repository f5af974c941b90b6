package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 connector semantics: server-side filter (JQL), maxResults
  * (limit), and fields (column pruning) pushdown — asserted in the
  * physical plan, not just on results (S1/S2, reference etl.js:92-195).
  */
class JiraSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val path = JiraFixture.writeLines(JiraFixture.rawRows, "issues.jsonl")

  private def load(): DataFrame =
    spark.read.format("graft.sources.JiraSearchSource").option("path", path).load()

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("filter pushdown: top-level equality runs server-side and appears as JQL in the scan") {
    val df = load().filter(col("key") === "F-3").select(col("key"))
    val p = planOf(df)
    assert(p.contains("JiraSearchScan"), p)
    assert(p.contains("jql=[") && p.contains("key = 'F-3'"), p)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("F-3"))
  }

  test("limit pushdown: maxResults caps the scan") {
    val df = load().limit(2)
    val p = planOf(df)
    assert(p.contains("maxResults=2"), p)
    assert(df.count() == 2)
  }

  test("column pruning: unprojected fields never materialize (fields= param)") {
    val df = load().select(col("key"))
    val p = planOf(df)
    assert(p.contains("fields=[key]"), p)
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("F-1", "F-2", "F-3", "F-4", "F-5"))
  }

  test("nested projection and estimates survive the schema-driven conversion") {
    val rows = load()
      .select(
        col("key"),
        col("fields.project.key").as("project"),
        col("fields.customfield_14604").as("design"),
        size(col("fields.issuelinks")).as("n_links"))
      .orderBy("key")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("F-1", "F-2", "F-3", "F-4", "F-5"))
    assert(rows.map(_.getString(1)).toSeq == Seq("PROJ1", "PROJ1", "PROJ1", "PROJ1", "PROJ2"))
    assert(rows(0).getDouble(2) == 1.2 && rows(0).getInt(3) == 2)
    assert(rows(3).getInt(3) == 0) // F-4 has no links
  }

  test("nested-field predicate is correct whether pushed or residual") {
    val df = load().filter(col("fields.project.key") === "PROJ2").select(col("key"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("F-5"))
  }

  test("paged scan (pages=3) partitions the fetch and returns the full result set") {
    val df = spark.read
      .format("graft.sources.JiraSearchSource")
      .option("path", path)
      .option("pages", "3")
      .load()
    assert(df.rdd.getNumPartitions == 3)
    assert(df.select("key").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("F-1", "F-2", "F-3", "F-4", "F-5"))
  }

  test("IN, range, and startsWith predicates evaluate server-side with SQL null semantics") {
    val keys = load()
      .filter(col("key").isin("F-1", "F-4") || col("fields.customfield_14600") > 1.5)
      .select("key")
      .collect()
      .map(_.getString(0))
      .sorted
      .toSeq
    assert(keys == Seq("F-1", "F-2", "F-4")) // F-1: both; F-2: 14600=2>1.5; F-4: IN
    // null estimate never matches a range predicate
    val none = load().filter(col("fields.customfield_14603") > 100).count()
    assert(none == 0)
    assert(load().filter(col("key").startsWith("F-")).count() == 5)
  }

  test("fail-fast: missing or unreadable path throws at load(), before any job (X4)") {
    val missing = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.JiraSearchSource").load()
    }
    assert(missing.getMessage.contains("path"))
    val bad = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.JiraSearchSource")
        .option("path", "/nonexistent/issues.jsonl").load()
    }
    assert(bad.getMessage.contains("does not exist"))
  }
}
