package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Etl

/** End-to-end fidelity of the five-stage pipeline against JIRA-shaped
  * JSON — the engine's port of the reference's manual test rows
  * (testing.sql:32-80), with every §2.10 null trap asserted:
  *  F-1 links+worklogs → full delta; F-2 no links → null delta;
  *  F-3 links w/o worklogs → linked 0, null delta; F-4 worklog w/o
  *  links; F-5 zero estimates → null delta.
  */
class EtlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def jsonDf(rows: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(rows.toDS)
  }

  private def issue(
      key: String,
      reviewer: String,
      estimates: String,
      links: String,
      reporter: String = "rep1",
      project: String = "PROJ1"): String = {
    val rev = if (reviewer == null) "null" else s"""{"name": "$reviewer"}"""
    s"""{"key": "$key", "fields": {"summary": "sum-$key", "customfield_12501": $rev,
       |"reporter": {"name": "$reporter"}, "project": {"key": "$project"},
       |"created": "2019-01-01T10:00:00.000+0000", "resolutiondate": "2019-02-01T10:00:00.000+0000",
       |$estimates, "issuelinks": [$links]}}""".stripMargin.replace("\n", " ")
  }

  private def link(linkKey: String, typeId: String = "10211", inward: Boolean = false): String = {
    val side = if (inward) "inwardIssue" else "outwardIssue"
    s"""{"type": {"id": "$typeId"}, "$side": {"key": "$linkKey", "fields": {"summary": "ls-$linkKey",
       |"status": {"name": "Done"}, "issuetype": {"name": "Development"}}}}""".stripMargin
      .replace("\n", " ")
  }

  private val allEst =
    """"customfield_14604": 1.2, "customfield_14600": 2, "customfield_14607": null,
      |"customfield_14603": 1, "customfield_14602": 0.5, "customfield_14601": 1""".stripMargin
      .replace("\n", " ")

  private def raw = jsonDf(Seq(
    issue("F-1", "rev1", allEst, s"${link("L-1")}, ${link("L-2", inward = true)}"),
    issue("F-2", "rev1", """"customfield_14600": 2""", link("X-9", typeId = "999")),
    issue("F-3", "rev2", """"customfield_14603": 1""", link("L-3")),
    issue("F-4", null, """"customfield_14600": 1""", ""),
    issue("F-5", "rev2", """"customfield_14600": 0""", link("L-5"), project = "PROJ2")))

  private def worklogs = jsonDf(Seq(
    """{"key": "F-1", "worklogs": [{"author": {"name": "alice"}, "timeSpentSeconds": 600, "id": "1"},
      |{"author": {"name": "bob"}, "timeSpentSeconds": 300, "id": "2"}]}""".stripMargin.replace("\n", " "),
    """{"key": "F-2", "worklogs": []}""",
    """{"key": "F-3", "worklogs": []}""",
    """{"key": "F-4", "worklogs": [{"author": {"name": "carol"}, "timeSpentSeconds": 1200, "id": "3"}]}""",
    """{"key": "F-5", "worklogs": []}""",
    """{"key": "L-1", "worklogs": [{"author": {"name": "dev1"}, "timeSpentSeconds": 3600, "id": "4"},
      |{"author": {"name": "dev2"}, "timeSpentSeconds": 1800, "id": "5"}]}""".stripMargin.replace("\n", " "),
    """{"key": "L-2", "worklogs": [{"author": {"name": "dev1"}, "timeSpentSeconds": 7200, "id": "6"}]}""",
    """{"key": "L-3", "worklogs": []}""",
    """{"key": "L-5", "worklogs": [{"author": {"name": "dev3"}, "timeSpentSeconds": 500, "id": "7"}]}"""))

  private def details = jsonDf(Seq("L-1", "L-2", "L-3", "L-5").map { k =>
    s"""{"key": "$k", "fields": {"customfield_12501": {"name": "ldev"}, "reporter": {"name": "lrep"},
       |"project": {"key": "LPROJ"}, "created": "2019-01-05T10:00:00.000+0000",
       |"resolution": {"name": "Done"}, "resolutiondate": "2019-01-20T10:00:00.000+0000"}}""".stripMargin
      .replace("\n", " ")
  })

  private def emptyErrored = {
    import spark.implicits._
    Seq.empty[String].toDF("key")
  }

  private lazy val out = Etl
    .run(raw, worklogs, details, emptyErrored)
    .collect()
    .map(r => r.getString(r.fieldIndex("key")) -> r)
    .toMap

  private def d(key: String, col: String): Option[Double] = {
    val r = out(key)
    val i = r.fieldIndex(col)
    if (r.isNullAt(i)) None else Some(r.getDouble(i))
  }

  test("F-1: links + worklogs → estimates in seconds, full delta (testing.sql:39-44)") {
    // hours 1.2+2+0+1+0.5+1 = 5.7 → 20520 s; linked 3600+1800+7200 = 12600
    assert(d("F-1", "design_estimate").contains(1.2 * 3600))
    assert(d("F-1", "development_pad_estimate").contains(0.0)) // null → 0 s (§2.10-4)
    assert(d("F-1", "feasibility_estimate_total").contains(20520.0))
    assert(d("F-1", "feasibility_timespent").contains(900.0))
    assert(d("F-1", "linked_timespent").contains(12600.0))
    assert(d("F-1", "delta").contains(20520.0 - 12600.0))
    assert(d("F-1", "delta_percentage")
      .contains((20520.0 - 12600.0) / ((20520.0 + 12600.0) / 2.0) * 100.0))
  }

  test("F-2: no qualifying links → null linked timespent, null delta (§2.10-3)") {
    assert(d("F-2", "linked_timespent").isEmpty)
    assert(d("F-2", "delta").isEmpty && d("F-2", "delta_percentage").isEmpty)
    assert(d("F-2", "feasibility_timespent").isEmpty) // empty worklog → null (§2.10-2)
    val r = out("F-2")
    assert(r.isNullAt(r.fieldIndex("issue_links"))) // type-999 link filtered (P3)
  }

  test("F-3: links without worklogs → linked 0 (not null), delta null via falsy guard (§2.10-1)") {
    assert(d("F-3", "linked_timespent").contains(0.0))
    assert(d("F-3", "delta").isEmpty && d("F-3", "delta_percentage").isEmpty)
  }

  test("F-4: worklog without links; null reviewer survives null-safe access") {
    assert(d("F-4", "feasibility_timespent").contains(1200.0))
    assert(d("F-4", "linked_timespent").isEmpty)
    val r = out("F-4")
    assert(r.isNullAt(r.fieldIndex("reviewer")))
  }

  test("F-5: zero estimate total → null delta even with linked worklogs (falsy 0)") {
    assert(d("F-5", "feasibility_estimate_total").contains(0.0))
    assert(d("F-5", "linked_timespent").contains(500.0))
    assert(d("F-5", "delta").isEmpty)
  }

  test("storage JSON round-trips: worklog total and link enrichment survive to_json") {
    val r = out("F-1")
    val wl = r.getString(r.fieldIndex("worklog"))
    assert(wl.contains(""""total":900"""))
    val linksJson = r.getString(r.fieldIndex("issue_links"))
    assert(linksJson.contains(""""L-1""""))
    assert(linksJson.contains(""""resolution":"Done""""))
    assert(linksJson.contains(""""reviewer":"ldev""""))
  }

  test("quality gate prunes errored parents and aborts past threshold (etl.js:249-278)") {
    import spark.implicits._
    val errored = Seq("F-1", "F-3").toDF("key") // 40% loss
    intercept[IllegalArgumentException] {
      Etl.run(raw, worklogs, details, errored, thresholdPct = 20.0).collect()
    }
    val ok = Etl.run(raw, worklogs, details, errored, thresholdPct = 50.0)
    assert(ok.count() == 3)
  }
}
