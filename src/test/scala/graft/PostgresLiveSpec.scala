package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks
import graft.sources.Sinks.DimSpec

/** OPT-IN live-Postgres end-to-end for the G6/K1 dialect path —
  * `postgresStarSchemaDdl` + `castForPostgresReal` + normalize +
  * parallel JDBC load against a REAL server, asserting the
  * REAL/TIMESTAMPTZ/JSON round trip matches the Derby-proven rows
  * (JdbcSinkSpec covers the same five testing.sql:36-80 inserts
  * against embedded Derby; this spec replays them on the reference's
  * actual target dialect, schema.sql:22-59).
  *
  * No pgjdbc JDBC driver ships in this container (zero egress), so
  * the suite CANCELS unless a server and driver are provided — the
  * dialect semantics themselves (DDL, constraints, REAL rounding,
  * JSON/TIMESTAMPTZ round-trip) are already proven against the
  * container's real PostgreSQL 15 via psql in
  * [[PostgresDdlConformanceSpec]]; what remains opt-in here is only
  * the Spark JDBC wire:
  *
  * {{{
  * GRAFT_PG_URL=jdbc:postgresql://host:5432/db \
  * GRAFT_PG_USER=... GRAFT_PG_PASSWORD=... sbt "testOnly graft.PostgresLiveSpec"
  * }}}
  *
  * with `postgresql-*.jar` on the classpath. `stringtype=unspecified`
  * is appended to the URL so the engine's serialized TIMESTAMPTZ/JSON
  * strings bind server-side to the DDL's column types (the PG driver
  * otherwise rejects setString into non-text columns).
  */
class PostgresLiveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val baseUrl = sys.env.get("GRAFT_PG_URL")
  private def url = {
    val u = baseUrl.get
    if (u.contains("stringtype=")) u
    else u + (if (u.contains("?")) "&" else "?") + "stringtype=unspecified"
  }
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.postgresql.Driver")
    sys.env.get("GRAFT_PG_USER").foreach(p.setProperty("user", _))
    sys.env.get("GRAFT_PG_PASSWORD").foreach(p.setProperty("password", _))
    p
  }
  private def available: Boolean =
    baseUrl.isDefined && (try { Class.forName("org.postgresql.Driver"); true }
    catch { case _: Throwable => false })

  private val specs = Seq(
    DimSpec("reviewer_name", "fk_reviewer", "jira_user"),
    DimSpec("reporter_name", "fk_reporter", "jira_user"),
    DimSpec("project_name", "fk_project", "project"))

  private def emptyDim = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("id", "name")
  }

  private def readTable(t: String): DataFrame = spark.read.jdbc(url, t, props)

  test("postgres DDL + REAL-cast load + read-back matches the Derby-proven rows") {
    assume(available, "GRAFT_PG_URL / postgresql driver not present — live-PG e2e skipped")
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      Seq("feasibility", "jira_user", "project")
        .foreach(t => st.executeUpdate(s"DROP TABLE IF EXISTS $t CASCADE"))
      Sinks.postgresStarSchemaDdl.foreach(st.executeUpdate)
      st.close()
    } finally conn.close()

    import spark.implicits._
    val incoming = Seq(
      ("PG-1", "PG row A", "user1", "user2", "PROJ1",
        "1999-01-08 04:05:06+00", Some("""{"worklog":[],"total":0}"""), Some(0.1), 2.0),
      ("PG-2", "PG row B", "user2", "user1", "PROJ2",
        "2014-01-08 04:05:06+00", None, None, 3.5))
      .toDF("key", "summary", "reviewer_name", "reporter_name", "project_name",
        "created", "worklog", "delta", "development_estimate")
    val (dims, fact0) = Sinks.normalize(
      incoming, Map("jira_user" -> emptyDim, "project" -> emptyDim), specs)
    // REAL boundary: engine-side IEEE float32 cast BEFORE the write, so
    // the stored value is decided here, not by a server conversion.
    val fact = Sinks.castForPostgresReal(Sinks.requireResolved(fact0, specs))
    Sinks.writeJdbc(dims("jira_user").withColumnRenamed("name", "username"),
      url, "jira_user", props, numPartitions = 2)
    Sinks.writeJdbc(dims("project"), url, "project", props, numPartitions = 2)
    Sinks.writeJdbc(fact, url, "feasibility", props, numPartitions = 2)

    val users = readTable("jira_user").collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(users == Map("user1" -> 1L, "user2" -> 2L))
    val back = readTable("feasibility").orderBy("key").collect()
    assert(back.length == 2)
    val a = back(0)
    // REAL columns come back as float32 — bit-exact vs the engine cast
    assert(a.getFloat(a.fieldIndex("delta")) == 0.1f)
    assert(a.getFloat(a.fieldIndex("development_estimate")) == 2.0f)
    // JSON round-trips the engine's serialized string unchanged
    assert(a.getString(a.fieldIndex("worklog")) == """{"worklog":[],"total":0}""")
    // TIMESTAMPTZ: same UTC instant as the written literal
    val created = readTable("feasibility")
      .filter(col("key") === "PG-1")
      .select(unix_timestamp(col("created")))
      .collect()(0).getLong(0)
    assert(created == 915768306L) // 1999-01-08T04:05:06Z
  }
}
