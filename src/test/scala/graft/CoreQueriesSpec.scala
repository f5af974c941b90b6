package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

class CoreQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and every query has an oracle or is rows-only") {
    // Sweep per query (the Bench/Verify discipline): some operators
    // persist intermediates as a documented contract (q109's count
    // tables), and the finally keeps a mid-loop failure from leaking
    // them into the shared session and later suites' cache asserts.
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val n = fn(spark, sf).count()
        assert(n >= 0, s"$name failed")
      } finally GraftSession.releaseAllCaches(spark)
    }
  }

  test("q06: childless parents keep NULL rollup but 0 linked_total (§2.10-2/3)") {
    val df = SparkEntry.queries("q06_child_rollup")(spark, sf)
    val childless = df.filter(col("worklog_total").isNull)
    if (childless.count() > 0) {
      val r = childless.select("n_entries", "linked_total").collect()(0)
      assert(r.getLong(0) == 0L && r.getDouble(1) == 0.0)
    }
  }

  test("quality gate aborts above threshold and passes below (etl.js:269-274)") {
    import spark.implicits._
    val parents = Seq(1, 2, 3, 4, 5).toDF("k")
    val errored = Seq(1, 2).toDF("k") // 40% loss
    intercept[IllegalArgumentException] {
      Relational.qualityGate(parents, errored, "k", 20.0)
    }
    val ok = Relational.qualityGate(parents, Seq(1).toDF("k"), "k", 25.0)
    assert(ok.count() == 4)
  }

  test("dimGetOrCreate: dense ids, idempotent, appends after existing (schema.sql:105-134)") {
    import spark.implicits._
    val existing = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
    val incoming = Seq("beta", "gamma", "delta", "gamma").toDF("name")
    val dim = Relational.dimGetOrCreate(existing, incoming).collect()
    val byName = dim.map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(byName == Map("alpha" -> 1L, "beta" -> 2L, "delta" -> 3L, "gamma" -> 4L))
    // idempotent: re-running with the same incoming adds nothing
    val dimDf = dim.map(r => (r.getLong(0), r.getString(1))).toSeq.toDF("id", "name")
    val again = Relational.dimGetOrCreate(dimDf, incoming)
    assert(again.count() == 4)
  }

  test("dimGetOrCreate: NULL names are dropped, not re-created each call") {
    import spark.implicits._
    val existing = Seq((1L, "alpha")).toDF("id", "name")
    val incoming = Seq(Some("beta"), None, None).toDF("name")
    val dim = Relational.dimGetOrCreate(existing, incoming)
    assert(dim.count() == 2)
    assert(dim.filter(col("name").isNull).count() == 0)
    // idempotent under NULLs: a second pass adds nothing
    val again = Relational.dimGetOrCreate(dim, incoming)
    assert(again.count() == 2)
  }

  test("resolveDimFk: only the fk column joins in; pre-existing id survives") {
    import spark.implicits._
    val fact = Seq((10L, "alpha", 1L), (11L, "gamma", 2L)).toDF("id", "proj", "x")
    val dim = Seq((1L, "alpha", "extra-a"), (2L, "beta", "extra-b"))
      .toDF("id", "name", "junk")
    val out = Relational.resolveDimFk(fact, dim, "proj", "fk_project")
    assert(out.columns.sorted.toSeq == Seq("fk_project", "id", "proj", "x"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getLong(rows(0).fieldIndex("id")) == 10L)
    assert(rows(0).getLong(rows(0).fieldIndex("fk_project")) == 1L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("fk_project"))) // unmatched name
  }
}
