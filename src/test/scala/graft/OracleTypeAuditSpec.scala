package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Authoring-time dtype audit over every `SparkEntry.oracleSql` entry.
  *
  * Why this exists: the driver's correctness gate fetches the DuckDB
  * oracle result via pandas and hashes *stringified* values. DuckDB
  * widens `SUM(BIGINT)` to HUGEINT, which pandas coerces to float64, so
  * an uncast integer SUM in an oracle's final SELECT renders as `"3.0"`
  * against Spark's `"3"` — a hash FAIL with cell-exact values. Round 8
  * shipped exactly three such reds (q147/q154/q155) because nothing
  * checked oracle output dtypes at authoring time.
  *
  * This spec DESCRIBEs every oracle in DuckDB (via
  * `tools/check_parity.py --describe-only`, the same code path the
  * local parity replica uses) against the sf0.001 tables and fails if
  * any output column is HUGEINT. It also exercises every oracle's SQL
  * through DuckDB's binder — a syntax error or schema drift in any of
  * the 157 oracles fails here before a driver round burns on it.
  *
  * The audit needs the driver-side python3+duckdb toolchain and the
  * generated testdata; when either is absent (e.g. a bare CI sandbox)
  * the test cancels rather than fails.
  */
class OracleTypeAuditSpec extends AnyFunSuite {

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")

  private def toolchainAvailable: Boolean = {
    if (!Files.exists(Paths.get(sfDir, "lineitem.parquet"))) return false
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb, pandas").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }
  }

  test("no oracle output column is HUGEINT (driver pandas-hash trap)") {
    assume(toolchainAvailable, s"python3+duckdb or $sfDir unavailable — audit skipped")
    val json = Files.createTempFile("oracle_sql_", ".json")
    Files.writeString(json, Verify.oracleSqlJson)
    val p = new ProcessBuilder(
      "python3", "tools/check_parity.py", "--describe-only", sfDir, json.toString)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    Files.deleteIfExists(json)
    val fails = out.linesIterator.filter(_.startsWith("FAIL")).toVector
    assert(rc == 0 && fails.isEmpty,
      s"oracle dtype audit failed (${fails.size} oracles):\n${fails.mkString("\n")}")
    val passes = out.linesIterator.count(_.startsWith("PASS"))
    assert(passes == SparkEntry.oracleSql.size,
      s"audit covered $passes oracles but SparkEntry.oracleSql has ${SparkEntry.oracleSql.size}")
  }
}
