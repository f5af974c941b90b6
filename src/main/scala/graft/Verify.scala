package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Positional <sfDir> <outDir> stay the driver contract; --key=value
    // argv overrides env overrides GRAFT_CONF file for the rest (S5).
    val cfg = Config(args)
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = positional.lift(0).getOrElse(cfg.get("sf-dir", "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val outDir = positional.lift(1).getOrElse(cfg.get("out-dir", "SPARK_GRAFT_OUT_DIR", "/tmp/graft_verify"))
    val cpus = cfg.get("cpus", "SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, appName = "graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Per-query cache sweep: keeps each dump independent of sibling
      // queries' persisted frames (see GraftSession.releaseAllCaches).
      GraftSession.releaseAllCaches(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
