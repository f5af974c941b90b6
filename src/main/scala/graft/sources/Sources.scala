package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-pinned sources. The reference's only scans are an HTTP JSON
  * API and Postgres (SURVEY.md §2.1, §2.11 — no file formats); the
  * engine's sources cover the file formats a data platform actually
  * feeds Spark with, all with explicit schemas:
  *
  *  - inference is a full extra pass over the data at 100 TB;
  *  - inferred types drift between drops (an all-null day turns a
  *    double column into string) — a pinned `StructType` fails fast
  *    instead;
  *  - with the schema known, Catalyst prunes columns and pushes
  *    predicates into the reader (`ReadSchema` / `PushedFilters` in
  *    `.explain`), which inference-era plans only get after the fact.
  */
object Sources {

  /** Columnar scan — the default. Parquet carries its own schema;
    * passing one anyway asserts the contract (and lets the reader
    * prune to it).
    */
  def parquet(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.parquet(path)
  }

  /** CSV with mandatory schema: header-based inference is both slow
    * (extra pass) and fragile. `mode=FAILFAST` surfaces bad rows at
    * read time instead of silently nulling them.
    */
  def csv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header)
      .option("mode", "FAILFAST")
      .csv(path)

  /** JSON-lines with mandatory schema — the production form of the
    * JIRA-payload ingestion (`spark.read.json` inference is for
    * exploration; SURVEY.md §1.3 pins a StructType for determinism).
    */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** ORC scan — the second columnar format warehouses interop with;
    * same pushdown/pruning contract as parquet (predicate pushdown via
    * ORC's SearchArgument, column pruning via the ORC reader).
    */
  def orc(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.orc(path)
  }

  /** JSON-lines with an ERROR SIDE-CHANNEL — the source-level analog
    * of the reference's P6 error routing (etl.js:249-278 prunes rows
    * whose fetch failed; here rows whose PARSE failed). PERMISSIVE
    * mode routes each unparseable line into `_corrupt_record` instead
    * of failing the job; the caller gets (clean rows, corrupt lines)
    * and applies its loss threshold — the same quality-gate contract
    * as `Relational.qualityGate`, applied at ingest. At 100 TB a
    * single bad line must cost one row, not the job.
    *
    * The parsed batch is cached (both splits read it; see SPARK-21610
    * note below) — the third element RELEASES that cache; call it once
    * both splits are materialized, or sweep the session with
    * [[graft.GraftSession.releaseAllCaches]].
    */
  def jsonLinesWithErrors(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame, () => Unit) = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField("_corrupt_record", org.apache.spark.sql.types.StringType))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // PERMISSIVE corrupt-record access requires materialization
      // (SPARK-21610: can't filter on the corrupt column straight off
      // the scan) — cache the parsed batch once, split it twice.
      .cache()
    val clean = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val errors = raw.filter(col("_corrupt_record").isNotNull).select(col("_corrupt_record").as("line"))
    (clean, errors, () => { raw.unpersist(blocking = false); () })
  }

  /** Partitioned JDBC scan — the read twin of [[Sinks.writeJdbc]].
    * `partitionColumn` + bounds split the table into `numPartitions`
    * range predicates, one connection each: the only way a JDBC scan
    * parallelizes. Exercised (unpartitioned form) against embedded
    * Derby in JdbcSinkSpec's write-read-back round trip.
    */
  def jdbc(
      spark: SparkSession,
      url: String,
      table: String,
      props: Properties,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound, numPartitions, props)
}
