package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provisioned parquet tables (see TESTDATA.md).
  *
  * Each table is a plain `spark.read.parquet` scan so Catalyst pushes
  * filters (`PushedFilters`) and prunes columns (`ReadSchema`) into the
  * parquet reader — the Spark-native analog of the reference's
  * server-side JQL predicate + manual field projection
  * (reference: etl.js:92-148, config.json:4).
  *
  * At 100 TB these would be partitioned/bucketed table locations; the
  * API shape (a `DataFrame` per logical table, lazily scanned) is the
  * same.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** The events table's `ts` is parquet TIMESTAMP(NANOS), which Spark
    * only reads with `spark.sql.legacy.parquet.nanosAsLong=true` (as a
    * long of epoch nanoseconds). Normalize either representation to an
    * extra `ts_us` column (epoch microseconds, the precision Spark
    * timestamps carry) so downstream operators are session-agnostic.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.types.LongType
    val df = table(s, d, "events")
    val tsUs = df.schema("ts").dataType match {
      // Integer division: epoch-ns (~1.7e18) exceeds double's 2^53 exact
      // range, so `/ 1000.0` would be off by 1µs on some rows.
      case LongType => expr("ts div 1000")
      case _        => unix_micros(col("ts"))
    }
    df.withColumn("ts_us", tsUs)
  }
  /** The corpus tables (documents, embeddings) feed compute-heavy
    * per-row passes (md5 shingles, HOF dot products, winnowing) that
    * are MUCH more expensive than their bytes: a small parquet file is
    * one row group = ONE task, so without a spread the whole pass
    * serializes onto a single core no matter how many the cluster has
    * (round-6 bench: single-task interpreted HOF passes were the top
    * stragglers). [[graft.operators.Relational.spreadFewSplits]] is
    * the identity whenever the scan already yields >= parallelism
    * splits — any real 100 TB table — so this costs nothing at scale
    * and one narrow ~MB shuffle locally. Queries that need the raw
    * scan shape (e.g. split-count probes) use [[table]] directly.
    */
  def documents(s: SparkSession, d: String): DataFrame =
    graft.operators.Relational.spreadFewSplits(table(s, d, "documents"), "doc_id")
  def embeddings(s: SparkSession, d: String): DataFrame =
    graft.operators.Relational.spreadFewSplits(table(s, d, "embeddings"), "vec_id")
}
