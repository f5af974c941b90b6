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
  /** The events table's `ts` has shipped as three parquet physical
    * shapes across testdata generations: TIMESTAMP(NANOS) (readable
    * only as epoch-ns longs under
    * `spark.sql.legacy.parquet.nanosAsLong=true`), TIMESTAMP(MICROS,
    * isAdjustedToUTC=true) (Spark `TimestampType`), and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark
    * `TimestampNTZType`). Normalize all three to an extra `ts_us`
    * column (epoch microseconds, the precision Spark timestamps carry)
    * so downstream operators are representation-agnostic.
    *
    * The NTZ branch casts through `TimestampType`, which interprets
    * the naive wall-clock in the session time zone —
    * [[GraftSession]] pins `spark.sql.session.timeZone=UTC`, matching
    * the DuckDB oracle's `epoch_us(ts)` (naive-as-UTC) exactly.
    */
  def events(s: SparkSession, d: String): DataFrame =
    withTsUs(table(s, d, "events"))

  /** Adds the normalized `ts_us` column for any of the three `ts`
    * physical shapes. Shared by the batch loader above and the
    * streaming landing-zone path (whose pinned file schema carries the
    * same three possibilities).
    */
  def withTsUs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val tsUs = df.schema("ts").dataType match {
      // Integer division: epoch-ns (~1.7e18) exceeds double's 2^53 exact
      // range, so `/ 1000.0` would be off by 1µs on some rows.
      case LongType         => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case _                => unix_micros(col("ts"))
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
