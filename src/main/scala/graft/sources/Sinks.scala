package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Sinks — the engine-owned write paths.
  *
  * The reference loads by inserting denormalized rows against a view
  * and letting an INSTEAD-OF-INSERT trigger + get-or-create procedures
  * normalize them into a star schema (reference: etl.js:311-370,
  * schema.sql:105-173; SURVEY.md §2.2 K1, §2.8 G1–G4, §3.2). This
  * engine owns both sides, so the whole trigger pipeline is one batch
  * API: [[normalize]] resolves dimensions and rewrites the fact rows;
  * the caller then writes fact + dims with [[writeParquet]] /
  * [[writeJdbc]].
  */
object Sinks {

  /** One name→surrogate-key resolution: fact column `nameCol` resolves
    * through dimension `dimName` into `fkCol`. Several specs may share
    * a `dimName` — the reference resolves reviewer AND reporter through
    * the same `jira_user` dim (schema.sql:147-149).
    */
  case class DimSpec(nameCol: String, fkCol: String, dimName: String)

  /** The trigger-equivalent normalization (reference: add_feasibility,
    * schema.sql:141-165): grow each dimension with any new names from
    * the incoming batch (dense ids appended after the existing max),
    * then swap every name column for its surrogate key.
    *
    * Returns (updated dims, normalized fact). Deterministic and
    * idempotent per batch; dims stay small relative to the fact, so
    * the FK-resolution joins broadcast — at 100 TB the fact never
    * shuffles for this.
    */
  def normalize(
      incoming: DataFrame,
      existingDims: Map[String, DataFrame],
      specs: Seq[DimSpec]): (Map[String, DataFrame], DataFrame) = {
    val grownDims = specs.groupBy(_.dimName).map { case (dimName, ss) =>
      val names = ss
        .map(s => incoming.select(col(s.nameCol).as("name")))
        .reduce(_ unionByName _)
      dimName -> Relational.dimGetOrCreate(existingDims(dimName), names)
    }
    val fact = specs.foldLeft(incoming) { (acc, s) =>
      Relational.resolveDimFk(acc, grownDims(s.dimName), s.nameCol, s.fkCol).drop(s.nameCol)
    }
    (grownDims, fact)
  }

  /** The reference's NULL-id guard (schema.sql:151-152): fail the batch
    * if any row carries a name that did not resolve. Costs one count on
    * the already-built plan.
    */
  def requireResolved(fact: DataFrame, specs: Seq[DimSpec]): DataFrame = {
    val unresolved = specs.map(s => col(s.fkCol).isNull).reduce(_ || _)
    val n = fact.filter(unresolved).count()
    require(n == 0, s"$n fact rows have unresolved dimension keys")
    fact
  }

  /** Partitioned parquet sink. Partition columns become the directory
    * layout — the coarse pruning axis every downstream scan gets for
    * free; at 100 TB this (plus file sizing via
    * `spark.sql.files.maxRecordsPerFile`) is the difference between
    * touching one partition and touching all of them.
    */
  def writeParquet(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Bucketed table sink: hash-bucket (and sort) the data by the join
    * key at write time. Two tables bucketed the same way equi-join with
    * NO shuffle on either side — the planner proves co-partitioning
    * from the bucket spec. At 100 TB this is the single biggest join
    * optimization available: the fact table's shuffle is paid once at
    * ingest instead of on every query. Requires a catalog table
    * (`saveAsTable`) — bucket metadata lives in the metastore.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** JDBC sink — the Spark-native K1 (reference: etl.js:311-370, one
    * prepared INSERT per row under async.parallel). Spark's JDBC writer
    * batches `batchSize` rows per statement and runs one connection per
    * partition, so `repartition(numPartitions)` is the concurrency
    * knob the reference's unbounded async.parallel lacked. Per-row
    * error tolerance (helpers.js:100-104 swallows failures) is
    * deliberately NOT replicated: a failed partition fails the job —
    * all-or-nothing beats silently missing rows in a 100 TB load.
    *
    * Untested in this container (no database); exercised through the
    * same `DataFrameWriter` surface `writeParquet` covers.
    */
  def writeJdbc(
      df: DataFrame,
      url: String,
      table: String,
      props: Properties,
      numPartitions: Int = 8,
      batchSize: Int = 10000,
      mode: SaveMode = SaveMode.Append): Unit =
    df.repartition(numPartitions)
      .write
      .mode(mode)
      .option("batchsize", batchSize.toLong)
      .jdbc(url, table, props)
}
