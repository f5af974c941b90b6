package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tables.withTsUs must normalize every `ts` physical shape the
  * testdata generator has shipped to identical epoch-µs values:
  *  - int64 epoch-nanos (parquet TIMESTAMP(NANOS) read under
  *    `nanosAsLong=true`, or a plain long column),
  *  - TIMESTAMP(MICROS, adjustedToUTC=true)  → Spark TimestampType,
  *  - TIMESTAMP(MICROS, adjustedToUTC=false) → Spark TimestampNTZType
  *    (the round-7 testdata regeneration; unhandled, it failed all 14
  *    events queries with an AnalysisException from unix_micros).
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(2, appName = "tables-spec")

  // one deterministic instant set, expressed as epoch µs
  private val us = Seq(0L, 1_700_000_000_123_456L, 1_700_003_600_000_001L)

  test("withTsUs: nanos-long, timestamp, and timestamp_ntz ts all normalize to the same epoch-µs") {
    import spark.implicits._
    val base = us.toDF("us")

    val asLong = base.select((col("us") * 1000L).as("ts"))
    val asTs   = base.select(timestamp_micros(col("us")).as("ts"))
    val asNtz  = base.select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))

    assert(asNtz.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)

    for (df <- Seq(asLong, asTs, asNtz)) {
      val got = Tables.withTsUs(df).select("ts_us").as[Long].collect().sorted
      assert(got.toSeq == us.sorted, s"shape ${df.schema("ts").dataType}")
    }
  }

  test("withTsUs round-trips through parquet for the NTZ shape (the on-disk case)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ntz_events").toString
    us.toDF("us")
      .select(
        monotonically_increasing_id().as("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val got = Tables.withTsUs(back).select("ts_us").as[Long].collect().sorted
    assert(got.toSeq == us.sorted)
  }

  test("Tables.events on the provisioned sf0.001 dir yields a non-null long ts_us") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts_us").dataType == org.apache.spark.sql.types.LongType)
    val n = ev.count()
    assert(n > 0)
    assert(ev.filter(col("ts_us").isNull).count() == 0)
    // sanity: values are plausible epoch-µs (year > 1990), i.e. not
    // accidentally seconds or nanos under some future shape change
    assert(ev.filter(col("ts_us") < 631152000000000L).count() == 0)
  }
}
