package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Scalars.dec4

/** Structured Streaming surface of the engine — the streaming twins of
  * the batch event queries (q15 tumbling windows, q16 sessionization).
  *
  * The reference is a single-shot batch script (SURVEY.md §2.11:
  * streaming absent), so this is green-field, built the Spark way:
  * `readStream` → declarative transforms → `writeStream`, with
  * watermarks bounding state. Every transform here takes a DataFrame/
  * Dataset and works identically on a batch frame (tested for parity
  * with q15/q16) and a streaming one — the "write once, run either
  * mode" property Structured Streaming is designed around.
  *
  * Scale notes: state for windowed aggregation is (window × event_type)
  * — tiny. Sessionization state is one struct per active user, hash-
  * partitioned by user_id across executors; the watermark evicts idle
  * users, so state is bounded by the active-user set, not history.
  */
object EventStreams {

  /** File-source stream over an events directory: each parquet file
    * that lands becomes a micro-batch (the standard landing-zone
    * ingestion shape). The schema is pinned from the existing files —
    * streaming sources cannot infer.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Tumbling event-time window counts + exact decimal sums per event
    * type (streaming twin of q15). Late rows beyond `watermarkDelay`
    * are dropped; in append mode a window emits exactly once, when the
    * watermark passes its end.
    */
  def tumblingAgg(events: DataFrame, windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec4(col("value"))).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n"),
        col("sum_value"))

  /** Tumbling-window distinct-user cardinality via the bounded KMV
    * sketch ([[graft.functions.KMinList]]) — streaming observability
    * ("unique users per window per event type") with CONSTANT state
    * per group where `approx_count_distinct` keeps an opaque HLL++
    * and exact distinct keeps every key. Duplicate user hashes are
    * absorbed map-side by the sketch insert, the watermark bounds the
    * group state lifetime, and the k-th-minimum estimator
    * `(k−1)·2⁶⁰ / kth_min` (Beyer et al. 2007) — or the EXACT filled
    * size when the window saw fewer than k distinct users — is pure
    * integer-derived arithmetic, so streaming and batch runs of the
    * same data agree bit-for-bit (StreamingSpec asserts the parity).
    */
  def windowedDistinctUsers(
      events: DataFrame,
      windowDur: String,
      watermarkDelay: String,
      k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2 (got $k)")
    val kml = udaf(new graft.functions.KMinList(k))
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(kml(graft.functions.Hashing.h60(col("user_id").cast("string"))).as("__sk"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        size(col("__sk")).cast("long").as("k_filled"),
        when(
          size(col("__sk")) < k,
          size(col("__sk")).cast("double"))
          .otherwise(
            lit((k - 1).toDouble) * lit(1152921504606846976e0) /
              element_at(col("__sk"), k).cast("double"))
          .as("distinct_est"))
  }

  /** One event on the session timeline (µs event time — the precision
    * contract shared with the batch path, Tables.events/ts_us).
    */
  case class Ev(userId: Long, eventId: Long, tsUs: Long)

  /** A closed session: closed either by a later event arriving past the
    * gap, or by event-time timeout (watermark passed last event + gap).
    */
  case class Session(
      userId: Long,
      sessionId: Long,
      startUs: Long,
      endUs: Long,
      nEvents: Long)

  /** Internal per-user sessionizer state (public: the state encoder's
    * generated serializer must reach the field accessors).
    */
  case class SessState(
      sessionId: Long,
      startUs: Long,
      lastUs: Long,
      nEvents: Long)

  /** Streaming exact deduplication (the streaming twin of q19): drop
    * re-deliveries of the same id arriving within the watermark delay.
    * `dropDuplicatesWithinWatermark` keeps one row per id and evicts
    * its dedup state once the watermark passes — state is bounded by
    * the id-arrival rate × delay, not by history, which is what makes
    * exactly-once ingest dedup feasible on an unbounded stream. (Plain
    * `dropDuplicates` on a stream never evicts — unbounded state.)
    * Works identically on a batch frame (falls back to dropDuplicates).
    *
    * NULL-event-time contract (pinned by StreamingSpec's fuzz probe):
    * the underlying `dropDuplicatesWithinWatermark` ADMITS a
    * NULL-`tsCol` row — it would be deduplicated and emitted like any
    * other — but a NULL event time gives the watermark no eviction
    * lever on that key's state, so one NULL-ts producer upstream means
    * unbounded state growth. The operator therefore DROPS NULL-ts rows
    * by default (`dropNullEventTime = true`): they neither emit nor
    * accumulate state, the P6 error-routing discipline at the stream
    * boundary (route-or-drop malformed rows, never wedge the
    * pipeline). Pass `dropNullEventTime = false` to opt back into the
    * raw engine behavior — only sound when the feed provably cannot
    * carry NULL event times. The windowed-aggregation operators behave
    * like the default (NULL rows join no window and are excluded) —
    * also spec-pinned.
    *
    * @param tsCol the event-time column the watermark rides on
    * @param dropNullEventTime drop NULL-`tsCol` rows before the
    *        stateful dedup (default true; see contract above)
    */
  def dedupStream(
      events: DataFrame,
      idCols: Seq[String],
      watermarkDelay: String,
      tsCol: String = "ts",
      dropNullEventTime: Boolean = true): DataFrame = {
    val guarded =
      if (dropNullEventTime) events.filter(col(tsCol).isNotNull) else events
    if (events.isStreaming)
      guarded
        .withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark(idCols)
    else guarded.dropDuplicates(idCols)
  }

  /** Stream-stream interval join (click attribution): each click joins
    * the view by the same user that happened at most `windowUs` before
    * it. Both sides are watermarked so the engine can bound the join
    * state: a buffered view is evicted once the click-side watermark
    * passes `view ts + window` — the state bound that makes
    * stream-stream joins run forever. Inner equi-join on user plus an
    * event-time range predicate — exactly the shape Structured
    * Streaming supports natively; the same expression joins two batch
    * frames for parity testing.
    *
    * Column contract: both inputs need `user_id`, `event_id`, and the
    * event-time column named by `tsCol` (default `ts`).
    */
  def attributeClicks(
      views: DataFrame,
      clicks: DataFrame,
      windowUs: Long,
      watermarkDelay: String = "10 minutes",
      tsCol: String = "ts"): DataFrame = {
    val v0 = views.select(
      col("user_id").as("v_user"),
      col("event_id").as("view_id"),
      col(tsCol).as("view_ts"))
    val c0 = clicks.select(
      col("user_id").as("c_user"),
      col("event_id").as("click_id"),
      col(tsCol).as("click_ts"))
    val (v, c) =
      if (views.isStreaming)
        (v0.withWatermark("view_ts", watermarkDelay), c0.withWatermark("click_ts", watermarkDelay))
      else (v0, c0)
    c.join(
        v,
        col("c_user") === col("v_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowUs MICROSECOND"))
      .select(
        col("c_user").as("user_id"),
        col("click_id"),
        col("view_id"),
        col("view_ts"),
        col("click_ts"))
  }

  /** Stream-static enrichment: each micro-batch left-joins the static
    * dimension, broadcast to every executor — NO stream state, no
    * watermark needed (the static side is re-resolvable per batch, so
    * dimension updates between batches are picked up). This is the
    * streaming twin of the batch FK-resolution joins: the dim is the
    * small side at any stream rate.
    */
  def enrichStream(events: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    events.join(broadcast(dim), Seq(keyCol), "left")

  /** The per-batch body of [[writeIdempotentBatches]], exposed so the
    * idempotence contract is directly testable: every micro-batch
    * OVERWRITES its own `batch_id=<id>` directory. A post-failure
    * replay of the same batch id rewrites identical files instead of
    * appending duplicates — exactly-once by idempotence, the standard
    * `foreachBatch` file-sink recipe.
    */
  def writeBatchIdempotent(outDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Exactly-once-by-idempotence parquet sink via `foreachBatch` +
    * checkpointing: the checkpoint pins batch contents to batch ids
    * across restarts, and [[writeBatchIdempotent]] makes re-delivery
    * of a batch id harmless.
    */
  def writeIdempotentBatches(
      stream: DataFrame,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(writeBatchIdempotent(outDir) _)
      .start()

  /** Streaming twin of the q197 incremental media screen: NEW
    * documents arrive as an AvailableNow file stream, each micro-batch
    * is fingerprinted through the caller's real codec chain
    * (`hashBatch` — e.g. PNG encode→decode→dHash) and met against the
    * STATIC already-deduped corpus fingerprints with
    * [[graft.operators.Dedup.simHashIncremental]] — the
    * O(|batch|·bucket) daily-ingest join, here at micro-batch grain.
    * Matches land through the idempotent batch sink; blocks until
    * drained. `foreachBatch` is the right vehicle (not a stream-static
    * join): the screen needs the banded chunk EXPLODE + bucket gates
    * on both sides, which are batch transformations of the micro-batch.
    * The screen is micro-batch-DECOMPOSABLE by construction — pairs
    * are batch×corpus only, so the union over micro-batches equals the
    * one-shot batch screen (StreamingSpec pins this against q197's
    * pipeline on the same fixture).
    *
    * The corpus side is chunk-banded, bucket-GATED, and persisted ONCE
    * up front ([[graft.operators.Dedup.prepareSimHashCorpus]]) and
    * released when the stream drains — without that, every micro-batch
    * would re-derive the corpus-wide bucket-count aggregation (k
    * batches = k redundant corpus passes against a 100 TB store).
    */
  def runMediaDedupAvailableNow(
      spark: SparkSession,
      newDocsDir: String,
      schema: org.apache.spark.sql.types.StructType,
      corpusSh: DataFrame,
      hashBatch: DataFrame => DataFrame,
      outDir: String,
      checkpointDir: String,
      idCol: String = "doc_id",
      maxHamming: Int = 7,
      bits: Int = 64,
      readerOptions: Map[String, String] = Map.empty): Unit = {
    val (preparedCorpus, releaseCorpus) =
      graft.operators.Dedup.prepareSimHashCorpus(corpusSh, idCol, maxHamming, bits)
    try {
      val in = spark.readStream.schema(schema).options(readerOptions).parquet(newDocsDir)
      val q = in.writeStream
        .option("checkpointLocation", checkpointDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // The batch fingerprints feed the screen's chunk explode
          // TWICE (bucket-gate leg + join leg); without a persist the
          // caller's full codec chain (e.g. PNG encode→decode→dHash)
          // runs twice per micro-batch — the simHashIncremental
          // scaladoc's own advice, applied here at micro-batch grain.
          val sh = hashBatch(batch)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val pairs = graft.operators.Dedup
              .simHashIncrementalPrepared(sh, preparedCorpus, idCol, maxHamming, bits)
            writeBatchIdempotent(outDir)(pairs, batchId)
          } finally sh.unpersist(blocking = false): Unit
        }
        .start()
      q.awaitTermination()
    } finally releaseCorpus()
  }

  /** Streaming twin of the q182 intake front door (r12 verdict Next
    * #6): an AvailableNow file stream over `(doc_id, source, html)`
    * parquet runs the per-row intake stages
    * ([[graft.operators.Intake.perDocStats]] — extract → repair →
    * screen) inside each micro-batch and lands DOC-GRAIN records
    * through the idempotent batch sink, then blocks until drained.
    * The source-grain rollup is a batch query over the landed records
    * ([[graft.operators.Intake.rollup]]) — a crawl is operationally a
    * stream, and only the landed statistics ever aggregate.
    * StreamingSpec pins the rollup's bit-parity with the q182 batch
    * result on the same fixtures.
    */
  def runIntakeAvailableNow(
      spark: SparkSession,
      wrappedDir: String,
      schema: org.apache.spark.sql.types.StructType,
      outDir: String,
      checkpointDir: String,
      readerOptions: Map[String, String] = Map.empty): Unit = {
    val stream = graft.operators.Intake.perDocStats(
      spark.readStream.schema(schema).options(readerOptions).parquet(wrappedDir))
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(writeBatchIdempotent(outDir) _)
      .start()
    q.awaitTermination()
  }

  /** Stateful sessionizer (streaming twin of q16): a gap of more than
    * `gapUs` between consecutive events of a user starts a new session.
    * Arbitrary state via `flatMapGroupsWithState` — the engine hash-
    * partitions by user, each executor owns its users' state, and the
    * event-time timeout flushes sessions the watermark has passed, so
    * the operator emits every session exactly once in append mode.
    *
    * Events inside one trigger are sorted by (tsUs, eventId) before
    * merging — iterator order within a micro-batch is not guaranteed.
    * The same function sessionizes a batch Dataset (no timeout path;
    * still-open sessions simply stay unemitted), which is how the spec
    * checks parity with the batch q16 semantics.
    */
  def sessionize(
      events: Dataset[Ev],
      gapUs: Long,
      watermarkDelay: String = "10 minutes",
      flushOpen: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming

    def handle(
        userId: Long,
        batch: Iterator[Ev],
        state: GroupState[SessState]): Iterator[Session] = {
      var closed = List.empty[Session]
      if (state.hasTimedOut) {
        // Timeout invocations carry no data: the watermark passed
        // lastUs + gap, so the open session is definitively closed.
        val s = state.get
        closed ::= Session(userId, s.sessionId, s.startUs, s.lastUs, s.nEvents)
        state.remove()
      } else {
        val evs = batch.toArray.sortBy(e => (e.tsUs, e.eventId))
        var cur = state.getOption
        evs.foreach { e =>
          cur match {
            case Some(s) if e.tsUs - s.lastUs <= gapUs =>
              cur = Some(s.copy(lastUs = e.tsUs, nEvents = s.nEvents + 1))
            case Some(s) =>
              closed ::= Session(userId, s.sessionId, s.startUs, s.lastUs, s.nEvents)
              cur = Some(SessState(s.sessionId + 1, e.tsUs, e.tsUs, 1))
            case None =>
              cur = Some(SessState(1, e.tsUs, e.tsUs, 1))
          }
        }
        cur.foreach { s =>
          if (flushOpen) {
            closed ::= Session(userId, s.sessionId, s.startUs, s.lastUs, s.nEvents)
            state.remove()
          } else {
            state.update(s)
            if (streaming) state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
          }
        }
      }
      closed.reverseIterator
    }

    if (streaming)
      events
        .withColumn("eventTime", timestamp_micros(col("tsUs")))
        .withWatermark("eventTime", watermarkDelay)
        .as[Ev]
        .groupByKey(_.userId)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(handle)
    else
      events
        .groupByKey(_.userId)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(handle)
  }
}
