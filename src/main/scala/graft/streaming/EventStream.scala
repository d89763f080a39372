package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming analog of the reference's batch re-ingest
  * (SURVEY §2.11 / §7.6): the reference handles late/updated data by
  * re-reading the world daily plus latest-update-wins dedup; the idiomatic
  * streaming counterpart is a file-source stream with watermarked dedup and
  * windowed aggregation, plus a stateful per-key session via
  * mapGroupsWithState.
  *
  * Scale: state is keyed by event/user id (hash-partitioned state store);
  * the watermark bounds state size — the knobs that matter at 100 TB/day.
  */
object EventStream {

  /** Schema of the landed event files (mirrors the `events` testdata table,
    * with the timestamp already normalized to a proper TimestampType). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_time", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-source stream over a landing directory. */
  def readEvents(spark: SparkSession, landingDir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(landingDir)

  /** Watermarked exact dedup by event_id — the streaming form of the
    * batch latest-update-wins window (W1). */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Windowed per-type aggregation (counts + value sums per 5-minute
    * tumbling window) — the streaming BI rollup. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-user session windows (gap-merged) — the streaming sessionization
    * surface. A session spans events closer than `gap` apart; its window is
    * [first event, last event + gap). In append mode a session is emitted
    * once the watermark passes its end, so over a static landing dir the
    * result is exactly the batch sessionization filtered to closed
    * sessions. */
  def sessionRollup(events: DataFrame, gap: String = "5 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Stream-stream interval join: clicks matched to errors by the same
    * user within the hour after the error — the streaming twin of the
    * batch interval join (q23). Both sides carry watermarks and the join
    * condition bounds event-time distance, so the state store can evict
    * rows once the watermark passes their match window (the state-cleanup
    * contract stream-stream joins require). Inner matches are emitted as
    * soon as both sides arrive. */
  def clickAfterErrorJoin(clicks: DataFrame, errors: DataFrame,
                          watermark: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("event_time").as("c_time"),
        col("event_id").as("click_id"))
      .withWatermark("c_time", watermark)
    val e = errors
      .select(col("user_id").as("e_user"), col("event_time").as("e_time"),
        col("event_id").as("error_id"))
      .withWatermark("e_time", watermark)
    c.join(e, expr(
        "c_user = e_user AND c_time >= e_time AND c_time <= e_time + interval 1 hour"))
      .select(col("c_user").as("user_id"), col("click_id"), col("error_id"))
  }

  /** Stream-stream LEFT OUTER interval join — the outer twin of
    * [[clickAfterErrorJoin]]: every click emits either its error matches
    * (as soon as both sides arrive, inner semantics) or one null-error row
    * once the watermark proves no matching error can still arrive. The
    * null emission is exactly the state-eviction contract: a click is held
    * in state until the watermark passes the end of its match window, then
    * emitted with nulls if it never matched — so outer results trail the
    * watermark by design, and driving a query to completion requires
    * advancing the watermark past the last click (see x21's flush wave).
    * State stays bounded at scale for the same reason the inner join's
    * does: both sides evict on watermark. */
  def clickAfterErrorLeftJoin(clicks: DataFrame, errors: DataFrame,
                              watermark: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("event_time").as("c_time"),
        col("event_id").as("click_id"))
      .withWatermark("c_time", watermark)
    val e = errors
      .select(col("user_id").as("e_user"), col("event_time").as("e_time"),
        col("event_id").as("error_id"))
      .withWatermark("e_time", watermark)
    c.join(e, expr(
        "c_user = e_user AND c_time >= e_time AND c_time <= e_time + interval 1 hour"),
        "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("error_id"))
  }

  /** Stream-static enrichment rollup: each fact event joins a broadcast
    * static dimension, then a 5-minute tumbling per-attribute rollup. The
    * stream-static join keeps NO join state — the dim is a broadcast table
    * re-resolved per micro-batch, which is the 100-TB shape for fact-stream
    * × small-dim enrichment (state store holds only the windowed agg, and
    * the watermark bounds it). */
  def enrichedRollup(events: DataFrame, dim: DataFrame, dimKey: String,
                     dimAttr: String, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .join(broadcast(dim), col("user_id") === col(dimKey))
      .groupBy(window(col("event_time"), "5 minutes"), col(dimAttr))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col(dimAttr),
        col("n"), col("sum_value"))

  case class UserEvent(event_id: Long, event_time: java.sql.Timestamp,
                       user_id: Long, event_type: String, value: Double)
  case class UserSessionState(nEvents: Long, totalValue: Double)
  case class UserSession(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user totals via mapGroupsWithState
    * (the arbitrary-stateful-processing surface). */
  def userSessions(spark: SparkSession, events: DataFrame): Dataset[UserSession] = {
    import spark.implicits._
    events.as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserSessionState, UserSession](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserSessionState]) =>
          val prev = state.getOption.getOrElse(UserSessionState(0L, 0.0))
          var n = prev.nEvents
          var total = prev.totalValue
          rows.foreach { e => n += 1; total += e.value }
          state.update(UserSessionState(n, total))
          UserSession(userId, n, total)
      }
  }

  /** Drive a streaming query synchronously to completion over whatever is
    * currently in the landing dir (memory sink; local smoke harness).
    *
    * Stateful operators create one state-store instance per shuffle
    * partition, and every micro-batch pays a per-partition commit; at local
    * bench scale 32 partitions means the state-store overhead dominates the
    * actual work (measured 11.3 s → 2.3 s on the sf0.1 session rollup going
    * 32 → 8). The partition count is fixed into the checkpoint at query
    * start, so this harness sets a right-sized value for the duration of
    * the query and restores the session conf after; a production deployment
    * sizes it to cluster state volume instead. */
  def runToMemorySink(df: DataFrame, queryName: String,
                      outputMode: OutputMode = OutputMode.Append,
                      statePartitions: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
    try {
      val q = df.writeStream
        .format("memory").queryName(queryName).outputMode(outputMode)
        .start()
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(queryName)
  }

  /** Drive a streaming query over TWO ingest waves with a barrier between
    * them — the harness for late-data semantics: wave 1 advances the
    * watermark, so wave-2 rows with event times behind it are dropped as
    * too late. Files are copied into a scratch landing dir between
    * `processAllAvailable()` calls (the file source lists new files per
    * micro-batch), so each wave is exactly one batch and the watermark
    * the second wave faces is exactly max(wave-1 event time) − delay. */
  def runTwoWaves(wave1Dir: String, wave2Dir: String,
                  build: DataFrame => DataFrame, queryName: String,
                  spark: SparkSession,
                  statePartitions: Int = 8): DataFrame =
    runTwoWavesFrom(wave1Dir, wave2Dir,
      dir => build(readEvents(spark, dir)), queryName, spark, statePartitions)

  /** As [[runTwoWaves]], but hands the scratch landing DIR to the builder
    * so queries that need several independent source streams over the same
    * landing (e.g. a stream-stream self-join's two filtered sides) can
    * call [[readEvents]] more than once. */
  def runTwoWavesFrom(wave1Dir: String, wave2Dir: String,
                      buildFromLanding: String => DataFrame, queryName: String,
                      spark: SparkSession,
                      statePartitions: Int = 8): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory("graft_two_wave")
    // Copy to a non-.parquet temp name, then ATOMIC_MOVE into place: the
    // running FileStreamSource polls the scratch dir continuously (not
    // only inside processAllAvailable), and the source dedups by path —
    // a listing that catches a half-copied .parquet would pin its partial
    // length forever (failed footer read or silently truncated rows).
    def land(src: String, prefix: String): Unit = {
      val dir = java.nio.file.Paths.get(src)
      val stream = java.nio.file.Files.list(dir)
      try {
        val files = stream.iterator()
        var i = 0
        while (files.hasNext) {
          val f = files.next()
          if (f.getFileName.toString.endsWith(".parquet")) {
            val tmp = scratch.resolve(s"${prefix}_$i.inflight")
            java.nio.file.Files.copy(f, tmp)
            java.nio.file.Files.move(tmp, scratch.resolve(s"${prefix}_$i.parquet"),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            i += 1
          }
        }
      } finally stream.close()
    }
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
    try {
      land(wave1Dir, "w1")
      val q = buildFromLanding(scratch.toString).writeStream
        .format("memory").queryName(queryName).outputMode(OutputMode.Append)
        .start()
      q.processAllAvailable() // wave 1: watermark was -inf, everything lands
      land(wave2Dir, "w2")
      q.processAllAvailable() // wave 2: filtered against wave 1's watermark
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(queryName)
  }

  /** Production-shaped sink: checkpointed parquet with an AvailableNow
    * trigger — processes everything currently landed, then stops. The
    * checkpoint gives exactly-once file-sink semantics: re-running over the
    * same landing dir appends nothing (source offsets are committed), and a
    * crash mid-batch replays without duplicates. This is the streaming
    * medallion ingest: landing → (dedup/transform) → silver parquet. */
  /** Transactional exactly-once sink: every micro-batch commits to a
    * [[graft.sources.TxnLake]] table through `commitOnce`, keyed by
    * (appId, batchId) — the Delta `txn` idempotence pattern. The plain
    * parquet file sink below is exactly-once only for ITS OWN file
    * manifest; foreachBatch is officially at-least-once (a crash between
    * sink write and offset commit re-delivers the batch on restart), so
    * any side-effecting batch sink must dedupe on batchId itself. Here the
    * replayed batch finds its (appId, batchId) txn already in the table
    * log and skips — the table observes each batch exactly once no matter
    * how many times the query restarts.
    *
    * At scale this is the canonical streaming-lakehouse ingest shape:
    * state lives in the checkpoint, idempotence lives in the table log,
    * and the two recover independently. */
  def runToTxnSink(df: DataFrame, table: String, checkpointDir: String,
                   appId: String): Unit = {
    val q = df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.TxnLake.commitOnce(
          batch.sparkSession, batch, table, "append", appId, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  def runToParquetSink(df: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
