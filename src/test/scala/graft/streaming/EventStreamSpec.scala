package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.sources.Tables

class EventStreamSpec extends SparkSpec {

  /** Land a batch of the real events table (normalized schema) into a
    * temp streaming source dir. */
  private lazy val landingDir = {
    val dir = Files.createTempDirectory("stream_landing").toString
    Tables.events(SparkSpec.session, "/root/testdata/sf0.001")
      .select("event_id", "event_time", "user_id", "event_type", "value")
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("file-source stream dedups by event_id within the watermark") {
    val s = SparkSpec.session
    // duplicate every event by landing the batch twice
    val dir = Files.createTempDirectory("stream_dup").toString
    val batch = s.read.schema(EventStream.eventSchema).parquet(landingDir)
    batch.write.mode("append").parquet(dir)
    batch.write.mode("append").parquet(dir)
    val deduped = EventStream.runToMemorySink(
      EventStream.dedup(EventStream.readEvents(s, dir)), "dedup_sink")
    assert(deduped.count() == batch.count())
    assert(deduped.select("event_id").distinct().count() == batch.count())
  }

  test("windowed aggregation matches the batch equivalent") {
    val s = SparkSpec.session
    val streamed = EventStream.runToMemorySink(
      EventStream.windowedCounts(EventStream.readEvents(s, landingDir)),
      "window_sink", OutputMode.Append())
    val batch = s.read.schema(EventStream.eventSchema).parquet(landingDir)
      .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // append mode emits only watermark-closed windows; every emitted row
    // must match its batch counterpart
    val streamedRows = streamed.select("window_start", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batchRows = batch.select(col("window.start"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamedRows.nonEmpty)
    assert(streamedRows.forall { case (k, v) => batchRows.get(k).contains(v) })
  }

  test("session windows match the batch session_window equivalent") {
    val s = SparkSpec.session
    val streamed = EventStream.runToMemorySink(
      EventStream.sessionRollup(EventStream.readEvents(s, landingDir)),
      "sess_sink", OutputMode.Append())
    val batch = s.read.schema(EventStream.eventSchema).parquet(landingDir)
      .groupBy(session_window(col("event_time"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start"), col("user_id"), col("n_events"))
    // append emits only watermark-closed sessions; each must equal its
    // batch counterpart exactly (same start, same user, same count)
    val streamedRows = streamed.select("session_start", "user_id", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batchRows = batch.collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamedRows.nonEmpty)
    assert(streamedRows.forall { case (k, v) => batchRows.get(k).contains(v) })
  }

  test("stream-static enrichment matches batch join and keeps no join state") {
    val s = SparkSpec.session
    val dim = Tables.customer(s, "/root/testdata/sf0.001")
      .join(Tables.nation(s, "/root/testdata/sf0.001"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val streamed = EventStream.runToMemorySink(
      EventStream.enrichedRollup(
        EventStream.readEvents(s, landingDir), dim, "c_custkey", "n_name"),
      "enrich_sink", OutputMode.Append())
    val batch = s.read.schema(EventStream.eventSchema).parquet(landingDir)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(window(col("event_time"), "5 minutes"), col("n_name"))
      .agg(count(lit(1)).as("n"))
    val streamedRows = streamed.select("window_start", "n_name", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batchRows = batch.select(col("window.start"), col("n_name"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamedRows.nonEmpty)
    assert(streamedRows.forall { case (k, v) => batchRows.get(k).contains(v) })
    // the join itself must be stateless: the dim side carries the broadcast
    // hint (analyzed plan only — optimizing a streaming plan outside
    // writeStream trips the batch-execution checker), so it resolves to a
    // broadcast hash join, never a stream-stream join with keyed state
    val plan = EventStream.enrichedRollup(
      EventStream.readEvents(s, landingDir), dim, "c_custkey", "n_name")
      .queryExecution.analyzed.toString
    assert(plan.contains("ResolvedHint (strategy=broadcast)"))
  }

  test("left-outer interval join emits null rows once the watermark proves absence") {
    val s = SparkSpec.session
    import s.implicits._
    // user 1: click 10:00 with an error 09:30 (match, within the hour
    // before); user 2: click 10:00, no error at all (outer null); user 3:
    // click 10:00 but its error is 2h earlier (outside window -> null)
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val wave1 = Seq(
      (1L, ts("10:00"), 1L, "click", 0.0), (2L, ts("09:30"), 1L, "error", 0.0),
      (3L, ts("10:00"), 2L, "click", 0.0),
      (4L, ts("10:00"), 3L, "click", 0.0), (5L, ts("08:00"), 3L, "error", 0.0))
      .toDF("event_id", "event_time", "user_id", "event_type", "value")
    // flush wave: sentinel rows far in the future advance both watermarks
    val wave2 = Seq(
      (-1L, ts("15:00"), -1L, "click", 0.0),
      (-2L, ts("15:00"), -1L, "error", 0.0))
      .toDF("event_id", "event_time", "user_id", "event_type", "value")
    val d1 = Files.createTempDirectory("soj_w1").toString
    val d2 = Files.createTempDirectory("soj_w2").toString
    wave1.coalesce(1).write.mode("overwrite").parquet(d1)
    wave2.coalesce(1).write.mode("overwrite").parquet(d2)
    val out = EventStream.runTwoWavesFrom(d1, d2, dir =>
        EventStream.clickAfterErrorLeftJoin(
          EventStream.readEvents(s, dir).filter(col("event_type") === "click"),
          EventStream.readEvents(s, dir).filter(col("event_type") === "error")),
        s"soj_spec_${java.util.UUID.randomUUID().toString.take(8)}", s)
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 2L), (2L, 3L, -1L), (3L, 4L, -1L)))
  }

  test("checkpointed parquet sink is exactly-once across re-runs") {
    val s = SparkSpec.session
    val out = Files.createTempDirectory("stream_silver").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    def runOnce(): Unit = EventStream.runToParquetSink(
      EventStream.dedup(EventStream.readEvents(s, landingDir)), out, ckpt)
    runOnce()
    val n1 = s.read.parquet(out).count()
    assert(n1 == s.read.schema(EventStream.eventSchema).parquet(landingDir).count())
    // second run over the same landing dir: offsets committed → no new rows
    runOnce()
    assert(s.read.parquet(out).count() == n1)
  }

  test("mapGroupsWithState accumulates per-user totals") {
    val s = SparkSpec.session
    val sessions = EventStream.runToMemorySink(
      EventStream.userSessions(s, EventStream.readEvents(s, landingDir)).toDF(),
      "session_sink", OutputMode.Update())
    val batch = s.read.schema(EventStream.eventSchema).parquet(landingDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("tv"))
    val got = sessions.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = batch.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (u, (n, tv)) =>
      assert(want(u)._1 == n && math.abs(want(u)._2 - tv) < 1e-6)
    }
  }
}
