package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.{Expectations, TxnLake}

/** What the x32 oracle cannot see: the table's VERSION HISTORY. Two waves
  * must commit exactly two versions, the checkpoint-loss replay zero, and
  * no quarantine table may appear on honest data. */
class CurationStreamSpec extends SparkSpec {

  test("two waves commit two versions; the fresh-checkpoint replay commits none") {
    val d = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("cur_stream_spec").toString
    val docs = graft.sources.Tables.documents(spark, d)
    val w1 = s"$base/w1"; val w2 = s"$base/w2"
    docs.filter(col("doc_id") % 3 =!= 0).coalesce(1).write.parquet(w1)
    docs.filter(col("doc_id") % 3 === 0).coalesce(1).write.parquet(w2)
    val table = s"$base/t"
    CurationStream.runCuratedTwoWaveIngest(
      w1, w2, table, s"$base/ckpt", "spec_ingest", spark)
    // wave1 = version 0, wave2 = version 1, replay = nothing
    assert(TxnLake.latestVersion(spark, table).contains(1L),
      s"expected exactly versions 0 and 1, got ${TxnLake.latestVersion(spark, table)}")
    assert(TxnLake.latestVersion(spark,
      Expectations.quarantinePath(table)).isEmpty,
      "honest data must not quarantine")
    // cross-wave ownership: every fingerprint appears once, and a fp seen
    // in wave 1 is never re-committed by wave 2
    val rows = TxnLake.read(spark, table)
    assert(rows.groupBy("fp").count().filter(col("count") > 1).count() == 0)
    val batches = rows.select("ingest_batch").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(batches == Set(0, 1), s"got batches $batches")
  }
}
