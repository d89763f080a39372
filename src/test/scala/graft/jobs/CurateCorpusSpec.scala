package graft.jobs

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.CurationPipeline
import graft.sources.{Expectations, TxnLake}
import graft.sources.Expectations.Expectation

/** The curated-corpus sink: lake bytes must reproduce the oracle-gated
  * plan, replays must be no-ops, and expectation violations must
  * quarantine without poisoning the snapshot. */
class CurateCorpusSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def freshTable(): String =
    Files.createTempDirectory("curate_spec").resolve("corpus").toString

  test("committed lake contents reproduce the d47 shard summary exactly") {
    val t = freshTable()
    val res = CurateCorpus.run(spark, dir, t)
    assert(res.isDefined && res.get.quarantined == 0,
      s"default expectations must pass on honest data: $res")
    // recompute the registered query's 16-row summary FROM THE LAKE and
    // demand equality with the oracle-gated plan output
    val fromLake = TxnLake.read(spark, t)
      .groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_red_chars")).as("sum_red_chars"),
        sum(col("n_toks")).as("sum_toks"),
        sum(col("sum_bits")).as("sum_bits"),
        min_by(col("doc_id"), col("perm")).as("head_doc"),
        max_by(col("doc_id"), col("perm")).as("tail_doc"),
        sum(col("pos") * col("doc_id") % 1000000007L).as("order_sig"))
      .orderBy("epoch", "shard")
      .collect().toSeq
    val fromPlan = CurationPipeline.curationPipeline
      .run(spark, dir).collect().toSeq
    assert(fromLake == fromPlan,
      s"lake-derived summary diverged:\n$fromLake\nvs\n$fromPlan")
    assert(res.get.passed == TxnLake.read(spark, t).count())
  }

  test("a scheduler retry replays as a no-op (exactly-once)") {
    val t = freshTable()
    val first = CurateCorpus.run(spark, dir, t, batchId = 7L)
    assert(first.isDefined)
    val v = TxnLake.latestVersion(spark, t)
    val replay = CurateCorpus.run(spark, dir, t, batchId = 7L)
    assert(replay.isEmpty, "same (appId, batchId) must not re-commit")
    assert(TxnLake.latestVersion(spark, t) == v)
    // a NEW batch does commit (overwrite snapshot advances the version)
    val next = CurateCorpus.run(spark, dir, t, batchId = 8L)
    assert(next.isDefined && TxnLake.latestVersion(spark, t) != v)
  }

  test("violations quarantine exactly once; the snapshot stays clean") {
    val t = freshTable()
    // shard 7 declared out-of-contract: a deterministic slice of honest
    // rows fails, exercising the split + the quarantine txn id
    val tight = CurateCorpus.DefaultExpectations
      .filterNot(_.name == "shard_in_range") :+
      Expectation("shard_in_range", col("shard").between(0, 6))
    val res = CurateCorpus.run(spark, dir, t, batchId = 1L, expectations = tight)
    assert(res.isDefined && res.get.quarantined > 0)
    val kept = TxnLake.read(spark, t)
    assert(kept.filter(col("shard") === 7).count() == 0)
    val q = TxnLake.read(spark, Expectations.quarantinePath(t))
    assert(q.count() == res.get.quarantined)
    assert(q.select("violated").distinct().collect()
      .map(_.getString(0)).toSet == Set("shard_in_range"))
    // replay: neither table re-commits
    val qv = TxnLake.latestVersion(spark, Expectations.quarantinePath(t))
    assert(CurateCorpus.run(spark, dir, t, batchId = 1L,
      expectations = tight).isEmpty)
    assert(TxnLake.latestVersion(spark, Expectations.quarantinePath(t)) == qv)
  }
}
