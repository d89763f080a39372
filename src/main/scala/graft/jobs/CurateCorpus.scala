package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.CurationPipeline
import graft.sources.Expectations
import graft.sources.Expectations.{Expectation, ExpectationResult}

/** Materializes the d47 curation plan: the per-(doc, epoch) shard
  * assignment — WITH the redacted document text — lands in a
  * transactional [[graft.sources.TxnLake]] table, gated by commit-time
  * expectations and idempotent under scheduler retries
  * (`Expectations.commitOnceWithExpectations`). This is the sink half
  * the registered d47 query deliberately omits: the query hash-gates the
  * PLAN (the 16-row shard summary), this job ships the CORPUS, and
  * `CurateCorpusSpec` closes the loop by recomputing the summary from
  * the committed lake bytes and demanding equality with the oracle-gated
  * query — the lake provably contains what the plan promised.
  *
  * Reference analog: the gold-layer publish, scripts/
  * process_silver_to_gold.py:143-158 (full-replace warehouse load),
  * re-expressed for the training-data tier with ACID + quality gates.
  *
  * Scale: the input relation is the pipeline's own shard assignment (no
  * extra shuffles beyond d47's); the write is one snapshot commit whose
  * files the log tracks — per-shard consumers prune by the table's
  * per-file stats (epoch/shard min-max) rather than directory layout.
  */
object CurateCorpus {

  /** Commit-time contract of the curated corpus: structural invariants a
    * pipeline bug would violate BEFORE training jobs consume the shards.
    * Violations quarantine (append-only audit), they don't kill the run. */
  val DefaultExpectations: Seq[Expectation] = Seq(
    Expectation("doc_id_present", col("doc_id").isNotNull),
    Expectation("text_nonempty", length(col("rtext")) >= 1),
    Expectation("epoch_in_range", col("epoch").between(0, 1)),
    Expectation("shard_in_range", col("shard").between(0, 7)),
    Expectation("pos_positive", col("pos") >= 1),
    Expectation("tokens_positive", col("n_toks") >= 1))

  /** Runs the pipeline and commits the curated corpus to `table`.
    * Returns None when (appId, batchId) is already committed — the
    * at-least-once replay case. */
  def run(spark: SparkSession, sfDir: String, table: String,
          appId: String = "curate_corpus", batchId: Long = 0L,
          expectations: Seq[Expectation] = DefaultExpectations): Option[ExpectationResult] = {
    // pinned: the expectations commit runs three actions (violation count,
    // quarantine write, target write) over this — the Expectations
    // persist-your-expensive-upstream contract; without it the pipeline's
    // tail stages execute three times
    val shards = CurationPipeline.shardAssignments(spark, sfDir, withText = true)
      .persist()
    try Expectations.commitOnceWithExpectations(
      spark, shards, table, "overwrite", appId, batchId, expectations)
    finally shards.unpersist()
  }
}
