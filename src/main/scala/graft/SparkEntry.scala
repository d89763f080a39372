package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticQueries, CurationPipeline, CurationQueries, OperatorQueries, OracleQuery, PipelineQueries, RelationalQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each registered query is an [[OracleQuery]]: a Spark implementation paired
  * (where SQL-expressible) with DuckDB oracle SQL over the same parquet
  * tables. Registries live next to the operator families they exercise:
  *
  *  - q01–q25 [[graft.queries.RelationalQueries]] — SURVEY §2 relational
  *    inventory + as-of/interval joins, rollup, semi/anti, distinct tiers
  *  - q26–q47, q49–q51 [[graft.queries.AnalyticQueries]] — frames, lag/lead, exact
  *    percentiles, string suite, pivot, set ops, null-safe equality,
  *    CUBE, GROUPING SETS, salted skew-safe aggregation, correlated
  *    subqueries, stats suite (corr/covar/regr), incremental upsert,
  *    date gap-fill, global top-k, z-order clustering keys, typed-
  *    Aggregator group top-K, sequential event funnel, weekly
  *    cohort retention, batch sessionization
  *  - d01–d20, d25–d27, d29, d33, d35–d36, d38–d45, d48–d51, d53 [[graft.queries.TextQueries]] — token/quality/
  *    langid/fingerprint/dedup family (exact, MinHash-LSH, SimHash, exact
  *    n-gram Jaccard, edit-distance, cluster collapse), chunking, TF-IDF,
  *    corpus curation, token packing, md5-bucket train/eval split,
  *    winnowing, repetition filters, vocabulary/OOV analysis,
  *    contamination screen, BM25 retrieval, cross-doc repeated-span
  *    census, BPE merge discovery, incremental delta-vs-index screening,
  *    hybrid sparse+dense RRF retrieval, length-bucketed batching census,
  *    LSH recall evaluation vs lossless ground truth, BPE segmentation
  *    application, cross-source duplication matrix, repeated-span
  *    removal (hot-span excision with hash-gated cleaned text),
  *    deterministic per-epoch shuffle + training-shard assignment,
  *    quality-aware dedup survivor selection, exact asymmetric n-gram
  *    containment join (quote/subset near-dup), unicode NFC
  *    canonicalization + control-char scrub (native expression),
  *    distributed suffix-array longest-repeated-span discovery
  *    (prefix-doubling supersteps over range-partitioned competition
  *    ranks; oracle brute-forces the O(n·len) span census),
  *    mega-bucket-guarded LSH near-dup (oversized band buckets emit a
  *    representative star — linear in the cluster; see SCALE.md skew
  *    run), order-sensitive n-gram novelty (first-seen attribution — the
  *    curation-stream dedup-rate curve), suffix-array exact-substring
  *    dedup (excise every ≥50-token span occurring ≥2× corpus-wide —
  *    the Lee et al. §4.1 application, cleaned text hash-gated against
  *    a window-census oracle)
  *  - d21–d24, d28, d30–d31, d34, d37, d46, d52, d54 [[graft.queries.CurationQueries]] —
  *    PII scrub, stratified corpus mixing, unigram-LM surprisal,
  *    boilerplate n-gram pruning, DSIR importance weighting, bigram-LM
  *    conditional surprisal, hashed-feature linear quality classifier,
  *    deterministic weighted priority sampling, temperature-scaled
  *    mixture weights,
  *    surprisal-quantile bucketed mixing (exact quartiles via
  *    distributed prefix-sum ranks, per-quartile md5 sampling),
  *    trained-then-frozen LR quality inference (FreezeQualityLr's
  *    learned weights as oracle-exact arithmetic — logit + decision,
  *    no transcendental), greedy token-budget corpus selection
  *    (quality-ordered weighted prefix sum of token counts, full-fit
  *    keep rule — the "top-quality B tokens" training-set construction)
  *  - v01–v12, d32 [[graft.queries.VectorQueries]] — embedding math, ANN
  *    baseline, int8 quantization, quantized-prefilter re-rank ANN,
  *    Johnson–Lindenstrauss random-projection coarse ANN + exact re-rank,
  *    SemDeDup cluster-scoped semantic dedup, MMR diversified re-rank,
  *    per-label outlier scores, ANN recall evaluation, broadcast-Lloyd
  *    distributed k-means
  *  - x01–x70 [[graft.queries.OperatorQueries]] — SRP-LSH (oracled), IVF,
  *    multimodal features + frame sampling, streaming windows + sessions +
  *    dedup + interval join + mapGroupsWithState + late-data census +
  *    stream-static broadcast enrichment,
  *    sketch-tolerance checks (HLL, quantile, heavy hitters), bucketed
  *    co-located join, PQ-ADC ANN, one-pass table profiling,
  *    integer-exact weighted PageRank, stream-stream outer join,
  *    exactly-once transactional streaming ingest, IVF-PQ composed ANN,
  *    stats-pruned data-skipping scan with oracled file counters,
  *    change-data-feed snapshot diff, incremental MV maintenance,
  *    streaming CDF consumer with exactly-once restart recovery,
  *    commit-time expectations with transactional quarantine,
  *    log-carried schema evolution with historical time travel,
  *    metadata-only RESTORE TO VERSION rollback,
  *    perceptual-hash image dedup over binary media columns,
  *    streaming curated ingest (two-wave scrub/gate/dedup-vs-table with
  *    exactly-once expectations commits and checkpoint-loss replay),
  *    plus the same ingest with the incremental delta-vs-index near-dup
  *    gate (the committed table doubles as its own LSH index),
  *    OPTIMIZE ZORDER layout maintenance with before/after skipping
  *    counters, VACUUM with retention-window time-travel proof,
  *    streaming ingest under continuous compaction (exactly-once
  *    surviving interleaved maintenance commits), incremental
  *    small-file compaction (pack only sub-threshold files, large
  *    files carry over verbatim — O(debt), never O(table)), and
  *    streaming embedding ingest with an incremental cell-scoped
  *    SemDeDup gate (first-arrival-wins vs the committed corpus,
  *    quadratic confined per cell, label-clustered commits + a
  *    cell-pruned delta-vs-corpus probe), indexed near-dup ingest UNDER
  *    continuous compaction (version-coverage index trust — maintenance
  *    commits classify as data-preserving, the probe path survives),
  *    predicate-scoped OPTIMIZE … WHERE (re-cluster only in-scope
  *    files, out-of-scope files carry over verbatim), the decontam
  *    twin of the maintained ingest (window index under compaction),
  *    streaming ingest with provenance-scoped INCREMENTAL compaction
  *    in the loop (pack only the batch's own landed files — O(debt)),
  *    row-level DELETE WHERE (copy-on-write, stats-scoped, NULL keeps
  *    the row), table_changes at O(changes-per-commit) (per-commit
  *    log-delta walk; appends as inserts, deletes as
  *    removed-minus-added, maintenance silent), SCAN-SCALED sibling-index
  *    probes (per-file Bloom sidecars on the fp/band/window key columns;
  *    the delta-vs-index candidate plan streams a bloom-pruned index scan
  *    against a broadcast delta — zero index-side exchanges, gated
  *    in-engine for both the band and window index), MERGE INTO
  *    (copy-on-write upsert stats-scoped by the merge keys, untouched
  *    files carry verbatim, O(touched) change-feed attribution,
  *    idempotent re-merge emits no changes), row-level UPDATE WHERE
  *    (the scalar DML sibling, SQL NULL-predicate semantics, update
  *    pre/post-image feed pairs), clause-based MERGE applying a CDC
  *    batch — tombstone DELETE, post-image UPDATE, conditional INSERT
  *    in one transaction with the mid buckets carried verbatim — and
  *    the sharded replica reconcile (NOT MATCHED BY SOURCE repair:
  *    drifted rows fix, retired rows soft-delete to a sentinel,
  *    overflow rows hard-delete, sub-shard files untouched), plus
  *    continuous CDC replication (TxnReplicaFeed — source versions as
  *    offsets, one exactly-once clause merge per hop, maintenance
  *    hops land as empty marker merges), schema-evolving MERGE
  *    (merge-time autoMerge: clause-assigned new columns join the
  *    log-carried schema, carried files null-fill without rewriting,
  *    narrow versions still time-travel), and DELETION VECTORS
  *    (merge-on-read delete: matched positions land in per-file
  *    sidecars, no data file moves, every read/feed path honors the
  *    masks, REORG-style purge materializes them away, bulk deletes
  *    fall back to copy-on-write), merge-on-read UPDATE via deletion
  *    vectors (one commit masks the pre-images and appends one
  *    post-image file — O(matched rows), never O(touched bytes); the
  *    feed classifies the hop as full update pairs), and TIMESTAMP AS
  *    OF time travel (log-entry publish mtimes, monotone-adjusted;
  *    pre-history reads refused naming the earliest instant), and
  *    table CLONE (shallow = zero-copy absolute references with full
  *    bidirectional lifecycle isolation; deep = self-contained byte
  *    copy; both carry schema, stats, bloom declaration, and masks),
  *    metadata-only ALTER TABLE ADD/DROP COLUMN (one log entry,
  *    zero files moved, null-fill/projection read semantics, drop
  *    TOMBSTONES refusing silent byte resurrection), persistent
  *    CHECK constraints (ADD/DROP CONSTRAINT table properties,
  *    validated at declaration, enforced O(delta) on every later
  *    data commit with atomic refusal, pinning referenced columns),
  *    DESCRIBE DETAIL + VACUUM DRY RUN (files/bytes/logical-rows/
  *    mask census + the property surface; the dry run predicts
  *    vacuum's reclaim exactly without deleting a byte), and
  *    GENERATED columns (declared on an empty table, filled at write
  *    time when omitted, validated null-safe when supplied — an
  *    inconsistent value or invariant-breaking UPDATE refuses), and
  *    TYPE WIDENING (metadata-only lossless promotions; old files
  *    upcast natively at scan, integer-era stats still prune exactly,
  *    bloom-rendering hazards refused), and ROW TRACKING (per-file
  *    baseRowId reserved at commit, fresh ids virtual `brid +
  *    row_index` at zero append cost, engine rewrites materialize the
  *    ids they read — stable through CoW DML, DV hops, OPTIMIZE,
  *    restore, and clone; readWithRowIds exposes them, plain reads
  *    never see them; tableChangesByRowId keys the change feed on
  *    stable identity — a rekeying update classifies as the update it
  *    is, and no user key is needed), and column RENAME via COLUMN
  *    MAPPING (one
  *    metadata entry; files/stats/bloom sidecars keep the stable
  *    physical name, a cumulative physical→display overlay renames at
  *    the boundaries — retired-name writes refuse, skipping stays
  *    live, old versions time-travel under their era's names,
  *    identity/generated columns pin their own rename while
  *    constraint- and gen-expression-referenced columns rename WITH
  *    their references: the stored SQL rewrites in the same metadata
  *    commit and keeps enforcing under the new name), DISTRIBUTED
  *    snapshot file-list pruning (past a file-count cap the parquet
  *    checkpoint is read as a table and the stats matcher runs on the
  *    executors — only surviving paths collect, the driver never
  *    holds the O(snapshot) list; identical kept sets both regimes,
  *    seam-gated), and the RATE-LIMITED backfill ingest
  *    (maxFilesPerTrigger as the curation counterpart of the replica
  *    feed's maxFilesPerHop: bounded micro-batches through the
  *    unchanged exactly-once sink, injected-crash convergent resume)
  *  - q48 [[graft.queries.PipelineQueries]] — the earthquake pipeline
  *    itself (bronze GeoJSON → silver → gold star schema) end to end
  *    over the deterministic USGS fixture, surrogate-key joins gated
  *  - d47 [[graft.queries.CurationPipeline]] — the LLM-curation tier
  *    composed end to end (scrub → quality/langid → exact + near dedup
  *    with quality survivors → containment prune → PII redaction →
  *    surprisal-quantile mixing → epoch shards), the q48 analog for
  *    training data, final shard assignment order-signature gated
  *  - d38s/v10s — the recall evaluations at their deterministic 25 %
  *    md5-bucket sample rate, the 100 TB-realistic estimator cost
  *
  * COVERAGE.md maps every SURVEY §2 operator ID to its implementation,
  * query, and test.
  */
object SparkEntry {

  private def registry: Seq[OracleQuery] =
    RelationalQueries.all ++ AnalyticQueries.all ++ TextQueries.all ++
      CurationQueries.all ++ VectorQueries.all ++ OperatorQueries.all ++
      PipelineQueries.all ++ CurationPipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q04.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.sql.map(q.name -> _)).toMap
}
