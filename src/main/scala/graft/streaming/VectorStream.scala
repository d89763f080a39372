package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions._
import graft.sources.{Expectations, TxnLake}
import graft.sources.Expectations.Expectation

/** Streaming EMBEDDING ingest with an incremental cell-scoped semantic
  * dedup gate — the vector-modality counterpart of [[CurationStream]]'s
  * document ingests (x32–x34), the motion an embedding store runs as new
  * vectors arrive: per micro-batch, drop every vector whose cosine to an
  * ALREADY-COMMITTED vector in the SAME coarse cell reaches `eps` (the
  * d32 SemDeDup rule at the delta-vs-corpus grain), then commit the
  * survivors through the exactly-once expectations sink. The coarse cell
  * is the `label` quantizer (the x06/d32 convention — production swaps
  * in IVF centroid assignment and nothing else changes).
  *
  * Scale: the probe is one label-keyed equi-join of the day's delta
  * against the committed corpus, with the quadratic confined to each
  * cell (the published SemDeDup cost model); the corpus side prunes
  * BOTH ways — to (vec_id, label, embedding) column-wise, and to the
  * BATCH'S CELLS file-wise: commits land label-range-clustered, so the
  * probe's [[graft.sources.TxnLake.readKeyed]] scan skips every file
  * whose label stats miss the arrivals' distinct labels (collected to
  * the driver — bounded by the quantizer's cell count, k centroids in
  * production, never by row volume; the per-key stats test runs on the
  * driver, so no In-literal list ever enters the plan, and the row-level
  * cell restriction is a broadcast semi-join). At a 100 TB vector store with a
  * fixed-size daily delta, the probe therefore reads only the touched
  * cells' files, never the full table. No index sibling is needed
  * because the CELL KEY already lives in the table (where x33/x34 must
  * derive band keys / windows from text, the vector table IS its own
  * inverted index). Exactly-once is the x32 doctrine verbatim:
  * (appId, batchId) txns in the table log absorb the checkpoint-loss
  * replay.
  */
object VectorStream {

  /** embeddings.parquet schema as landed (matches TESTDATA.md). */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def readEmbeddings(spark: SparkSession, landing: String): DataFrame =
    spark.readStream.schema(embSchema).parquet(landing)

  /** The vector-store commit contract. */
  val IngestExpectations: Seq[Expectation] = Seq(
    Expectation("vec_id_present", col("vec_id").isNotNull),
    Expectation("dim_64", size(col("embedding")) === 64),
    Expectation("label_present", col("label").isNotNull))

  /** One micro-batch through the incremental SemDeDup gate: batch
    * vectors probe the committed corpus label-by-label; cosine ≥ `eps`
    * to ANY committed cell-mate drops the arrival (the committed vector
    * is the semantic representative — first-arrival-wins, the streaming
    * analog of d32's min-id survivor). Within-batch near-dups are NOT
    * collapsed (that is d32's batch job; orthogonal gates keep each
    * oracle exact).
    *
    * `maxCell` is the d32 mega-cluster doctrine at the streaming grain:
    * a cell whose COMMITTED population exceeds the cap skips the probe
    * entirely (arrivals keep — conservative), because the per-arrival
    * probe cost is the cell size and a degenerate cell would otherwise
    * make every future batch pay it forever (the factor-30 growth run
    * measures exactly that quadratic when the cap is lifted). Inert at
    * test SFs by design; production re-clusters (grows k) instead of
    * letting any cell reach the cap. Emits
    * (vec_id, embedding, label, ingest_batch). */
  def curateVecBatch(batch: DataFrame, table: String, batchId: Long,
                     eps: Double = 0.3, maxCell: Int = 4096): DataFrame = {
    val s = batch.sparkSession
    // commits land RANGE-CLUSTERED on the cell key, so every data file
    // carries tight label min/max stats and future probes skip untouched
    // cells at file grain (the x35 clustering + x24 skipping machinery)
    val out = (df: DataFrame) => clusterForCommit(
      df.select(col("vec_id"), col("embedding"),
        col("label"), lit(batchId).cast("int").as("ingest_batch")))
    if (TxnLake.latestVersion(s, table).isEmpty) return out(batch)
    val norm = (df: DataFrame, idAs: String, vAs: String, nAs: String) => df
      .select(col("vec_id").as(idAs), col("label"),
        toDouble(col("embedding")).as(vAs))
      .withColumn(nAs, l2Norm(col(vAs)))
    // prune the corpus scan to the batch's cells: the distinct labels are
    // bounded by the quantizer's cell count (k centroids in production),
    // so the driver-side collect is O(k). File pruning goes through
    // readKeyed — per-file stats tested key-by-key ON THE DRIVER, so no
    // In-literal ever enters the plan (a production quantizer at k=2^16
    // would otherwise mint a 65k-literal predicate) — and row-level
    // exactness comes from a broadcast semi-join against the same
    // distinct-label relation
    val batchLabels = batch.select("label").distinct()
      .filter(col("label").isNotNull)
    val labelKeys = batchLabels.collect().map(_.getInt(0).toString).toSeq
    val (prunedCells, skipping) =
      TxnLake.readKeyed(s, table, "label", labelKeys)
    lastProbeSkipping = skipping
    val committedCells = prunedCells
      .join(broadcast(batchLabels), Seq("label"), "left_semi")
    val keptCells = committedCells.groupBy("label")
      .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxCell)
      .select("label")
    val arrivals = norm(batch, "vec_id", "va", "na")
    val committed = norm(committedCells, "id_b", "vb", "nb")
      .join(broadcast(keptCells), Seq("label"))
    // zero-norm guard: `when` nulls the divisor instead of letting the
    // session's ANSI mode raise DIVIDE_BY_ZERO mid-batch on a degenerate
    // (all-zero) embedding — the NULL cosine fails the >= and the
    // arrival is KEPT, exactly the oracle's NULL semantics
    val denom = col("na") * col("nb")
    val dropped = arrivals.join(committed, Seq("label"))
      .filter(dot(col("va"), col("vb")) / when(denom =!= 0.0, denom) >= eps)
      .select("vec_id").distinct()
    out(batch.join(dropped, Seq("vec_id"), "left_anti"))
  }

  /** Files per commit (label-range buckets). Small at test SF; a
    * production store sizes this so file count tracks cell count. */
  private val CommitFiles = 4

  /** The commit LAYOUT contract in one place — label-range clustering
    * into [[CommitFiles]] files — shared by [[curateVecBatch]]'s output
    * and any harness that founds a store without the probe (the scale
    * harness's fixture setup); a drift here would silently un-prune
    * every future probe. */
  private[graft] def clusterForCommit(df: DataFrame): DataFrame =
    df.repartitionByRange(CommitFiles, col("label"))

  /** Observability seam: (files kept, files total) of the most recent
    * probe's cell-pruned corpus scan — the files-skipped gate the
    * VectorStreamSpec and the scale harness assert on. */
  @volatile private[graft] var lastProbeSkipping: (Int, Int) = (0, 0)

  /** Drive the vector ingest over TWO waves with the same exactly-once +
    * checkpoint-loss-replay proof as [[CurationStream]] (shared two-wave
    * runner; only the source schema and the gate differ). */
  def runVectorTwoWaveIngest(wave1Dir: String, wave2Dir: String,
                             table: String, checkpointDir: String,
                             appId: String, spark: SparkSession,
                             eps: Double = 0.3): Unit = {
    val sink = (batch: DataFrame, batchId: Long) => {
      // replay fast-path (cost short-circuit; the txn guard inside the
      // commit remains the correctness mechanism)
      if (!TxnLake.lastTxn(batch.sparkSession, table, appId)
            .exists(_ >= batchId)) {
        Expectations.commitOnceWithExpectations(
          batch.sparkSession, curateVecBatch(batch, table, batchId, eps),
          table, "append", appId, batchId, IngestExpectations)
      }
      ()
    }
    CurationStream.runTwoWaveSink(wave1Dir, wave2Dir, checkpointDir, spark,
      sink)(readEmbeddings(spark, _))
  }
}
