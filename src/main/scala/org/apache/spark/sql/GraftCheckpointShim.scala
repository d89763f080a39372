package org.apache.spark.sql

import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Statistics hygiene for iterative DataFrame algorithms (see
  * [[graft.operators.SuffixArray]]).
  *
  * Spark 4's `Dataset.localCheckpoint` rewrites the new LogicalRDD
  * leaf's statistics to the ORIGINAL plan's estimate
  * (`LogicalRDD.rewriteStatsAndConstraints`). For an iterative
  * superstep loop that is quietly catastrophic: size-only join
  * estimation (`SizeInBytesOnlyStatsPlanVisitor.visitJoin`) MULTIPLIES
  * child sizes, and a superstep's inputs are previous checkpoints —
  * so the carried `sizeInBytes` BigInt roughly squares every superstep,
  * its bit length doubling each time. By superstep ~14 (a 10⁵-token
  * document in the suffix tier) the driver spends minutes inside
  * `BigInteger.multiply` merely *evaluating statistics*, observed as a
  * single-core planner stall with Karatsuba/Toom-Cook frames on the
  * main thread.
  *
  * This shim rebuilds a just-checkpointed Dataset's leaf WITHOUT the
  * carried statistics. The planner then falls back to
  * `spark.sql.defaultSizeInBytes` for the leaf — the honest "unknown"
  * answer — and AQE re-plans joins from true runtime sizes, which is
  * exactly the treatment a materialized intermediate of unknowable size
  * should get. Data, partitioning, and ordering are untouched: the same
  * checkpointed RDD backs the result.
  *
  * Lives in the `org.apache.spark.sql` package solely for
  * `Dataset.ofRows` access; everything else is public Spark API.
  */
object GraftCheckpointShim {

  /** `df` must be freshly `localCheckpoint()`ed (its logical plan a
    * [[LogicalRDD]]); any other plan is returned unchanged. */
  def dropCarriedStats(df: Dataset[Row]): Dataset[Row] =
    df.queryExecution.logical match {
      case lr: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[CSparkSession]
        val clean = new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(session, None, None)
        CDataset.ofRows(session, clean)
      case _ => df
    }
}
