package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for iterative operators: `localCheckpoint()` blocks are
  * NOT dropped by `spark.catalog.clearCache()` (that only clears DataFrame
  * caches), so a long-lived session running checkpoint-based operators
  * repeatedly accumulates dead blocks until executor memory pressure slows
  * every later query. Operators free their intermediate checkpoints as soon
  * as the next round is materialized; only the blocks backing the RETURNED
  * plan remain (callers running many queries in one session can drop those
  * via `sparkContext.getPersistentRDDs` once results are consumed).
  */
object CheckpointUtils {

  /** Frees the storage blocks backing a `localCheckpoint()`'d DataFrame.
    * Safe only once nothing unmaterialized references it — the lineage was
    * truncated, so a dropped block cannot be recomputed. No-op for plans
    * that are not a direct checkpoint scan. */
  def unpersistBacking(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
