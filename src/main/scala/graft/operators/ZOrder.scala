package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-code) clustering — the data-layout operator behind
  * multi-dimensional data skipping (`OPTIMIZE ZORDER BY` in lakehouse
  * engines): rows are sorted by the bit-interleaving of their dimensions'
  * quantized cell coordinates, so a file/partition covers a compact
  * hyper-rectangle and a predicate on ANY clustered dimension prunes most
  * files — a plain sort clusters only its leading column.
  *
  * Everything is integer/bit arithmetic on quantized cells (exact in any
  * engine) built as a static expression tree, so the whole key stays
  * inside whole-stage codegen — no UDF, no HOF lambda re-evaluation.
  */
object ZOrder {

  /** Quantizes `x` into [0, 2^bits) given inclusive global bounds. The
    * scale factor is applied before the subtraction-normalized ratio hits
    * exactly 1.0 only at x = max, which `least` clamps to the top cell. */
  def cell(x: Column, min: Column, max: Column, bits: Int): Column = {
    val cells = 1L << bits
    when(max === min, lit(0L)).otherwise(
      least(floor((x - min) / (max - min) * cells), lit(cells - 1)).cast("long"))
  }

  /** Morton interleave of two cell coordinates (x even bits, y odd bits) —
    * a fold over bit positions producing one static codegen'd expression. */
  def zValue2(cx: Column, cy: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(cx, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(cy, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }

  /** Clusters `df` by the z-order of (xCol, yCol): RANK-quantized cell
    * coordinates per dimension, the Morton key, then a range repartition
    * + within-partition sort on it. Each output partition owns a
    * contiguous z-range = a compact region of RANK space; writing these
    * as files gives min/max footers that prune on either dimension.
    *
    * Cells are rank-based — each dimension's cell id is the row's range
    * partition under `repartitionByRange(2^bits, dim)` (Delta's
    * `range_partition_id`, sampled boundaries) — NOT a linear min/max
    * normalization. Linear quantization breaks on exactly the
    * distributions a grown lake has: clustered/sparse keys (e.g. ids
    * arriving in widely-offset blocks) collapse into a handful of linear
    * cells, the interleave degenerates to a 1-D sort on the other
    * dimension, and file pruning on the collapsed dimension dies — the
    * failure mode the factor-10 growth run of x35 caught. Rank cells
    * equidistribute ANY distribution by construction. AQE may coalesce
    * small adjacent range partitions, which only coarsens cells while
    * keeping them monotone in the dimension — pruning structure is
    * preserved.
    *
    * Cost: two extra full shuffles (one per dimension) over the
    * min/max-aggregate approach — the price of distribution-robust
    * layout, paid by a maintenance command that already rewrites every
    * byte it touches. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String, bits: Int = 8,
                 partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val cells = 1 << bits
    // spark_partition_id is non-deterministic to the optimizer, so each
    // projection stays pinned to the stage right after its exchange —
    // the id read IS that exchange's range bucket
    val cx = df.repartitionByRange(cells, col(xCol))
      .withColumn("__cx", spark_partition_id().cast("long"))
    val cy = cx.repartitionByRange(cells, col(yCol))
      .withColumn("__cy", spark_partition_id().cast("long"))
    val keyed = cy.withColumn("__z", zValue2(col("__cx"), col("__cy"), bits))
      .drop("__cx", "__cy")
    keyed.repartitionByRange(n, col("__z")).sortWithinPartitions("__z")
  }
}
