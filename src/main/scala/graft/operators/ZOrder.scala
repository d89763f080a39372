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

  /** Clusters `df` by the z-order of (xCol, yCol): one global min/max
    * aggregate (broadcast back — no driver round-trip in the plan), the
    * Morton key, then a range repartition + within-partition sort on it.
    * Each output partition owns a contiguous z-range = a compact region of
    * the (x, y) space; writing these as files gives min/max footers that
    * prune on either dimension. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String, bits: Int = 8,
                 partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val bounds = df.agg(
      min(col(xCol)).as("__xmin"), max(col(xCol)).as("__xmax"),
      min(col(yCol)).as("__ymin"), max(col(yCol)).as("__ymax"))
    val keyed = df.crossJoin(broadcast(bounds))
      .withColumn("__z", zValue2(
        cell(col(xCol), col("__xmin"), col("__xmax"), bits),
        cell(col(yCol), col("__ymin"), col("__ymax"), bits), bits))
      .drop("__xmin", "__xmax", "__ymin", "__ymax")
    keyed.repartitionByRange(n, col("__z")).sortWithinPartitions("__z")
  }
}
