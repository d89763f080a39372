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
    zValueK(Seq(cx, cy), bits)

  /** Morton interleave of K cell coordinates: bit `b` of dimension `i`
    * lands at position `b*K + i` (for K=2 this is exactly [[zValue2]]'s
    * even/odd layout). Still one static fold — K·bits OR/shift terms,
    * all inside whole-stage codegen. K·bits must fit a signed long. */
  def zValueK(cells: Seq[Column], bits: Int): Column = {
    val k = cells.size
    require(k >= 1 && k * bits < 64,
      s"ZOrder.zValueK: $k dims x $bits bits exceeds a signed long")
    cells.zipWithIndex.foldLeft(lit(0L)) { case (acc0, (c, i)) =>
      (0 until bits).foldLeft(acc0) { (acc, b) =>
        acc.bitwiseOR(shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * k + i))
      }
    }
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
                 partitions: Int = 0): DataFrame =
    clusterByZN(df, Seq(xCol, yCol), bits, partitions)

  /** K-dimensional [[clusterByZ]] — lakehouse Z-order routinely takes 3–4
    * keys. One rank-quantization shuffle per dimension (the
    * distribution-robustness price documented on the 2-D form), then the
    * single interleaved key drives the final range layout. `bits` defaults
    * scale down so K·bits stays within a long (8 bits/dim up to 4 dims).
    *
    * Caveat shared with Delta's range_partition_id cube: a dimension with
    * fewer distinct values than 2^bits occupies only the LOW rank cells
    * (the range partitioner emits ids 0..k-1), leaving its high interleave
    * bits constant and weighting the layout toward the other dimensions.
    * When clustering a low-cardinality key, pass bits ≈ log2(its distinct
    * count) so every dimension's cells span the full bit range. */
  def clusterByZN(df: DataFrame, dims: Seq[String], bits: Int = 8,
                  partitions: Int = 0): DataFrame = {
    require(dims.nonEmpty, "ZOrder.clusterByZN: no dimensions")
    val b = math.min(bits, 63 / dims.size)
    // refuse a degenerate layout loudly: b == 0 would mean ONE rank cell
    // per dimension — a constant z-key, i.e. no clustering at all — and a
    // maintenance command would then commit an unclustered rewrite tagged
    // "optimize" with nothing anywhere signalling that pruning never
    // improved (bits <= 0, or more dimensions than a signed long has bits)
    require(b >= 1,
      s"ZOrder.clusterByZN: ${dims.size} dims at $bits bits leaves no bit " +
        "per dimension (need bits >= 1 and dims.size <= 63)")
    val n = if (partitions > 0) partitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val cells = 1 << b
    // spark_partition_id is non-deterministic to the optimizer, so each
    // projection stays pinned to the stage right after its exchange —
    // the id read IS that exchange's range bucket
    val ranked = dims.zipWithIndex.foldLeft(df) { case (acc, (d, i)) =>
      acc.repartitionByRange(cells, col(d))
        .withColumn(s"__c$i", spark_partition_id().cast("long"))
    }
    val keyed = ranked
      .withColumn("__z",
        zValueK(dims.indices.map(i => col(s"__c$i")), b))
      .drop(dims.indices.map(i => s"__c$i"): _*)
    keyed.repartitionByRange(n, col("__z")).sortWithinPartitions("__z")
  }
}
