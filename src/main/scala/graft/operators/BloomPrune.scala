package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Runtime-filter analog: prune a fact table's scan with a Bloom filter of
  * the (already filtered) dimension's join keys, then finish with the exact
  * join. This is the pattern Catalyst's own InjectRuntimeFilter applies to
  * shuffle joins — reproduced here as an explicit operator so the pruning
  * survives plans the optimizer won't rewrite (e.g. a prune built in one
  * job and applied in another, the way a 100 TB pipeline stages it).
  *
  * Scale shape: the build side is a distributed partial-aggregate (each
  * task folds its rows into a local sketch, merges are bitwise OR), so the
  * driver only ever holds the finished ~numBits/8-byte sketch — the same
  * footprint discipline as `df.stat.bloomFilter`, but executed by the
  * codegen'd [[BloomFilterAggregate]]. The probe side stays inside
  * whole-stage codegen ([[BloomFilterMightContain]] is a native predicate,
  * not a UDF), and false positives are removed by the exact join that
  * follows — the sketch only reduces the rows entering the shuffle.
  */
object BloomPrune {

  /** Distributed Bloom build over a BIGINT key column → serialized sketch
    * (None when the build side is empty, in which case every probe row can
    * be pruned). */
  def build(dim: DataFrame, key: String, expectedItems: Long): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(dim(key)),
      Literal(expectedItems),
      Literal(expectedItems * 8) // 8 bits/item ≈ 2% fpp
    ).toAggregateExpression()
    val bytes = dim.agg(ColumnBridge.column(agg).as("bloom")).head()
    if (bytes.isNullAt(0)) None else Some(bytes.getAs[Array[Byte]](0))
  }

  /** Codegen'd `might_contain(sketch, key)` predicate for a BIGINT key. */
  def mightContain(sketch: Option[Array[Byte]], key: Column): Column =
    sketch match {
      case Some(b) =>
        ColumnBridge.column(
          BloomFilterMightContain(Literal(b, BinaryType), ColumnBridge.expression(key)))
      case None => org.apache.spark.sql.functions.lit(false)
    }
}
