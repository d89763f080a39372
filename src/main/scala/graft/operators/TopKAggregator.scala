package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-K as a typed [[Aggregator]] — the bounded-state
  * alternative to a window `row_number` for group-wise top-K at scale:
  * each partition's partial aggregate holds at most K (score, id) pairs
  * per group and merges are K-bounded list unions, so a group with a
  * billion rows costs O(K) state and network instead of a full per-group
  * sort. (Spark's own WindowGroupLimit gets close for window queries; this
  * is the typed-API form usable inside `KeyValueGroupedDataset.agg`,
  * composable with other typed aggregators in one pass.)
  *
  * Ordering: score DESC, then id ASC — a total order, so results are
  * deterministic for any partitioning. */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def bound(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortWith(better).take(k)

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    // the buffer stays sorted and ≤ K elements; fast-reject keeps the
    // common case (row worse than the current K-th) allocation-free
    if (buf.size >= k && !better(in, buf.last)) buf else bound(buf :+ in)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    bound(a ++ b)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  /** Convenience: Encoders for the groupByKey site. */
  val pairEncoder: Encoder[(String, Double, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaDouble, Encoders.scalaLong)
}
