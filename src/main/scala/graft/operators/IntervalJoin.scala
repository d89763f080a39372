package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without the nested-loop trap.
  *
  * A naive `l.point BETWEEN r.start AND r.end` theta join plans as a
  * broadcast-nested-loop (O(N·M) comparisons). Bucketizing turns it into an
  * equi-join: every right interval explodes into the fixed-width buckets it
  * overlaps, the left point maps to exactly one bucket, and the join runs on
  * (keys…, bucket) with the exact bound check as a post-filter. Each
  * matching (left, right) pair meets in exactly one bucket — the left
  * point's — so no dedup is needed.
  *
  * Scale: one hash shuffle on (keys, bucket); right-side blowup is
  * ceil(interval/bucketWidth)+1 rows, so pick bucketWidth ≈ the typical
  * interval length. Time skew lands in different buckets by construction.
  */
object IntervalJoin {

  /** Inner point-in-interval join. `point`/`start`/`end` are non-negative
    * long-valued columns (e.g. epoch nanos); bounds are inclusive on both
    * ends. Bucket ids use exact integer division (`div`) — `floor(col / w)`
    * would go through doubles, whose 256-unit ulp at epoch-nanos magnitude
    * (~1.7e18) can misplace a point within ~256 ns of a bucket boundary. */
  def pointInInterval(left: DataFrame, right: DataFrame, keys: Seq[String],
                      point: String, start: String, end: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    def bkt(c: String) = expr(s"`$c` div ${bucketWidth}L")
    val l = left.withColumn("__bkt", bkt(point))
    val r = right.withColumn("__bkt", explode(sequence(bkt(start), bkt(end))))
    l.join(r, keys :+ "__bkt")
      .filter(col(point) >= col(start) && col(point) <= col(end))
      .drop("__bkt")
  }
}
