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

  /** Inner point-in-interval join. `point`/`start`/`end` are long-valued
    * columns (e.g. epoch nanos); bounds are inclusive on both ends. */
  def pointInInterval(left: DataFrame, right: DataFrame, keys: Seq[String],
                      point: String, start: String, end: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val l = left.withColumn("__bkt", floor(col(point) / bucketWidth))
    val r = right.withColumn("__bkt",
      explode(sequence(floor(col(start) / bucketWidth), floor(col(end) / bucketWidth))))
    l.join(r, keys :+ "__bkt")
      .filter(col(point) >= col(start) && col(point) <= col(end))
      .drop("__bkt")
  }
}
