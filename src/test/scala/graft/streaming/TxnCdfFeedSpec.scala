package graft.streaming

import graft.SparkSpec
import graft.sources.TxnLake
import java.nio.file.Files

/** The streaming CDF consumer's exactly-once lifecycle: initial load,
  * incremental folds, and — the case x27's happy path can't show — replay
  * after a consumer that saw the versions but whose MV commit already
  * landed (the at-least-once crash window). */
class TxnCdfFeedSpec extends SparkSpec {

  private def freshBase(): String =
    Files.createTempDirectory("txn_cdf_feed").toString

  test("poll applies each version once and a lagging consumer catches up") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = freshBase()
    val src = s"$base/src"
    val mv = s"$base/mv"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val feed = new TxnCdfFeed(src, mv, "spec_mv", "event_id")
    // v0: two types
    TxnLake.commit(spark,
      Seq((1L, "click", 1.0), (2L, "view", 2.5), (3L, "click", 0.25))
        .toDF("event_id", "event_type", "value"), src, "overwrite")
    assert(feed.poll(spark) == 1)
    assert(rows(TxnLake.read(spark, mv)).toSeq
      == Seq(("click", 2L, 125L), ("view", 1L, 250L)))
    // v1 (update id=1 value, delete id=2) + v2 (insert id=4) land BEFORE
    // the next poll — each folds as its own batch
    TxnLake.commit(spark,
      Seq((1L, "click", 2.0), (3L, "click", 0.25))
        .toDF("event_id", "event_type", "value"), src, "overwrite")
    TxnLake.commit(spark,
      Seq((4L, "view", 1.0)).toDF("event_id", "event_type", "value"),
      src, "append")
    assert(feed.poll(spark) == 2)
    assert(rows(TxnLake.read(spark, mv)).toSeq
      == Seq(("click", 2L, 225L), ("view", 1L, 100L)))
    // a STALE consumer instance re-polling the same versions applies
    // nothing: each version's commitOnce finds its txn and no-ops
    assert(new TxnCdfFeed(src, mv, "spec_mv", "event_id").poll(spark) == 0)
    assert(rows(TxnLake.read(spark, mv)).toSeq
      == Seq(("click", 2L, 225L), ("view", 1L, 100L)))
    // types with n dropping to 0 vanish from the MV
    TxnLake.commit(spark,
      TxnLake.read(spark, src).filter(col("event_type") =!= "view"),
      src, "overwrite")
    assert(feed.poll(spark) == 1)
    assert(rows(TxnLake.read(spark, mv)).toSeq == Seq(("click", 2L, 225L)))
  }

  test("empty source and missing tables are safe no-ops") {
    val base = freshBase()
    val feed = new TxnCdfFeed(s"$base/none", s"$base/mv", "spec_mv", "event_id")
    assert(feed.poll(spark) == 0)
  }
}
