package graft.streaming

import graft.SparkSpec
import graft.sources.TxnLake
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Continuous CDC replication: version-offset polling, exactly-once
  * clause-merge application, maintenance-hop marker advancement, and
  * crash-restart resume from the replica's own txn state. */
class TxnReplicaFeedSpec extends SparkSpec {

  private def fresh(): (String, String) = {
    val d = Files.createTempDirectory("txn_replica")
    (d.resolve("src").toString, d.resolve("rep").toString)
  }

  private def rows(t: String): Map[Long, String] =
    TxnLake.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("replica follows appends, updates, deletes, and snapshot bootstrap") {
    import spark.implicits._
    val (src, rep) = fresh()
    TxnLake.commit(spark,
      (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1),
      src, "append") // v0
    TxnLake.commit(spark,
      (50L until 100L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1),
      src, "append") // v1
    val feed = new TxnReplicaFeed(src, rep, "repl", "k")
    assert(feed.poll(spark) == 2, "bootstrap + one append hop")
    assert(rows(rep) == rows(src))
    TxnLake.updateWhere(spark, src, col("k") >= 90L,
      Map("v" -> upper(col("v")))) // v2
    TxnLake.deleteWhere(spark, src, col("k") < 10L) // v3
    TxnLake.commit(spark,
      Seq((200L, "x200")).toDF("k", "v").coalesce(1), src, "append") // v4
    assert(feed.poll(spark) == 3)
    val got = rows(rep)
    assert(got == rows(src) && got.size == 91 && got(90L) == "V90"
      && !got.contains(5L) && got(200L) == "x200")
    // caught up: nothing to apply, and a FRESH consumer instance agrees
    // (the offset lives in the replica's txn state, not in the object)
    assert(feed.poll(spark) == 0)
    assert(new TxnReplicaFeed(src, rep, "repl", "k").poll(spark) == 0)
  }

  test("maintenance hops advance the marker with an empty merge — " +
    "replica data untouched") {
    import spark.implicits._
    val (src, rep) = fresh()
    (0 until 4).foreach { i =>
      TxnLake.commit(spark,
        (i * 10L until i * 10L + 10L).map(j => (j, s"v$j")).toDF("k", "v")
          .coalesce(1), src, "append")
    }
    val feed = new TxnReplicaFeed(src, rep, "repl", "k")
    assert(feed.poll(spark) == 4)
    val repVPre = TxnLake.latestVersion(spark, rep).get
    // source maintenance: zero change rows, but the offset must advance
    TxnLake.compactSmallFiles(spark, src, minFileBytes = Long.MaxValue)
      .getOrElse(sys.error("fixture: compaction must pack 4 small files"))
    assert(feed.poll(spark) == 1, "the maintenance hop is one marker merge")
    val repVPost = TxnLake.latestVersion(spark, rep).get
    assert(repVPost == repVPre + 1)
    assert(TxnLake.commitInfo(spark, rep, repVPost).operation == "merge")
    assert(TxnLake.tableChanges(spark, rep, repVPre, repVPost, "k").isEmpty,
      "an empty marker merge must change no rows")
    assert(rows(rep) == rows(src))
    assert(feed.poll(spark) == 0)
  }

  test("replayed versions no-op at the commit — the merge marker, not " +
    "convergence, is the replay guard") {
    import spark.implicits._
    val (src, rep) = fresh()
    TxnLake.commit(spark,
      (0L until 20L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1),
      src, "append") // v0
    val feed = new TxnReplicaFeed(src, rep, "repl", "k")
    assert(feed.poll(spark) == 1)
    TxnLake.updateWhere(spark, src, col("k") === 3L,
      Map("v" -> lit("NEW"))) // v1
    assert(feed.poll(spark) == 1 && rows(rep)(3L) == "NEW")
    // direct replay of the OLD v1 batch (what a crashed consumer would
    // re-send): the (appId, version) marker refuses it — without the
    // marker this would be applied as a fresh merge
    import TxnLake.{MergeInsert, MergeUpdate, sourceCol}
    val stale = Seq((3L, "v3", "U")).toDF("k", "v", "__op")
    assert(TxnLake.mergeIntoClauses(spark, stale, rep, "k",
      matched = Seq(MergeUpdate(Map("v" -> sourceCol("v")))),
      notMatched = Seq(MergeInsert(Map("k" -> col("k"), "v" -> col("v")))),
      txn = Some(("repl", 1L))).isEmpty,
      "a replayed (appId, version) must no-op at the commit")
    assert(rows(rep)(3L) == "NEW", "the replay must not regress the row")
  }
}
