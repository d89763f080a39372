package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Copy-on-write row-level DML: MERGE INTO (stats-scoped upsert) and
  * UPDATE WHERE (stats-scoped scalar rewrite), their carry-verbatim /
  * concurrency contracts, and their O(touched) change-feed hops. */
class TxnLakeDmlSpec extends SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("txnlake_dml").resolve("t").toString

  /** Two single-file appends with DISJOINT id ranges (tight id stats per
    * file — the layout that lets DML prove its scope boundary). */
  private def twoFileTable(t: String): Unit = {
    import spark.implicits._
    TxnLake.commit(spark,
      (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1),
      t, "append")
    TxnLake.commit(spark,
      (50L until 100L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1),
      t, "append")
  }

  test("mergeInto rewrites only key-scoped files; the rest carry verbatim") {
    import spark.implicits._
    val t = freshTable()
    twoFileTable(t)
    val preV = TxnLake.latestVersion(spark, t).get
    val preFiles = TxnLake.snapshotFiles(spark, t).map(_.path).toSet
    // keys 60..62 live in file 2 only; 100..101 are inserts
    val delta = Seq((60L, "U60"), (61L, "U61"), (62L, "U62"),
      (100L, "I100"), (101L, "I101")).toDF("k", "v")
    val v = TxnLake.mergeInto(spark, delta, t, "k")
    assert(TxnLake.commitInfo(spark, t, v).operation == "merge")
    val postFiles = TxnLake.snapshotFiles(spark, t).map(_.path).toSet
    val carried = preFiles intersect postFiles
    assert(carried.size == 1, s"exactly the low-id file must carry: $carried")
    val got = TxnLake.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 102)
    assert(got(60L) == "U60" && got(61L) == "U61" && got(62L) == "U62")
    assert(got(100L) == "I100" && got(101L) == "I101")
    assert(got(10L) == "v10" && got(59L) == "v59")
    // pre-merge snapshot still time-travels in full
    assert(TxnLake.readVersion(spark, t, preV).count() == 100)
    // the merge hop is row-attributable from the log at O(touched)
    val feed = TxnLake.tableChanges(spark, t, preV, v, "k")
    val byType = feed.groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 2L, "update_preimage" -> 3L,
      "update_postimage" -> 3L),
      s"merge hop must classify inserts and update pairs: $byType")
  }

  test("mergeInto founds an empty table, inserts NULL-keyed delta rows") {
    import spark.implicits._
    val t = freshTable()
    val delta = Seq((Option(1L), "a"), (Option.empty[Long], "nullkey"))
      .toDF("k", "v")
    val v = TxnLake.mergeInto(spark, delta, t, "k")
    assert(TxnLake.commitInfo(spark, t, v).operation == "merge")
    assert(TxnLake.read(spark, t).count() == 2)
    // a second merge: the NULL-keyed delta row never matches (SQL
    // equality), so it inserts again — Delta's NOT MATCHED semantics
    TxnLake.mergeInto(spark,
      Seq((Option(1L), "A"), (Option.empty[Long], "nullkey2")).toDF("k", "v"),
      t, "k")
    val got = TxnLake.read(spark, t).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1)))
    assert(got.count(_._1.isEmpty) == 2, s"null keys must both insert: $got")
    assert(got.collect { case (Some(1L), s) => s }.toSeq == Seq("A"))
  }

  test("mergeInto refuses duplicate delta keys (multiple-matches error)") {
    import spark.implicits._
    val t = freshTable()
    twoFileTable(t)
    intercept[IllegalArgumentException] {
      TxnLake.mergeInto(spark,
        Seq((60L, "a"), (60L, "b")).toDF("k", "v"), t, "k")
    }
  }

  test("mergeInto detects a concurrent commit and recomputes — no lost rows") {
    import spark.implicits._
    val t = freshTable()
    twoFileTable(t)
    var raced = false
    TxnLake.mergeIntoImpl(spark,
      Seq((60L, "U60"), (200L, "I200")).toDF("k", "v"), t, "k",
      maxAttempts = 10,
      beforeCommit = () => if (!raced) {
        raced = true
        TxnLake.commit(spark,
          Seq((300L, "C300")).toDF("k", "v").coalesce(1), t, "append")
      })
    val got = TxnLake.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(300L) == "C300", "concurrent append lost by the merge retry")
    assert(got(60L) == "U60" && got(200L) == "I200" && got.size == 102)
  }

  test("updateWhere rewrites touched files; NULL predicate keeps rows") {
    import spark.implicits._
    val t = freshTable()
    TxnLake.commit(spark,
      Seq((1L, Option(10L)), (2L, Option.empty[Long]), (3L, Option(30L)))
        .toDF("k", "n").coalesce(1), t, "append")
    TxnLake.commit(spark,
      Seq((100L, Option(100L)), (101L, Option(200L)))
        .toDF("k", "n").coalesce(1), t, "append")
    val preV = TxnLake.latestVersion(spark, t).get
    val preFiles = TxnLake.snapshotFiles(spark, t).map(_.path).toSet
    // predicate touches only the low-k file; n IS NULL evaluates the
    // predicate to NULL there — the row must stay verbatim
    val v = TxnLake.updateWhere(spark, t, col("k") < 50L && col("n") < 25L,
      Map("n" -> (col("n") * 1000L))).get
    assert(TxnLake.commitInfo(spark, t, v).operation == "update")
    val carried = preFiles intersect TxnLake.snapshotFiles(spark, t)
      .map(_.path).toSet
    assert(carried.size == 1, s"high-k file must carry verbatim: $carried")
    val got = TxnLake.read(spark, t).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(10000L), 2L -> None, 3L -> Some(30L),
      100L -> Some(100L), 101L -> Some(200L)))
    // update feed hop: exactly one pre/post pair, nothing for kept rows
    val feed = TxnLake.tableChanges(spark, t, preV, v, "k")
    val types = feed.select("k", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(types == Seq((1L, "update_postimage"), (1L, "update_preimage")),
      s"update hop must emit one pre/post pair: $types")
    // a provably-empty update is a no-op (no version churn)
    assert(TxnLake.updateWhere(spark, t, col("k") > 1000L,
      Map("n" -> lit(0L))).isEmpty)
    // unknown SET column refused
    intercept[IllegalArgumentException] {
      TxnLake.updateWhere(spark, t, col("k") === 1L, Map("zz" -> lit(1L)))
    }
  }

  test("tableChanges attributes a legacy full-list hop via the snapshot diff") {
    import spark.implicits._
    val t = freshTable()
    TxnLake.commit(spark, Seq((1L, "a")).toDF("k", "v").coalesce(1),
      t, "append") // v0
    TxnLake.commit(spark, Seq((2L, "b")).toDF("k", "v").coalesce(1),
      t, "append") // v1
    // rewrite v1 into the pre-delta format: operation SAYS append but the
    // entry carries the FULL snapshot under "files" with an empty add —
    // the shape a shortcut-as-empty-append walk would silently drop from
    // the feed; only the snapshot diff can attribute it
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def addsOf(v: Long) = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(t, "_txn_log", s"v$v.json"))).get("add")
    val legacy = mapper.createObjectNode()
    legacy.put("version", 1L).put("operation", "append")
    val files = legacy.putArray("files")
    addsOf(0L).forEach(a => files.add(a.get("path").asText()))
    addsOf(1L).forEach(a => files.add(a.get("path").asText()))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(t, "_txn_log", "v1.json"),
      mapper.writeValueAsString(legacy))
    val feed = TxnLake.tableChanges(spark, t, 0L, 1L, "k").collect()
    assert(feed.length == 1 && feed.head.getLong(0) == 2L
      && feed.head.getAs[String]("change_type") == "insert",
      s"legacy hop must fall back to the snapshot diff: ${feed.toSeq}")
  }
}
