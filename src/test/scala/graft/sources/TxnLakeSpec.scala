package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** The transaction-log lake protocol: atomic overwrite snapshots,
  * snapshot-isolated concurrent readers, time travel, append, optimistic
  * multi-writer commits, and vacuum reclamation. */
class TxnLakeSpec extends SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("txnlake_spec").resolve("t").toString

  test("overwrite commits snapshots; latest wins; old versions time-travel") {
    import spark.implicits._
    val t = freshTable()
    val v0 = TxnLake.commit(spark, Seq(1, 2, 3).toDF("x"), t, "overwrite")
    val v1 = TxnLake.commit(spark, Seq(10, 20).toDF("x"), t, "overwrite")
    assert(v0 == 0 && v1 == 1)
    assert(TxnLake.read(spark, t).collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 20))
    assert(TxnLake.readVersion(spark, t, 0).collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 2, 3))
  }

  test("an in-flight reader keeps its snapshot across a concurrent overwrite") {
    import spark.implicits._
    val t = freshTable()
    TxnLake.commit(spark, Seq(1, 2, 3).toDF("x"), t, "overwrite")
    // reader resolves the log ONCE here (the isolation contract): the
    // DataFrame is bound to v0's immutable files
    val reader = TxnLake.read(spark, t)
    TxnLake.commit(spark, Seq(99).toDF("x"), t, "overwrite")
    assert(reader.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3),
      "overwrite mutated a resolved reader's snapshot")
    assert(TxnLake.read(spark, t).collect().map(_.getInt(0)).toSeq == Seq(99))
  }

  test("append accumulates rows across versions") {
    import spark.implicits._
    val t = freshTable()
    TxnLake.commit(spark, Seq(1).toDF("x"), t, "append")
    TxnLake.commit(spark, Seq(2).toDF("x"), t, "append")
    TxnLake.commit(spark, Seq(3).toDF("x"), t, "append")
    assert(TxnLake.read(spark, t).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("racing appenders all commit under optimistic concurrency, no lost rows") {
    import spark.implicits._
    val t = freshTable()
    val threads = 4
    val perThread = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futures = (0 until threads).flatMap { th =>
        (0 until perThread).map { i =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long =
              TxnLake.commit(spark, Seq(th * 100 + i).toDF("x"), t, "append",
                maxAttempts = 50)
          })
        }
      }
      val versions = futures.map(_.get())
      assert(versions.distinct.length == threads * perThread,
        s"duplicate committed versions: $versions")
    } finally pool.shutdown()
    val rows = TxnLake.read(spark, t).collect().map(_.getInt(0)).sorted.toSeq
    assert(rows.length == threads * perThread, s"lost commits: $rows")
  }

  test("vacuum reclaims only versions outside the retention window") {
    import spark.implicits._
    val t = freshTable()
    TxnLake.commit(spark, Seq(1).toDF("x"), t, "overwrite")
    TxnLake.commit(spark, Seq(2).toDF("x"), t, "overwrite")
    TxnLake.commit(spark, Seq(3).toDF("x"), t, "overwrite")
    val reclaimed = TxnLake.vacuum(spark, t, retainVersions = 1)
    assert(reclaimed == 2)
    assert(TxnLake.read(spark, t).collect().map(_.getInt(0)).toSeq == Seq(3))
    // the reclaimed snapshot's files are gone — time travel past retention fails
    intercept[Exception] {
      TxnLake.readVersion(spark, t, 0).collect()
    }
  }

  test("merge upserts delta rows, inserts unmatched, null updates win") {
    import spark.implicits._
    val t = freshTable()
    TxnLake.commit(spark,
      Seq((1L, Option("a")), (2L, Option("b")), (3L, Option("c")))
        .toDF("k", "v"), t, "overwrite")
    // update k=2 (to null — must WIN over "b"), update k=3, insert k=4
    val v = TxnLake.merge(spark,
      Seq((2L, Option.empty[String]), (3L, Option("C")), (4L, Option("d")))
        .toDF("k", "v"), t, "k")
    val got = TxnLake.read(spark, t).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("a"), 2L -> None, 3L -> Some("C"), 4L -> Some("d")))
    // one overwrite commit: pre-merge snapshot still time-travels
    assert(TxnLake.readVersion(spark, t, v - 1).count() == 3)
    // merge into an empty table is a plain insert
    val t2 = freshTable()
    TxnLake.merge(spark, Seq((9L, Option("z"))).toDF("k", "v"), t2, "k")
    assert(TxnLake.read(spark, t2).count() == 1)
  }

  test("merge detects a concurrent commit and recomputes — no lost update") {
    import spark.implicits._
    val t = freshTable()
    TxnLake.commit(spark,
      Seq((1L, Option("a")), (2L, Option("b"))).toDF("k", "v"), t, "overwrite")
    // interleave a concurrent writer between merge's snapshot read and its
    // commit: the racer overwrites the table with an extra row (k=5). A
    // lost-update merge would publish its stale recompute over it; the
    // conflict-checked merge must refuse, re-read, and carry k=5 through.
    var raced = false
    TxnLake.mergeImpl(spark,
      Seq((2L, Option("B")), (3L, Option("c"))).toDF("k", "v"), t, "k",
      maxAttempts = 10,
      beforeCommit = () => if (!raced) {
        raced = true
        TxnLake.commit(spark,
          Seq((1L, Option("a")), (2L, Option("b")), (5L, Option("e")))
            .toDF("k", "v"), t, "overwrite")
      })
    val got = TxnLake.read(spark, t).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("a"), 2L -> Some("B"),
      3L -> Some("c"), 5L -> Some("e")))
    // type-mismatched delta with matching names is rejected up front
    intercept[IllegalArgumentException] {
      TxnLake.merge(spark, Seq((7L, 1)).toDF("k", "v"), t, "k")
    }
  }

  test("BronzeToSilver runs unchanged on the TxnLake format") {
    val lake = Files.createTempDirectory("txnlake_b2s").toString
    graft.ingest.UsgsGeoJson.writeBronze(s"$lake/bronze/raw.json")
    val viaParquet = graft.jobs.BronzeToSilver.run(
      spark, s"$lake/bronze/raw.json", s"$lake/silver_parquet")
    val viaTxn = graft.jobs.BronzeToSilver.run(
      spark, s"$lake/bronze/raw.json", s"$lake/silver_txn",
      lake = TxnLake)
    assert(viaTxn.count() == viaParquet.count())
    assert(viaTxn.columns.sorted.toSeq == viaParquet.columns.sorted.toSeq)
    // the txn table is versioned: a re-run commits a new snapshot
    graft.jobs.BronzeToSilver.run(
      spark, s"$lake/bronze/raw.json", s"$lake/silver_txn", lake = TxnLake)
    assert(TxnLake.latestVersion(spark, s"$lake/silver_txn").contains(1L))
  }

  test("LakeFormat interface round-trips through the log") {
    import spark.implicits._
    val t = freshTable()
    TxnLake.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), t, Seq.empty)
    val back = TxnLake.read(spark, t).collect().map(r => (r.getInt(0), r.getString(1)))
    assert(back.sorted.toSeq == Seq((1, "a"), (2, "b")))
  }
}
