package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Per-file Bloom sidecar integration: declared bloom columns are a table
  * property, commits publish sidecars beside their data files, readKeyed
  * prunes hash-uniform key scans that min/max stats cannot, maintenance
  * rewrites inherit the declaration, and vacuum reclaims sidecars with
  * their files. */
class TxnLakeBloomSpec extends SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("txnlake_bloom").resolve("t").toString

  /** Four single-file appends of md5-keyed rows: every file spans nearly
    * the full hex range, so min/max pruning keeps everything and only the
    * sidecar can skip. */
  private def hashKeyedTable(t: String): Unit = {
    import spark.implicits._
    (0 until 4).foreach { i =>
      val part = (0 until 50).map(j => (i * 50 + j).toLong)
        .toDF("id").select(col("id"), md5(col("id").cast("string")).as("k"))
        .coalesce(1)
      TxnLake.commit(spark, part, t, "append", bloomCols = Seq("k"))
    }
  }

  private def md5Of(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("readKeyedDistributed prunes IDENTICALLY to readKeyed with the " +
    "membership decision on the executors — no driver key collect") {
    import spark.implicits._
    val t = freshTable()
    hashKeyedTable(t)
    // keys hitting two specific files plus absent ones — the kept set and
    // rows must match the driver-side probe exactly
    val keys = Seq(md5Of(10L), md5Of(120L), md5Of(999999L), md5Of(888888L))
    val (dDf, (dKept, dTotal)) = TxnLake.readKeyed(spark, t, "k", keys)
    assert(!TxnLake.lastKeyedProbeDistributed)
    val keysDf = keys.toDF("k")
    val (xDf, (xKept, xTotal)) =
      TxnLake.readKeyedDistributed(spark, t, "k", keysDf)
    assert(TxnLake.lastKeyedProbeDistributed,
      "the distributed probe must record its regime")
    assert((xKept, xTotal) == ((dKept, dTotal)),
      s"distributed prune diverged: ($xKept,$xTotal) vs ($dKept,$dTotal)")
    assert(xKept < xTotal, "fixture: pruning must actually happen")
    assert(xDf.collect().map(_.toString).sorted.toSeq ==
      dDf.collect().map(_.toString).sorted.toSeq,
      "identical scans from both membership regimes")
    // absent keys only: zero kept, typed-empty scan
    val (none, (k0, _)) = TxnLake.readKeyedDistributed(spark, t, "k",
      Seq(md5Of(777777L)).toDF("k"))
    assert(k0 == 0 && none.isEmpty && none.columns.toSeq == Seq("id", "k"))
    // null keys are ignored, not NPE'd
    val (_, (kN, tN)) = TxnLake.readKeyedDistributed(spark, t, "k",
      Seq(Some(md5Of(10L)), None).toDF("k"))
    assert(tN == 4 && kN >= 1)
    // a ~zero broadcast budget forces one chunk PER SIDECAR — the
    // chunked regime (very-many-files snapshots) must keep and scan
    // identically
    spark.conf.set("graft.probe.maxSidecarBroadcastBytes", "1")
    try {
      val (cDf, (cKept, cTotal)) =
        TxnLake.readKeyedDistributed(spark, t, "k", keysDf)
      assert((cKept, cTotal) == ((dKept, dTotal))
        && cDf.collect().map(_.toString).sorted.toSeq ==
          dDf.collect().map(_.toString).sorted.toSeq,
        "per-sidecar chunking must not change the kept set or the rows")
    } finally spark.conf.unset("graft.probe.maxSidecarBroadcastBytes")
    // a table founded BEFORE any bloom declaration keeps everything
    // (conservative), like readKeyed
    val t2 = freshTable()
    (0 until 2).foreach { i =>
      TxnLake.commit(spark,
        Seq((i.toLong, s"v$i")).toDF("id", "k").coalesce(1), t2, "append")
    }
    val (_, (ck, ct)) =
      TxnLake.readKeyedDistributed(spark, t2, "k", Seq("v0").toDF("k"))
    assert(ck == ct && ct == 2, "unbloomed files keep conservatively")
  }

  test("bloom sidecars prune key scans that min/max cannot") {
    val t = freshTable()
    hashKeyedTable(t)
    assert(TxnLake.bloomColumns(spark, t) == Seq("k"))
    // a key living in commit 2's file: only that file (plus fp tail) reads
    val key = md5Of(120L) // id 120 -> third commit (100..149)
    val (df, (kept, total)) = TxnLake.readKeyed(spark, t, "k", Seq(key))
    assert(total == 4, s"expected 4 files, got $total")
    assert(kept < total,
      s"bloom must prune a single-key scan on hash-uniform keys: $kept/$total")
    val ids = df.filter(col("k") === key).collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(120L), s"pruned scan lost the key's row: $ids")
    // absent key: every sidecar answers definitely-absent
    val (none, (kept0, _)) = TxnLake.readKeyed(spark, t, "k",
      Seq(md5Of(999999L)))
    assert(kept0 == 0 && none.isEmpty,
      s"an absent key must prune every file, kept $kept0")
    // empty key set reads nothing
    assert(TxnLake.readKeyed(spark, t, "k", Seq.empty)._2._1 == 0)
  }

  test("min/max still participates: an out-of-range integer key prunes") {
    import spark.implicits._
    val t = freshTable()
    TxnLake.commit(spark, Seq(1L, 2L).toDF("id").coalesce(1), t, "append")
    TxnLake.commit(spark, Seq(100L, 200L).toDF("id").coalesce(1), t, "append")
    // no bloom declared — range stats alone scope the scan
    val (_, (kept, total)) = TxnLake.readKeyed(spark, t, "id", Seq("150"))
    assert(total == 2 && kept == 1, s"range prune failed: $kept/$total")
    // the low-range key symmetrically keeps only the low file
    val (_, (keptLo, totalLo)) = TxnLake.readKeyed(spark, t, "id", Seq("1"))
    assert(keptLo == 1 && totalLo == 2)
  }

  test("maintenance rewrites inherit the bloom declaration (table property)") {
    val t = freshTable()
    hashKeyedTable(t)
    TxnLake.optimize(spark, t, zorderBy = Seq("id"), numFiles = 2)
    assert(TxnLake.bloomColumns(spark, t) == Seq("k"),
      "optimize dropped the bloom declaration")
    val files = TxnLake.snapshotFiles(spark, t)
    assert(files.nonEmpty && files.forall(_.stats.get("k").exists(_.bloom)),
      "rewritten files must carry fresh sidecar flags")
    // the rewritten layout still prunes: one key hits at most one cluster
    val (_, (kept, total)) = TxnLake.readKeyed(spark, t, "k", Seq(md5Of(3L)))
    assert(total == 2 && kept <= 1, s"post-optimize prune failed: $kept/$total")
    // and the kept file really contains the key
    val (df, _) = TxnLake.readKeyed(spark, t, "k", Seq(md5Of(3L)))
    assert(df.filter(col("k") === md5Of(3L)).count() == 1)
  }

  test("vacuum reclaims sidecars of dead files, keeps live files' sidecars") {
    import spark.implicits._
    val t = freshTable()
    val df = (0 until 90).map(_.toLong).toDF("id")
      .select(col("id"), md5(col("id").cast("string")).as("k"))
    TxnLake.commit(spark, df.repartition(3), t, "overwrite",
      bloomCols = Seq("k"))
    val files = TxnLake.snapshotFiles(spark, t).map(_.path)
    assert(files.size == 3)
    // pack two of the three files: their dir keeps one live file, so
    // vacuum must take the FILE-granular branch and reclaim the dead
    // pair's sidecars individually
    TxnLake.compactSmallFiles(spark, t, minFileBytes = Long.MaxValue,
      within = Some(files.take(2).toSet))
    TxnLake.vacuum(spark, t, retainVersions = 1)
    val dataRoot = java.nio.file.Paths.get(t, "data")
    val walk = java.nio.file.Files.walk(dataRoot)
    val sidecars =
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.contains(".parquet.bloom.") && !n.startsWith(".")
            && !n.endsWith(".crc")).toList
      } finally walk.close()
    val liveNames = TxnLake.snapshotFiles(spark, t)
      .map(_.path.split("/").last).toSet
    assert(sidecars.nonEmpty, "live files must keep their sidecars")
    assert(sidecars.forall(s =>
      liveNames.contains(s.substring(0, s.indexOf(".parquet.bloom.") + 8))),
      s"vacuum left orphaned sidecars: $sidecars vs live $liveNames")
    // the pruned read still works on the survivor layout
    val (got, _) = TxnLake.readKeyed(spark, t, "k", Seq(md5Of(7L)))
    assert(got.filter(col("k") === md5Of(7L)).count() == 1)
  }

  test("OPTIMIZE consolidates probe metadata: after compaction + vacuum " +
    "the sidecar count tracks the post-compaction file count — probe " +
    "I/O shrinks with the layout, not the table's history") {
    import spark.implicits._
    val t = freshTable()
    val df = (0 until 320).map(_.toLong).toDF("id")
      .select(col("id"), md5(col("id").cast("string")).as("k"))
    TxnLake.commit(spark, df.repartition(16), t, "overwrite",
      bloomCols = Seq("k"))
    def sidecarCount(): Int = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(t, "data"))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.map(_.getFileName.toString)
          .count(n => n.contains(".parquet.bloom.") && !n.startsWith(".")
            && !n.endsWith(".crc"))
      } finally walk.close()
    }
    assert(TxnLake.snapshotFiles(spark, t).size == 16
      && sidecarCount() == 16, "fixture: one sidecar per small file")
    TxnLake.optimize(spark, t, numFiles = 2)
    TxnLake.vacuum(spark, t, retainVersions = 1)
    val live = TxnLake.snapshotFiles(spark, t)
    assert(live.size == 2, s"compaction target: ${live.size}")
    assert(sidecarCount() == 2,
      s"sidecars must consolidate WITH the data files: ${sidecarCount()}")
    assert(live.forall(_.stats.get("k").exists(_.bloom)),
      "the consolidated files must carry fresh bloom flags")
    // the probe now pays 2 sidecar loads, not 16 — and stays exact
    val (got, (kept, total)) = TxnLake.readKeyed(spark, t, "k",
      Seq(md5Of(123L)))
    assert(total == 2 && kept <= 1 &&
      got.filter(col("k") === md5Of(123L)).count() == 1)
  }

  test("bloom flags survive log checkpointing (resolution via v10.ckpt)") {
    import spark.implicits._
    val t = freshTable()
    (0 until 11).foreach { i =>
      val part = (0 until 10).map(j => (i * 10 + j).toLong)
        .toDF("id").select(col("id"), md5(col("id").cast("string")).as("k"))
        .coalesce(1)
      TxnLake.commit(spark, part, t, "append", bloomCols = Seq("k"))
    }
    // version 10 wrote a parquet checkpoint; the snapshot now resolves
    // through it — the per-file "bl" markers must ride along or pruning
    // silently dies the moment a table is old enough to checkpoint
    val files = TxnLake.snapshotFiles(spark, t)
    assert(files.size == 11 && files.forall(_.stats.get("k").exists(_.bloom)))
    val (df, (kept, total)) = TxnLake.readKeyed(spark, t, "k", Seq(md5Of(57L)))
    assert(total == 11 && kept < total, s"post-checkpoint prune: $kept/$total")
    assert(df.filter(col("k") === md5Of(57L)).count() == 1)
  }

  test("public commit refuses the reserved operation tags") {
    import spark.implicits._
    val t = freshTable()
    TxnLake.commit(spark, Seq(1L).toDF("id"), t, "append")
    intercept[IllegalArgumentException] {
      TxnLake.commit(spark, Seq(2L).toDF("id"), t, "optimize")
    }
    intercept[IllegalArgumentException] {
      TxnLake.commitOnce(spark, Seq(2L).toDF("id"), t, "delete", "app", 0L)
    }
  }
}
