package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compaction shrinks file count, preserves rows, and swaps atomically") {
    val s = SparkSpec.session
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact_spec").toString + "/t"
    // simulate micro-batch ingest: 40 tiny files
    (1L to 4000L).toDF("id").withColumn("v", col("id") * 2)
      .repartition(40).write.parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parquetFiles == 40)
    val before = s.read.parquet(dir).agg(count(lit(1)), sum(col("v")))
      .as[(Long, Long)].head()

    val nOut = Compaction.compact(s, dir, targetBytes = 1024L * 1024)
    assert(parquetFiles == nOut, s"expected $nOut files")
    assert(parquetFiles < 40)
    val after = s.read.parquet(dir).agg(count(lit(1)), sum(col("v")))
      .as[(Long, Long)].head()
    assert(after == before)
    // no leftover scratch/aside dirs
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("_compact_")), parent.mkString(","))
  }

  test("already-compact dirs are left untouched") {
    val s = SparkSpec.session
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact_noop").toString + "/t"
    (1L to 100L).toDF("id").coalesce(1).write.parquet(dir)
    val mtimes = new java.io.File(dir).listFiles().map(f => f.getName -> f.lastModified).toMap
    val n = Compaction.compact(s, dir, targetBytes = 1024L * 1024)
    assert(n == 1)
    val after = new java.io.File(dir).listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(after == mtimes) // same files, not rewritten
  }
}
