package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Generated columns — Delta's GENERATED ALWAYS AS (expr): declared on
  * an empty table, filled at write time when the writer omits the
  * column, validated (null-safe c <=> expr) when supplied, carried
  * through DML rewrites, pinning source columns, retired by dropping
  * the generated column itself. */
class TxnLakeGenColSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("txnlake_gen").resolve("t").toString

  private def empty(t: String): Unit = {
    import spark.implicits._
    TxnLake.commit(spark,
      Seq.empty[(Long, Long)].toDF("k", "n").coalesce(1), t, "append")
  }

  test("the column fills on appends that omit it, validates when " +
    "supplied, and survives DML rewrites") {
    import spark.implicits._
    val t = fresh()
    empty(t)
    TxnLake.addGeneratedColumn(spark, t, "n2", LongType, "n * 2")
    // writer omits the column: generated
    TxnLake.commit(spark,
      (0L until 20L).map(i => (i, i)).toDF("k", "n").coalesce(1),
      t, "append")
    val got = TxnLake.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.size == 20 && got(7L) == 14L,
      "omitted generated column must fill from the expression")
    // writer supplies a CONSISTENT value: accepted
    TxnLake.commit(spark,
      Seq((100L, 5L, 10L)).toDF("k", "n", "n2").coalesce(1), t, "append")
    // writer supplies a WRONG value: refused atomically
    val preV = TxnLake.latestVersion(spark, t).get
    val e = intercept[IllegalStateException] {
      TxnLake.commit(spark,
        Seq((101L, 5L, 99L)).toDF("k", "n", "n2").coalesce(1),
        t, "append")
    }
    assert(e.getMessage.contains("generated column n2"))
    assert(TxnLake.latestVersion(spark, t).contains(preV)
      && TxnLake.read(spark, t).count() == 21)
    // a consistent UPDATE passes; one breaking the invariant refuses
    TxnLake.updateWhere(spark, t, col("k") === 3L,
      Map("n" -> lit(50L), "n2" -> lit(100L)))
    val e2 = intercept[IllegalStateException] {
      TxnLake.updateWhere(spark, t, col("k") === 4L,
        Map("n" -> lit(60L)))
    }
    assert(e2.getMessage.contains("generated column n2"),
      "an update changing the source without the generated column " +
        "must refuse, not silently break the invariant")
    // maintenance carries the column untouched
    TxnLake.compactSmallFiles(spark, t, minFileBytes = Long.MaxValue)
    val after = TxnLake.read(spark, t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after(3L) == ((50L, 100L)) && after(7L) == ((7L, 14L))
      && after(100L) == ((5L, 10L)))
  }

  test("declaration requires an empty table, known references, and a " +
    "fresh name; dropping the generated column retires the property " +
    "while source columns stay pinned") {
    import spark.implicits._
    val t = fresh()
    TxnLake.commit(spark,
      Seq((1L, 2L)).toDF("k", "n").coalesce(1), t, "append")
    val e = intercept[IllegalArgumentException] {
      TxnLake.addGeneratedColumn(spark, t, "n2", LongType, "n * 2")
    }
    assert(e.getMessage.contains("not empty"))
    val t2 = fresh()
    empty(t2)
    intercept[IllegalArgumentException] {
      TxnLake.addGeneratedColumn(spark, t2, "n2", LongType, "missing + 1")
    }
    TxnLake.addGeneratedColumn(spark, t2, "n2", LongType, "n * 2")
    // the source column pins while the generated column lives
    val e3 = intercept[IllegalArgumentException] {
      TxnLake.dropColumn(spark, t2, "n")
    }
    assert(e3.getMessage.contains("generated column n2"))
    // dropping the GENERATED column retires the property: the source
    // unpins and later appends carry no n2
    TxnLake.dropColumn(spark, t2, "n2")
    TxnLake.commit(spark,
      Seq((1L, 5L)).toDF("k", "n").coalesce(1), t2, "append")
    assert(TxnLake.read(spark, t2).columns.toSeq == Seq("k", "n"))
    TxnLake.dropColumn(spark, t2, "n") // unpinned now
    assert(TxnLake.read(spark, t2).columns.toSeq == Seq("k"))
  }

  test("the property rides clone and restore") {
    import spark.implicits._
    val d = Files.createTempDirectory("txnlake_gen")
    val t = d.resolve("src").toString
    empty(t)
    TxnLake.addGeneratedColumn(spark, t, "n2", LongType, "n * 2")
    TxnLake.commit(spark,
      Seq((1L, 3L)).toDF("k", "n").coalesce(1), t, "append")
    val cl = d.resolve("cl").toString
    TxnLake.cloneTable(spark, t, cl)
    TxnLake.commit(spark,
      Seq((2L, 4L)).toDF("k", "n").coalesce(1), cl, "append")
    val got = TxnLake.read(spark, cl).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 6L, 2L -> 8L),
      "a clone generates with the source's expression")
    intercept[IllegalStateException] {
      TxnLake.commit(spark, Seq((3L, 1L, 9L)).toDF("k", "n", "n2")
        .coalesce(1), cl, "append")
    }
  }
}
