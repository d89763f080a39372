package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** IDENTITY columns — Delta's GENERATED ALWAYS AS IDENTITY: declared on
  * an empty table, assigned at write time with no extra pass (hwm +
  * step-spaced reservations via monotonically_increasing_id), unique and
  * step-directed monotone across commits with documented gaps, hwm
  * advanced from harvested stats, ALWAYS-refusal for writers, survival
  * through restore (monotone — rolled-past values never reissue) and
  * DROP COLUMN retirement. */
class TxnLakeIdentitySpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("txnlake_identity").resolve("t").toString

  private def found(t: String): Unit = {
    import spark.implicits._
    TxnLake.commit(spark,
      Seq.empty[(String, Long)].toDF("k", "n").coalesce(1), t, "append")
  }

  test("values are unique, start-anchored, step-directed monotone " +
    "across commits — including multi-partition appends — and the hwm " +
    "advances from harvested stats") {
    import spark.implicits._
    val t = fresh()
    found(t)
    TxnLake.addIdentityColumn(spark, t, "id", start = 100L, step = 10L)
    TxnLake.commit(spark,
      (0 until 5).map(i => (s"a$i", i.toLong)).toDF("k", "n").coalesce(1),
      t, "append")
    val ids1 = TxnLake.read(spark, t).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids1 == Seq(100L, 110L, 120L, 130L, 140L),
      s"single-partition assignment is contiguous from start: $ids1")
    // multi-partition append: values remain unique and ABOVE the hwm;
    // gaps between partitions are the documented contract
    TxnLake.commit(spark,
      (0 until 40).map(i => (s"b$i", i.toLong)).toDF("k", "n")
        .repartition(4), t, "append")
    val all = TxnLake.read(spark, t).select("id").collect().map(_.getLong(0))
    assert(all.length == 45 && all.distinct.length == 45,
      "identity values must be unique across partitions and commits")
    val ids2 = all.filterNot(ids1.contains)
    assert(ids2.forall(_ > 140L),
      "later commits assign strictly above the prior hwm")
    assert(TxnLake.identityColumns(spark, t)("id").hwm == all.max,
      "the hwm must advance to the max assigned value (from file stats)")
    // step alignment: every value is start + k*step for integer k
    assert(all.forall(v => (v - 100L) % 10L == 0L),
      "every assigned value sits on the step lattice")
  }

  test("GENERATED ALWAYS: supplying the column on append/overwrite " +
    "refuses; declaration demands an empty table; negative steps " +
    "descend; DROP COLUMN retires the property") {
    import spark.implicits._
    val t = fresh()
    found(t)
    TxnLake.addIdentityColumn(spark, t, "id", start = 0L, step = -5L)
    intercept[IllegalArgumentException] {
      TxnLake.commit(spark,
        Seq(("x", 1L, 7L)).toDF("k", "n", "id").coalesce(1), t, "append")
    }
    TxnLake.commit(spark,
      (0 until 3).map(i => (s"a$i", i.toLong)).toDF("k", "n").coalesce(1),
      t, "append")
    val ids = TxnLake.read(spark, t).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(-10L, -5L, 0L), s"negative step descends: $ids")
    assert(TxnLake.identityColumns(spark, t)("id").hwm == -10L)
    // duplicate / non-empty-table declarations refuse
    intercept[IllegalArgumentException] {
      TxnLake.addIdentityColumn(spark, t, "id2")
    }
    val t2 = fresh()
    found(t2)
    intercept[IllegalArgumentException] {
      TxnLake.addIdentityColumn(spark, t2, "k") // exists (case-insensitive)
    }
    // DROP COLUMN retires the property and tombstones the name
    TxnLake.dropColumn(spark, t, "id")
    assert(TxnLake.identityColumns(spark, t).isEmpty)
    intercept[IllegalArgumentException] {
      TxnLake.commit(spark,
        Seq(("z", 9L, 1L)).toDF("k", "n", "ID").coalesce(1), t, "append")
    }
  }

  test("engine rewrites carry ids; merge-minted inserts fill fresh; " +
    "RESTORE keeps the hwm monotone so rolled-past values never reissue") {
    import spark.implicits._
    import TxnLake.{MergeInsert, MergeUpdate, sourceCol}
    val t = fresh()
    found(t)
    TxnLake.addIdentityColumn(spark, t, "id")
    TxnLake.commit(spark,
      (0 until 4).map(i => (s"a$i", i.toLong)).toDF("k", "n").coalesce(1),
      t, "append") // ids 1..4
    val before = TxnLake.read(spark, t).select("k", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // UPDATE rewrites rows, ids unchanged
    TxnLake.updateWhere(spark, t, col("k") === "a1", Map("n" -> lit(99L)))
    val after = TxnLake.read(spark, t).select("k", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before, "UPDATE must carry identity values verbatim")
    // merge: update existing + insert new — only the minted rows fill
    val batch = Seq(("a2", 7L), ("c1", 1L), ("c2", 2L)).toDF("k", "n")
      .coalesce(1)
    TxnLake.mergeIntoClauses(spark, batch, t, "k",
      matched = Seq(MergeUpdate(Map("n" -> sourceCol("n")))),
      notMatched = Seq(MergeInsert(Map("k" -> col("k"), "n" -> col("n")))))
    val rows = TxnLake.read(spark, t).select("k", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("a2") == before("a2"), "merge UPDATE keeps the id")
    assert(Seq("c1", "c2").forall(k => rows(k) > before.values.max),
      "merge INSERT mints fresh ids above the hwm")
    assert(rows.values.toSeq.distinct.size == rows.size)
    // RESTORE to the 4-row snapshot: hwm must NOT roll back with it
    val hwmBefore = TxnLake.identityColumns(spark, t)("id").hwm
    TxnLake.restore(spark, t, 2L) // the first data commit's version
    assert(TxnLake.read(spark, t).count() == 4)
    assert(TxnLake.identityColumns(spark, t)("id").hwm == hwmBefore,
      "restore keeps the hwm monotone — rolled-past ids never reissue")
    TxnLake.commit(spark,
      Seq(("d1", 1L)).toDF("k", "n").coalesce(1), t, "append")
    val dId = TxnLake.read(spark, t).filter(col("k") === "d1")
      .select("id").head().getLong(0)
    assert(dId > hwmBefore,
      s"post-restore mints must clear every historical id: $dId")
    // the property rides CLONE verbatim
    val cl = Files.createTempDirectory("txnlake_identity").resolve("c")
      .toString
    TxnLake.cloneTable(spark, t, cl)
    assert(TxnLake.identityColumns(spark, cl)("id").hwm ==
      TxnLake.identityColumns(spark, t)("id").hwm)
  }

  test("a range reservation that would overflow Long refuses LOUDLY — " +
    "no silent wrap, no partial commit, no hwm advance") {
    import spark.implicits._
    val t = fresh()
    found(t)
    // |hwm| = 2e9 clears the 2^61 founding guard, but a partition
    // ordinal >= 1 reserves step*(2^33+1) ~ 1.7e19 > Long.MaxValue:
    // the try_*-checked assignment must raise, not wrap
    TxnLake.addIdentityColumn(spark, t, "id", start = 0L,
      step = 2000000000L)
    val vBefore = TxnLake.latestVersion(spark, t)
    val e = intercept[Exception] {
      TxnLake.commit(spark,
        (0 until 8).map(i => (s"a$i", i.toLong)).toDF("k", "n")
          .repartition(4), t, "append")
    }
    def chain(x: Throwable): String =
      if (x == null) "" else Option(x.getMessage).getOrElse("") +
        "\n" + chain(x.getCause)
    assert(chain(e).contains("overflowed"),
      s"expected the loud overflow refusal, got: ${chain(e).take(400)}")
    assert(TxnLake.latestVersion(spark, t) == vBefore,
      "a refused overflow commit must publish nothing")
    assert(TxnLake.identityColumns(spark, t)("id").hwm ==
      -2000000000L, "the hwm must not advance on a refused commit")
    // the single-partition regime of the same table still works: mids
    // stay tiny, reservations fit, values land on the lattice
    TxnLake.commit(spark,
      Seq(("ok", 1L)).toDF("k", "n").coalesce(1), t, "append")
    assert(TxnLake.read(spark, t).select("id").head().getLong(0) == 0L)
  }

  test("concurrent identity-minting writers: ids stay unique and the " +
    "hwm monotone under real commit conflicts") {
    import spark.implicits._
    val t = fresh()
    found(t)
    TxnLake.addIdentityColumn(spark, t, "id", start = 1L, step = 3L)
    val writers = 4
    val commitsPer = 4
    val rowsPer = 10
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    // each writer lands its commits against whatever base it finds;
    // contention forces real CommitConflict retries, each of which
    // re-reads the freshly advanced hwm (the per-attempt re-derive)
    val futs = (0 until writers).map { w =>
      scala.concurrent.Future {
        (0 until commitsPer).foreach { b =>
          TxnLake.commit(spark,
            (0 until rowsPer).map(i => (s"w$w-b$b-r$i", i.toLong))
              .toDF("k", "n").repartition(2),
            t, "append", maxAttempts = 200)
        }
      }
    }
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration(300, "s"))
    finally pool.shutdown()
    val ids = TxnLake.read(spark, t).select("id").collect()
      .map(_.getLong(0))
    assert(ids.length == writers * commitsPer * rowsPer)
    assert(ids.distinct.length == ids.length,
      "concurrent writers must never reissue an identity value")
    assert(ids.forall(v => (v - 1L) % 3L == 0L),
      "every concurrently assigned value sits on the step lattice")
    assert(TxnLake.identityColumns(spark, t)("id").hwm == ids.max,
      "the final hwm is the max landed value")
    // hwm is monotone across the whole committed history
    val vs = (1L to TxnLake.latestVersion(spark, t).get)
    val marks = vs.flatMap(v => TxnLake.identityColumnsAt(spark, t, v)
      .get("id").map(_.hwm))
    assert(marks == marks.sorted,
      s"hwm must advance monotonically through the log: $marks")
  }
}
