package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Concurrent-DML conflict matrix (the r18 verdict's item 6): for each
  * racing pair, the outcome must be SOME serial order of the two
  * operations — or a loud ConcurrentModificationException when the
  * loser's retries exhaust — never a silent lost update or a torn
  * state. Identity-minting and rename-vs-writer races are covered by
  * their own suites (TxnLakeIdentitySpec, TxnLakeRenameSpec); this
  * matrix drives the remaining pairs the verdict named through one
  * shared race harness: DV-delete vs merge, update vs OPTIMIZE,
  * rename vs a CDF reader, restore vs append. */
class TxnLakeConflictMatrixSpec extends SparkSpec {

  private def fresh(): String =
    Files.createTempDirectory("txnlake_matrix").resolve("t").toString

  /** Found a 40-row (k, v) table in two files. */
  private def found(t: String): Unit = {
    import spark.implicits._
    (0 until 2).foreach { h =>
      TxnLake.commit(spark,
        (0 until 20).map(j => (h * 20L + j, s"v${h * 20 + j}"))
          .toDF("k", "v").coalesce(1), t, "append")
    }
  }

  /** Run the two operations CONCURRENTLY from a common barrier; each
    * side reports whether it committed (None) or threw (Some). An
    * IllegalArgument/IllegalState/ConcurrentModification escape is a
    * legal race outcome (a loud refusal); anything else rethrows. */
  private def race(opA: () => Unit, opB: () => Unit)
      : (Option[Throwable], Option[Throwable]) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    def side(op: () => Unit) = scala.concurrent.Future {
      gate.await()
      try { op(); None }
      catch {
        case e @ (_: IllegalArgumentException | _: IllegalStateException |
                  _: java.util.ConcurrentModificationException) => Some(e)
      }
    }
    val (fa, fb) = (side(opA), side(opB))
    try scala.concurrent.Await.result(
      fa.zip(fb), scala.concurrent.duration.Duration(300, "s"))
    finally pool.shutdown()
  }

  /** One matrix row: race the pair, then require the final state to be
    * a member of the serial-order outcomes consistent with which sides
    * committed. `outcomes` maps (aCommitted, bCommitted) to the set of
    * acceptable (sorted) row collections. */
  private case class Pair(
      name: String,
      opA: String => () => Unit,
      opB: String => () => Unit,
      outcomes: (Boolean, Boolean) => Set[Seq[(Long, String)]])

  private def rowsOf(t: String): Seq[(Long, String)] =
    TxnLake.read(spark, t).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  private val base: Seq[(Long, String)] =
    (0 until 40).map(i => (i.toLong, s"v$i"))

  private def updated(rows: Seq[(Long, String)],
                      lo: Long, hi: Long): Seq[(Long, String)] =
    rows.map { case (k, v) => if (k >= lo && k <= hi) (k, "u") else (k, v) }

  test("conflict matrix: every racing DML pair serializes or refuses " +
    "loudly — never a silent lost update") {
    import spark.implicits._
    val pairs = Seq(
      // DV-delete k<25 vs merge-update k in 20..29: both serial orders
      // agree (deleted rows' updates are moot), so the only acceptable
      // committed-committed state is rows 25..39 with 25..29 updated
      Pair("dv-delete vs merge",
        t => () => { TxnLake.deleteWhereDv(spark, t, col("k") < 25L); () },
        t => () => {
          TxnLake.mergeIntoClauses(spark,
            (20L to 29L).map(k => (k, "u")).toDF("k", "v"), t, "k",
            matched = Seq(TxnLake.MergeUpdate(
              Map("v" -> TxnLake.sourceCol("v")))))
          ()
        },
        (a, b) => Set(
          (if (a) base.filter(_._1 >= 25L) else base)
            .pipe(r => if (b) updated(r, 20L, 29L) else r))),
      // CoW update vs OPTIMIZE: optimize is row-preserving, so the rows
      // depend only on whether the update landed
      Pair("update vs optimize",
        t => () => {
          TxnLake.updateWhere(spark, t, col("k") === 5L,
            Map("v" -> lit("u")))
          ()
        },
        t => () => { TxnLake.optimize(spark, t, numFiles = 2); () },
        (a, _) => Set(if (a) updated(base, 5L, 5L) else base)),
      // restore-to-v0 vs append: restore-then-append keeps the new row,
      // append-then-restore discards it — BOTH are serial orders
      Pair("restore vs append",
        t => () => { TxnLake.restore(spark, t, 0L); () },
        t => () => {
          TxnLake.commit(spark,
            Seq((999L, "new")).toDF("k", "v").coalesce(1), t, "append")
          ()
        },
        (a, b) => {
          val v0 = base.take(20) // founding commit = first 20 rows
          val post = if (a) v0 else base
          if (b) Set(post, post :+ (999L, "new")) else Set(post)
        }))
    pairs.foreach { p =>
      val t = fresh()
      found(t)
      val (ea, eb) = race(p.opA(t), p.opB(t))
      val got = rowsOf(t)
      val allowed = p.outcomes(ea.isEmpty, eb.isEmpty)
      assert(allowed.exists(_ == got),
        s"[${p.name}] final state is no serial order of the race " +
          s"(A=${ea.map(_.getClass.getSimpleName)}, " +
          s"B=${eb.map(_.getClass.getSimpleName)}): got ${got.take(8)}… " +
          s"size ${got.size}, allowed sizes ${allowed.map(_.size)}")
    }
  }

  test("conflict matrix: a CDF reader racing a rename sees ONE coherent " +
    "naming per result — either era, never a phantom mix") {
    import spark.implicits._
    val t = fresh()
    found(t)
    TxnLake.updateWhere(spark, t, col("k") === 3L, Map("v" -> lit("u")))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val renamer = scala.concurrent.Future {
      Thread.sleep(20)
      TxnLake.renameColumn(spark, t, "v", "val", maxAttempts = 200)
    }
    val readers = scala.concurrent.Future {
      (0 until 6).map { _ =>
        val latest = TxnLake.latestVersion(spark, t).get
        val feed = TxnLake.tableChanges(spark, t, 0L, latest, "k")
        val cols = feed.columns.toSeq
        val dataCol = if (cols.contains("val")) "val" else "v"
        val nulls = feed.filter(col(dataCol).isNull).count()
        (cols, nulls)
      }
    }
    val results = try scala.concurrent.Await.result(
      readers, scala.concurrent.duration.Duration(300, "s"))
    finally {
      scala.concurrent.Await.ready(renamer,
        scala.concurrent.duration.Duration(300, "s"))
      pool.shutdown()
    }
    results.foreach { case (cols, nulls) =>
      assert(cols.contains("v") ^ cols.contains("val"),
        s"a feed must speak exactly one era's naming: $cols")
      assert(nulls == 0L,
        s"no hop may null-fill into a phantom column: $cols")
    }
  }
}
