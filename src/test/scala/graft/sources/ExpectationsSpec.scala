package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.sources.Expectations.Expectation

/** Commit-time expectations: the pass/quarantine split, violation labels,
  * null-fails semantics, and the all-pass fast path. */
class ExpectationsSpec extends SparkSpec {

  private def freshTable(): String =
    Files.createTempDirectory("expect_spec").resolve("t").toString

  test("rows split between target and labeled quarantine; counters match") {
    import spark.implicits._
    val t = freshTable()
    val df = Seq((1, 5.0), (2, -1.0), (3, 500.0), (4, -2.0)).toDF("k", "v")
    val res = Expectations.commitWithExpectations(spark, df, t, "overwrite",
      Seq(Expectation("nonneg", col("v") >= 0),
        Expectation("cap", col("v") <= 100)))
    assert(res.passed == 1 && res.quarantined == 3)
    assert(TxnLake.read(spark, t).collect().map(_.getInt(0)).toSeq == Seq(1))
    val q = TxnLake.read(spark, Expectations.quarantinePath(t))
      .collect().map(r => (r.getInt(0), r.getString(2))).sortBy(_._1).toSeq
    assert(q == Seq((2, "nonneg"), (3, "cap"), (4, "nonneg")))
  }

  test("a null constraint verdict counts as a violation (DLT EXPECT rule)") {
    import spark.implicits._
    val t = freshTable()
    val df = Seq((1, Some(5.0)), (2, None)).toDF("k", "v")
    val res = Expectations.commitWithExpectations(spark, df, t, "overwrite",
      Seq(Expectation("nonneg", col("v") >= 0)))
    assert(res.passed == 1 && res.quarantined == 1)
  }

  test("all-pass input commits everything and no quarantine table appears") {
    import spark.implicits._
    val t = freshTable()
    val res = Expectations.commitWithExpectations(spark,
      Seq((1, 1.0), (2, 2.0)).toDF("k", "v"), t, "overwrite",
      Seq(Expectation("nonneg", col("v") >= 0)))
    assert(res.passed == 2 && res.quarantined == 0 &&
      res.quarantineVersion.isEmpty)
    assert(TxnLake.latestVersion(spark, Expectations.quarantinePath(t)).isEmpty)
  }

  test("append accumulates quarantine and passed counts per call") {
    import spark.implicits._
    val t = freshTable()
    def run(rows: Seq[(Int, Double)]) =
      Expectations.commitWithExpectations(spark, rows.toDF("k", "v"), t,
        "append", Seq(Expectation("nonneg", col("v") >= 0)))
    val r1 = run(Seq((1, 1.0), (2, -1.0)))
    val r2 = run(Seq((3, 3.0), (4, 4.0), (5, -5.0)))
    assert(r1.passed == 1 && r2.passed == 2,
      s"per-call passed counts wrong: ${r1.passed}, ${r2.passed}")
    assert(TxnLake.read(spark, t).count() == 3)
    assert(TxnLake.read(spark, Expectations.quarantinePath(t)).count() == 2)
  }
}
