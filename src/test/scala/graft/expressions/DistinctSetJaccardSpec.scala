package graft.expressions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** [[DistinctSetJaccard]] must be arithmetically identical to the
  * size(array_intersect)/size(array_union) pair it replaces on the LSH
  * verification path — the oracle SQL still computes Jaccard the
  * list_intersect/list_distinct way, so any divergence here would surface
  * as a d07/d29/d40/d47/x33 hash mismatch at the driver gate. The
  * DataFrame route exercises the codegen path (doGenCode), the direct
  * kernel call the eval path. */
class DistinctSetJaccardSpec extends SparkSpec {

  private def viaBuiltins(a: Seq[String], b: Seq[String]): Double = {
    val sess = SparkSpec.session
    import sess.implicits._
    Seq((a, b)).toDF("sa", "sb")
      .select((size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb")))).as("j"))
      .head().getDouble(0)
  }

  private def viaKernel(a: Seq[String], b: Seq[String]): Double = {
    val sess = SparkSpec.session
    import sess.implicits._
    Seq((a, b)).toDF("sa", "sb")
      .select(TextExpressions.distinctSetJaccard(col("sa"), col("sb")).as("j"))
      .head().getDouble(0)
  }

  private val distinctArr: Gen[Seq[String]] =
    Gen.listOf(Gen.oneOf((0 to 30).map(i => s"g$i"))).map(_.distinct)

  test("kernel equals the built-in intersect/union pair on distinct arrays") {
    // raw scalacheck generation with a fixed seed (the TablesSpec pattern)
    // so the case set is deterministic; one DataFrame evaluates all cases
    // through the codegen path in a single pass
    val seed = org.scalacheck.rng.Seed(4712L)
    val cases = Gen.listOfN(60, Gen.zip(distinctArr, distinctArr))
      .apply(Gen.Parameters.default, seed)
      .getOrElse(fail("generator exhausted"))
      .filter { case (a, b) => a.nonEmpty || b.nonEmpty }
    assert(cases.size > 40)
    val sess = SparkSpec.session
    import sess.implicits._
    val rows = cases.toDF("sa", "sb")
      .select(
        TextExpressions.distinctSetJaccard(col("sa"), col("sb")).as("k"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("ref"),
        TextExpressions.distinctSetOverlap(col("sa"), col("sb")).as("ov"),
        size(array_intersect(col("sa"), col("sb"))).as("ovRef"),
        col("sa"), col("sb"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"jac: sa=${r.getSeq[String](4)} sb=${r.getSeq[String](5)}")
      assert(r.getInt(2) == r.getInt(3),
        s"overlap: sa=${r.getSeq[String](4)} sb=${r.getSeq[String](5)}")
    }
  }

  test("identical, disjoint, and subset shapes give exact values") {
    assert(viaKernel(Seq("a", "b"), Seq("a", "b")) == 1.0)
    assert(viaKernel(Seq("a"), Seq("b")) == 0.0)
    assert(viaKernel(Seq("a"), Seq("a", "b", "c", "d")) == 0.25)
  }

  test("two empty arrays give NaN (the built-in 0/0 raises under ANSI)") {
    // the built-in division THROWS DIVIDE_BY_ZERO under Spark 4 ANSI mode;
    // the kernel's Java division yields NaN, which fails every >= threshold
    // filter — strictly more lenient, and unreachable in the operators
    // anyway (the shingle table filters size(s) > 0 before any pairing)
    assert(viaKernel(Nil, Nil).isNaN)
    val ex = intercept[Exception](viaBuiltins(Nil, Nil))
    assert(ex.getMessage.contains("DIVIDE_BY_ZERO"), ex.getMessage)
  }

  test("null input yields null") {
    val sess = SparkSpec.session
    import sess.implicits._
    val r = Seq((Some(Seq("a")), Option.empty[Seq[String]])).toDF("sa", "sb")
      .select(TextExpressions.distinctSetJaccard(col("sa"), col("sb")).as("j"))
      .head()
    assert(r.isNullAt(0))
  }

  test("whole-stage codegen compiles the kernel call (no fallback plan)") {
    val sess = SparkSpec.session
    import sess.implicits._
    // repartition defeats the local-relation constant fold so a real
    // codegen'd Project stage materializes
    val df = (0 until 64).map(i => (Seq(s"x$i", "c"), Seq("c", s"y$i")))
      .toDF("sa", "sb").repartition(2)
      .select(TextExpressions.distinctSetJaccard(col("sa"), col("sb")).as("j"))
    assert(df.collect().forall(r => r.getDouble(0) == 1.0 / 3.0))
    // inspect the AQE-final plan (pre-execution it prints isFinalPlan=false
    // without the codegen annotations); a leading `*(n)` on the Project is
    // the whole-stage-codegen marker in the plan's short form
    val plan = df.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator
      .find(l => l.contains("Project") && l.contains("distinct_set_jaccard"))
    assert(projLine.exists(_.trim.matches("""^\+?-?\s*\*\(\d+\).*""")),
      s"Project not codegen'd:\n${plan.take(2000)}")
  }
}
