package graft.expressions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** [[DistinctSetJaccard]] / [[DistinctSetOverlap]] and the
  * [[RewriteSetSimilarity]] optimizer rule. Ground truth is a plain Scala
  * set model — it CANNOT be the built-in
  * size(array_intersect)/size(array_union) idiom evaluated in-session,
  * because the session installs GraftExtensions and the rule rewrites
  * that idiom into the very kernel under test (a comparison would be
  * vacuous). Comparing BOTH the kernel column and the built-in-idiom
  * column against the model therefore pins the kernel arithmetic and the
  * rewrite's semantics in one pass. The oracle SQL side still computes
  * Jaccard via DuckDB list functions, so any divergence would also
  * surface as a d07/d10/d29/d40/d44/d47/x33 hash mismatch at the driver
  * gate. */
class DistinctSetJaccardSpec extends SparkSpec {

  private def modelJac(a: Seq[String], b: Seq[String]): Double = {
    val sa = a.toSet
    val sb = b.toSet
    (sa & sb).size.toDouble / (sa | sb).size
  }

  private def kernelDf(cases: Seq[(Seq[String], Seq[String])]) = {
    val sess = SparkSpec.session
    import sess.implicits._
    // repartition blocks ConvertToLocalRelation from evaluating the whole
    // projection at optimization time — the idiom columns must survive to
    // the optimizer so RewriteSetSimilarity (a post-hoc batch) sees them
    cases.toDF("sa", "sb").repartition(2).select(
      TextExpressions.distinctSetJaccard(col("sa"), col("sb")).as("k"),
      (size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb")))).as("idiom"),
      TextExpressions.distinctSetOverlap(col("sa"), col("sb")).as("ov"),
      size(array_intersect(col("sa"), col("sb"))).as("ovIdiom"),
      col("sa"), col("sb"))
  }

  // duplicates NOT removed — duplicate-safety is part of the contract
  private val arr: Gen[Seq[String]] =
    Gen.listOf(Gen.oneOf((0 to 20).map(i => s"g$i")))

  test("kernel and rewritten idiom both match the Scala set model") {
    val seed = org.scalacheck.rng.Seed(4712L)
    val cases = Gen.listOfN(80, Gen.zip(arr, arr))
      .apply(Gen.Parameters.default, seed)
      .getOrElse(fail("generator exhausted"))
      .filter { case (a, b) => a.nonEmpty || b.nonEmpty }
    assert(cases.size > 80 * 3 / 4)
    assert(cases.exists { case (a, b) => a.size != a.distinct.size },
      "seed must produce duplicate-bearing cases")
    kernelDf(cases).collect().foreach { r =>
      val (a, b) = (r.getSeq[String](4), r.getSeq[String](5))
      val m = modelJac(a, b)
      assert(r.getDouble(0) == m, s"kernel: sa=$a sb=$b")
      assert(r.getDouble(1) == m, s"idiom-after-rewrite: sa=$a sb=$b")
      val ov = (a.toSet & b.toSet).size
      assert(r.getInt(2) == ov, s"overlap: sa=$a sb=$b")
      assert(r.getInt(3) == ov, s"overlap-idiom: sa=$a sb=$b")
    }
  }

  test("identical, disjoint, subset, and duplicate-bearing shapes are exact") {
    // keyed by input — repartition scrambles row order
    val byInput = kernelDf(Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq("a"), Seq("a", "b", "c", "d")),
      (Seq("a", "a", "b"), Seq("b", "b", "c"))))
      .collect()
      .map(r => (r.getSeq[String](4), r.getSeq[String](5)) ->
        ((r.getDouble(0), r.getInt(2)))).toMap
    assert(byInput((Seq("a", "b"), Seq("a", "b"))) == ((1.0, 2)))
    assert(byInput((Seq("a"), Seq("b"))) == ((0.0, 0)))
    assert(byInput((Seq("a"), Seq("a", "b", "c", "d"))) == ((0.25, 1)))
    assert(byInput((Seq("a", "a", "b"), Seq("b", "b", "c"))) == ((1.0 / 3.0, 1)))
  }

  test("the optimizer rule rewrites the idiom in the plan") {
    val sess = SparkSpec.session
    import sess.implicits._
    val df = Seq((Seq("a"), Seq("a"))).toDF("sa", "sb").repartition(2).select(
      (size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb")))).as("jac"),
      size(array_intersect(col("sa"), col("sb"))).as("inter"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("distinct_set_jaccard"), optimized)
    assert(optimized.contains("distinct_set_overlap"), optimized)
    assert(!optimized.contains("array_union"), optimized)
  }

  test("two empty arrays: direct kernel and try_divide idiom give NULL") {
    // the 0/0 case in the lenient modes: a direct kernel call defaults to
    // failOnError=false, and the try_divide form of the idiom rewrites to
    // the same lenient kernel — both produce the NULL try_divide defines
    val sess = SparkSpec.session
    import sess.implicits._
    val df = Seq((Seq.empty[String], Seq.empty[String])).toDF("sa", "sb")
      .repartition(2).select(
        TextExpressions.distinctSetJaccard(col("sa"), col("sb")).as("k"),
        expr("""try_divide(size(array_intersect(sa, sb)),
                           size(array_union(sa, sb)))""").as("tryIdiom"))
    // the TRY-mode division must also have been rewritten into the kernel
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("array_union"), optimized)
    val rows = df.collect()
    assert(rows.head.isNullAt(0))
    assert(rows.head.isNullAt(1))
  }

  test("ANSI session: the rewritten idiom still raises DIVIDE_BY_ZERO on 0/0") {
    // RewriteSetSimilarity is installed session-wide and the session runs
    // Spark 4's default spark.sql.ansi.enabled=true, so the rewrite must
    // keep the built-in contract: size(array_intersect)/size(array_union)
    // on two empty arrays raises DIVIDE_BY_ZERO. The rule carries the
    // Divide's eval mode into the kernel's failOnError — verified here as
    // (a) the rewrite still fires under ANSI, (b) the error survives it.
    val sess = SparkSpec.session
    assert(sess.conf.get("spark.sql.ansi.enabled") == "true",
      "precondition: the engine session is ANSI")
    val df = kernelDf(Seq((Seq.empty[String], Seq.empty[String])))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("distinct_set_jaccard"), optimized)
    assert(!optimized.contains("array_union"), optimized)
    val e = intercept[Exception](df.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("DIVIDE_BY_ZERO") || m.contains("Division by zero")),
      s"expected ANSI divide-by-zero, got: ${messages(e).mkString(" | ")}")
  }

  test("null input yields null") {
    val sess = SparkSpec.session
    import sess.implicits._
    val r = Seq((Some(Seq("a")), Option.empty[Seq[String]])).toDF("sa", "sb")
      .select(TextExpressions.distinctSetJaccard(col("sa"), col("sb")).as("j"),
        TextExpressions.distinctSetOverlap(col("sa"), col("sb")).as("o"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SQL registration: distinct_set_jaccard / distinct_set_overlap") {
    val sess = SparkSpec.session
    val r = sess.sql(
      """SELECT distinct_set_jaccard(array('a','b'), array('b','c')) AS j,
        |       distinct_set_overlap(array('a','b'), array('b','c')) AS o
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0 / 3.0 && r.getInt(1) == 1)
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
