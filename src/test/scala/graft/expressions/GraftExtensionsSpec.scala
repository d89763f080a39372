package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("dot_product_double is callable from SQL") {
    val r = SparkSpec.session.sql(
      "SELECT dot_product_double(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("native expression matches the HOF formulation") {
    val s = SparkSpec.session
    import s.implicits._
    val df = Seq((Seq(0.5, -1.5, 2.0), Seq(3.0, 0.25, -2.0)))
      .toDF("a", "b")
    val native = df.select(VectorExpressions.dotNative(col("a"), col("b"))).head().getDouble(0)
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).head().getDouble(0)
    assert(native == hof)
  }

  test("optimizer rule rewrites the HOF dot-product pattern to the native expression") {
    val s = SparkSpec.session
    // parquet-backed input so constant folding can't collapse the plan
    val e = graft.sources.Tables.embeddings(s, "/root/testdata/sf0.001")
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .select(aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val optimized = e.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product_double"), optimized)
    // and the rewritten plan still computes the right values (norms²)
    val viaNative = e.collect().map(_.getDouble(0))
    assert(viaNative.forall(_ > 0))
  }

  test("native dot product preserves HOF NULL semantics on length mismatch") {
    val s = SparkSpec.session
    import s.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
    val native = df.select(VectorExpressions.dotNative(col("a"), col("b")).as("d")).head()
    assert(native.isNullAt(0)) // HOF form: zip_with pads with null → sum is NULL
    // short doc → empty shingle/hash array → null minhash even from a
    // non-nullable child (nullable override regression test)
    val sig = Seq("ab cd").toDF("t")
      .withColumn("toks", split(lower(col("t")), "\\s+"))
      .withColumn("s", graft.functions.TextFunctions.shingles(col("toks"), 3))
      .withColumn("h", transform(col("s"), x => graft.functions.TextFunctions.hash28(x)))
      .select(graft.functions.TextFunctions.minhashSignature(col("h")).as("sig"))
      .head()
    assert(sig.isNullAt(0))
  }

  test("rule leaves non-matching aggregates alone") {
    val s = SparkSpec.session
    import s.implicits._
    // sum of a+b (not a*b) must NOT rewrite
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("dot_product_double"))
    assert(df.head().getDouble(0) == 10.0)
  }
}
