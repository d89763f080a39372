package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PrefixSumSpec extends SparkSpec {

  test("distributed prefix sum equals the single-window reference") {
    val s = SparkSpec.session
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 5000).map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("k", "v")
    val got = PrefixSum.exclusivePrefixSum(df, "k", "v", "off", partitions = 7)
      .select("k", "off").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("k")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val want = df.withColumn("off", coalesce(sum(col("v")).over(w), lit(0L)))
      .select("k", "off").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got(1L) == 0L)
  }

  test("single partition and empty input degenerate cleanly") {
    val s = SparkSpec.session
    import s.implicits._
    val one = PrefixSum.exclusivePrefixSum(
      Seq((10L, 5L)).toDF("k", "v"), "k", "v", "off", partitions = 1)
    assert(one.select("off").head().getLong(0) == 0L)
    val empty = PrefixSum.exclusivePrefixSum(
      Seq.empty[(Long, Long)].toDF("k", "v"), "k", "v", "off", partitions = 3)
    assert(empty.count() == 0)
  }
}
