package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewUtilsSpec extends SparkSpec {

  /** 90% of rows share one hot key. */
  private lazy val skewed = {
    val s = SparkSpec.session
    import s.implicits._
    (1 to 2000).map { i =>
      val k = if (i % 10 == 0) s"key_${i % 7}" else "hot_key"
      (k, i.toDouble)
    }.toDF("k", "v").repartition(8)
  }

  test("salted two-phase aggregation equals the direct groupBy") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = SkewUtils.saltedSumCount(skewed, Seq("k"), "v", salt = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (n, sv)) =>
      assert(direct(k)._1 == n)
      assert(math.abs(direct(k)._2 - sv) < 1e-6)
    }
  }

  test("salted join is row-identical to the plain join") {
    val s = SparkSpec.session
    import s.implicits._
    val right = Seq(("hot_key", "H"), ("key_0", "A"), ("key_3", "B"), ("absent", "X"))
      .toDF("k", "tag")
    val plain = skewed.join(right, Seq("k")).select("k", "v", "tag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    val salted = SkewUtils.saltedJoin(skewed, right, Seq("k"), salt = 8)
      .select("k", "v", "tag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("skew profile surfaces the hot key first") {
    val top = SkewUtils.keySkewProfile(skewed, Seq("k")).head()
    assert(top.getString(0) == "hot_key")
    assert(top.getAs[Double]("skew_ratio") > 3.0)
  }
}
