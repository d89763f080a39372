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

  test("composite-key prefix sum equals the single-window reference") {
    val s = SparkSpec.session
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // small primary domain forces heavy primary ties — the case the
    // composite exists for — with ids far beyond any 2^24-style ceiling
    val df = (1 to 4000).map(i =>
      (rnd.nextInt(5).toLong, i.toLong * 1000000007L, rnd.nextInt(50).toLong))
      .toDF("q", "id", "v")
    val got = PrefixSum
      .exclusivePrefixSumByRange(df, Seq("q", "id"), "v", "off")
      .select("id", "off").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("q", "id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val want = df.withColumn("off", coalesce(sum(col("v")).over(w), lit(0L)))
      .select("id", "off").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // empty input degenerates cleanly
    assert(PrefixSum.exclusivePrefixSumByRange(
      Seq.empty[(Long, Long, Long)].toDF("q", "id", "v"),
      Seq("q", "id"), "v", "off").count() == 0)
  }

  test("competition rank matches brute force on a random composite-key multiset") {
    val s = SparkSpec.session
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // heavy duplication on purpose: competition semantics only show
    // under ties, and ties must survive range-partition boundaries
    val rows = (1 to 4000).map { i =>
      (s"k${rnd.nextInt(12)}", rnd.nextInt(5).toLong, i.toLong)
    }
    val df = rows.toDF("a", "b", "id")
    val got = PrefixSum.competitionRankByRange(df, Seq("a", "b"), "r")
      .select("id", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keyOf = rows.map(t => t._3 -> ((t._1, t._2))).toMap
    implicit val ord: Ordering[(String, Long)] = Ordering.Tuple2
    rows.foreach { case (a, b, id) =>
      val smaller = rows.count(o => ord.lt((o._1, o._2), (a, b)))
      assert(got(id) == smaller + 1L,
        s"key ($a,$b): got ${got(id)}, want ${smaller + 1}")
    }
    // tie flag: set exactly when the key occurs more than once
    val flags = PrefixSum
      .competitionRankByRange(df, Seq("a", "b"), "r", tiedOut = "t")
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val multi = rows.groupBy(t => (t._1, t._2)).view.mapValues(_.size > 1).toMap
    rows.foreach { case (a, b, id) =>
      assert(flags(id) == multi((a, b)), s"tie flag for ($a,$b)")
    }
  }

  test("competition rank: all-equal keys, all-distinct keys, empty input") {
    val s = SparkSpec.session
    import s.implicits._
    val same = PrefixSum.competitionRankByRange(
      (1L to 100L).map(i => ("x", i)).toDF("k", "id"), Seq("k"), "r",
      tiedOut = "t").collect()
    assert(same.forall(r => r.getAs[Long]("r") == 1L && r.getAs[Boolean]("t")))
    val distinct = PrefixSum.competitionRankByRange(
      (1L to 100L).map(i => (f"k$i%03d", i)).toDF("k", "id"), Seq("k"), "r",
      tiedOut = "t").collect()
    assert(distinct.map(_.getAs[Long]("r")).sorted.toSeq == (1L to 100L))
    assert(distinct.forall(!_.getAs[Boolean]("t")))
    val empty = PrefixSum.competitionRankByRange(
      Seq.empty[(String, Long)].toDF("k", "id"), Seq("k"), "r")
    assert(empty.count() == 0)
  }
}
