package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {

  test("bucketized interval join equals the naive theta join") {
    val s = SparkSpec.session
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i => (i.toLong % 5, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "p", "lid")
    val right = (1 to 60).map { i =>
      val st = rnd.nextInt(950).toLong
      (i.toLong % 5, st, st + rnd.nextInt(120).toLong, i.toLong)
    }.toDF("k", "st", "en", "rid")

    val bucketed = IntervalJoin.pointInInterval(left, right, Seq("k"), "p", "st", "en", 100L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right, Seq("k"))
      .filter(col("p") >= col("st") && col("p") <= col("en"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("pairs are emitted once even when intervals span many buckets") {
    val s = SparkSpec.session
    import s.implicits._
    val left = Seq((1L, 500L, 1L)).toDF("k", "p", "lid")
    val right = Seq((1L, 0L, 1000L, 9L)).toDF("k", "st", "en", "rid") // spans 11 buckets
    val out = IntervalJoin.pointInInterval(left, right, Seq("k"), "p", "st", "en", 100L)
    assert(out.count() == 1)
  }

  test("exact bucket ids at epoch-nanos magnitude (long div, not double floor)") {
    val s = SparkSpec.session
    import s.implicits._
    // At ~1.7e18 a double's ulp is 256, so floor(p / w) through doubles can
    // shift a near-boundary bucket id; `div` is exact long arithmetic.
    val w = 60_000_000_000L // 60 s in nanos
    val boundary = 28_333_333L * w // 1.69999998e18, a bucket edge
    val left = Seq((1L, boundary - 1L, 1L), (1L, boundary, 2L), (1L, boundary + 1L, 3L))
      .toDF("k", "p", "lid")
    val right = Seq((1L, boundary - 10L, boundary - 1L, 8L), (1L, boundary, boundary + 10L, 9L))
      .toDF("k", "st", "en", "rid")
    val got = IntervalJoin.pointInInterval(left, right, Seq("k"), "p", "st", "en", w)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 8L), (2L, 9L), (3L, 9L)))
  }

  test("inclusive bounds on both ends") {
    val s = SparkSpec.session
    import s.implicits._
    val left = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 9L, 3L), (1L, 21L, 4L))
      .toDF("k", "p", "lid")
    val right = Seq((1L, 10L, 20L, 9L)).toDF("k", "st", "en", "rid")
    val got = IntervalJoin.pointInInterval(left, right, Seq("k"), "p", "st", "en", 7L)
      .select("lid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }
}
