package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = SparkSpec.session
    import s.implicits._
    ConnectedComponents.components(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to one component labeled by its min id") {
    // 5~4~3~2~1: worst-case diameter for min-label propagation
    val got = run(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate canonical labels") {
    val got = run(Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L)))
    assert(got == Map(
      1L -> 1L, 2L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("cycles and duplicate edges converge") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("90%-degree hub: skew census triggers salting, result unchanged, no straggler") {
    val s = SparkSpec.session
    import org.apache.spark.sql.functions._
    import s.implicits._
    // star center 0 ~ {1..200} (the web-scale dedup-cluster shape) plus a
    // side chain so there's a second component to keep honest
    val star = (1L to 200L).map(i => (0L, i))
    val chain = Seq((500L, 501L), (501L, 502L))
    val edgesDf = (star ++ chain).toDF("src", "dst")
    // census: after undirected doubling the hub owns half the directed edges
    val doubled = edgesDf.select(col("src").as("e_src"), col("dst").as("e_dst"))
      .union(edgesDf.select(col("dst").as("e_src"), col("src").as("e_dst")))
    val frac = ConnectedComponents.hottestSourceFraction(doubled)
    assert(frac > 0.45 && frac <= 0.55, s"hub fraction=$frac")
    val expected =
      (0L to 200L).map(_ -> 0L).toMap ++ Map(500L -> 500L, 501L -> 500L, 502L -> 500L)
    // default threshold (0.25) puts the hub graph on the salted path
    val saltedRun = ConnectedComponents.components(edgesDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(saltedRun == expected)
    // forced-unsalted run must agree: salting is semantics-preserving
    val plainRun = ConnectedComponents
      .components(edgesDf, skewMinFraction = 1.1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plainRun == saltedRun)
    // partition-size probe on the propagation join (AQE off so coalescing
    // doesn't mask the shuffle layout): unsalted, one partition owns the
    // hub's whole adjacency; salted, no partition holds more than ~2x the
    // fair share
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    val prevBcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevShuf = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // the at-scale premise: labels are corpus-sized, NOT broadcastable —
    // force the shuffled join the probe is about, wide enough that the 8
    // salt buckets don't trivially collide back into one partition
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "16")
    try {
      val labels = doubled.select(col("e_src").as("id")).distinct()
        .select(col("id").as("e_src"), col("id").as("lbl"))
      def maxShare(df: org.apache.spark.sql.DataFrame): Double = {
        val per = df.withColumn("p", spark_partition_id())
          .groupBy("p").count().collect().map(_.getLong(1))
        per.max.toDouble / per.sum
      }
      val plainShare = maxShare(doubled.join(labels, Seq("e_src")))
      val saltedShare = maxShare(
        SkewUtils.saltedJoin(doubled, labels, Seq("e_src"), salt = 8))
      assert(plainShare >= 0.5, s"plainShare=$plainShare")
      assert(saltedShare <= 0.35, s"saltedShare=$saltedShare")
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      s.conf.set("spark.sql.shuffle.partitions", prevShuf)
    }
  }
}
