package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("zValue2 interleaves bits (known Morton codes)") {
    val s = SparkSpec.session
    import s.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (255L, 0L), (0L, 255L))
      .toDF("cx", "cy")
      .withColumn("z", ZOrder.zValue2(col("cx"), col("cy"), 8))
    val got = df.select("z").as[Long].collect().toSeq
    // x occupies even bits, y odd: (1,0)->1, (0,1)->2, (1,1)->3,
    // (255,0)->0x5555, (0,255)->0xAAAA
    assert(got == Seq(0L, 1L, 2L, 3L, 0x5555L, 0xAAAAL))
  }

  test("cell clamps to the top cell at x = max and is 0 for degenerate range") {
    val s = SparkSpec.session
    import s.implicits._
    val df = Seq((0.0), (50.0), (25.0)).toDF("x")
      .withColumn("c", ZOrder.cell(col("x"), lit(0.0), lit(50.0), 8))
    assert(df.select("c").as[Long].collect().toSeq == Seq(0L, 255L, 128L))
    val deg = Seq((7.0)).toDF("x")
      .withColumn("c", ZOrder.cell(col("x"), lit(7.0), lit(7.0), 8))
    assert(deg.select("c").as[Long].collect().head == 0L)
  }

  test("clusterByZ partitions own disjoint contiguous z-ranges") {
    val s = SparkSpec.session
    import s.implicits._
    val pts = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toDouble, y.toDouble, x * 64 + y)).toDF("x", "y", "id")
    val clustered = ZOrder.clusterByZ(pts, "x", "y", bits = 6, partitions = 8)
    val ranges = clustered
      .groupBy(spark_partition_id().as("pid"))
      .agg(min(col("__z")).as("lo"), max(col("__z")).as("hi"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    // every partition's [lo, hi] interval is disjoint from the next —
    // exactly the property that gives file-footer min/max pruning teeth
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, ranges.mkString(","))
      case _ => ()
    }
    // no rows lost
    assert(clustered.count() == 64L * 64L)
  }

  test("rank cells keep pruning under clustered/sparse key distributions") {
    val s = SparkSpec.session
    import s.implicits._
    // 10 widely-offset id islands × uniform values — the x35 factor-10
    // growth shape. LINEAR min/max cells collapse each island to ~one id
    // cell and the count-quantile z cuts stop aligning with value
    // geometry, so a central value band kept EVERY file; rank cells make
    // the cuts quadrant-exact for any distribution.
    val pts = (for (isl <- 0 until 10; i <- 0 until 500)
      yield (isl * 10000000L + i.toLong, (i % 100).toDouble)).toDF("id", "v")
    val z = ZOrder.clusterByZ(pts, "id", "v", bits = 6, partitions = 4)
    val stats = z.groupBy(spark_partition_id())
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx")).collect()
    val (lo, hi) = (25.0, 49.0)
    // at least one partition's [mn, mx] lies wholly outside the central
    // band — the file a stats-pruned scan skips
    assert(stats.exists(r =>
      r.getAs[Double]("mn") > hi || r.getAs[Double]("mx") < lo),
      stats.map(r => (r.getAs[Double]("mn"), r.getAs[Double]("mx"))).mkString(","))
    assert(z.count() == 5000L)
  }

  test("z-order clustering bounds per-partition spatial extent vs a 1-D sort") {
    val s = SparkSpec.session
    import s.implicits._
    // uniform grid: a y-sorted layout puts EVERY x in each partition
    // (x-extent = full domain); z-order keeps both extents bounded
    val pts = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toDouble, y.toDouble)).toDF("x", "y")
    val z = ZOrder.clusterByZ(pts, "x", "y", bits = 6, partitions = 16)
    val maxExtent = z
      .groupBy(spark_partition_id())
      .agg((max(col("x")) - min(col("x"))).as("xe"), (max(col("y")) - min(col("y"))).as("ye"))
      .agg(max(greatest(col("xe"), col("ye"))))
      .collect().head.getDouble(0)
    // 16 partitions of a 64x64 grid in z-order = quadrant tiles; each tile
    // spans at most half the domain per axis (a 1-D sort spans the full 63)
    assert(maxExtent <= 32.0, s"max per-partition extent $maxExtent")
  }
}
