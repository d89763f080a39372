package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {

  private def viaAggregator(parts: Int): Seq[(String, Long, Double, Int)] = {
    val s = SparkSpec.session
    import s.implicits._
    val data = (1L to 500L).map(i =>
      (s"g${i % 7}", (i * 37 % 101).toDouble, i))
    val agg = new TopKAggregator(3)
    data.toDF("g", "score", "id").repartition(parts)
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (g, top) =>
        top.zipWithIndex.map { case ((sc, id), i) => (g, id, sc, i + 1) }
      }
      .collect().toSeq.sortBy(r => (r._1, r._4))
  }

  test("matches window row_number top-3 and is partition-invariant") {
    val s = SparkSpec.session
    import s.implicits._
    val data = (1L to 500L).map(i => (s"g${i % 7}", (i * 37 % 101).toDouble, i))
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val expect = data.toDF("g", "score", "id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("g", "id", "score", "rnk")
      .as[(String, Long, Double, Int)]
      .collect().toSeq.sortBy(r => (r._1, r._4))
    assert(viaAggregator(1) == expect)
    assert(viaAggregator(13) == expect) // merge path, any partitioning
  }

  test("groups smaller than K return all their rows, ranked") {
    val s = SparkSpec.session
    import s.implicits._
    val agg = new TopKAggregator(5)
    val out = Seq(("a", 2.0, 1L), ("a", 9.0, 2L)).toDF("g", "score", "id")
      .as[(String, Double, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(agg.toColumn.name("top"))
      .collect()
    assert(out.head._2 == Seq((9.0, 2L), (2.0, 1L)))
  }

  test("ties break on ascending id deterministically") {
    val s = SparkSpec.session
    import s.implicits._
    val agg = new TopKAggregator(2)
    val out = Seq(("a", 5.0, 30L), ("a", 5.0, 10L), ("a", 5.0, 20L))
      .toDF("g", "score", "id").as[(String, Double, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(agg.toColumn.name("top"))
      .collect()
    assert(out.head._2 == Seq((5.0, 10L), (5.0, 20L)))
  }
}
