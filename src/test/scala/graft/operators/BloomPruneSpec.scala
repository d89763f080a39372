package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {

  test("no false negatives: every built key passes mightContain") {
    val s = SparkSpec.session
    import s.implicits._
    val dim = (1L to 500L).map(_ * 7L).toDF("k")
    val sketch = BloomPrune.build(dim, "k", expectedItems = 500L)
    assert(sketch.isDefined)
    val kept = dim.filter(BloomPrune.mightContain(sketch, col("k"))).count()
    assert(kept == 500L)
  }

  test("prunes most non-members at 8 bits/key (fpp well under 10%)") {
    val s = SparkSpec.session
    import s.implicits._
    val dim = (1L to 500L).map(_ * 7L).toDF("k")
    val sketch = BloomPrune.build(dim, "k", expectedItems = 500L)
    // probe keys disjoint from the build set (multiples of 7 shifted by 3)
    val probes = (1L to 10000L).map(_ * 7L + 3L).toDF("k")
    val fp = probes.filter(BloomPrune.mightContain(sketch, col("k"))).count()
    assert(fp < 1000L, s"false-positive count $fp out of 10000")
  }

  test("empty build side prunes everything") {
    val s = SparkSpec.session
    import s.implicits._
    val dim = Seq.empty[Long].toDF("k")
    val sketch = BloomPrune.build(dim, "k", expectedItems = 16L)
    assert(sketch.isEmpty)
    val probes = (1L to 100L).toDF("k")
    assert(probes.filter(BloomPrune.mightContain(sketch, col("k"))).count() == 0L)
  }

  test("prune + exact join equals the plain join (false positives removed)") {
    val s = SparkSpec.session
    import s.implicits._
    val dim = (1L to 50L).toDF("k")
    val fact = (1L to 5000L).map(i => (i % 200L, i)).toDF("k", "v")
    val sketch = BloomPrune.build(dim, "k", expectedItems = 50L)
    val pruned = fact.filter(BloomPrune.mightContain(sketch, col("k")))
      .join(dim, "k").agg(count(lit(1)), sum("v")).head()
    val exact = fact.join(dim, "k").agg(count(lit(1)), sum("v")).head()
    assert(pruned == exact)
  }
}
