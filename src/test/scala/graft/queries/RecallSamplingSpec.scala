package graft.queries

import graft.SparkSpec

/** Sampled ground truth for the recall evaluations (d38 / v10): at 100 TB
  * the exact side runs over a deterministic md5-bucket sample; these tests
  * pin that rate < 1 restricts BOTH sides consistently (a recall estimate
  * over a sub-population, never a mixed-universe comparison) and that
  * rate = 1 is byte-identical to the registered queries. */
class RecallSamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("d38 sampled ground truth is a consistent sub-population estimate") {
    val full = TextQueries.lshRecallEval(spark, dir, 1.0)
    val sampled = TextQueries.lshRecallEval(spark, dir, 0.5)
    assert(sampled.columns.toSeq == full.columns.toSeq)
    val fullRows = full.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every sampled band's truth count is bounded by the full run's, and
    // found never exceeds truth (both sides saw the same sample universe)
    sampled.collect().foreach { r =>
      val (band, nTrue, nFound) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nFound <= nTrue, s"$band: found $nFound > true $nTrue")
      fullRows.get(band).foreach { case (ft, _) =>
        assert(nTrue <= ft, s"$band: sampled truth $nTrue > full $ft")
      }
      if (nTrue > 0) {
        val recall = r.getDouble(3)
        assert(recall >= 0.0 && recall <= 1.0, s"$band recall $recall")
      }
    }
    // rate 1.0 reproduces the registered query exactly
    assert(full.collect().toSeq ==
      TextQueries.docLshRecallEval.run(spark, dir).collect().toSeq)
    intercept[IllegalArgumentException] {
      TextQueries.lshRecallEval(spark, dir, 0.0)
    }
  }

  test("v10 sampled queries restrict the exact side's query set") {
    val full = VectorQueries.annRecallEvalRun(spark, dir, 1.0)
    val sampled = VectorQueries.annRecallEvalRun(spark, dir, 0.4)
    assert(sampled.columns.toSeq == full.columns.toSeq)
    val fullIds = full.collect().map(_.getLong(0)).toSet
    val sampledRows = sampled.collect()
    val sampledIds = sampledRows.map(_.getLong(0)).toSet
    assert(sampledIds.subsetOf(fullIds), s"$sampledIds not in $fullIds")
    assert(sampledIds.size < fullIds.size,
      "a 0.4 sample of 5 queries should drop at least one")
    // per-query rows agree with the full run on the shared queries: the
    // sample changes WHICH queries are evaluated, never their results
    val fullById = full.collect().map(r => r.getLong(0) -> r.toSeq).toMap
    sampledRows.foreach(r => assert(fullById(r.getLong(0)) == r.toSeq))
    // rate 1.0 reproduces the registered query exactly
    assert(full.collect().toSeq ==
      VectorQueries.annRecallEval.run(spark, dir).collect().toSeq)
  }
}
