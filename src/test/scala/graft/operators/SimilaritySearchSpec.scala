package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class SimilaritySearchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(SparkSpec.session, dir)
  private lazy val p = SimilaritySearch.prepared(emb)
  private lazy val exact = SimilaritySearch.bruteForceTopK(
    SimilaritySearch.asQueries(p.filter(col("vec_id") < 10)),
    SimilaritySearch.asCorpus(p), 10).cache()

  test("brute force: k results per query, self excluded, ranked desc") {
    val rows = exact.collect()
    assert(rows.length == 100)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val coss = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
    }
  }

  test("SRP-LSH results are a correctly-ranked subset with useful recall") {
    val approx = SimilaritySearch.srpTopK(
      SimilaritySearch.asQueries(p.filter(col("vec_id") < 10)),
      SimilaritySearch.asCorpus(p), 10, nPlanes = 4)
    // every approx neighbor's cos must equal the exact cos for that pair
    val joined = approx.as("a").join(exact.as("e"),
      col("a.query_id") === col("e.query_id") &&
        col("a.neighbor_id") === col("e.neighbor_id"))
      .select(abs(col("a.cos") - col("e.cos")).as("d")).collect()
    assert(joined.forall(_.getDouble(0) < 1e-12))
    // multi-probe over 5 of 16 buckets scans ~31% of a random corpus
    val recall = SimilaritySearch.recallAtK(approx, exact)
    assert(recall >= 0.15, s"recall=$recall")
  }

  test("IVF results are exact within probed lists with useful recall") {
    val approx = SimilaritySearch.ivfTopK(SparkSpec.session, emb,
      (0L until 10L).toSeq, 10, nLists = 8, nProbe = 3)
    val recall = SimilaritySearch.recallAtK(approx, exact)
    // 3 of 8 lists ≈ 37% scan fraction on random vectors
    assert(recall >= 0.15, s"recall=$recall")
    assert(approx.groupBy("query_id").count().collect().forall(_.getLong(1) <= 10))
  }

  test("SRP is deterministic across runs (fixed planes)") {
    def run() = SimilaritySearch.srpTopK(
      SimilaritySearch.asQueries(p.filter(col("vec_id") < 3)),
      SimilaritySearch.asCorpus(p), 5, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(run() == run())
  }

  test("mega-bucket guard drops oversized cells, leaves normal ones alone") {
    val s = SparkSpec.session
    import s.implicits._
    // 40 identical vectors: every band puts all 40 in ONE cell — with the
    // cap below 40 (per-cell population) no candidates survive; with the
    // cap at/above 40 all pairs do. The guard must also not disturb the
    // real corpus below the cap.
    val clones = (0L until 40L).map(i => (i, Array.fill(64)(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val capped = SimilaritySearch
      .bandedNearDupPairs(clones, 0.9, maxBucket = 39)
    assert(capped.count() == 0L)
    val uncapped = SimilaritySearch
      .bandedNearDupPairs(clones, 0.9, maxBucket = 40)
    assert(uncapped.count() == 40L * 39 / 2)
    val real = SimilaritySearch.bandedNearDupPairs(emb, 0.4)
    val realNoCap = SimilaritySearch
      .bandedNearDupPairs(emb, 0.4, maxBucket = Int.MaxValue)
    assert(real.collect().toSet == realNoCap.collect().toSet)
  }

  test("SemDeDup mega-cluster guard: skewed cluster skips pruning, others prune") {
    val s = SparkSpec.session
    import s.implicits._
    // label 0 is the hub: 50 identical vectors (half the corpus) — over the
    // cap of 8, so ALL must survive (no quadratic cell, no pruning). The 50
    // orthogonal-ish singleton clusters (labels 1..50) stay under the cap;
    // label 1 holds two clones, of which only the min-id survives.
    val hub = (0L until 50L).map(i => (i, Array.fill(64)(0.5f), 0))
    val dupPair = Seq((100L, Array.tabulate(64)(j => if (j == 1) 1f else 0f), 1),
      (101L, Array.tabulate(64)(j => if (j == 1) 1f else 0f), 1))
    val singles = (2 to 50).map(l =>
      (100L + l, Array.tabulate(64)(j => if (j == l % 64) 1f else 0f), l))
    val emb = (hub ++ dupPair ++ singles).toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.semDedupSurvivors(emb, eps = 0.35, maxCluster = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.count(_._2 == 0) == 50, "oversized cluster must fully survive")
    assert(out.filter(_._2 == 1).map(_._1).toSeq == Seq(100L),
      "capped cluster prunes to min-id survivor")
    assert(out.length == 50 + 1 + 49)
    // with the cap lifted the hub collapses to its min-id representative
    val unguarded = SimilaritySearch.semDedupSurvivors(emb, eps = 0.35)
      .filter(col("label") === 0).collect().map(_.getLong(0)).toSeq
    assert(unguarded == Seq(0L))
  }
}
