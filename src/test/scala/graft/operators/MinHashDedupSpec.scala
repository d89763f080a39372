package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MinHashDedupSpec extends SparkSpec {

  private def docsDf(docs: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text")
  }

  // 25+ tokens so 3-gram shingles are plentiful and near-copies stay
  // above the 0.7 verification threshold
  private val baseText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon " +
      "phi chi psi omega aleph"

  test("mega-bucket guard: star candidates keep the cluster connected, linearly") {
    // 12 identical docs: every band bucket holds the whole cluster, the
    // unguarded path would probe 66 pairs; cap 2 probes the 11-star
    val cluster = (1L to 12L).map(_ -> baseText)
    val capped = MinHashDedup.verifiedPairs(docsDf(cluster), 0.7, maxBucketSize = 2)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == (2L to 12L).map(i => (1L, i)).toSet,
      s"expected the representative star, got $capped")
    // connectivity is what downstream component collapse needs — the star
    // reaches every member
    val comps = ConnectedComponents.components(
      MinHashDedup.verifiedPairs(docsDf(cluster), 0.7, maxBucketSize = 2)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .collect().map(_.getLong(1)).toSet
    assert(comps == Set(1L), s"one cluster labeled by its min id, got $comps")
  }

  test("a cap larger than every bucket reproduces the unguarded pairs") {
    val docs = Seq(
      1L -> baseText,
      2L -> baseText.replace("omega", "omegaX"), // near-dup of 1
      3L -> baseText.split(" ").reverse.mkString(" "), // same tokens, new shingles
      4L -> "totally different words entirely unrelated content here now")
    val unguarded = MinHashDedup.verifiedPairs(docsDf(docs), 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = MinHashDedup.verifiedPairs(docsDf(docs), 0.7, maxBucketSize = 100)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == unguarded)
  }

  test("star edges still verify: false bucket collisions are filtered") {
    // the guard changes candidate GENERATION only; a star edge whose
    // Jaccard is below threshold must not surface
    val docs = (1L to 5L).map(_ -> baseText) :+
      (6L -> "unrelated text that shares no shingles with the cluster at all")
    val pairs = MinHashDedup.verifiedPairs(docsDf(docs), 0.7, maxBucketSize = 2)
      .collect()
    assert(pairs.forall(_.getDouble(2) >= 0.7))
    assert(!pairs.exists(r => r.getLong(0) == 6L || r.getLong(1) == 6L))
  }
}
