package graft.operators

import graft.{SparkSpec => SS}
import graft.SparkSpec
import graft.functions.VectorFunctions.toDouble
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {

  private def synthetic = {
    val s = SS.session
    import s.implicits._
    // two labels, two identical vectors each: centroids equal the vectors
    Seq(
      (0L, 0, Array.fill(64)(1.0)),
      (1L, 0, Array.fill(64)(1.0)),
      (2L, 1, Array.fill(64)(3.0)),
      (3L, 1, Array.fill(64)(3.0))
    ).toDF("vec_id", "label", "v")
  }

  test("codebook shape: one centroid array per (label, subspace)") {
    val cb = ProductQuantization.codebook(synthetic).collect()
    assert(cb.length == 2 * 8)
    assert(cb.forall(_.getAs[Seq[Double]]("carr").length == 8))
  }

  test("encode maps each vector to its own label's centroid") {
    val cb = ProductQuantization.codebook(synthetic)
    val codes = ProductQuantization
      .encode(ProductQuantization.subspaceDistances(synthetic, cb))
      .collect()
    assert(codes.length == 4 * 8)
    codes.foreach { r =>
      val expected = if (r.getAs[Long]("vec_id") < 2) 0 else 1
      assert(r.getAs[Int]("code") == expected, r.toString)
    }
  }

  test("ADC distance is 0 to same-centroid vectors, 8·8·(Δ)² nano to the other") {
    val cb = ProductQuantization.codebook(synthetic)
    val dists = ProductQuantization.subspaceDistances(synthetic, cb)
    val out = ProductQuantization
      .adcTopK(ProductQuantization.encode(dists), dists.filter(col("vec_id") < 1), 10)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Long]("approx_dist"))
      .toMap
    assert(out(1L) == 0L) // identical vector, same code, zero LUT distance
    // label-1 vectors: per subspace 8 dims × (1-3)² = 32 → 32e9 nano × 8 subspaces
    assert(out(2L) == 8L * 32L * 1000000000L)
    assert(out(3L) == out(2L))
  }

  test("ADC top-50 candidates recall the exact L2 top-10 well above random") {
    // The at-scale contract is two-stage (PQ candidates → exact re-rank,
    // the v07 composition), so the quality gate is CANDIDATE recall: how
    // much of the true top-10 survives into the ADC top-50. On this
    // synthetic corpus (labels carry ~10% geometric signal over iid noise)
    // the deterministic value is 0.42 vs a 50/499 ≈ 0.10 random baseline —
    // a 4× lift. Gate at 0.3: only a code change can move the number.
    val s = SS.session
    val emb = Tables.embeddings(s, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
    val cb = ProductQuantization.codebook(emb)
    val dists = ProductQuantization.subspaceDistances(emb, cb)
    val approx = ProductQuantization
      .adcTopK(ProductQuantization.encode(dists), dists.filter(col("vec_id") < 5), 50)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact squared-L2 top-10 per query by brute force
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val exact = broadcast(q)
      .join(emb.select(col("vec_id").as("neighbor_id"), col("v").as("cv")),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("d2",
        aggregate(zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), _ + _))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d2"), col("neighbor_id"))))
      .filter(col("rnk") <= 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"candidate recall@50 = $recall")
  }
}
