package graft.jobs

import java.nio.file.Files
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** Weak-label quality-classifier training: learnability, determinism,
  * model round-trip, and full-corpus scoring coverage. */
class TrainQualityClassifierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("learns the heuristic: holdout AUC is near-perfect and scoring covers the corpus") {
    val docs = Tables.documents(spark, dir)
    val res = TrainQualityClassifier.run(spark, docs)
    // labels are a function of the features, so a working trainer must
    // separate the quartiles almost perfectly; a broken feature column or
    // label leak shows up as AUC ≈ 0.5
    assert(res.aucRoc > 0.85, s"AUC ${res.aucRoc}")
    assert(res.nTrain > 0 && res.nHoldout > 0)
    // the model scores EVERY document, including the unlabeled gray zone
    assert(res.scored.count() == docs.count())
    assert(res.scored.filter(col("p_quality").isNull).count() == 0)
    val probes = res.scored.agg(
      min(col("p_quality")), max(col("p_quality"))).head()
    assert(probes.getDouble(0) >= 0.0 && probes.getDouble(1) <= 1.0)
    // the learned scores must agree with the weak labels they distill
    val agree = res.scored.filter(col("weak_label").isNotNull)
      .filter((col("p_quality") >= 0.5) === (col("weak_label") === 1.0))
      .count().toDouble /
      res.scored.filter(col("weak_label").isNotNull).count()
    assert(agree > 0.9, s"label agreement $agree")
  }

  test("seeded run is deterministic and the model round-trips") {
    val docs = Tables.documents(spark, dir)
    val p = Files.createTempDirectory("qc_model").resolve("m").toString
    val a = TrainQualityClassifier.run(spark, docs, modelPath = Some(p))
    val b = TrainQualityClassifier.run(spark, docs)
    assert(a.aucRoc == b.aucRoc, "seed-42 split + LR must reproduce")
    val reloaded = PipelineModel.load(p)
    val docsF = TrainQualityClassifier.weakLabels(
      TrainQualityClassifier.featurize(docs))
    val sa = a.model.transform(docsF)
      .select(col("doc_id"),
        org.apache.spark.ml.functions.vector_to_array(col("probability"))
          .getItem(1).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sb = reloaded.transform(docsF)
      .select(col("doc_id"),
        org.apache.spark.ml.functions.vector_to_array(col("probability"))
          .getItem(1).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sa == sb, "persisted model must score identically after reload")
  }
}
