package graft.jobs

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-quality classifier TRAINING — the FineWeb-Edu/DCLM production
  * shape the fixed-weight scorer (d31) only applies: learn the quality
  * model from weak labels, then score the corpus with it. Weak
  * supervision comes from the d02 quality heuristics themselves — top
  * quality-quartile documents label 1, bottom-quartile 0, the middle
  * half is left unlabeled (classic weak-label distillation: the learned
  * model generalizes the heuristic to the gray zone and to corpora where
  * the heuristic's thresholds drift).
  *
  * Features are HashingTF term frequencies (2^12 buckets) over the
  * tokenized text — the same hashed-feature space d31's inference-only
  * scorer uses — plus the structural ratios; the estimator is seeded
  * logistic regression, so the whole job is deterministic given the
  * input rows (the TrainTsunamiModel doctrine, SURVEY §7.5.8).
  *
  * Scale: HashingTF is a per-row map (no vocabulary build, no shuffle);
  * LR training is MLlib's own treeAggregate loop — gradient traffic is
  * O(features) per pass, never corpus-sized; scoring is a broadcast
  * model applied in one narrow pass.
  */
object TrainQualityClassifier {

  case class Result(model: PipelineModel, scored: DataFrame, aucRoc: Double,
                    nTrain: Long, nHoldout: Long)

  /** Structural quality ratios (the d02 contract) + tokens. */
  def featurize(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("double"))
      .withColumn("alpha_ratio",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("double")
          / greatest(length(col("text")), lit(1)))
      .withColumn("uniq_ratio",
        size(array_distinct(col("toks"))).cast("double")
          / greatest(size(col("toks")), lit(1)))

  /** Weak labels from the heuristic quality score: top quartile → 1,
    * bottom quartile → 0, middle half unlabeled (NULL). The score is the
    * d02-style blend of structural ratios. */
  def weakLabels(featurized: DataFrame): DataFrame = {
    val score = col("alpha_ratio") * 0.5 + col("uniq_ratio") * 0.3 +
      least(col("n_tokens") / 100.0, lit(1.0)) * 0.2
    val scored = featurized.withColumn("q_score", score)
    val Array(lo, hi) =
      scored.stat.approxQuantile("q_score", Array(0.25, 0.75), 0.001)
    scored.withColumn("label",
      when(col("q_score") >= hi, 1.0)
        .when(col("q_score") <= lo, 0.0)
        .otherwise(lit(null).cast("double")))
  }

  /** HashingTF(2^12) term frequencies ⊕ the structural ratios →
    * LR(deterministic) pipeline. The ratios ride ALONGSIDE the hashed
    * terms — the label heuristic is (nearly) linear in them, so the
    * assembled LR provably can represent it, while the TF block lets the
    * model pick up lexical quality signal the ratios can't see. */
  def pipeline(): Pipeline = {
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("toks").setOutputCol("tf").setNumFeatures(1 << 12)
    val assembler = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("tf", "n_tokens", "alpha_ratio", "uniq_ratio"))
      .setOutputCol("features")
    val lr = new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(50).setRegParam(0.001)
    new Pipeline().setStages(Array(tf, assembler, lr))
  }

  /** Train on an 80/20 split of the weakly-labeled quartiles, report
    * holdout AUC, score the WHOLE corpus (gray zone included). */
  def run(spark: SparkSession, docs: DataFrame,
          modelPath: Option[String] = None): Result = {
    // pinned: labeling runs an approxQuantile scan, and training /
    // evaluation / scoring / the result counts all re-consume it —
    // without the persist the dominant feature+quantile pass re-executes
    // once per action
    val wl = weakLabels(featurize(docs)).persist()
    try {
      val labeled = wl.filter(col("label").isNotNull)
      val Array(train, holdout) = labeled.randomSplit(Array(0.8, 0.2), seed = 42)
      val model = pipeline().fit(train)
      val auc = new BinaryClassificationEvaluator()
        .setLabelCol("label").setMetricName("areaUnderROC")
        .evaluate(model.transform(holdout))
      modelPath.foreach(p => model.write.overwrite().save(p))
      val scored = model.transform(wl)
        .select(col("doc_id"),
          org.apache.spark.ml.functions.vector_to_array(col("probability"))
            .getItem(1).as("p_quality"),
          col("q_score"), col("label").as("weak_label"))
        // materialized before the backing cache is released below
        .localCheckpoint()
      Result(model, scored, auc, train.count(), holdout.count())
    } finally wl.unpersist()
  }
}
