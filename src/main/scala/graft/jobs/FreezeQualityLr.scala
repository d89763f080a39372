package graft.jobs

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Provenance job for the d52 FROZEN quality classifier: trains a
  * logistic regression on md5-bucket hashed term frequencies (the d31
  * feature space, 64 buckets) against the [[TrainQualityClassifier]]
  * weak labels, then prints the trained coefficients in BOTH dialects —
  * the Scala literal vector and the DuckDB list literal — for pasting
  * into the d52 registered query as constants.
  *
  * Why freeze instead of scoring with the live model: the d52 query is
  * ORACLE-GATED — DuckDB must reproduce the inference bit-for-bit, which
  * it can when scoring is a pure per-token fold over literal weights
  * (one md5 hash + one list lookup + one left-to-right double sum per
  * token), but cannot when it requires loading an MLlib model. Training
  * happens once, here, deterministically (seed 42 split, LBFGS on fixed
  * data); inference is re-expressed as arithmetic. This is exactly the
  * production split for corpus-scale quality filtering (FineWeb-Edu,
  * DCLM): train once on a sample, then score 100 TB with a broadcast
  * weight vector in a single codegen'd projection — no model service,
  * no shuffle.
  *
  * Run: `sbt "runMain graft.jobs.FreezeQualityLr /root/testdata/sf0.01"`.
  */
object FreezeQualityLr {

  val NumBuckets = 64

  /** Per-document md5-bucket term-frequency counts (dense, 64 wide) —
    * the training-side mirror of d52's per-token inference fold: bucket
    * = conv(md5(token)[1..7], 16, 10) % 64, the d31 device both engines
    * compute identically. */
  def bucketCounts(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), tokens(col("text")).as("toks"))
    .select(col("doc_id"), expr(
      s"""aggregate(
         |  transform(toks, t ->
         |    CAST(CAST(conv(substring(md5(t), 1, 7), 16, 10) AS BIGINT)
         |         % $NumBuckets AS INT)),
         |  array_repeat(0.0D, $NumBuckets),
         |  (acc, b) -> transform(acc, (v, i) ->
         |    CASE WHEN i = b THEN v + 1.0D ELSE v END))""".stripMargin)
      .as("tf"))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.local()
    try {
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val wl = TrainQualityClassifier
        .weakLabels(TrainQualityClassifier.featurize(docs)).persist()
      // the d52 feature contract: 64 hashed-TF counts ⊕ three structural
      // ratios (length-capped token count, alpha ratio, uniq ratio) — the
      // TrainQualityClassifier design re-expressed in oracle-exact
      // arithmetic (every feature is integer counts and IEEE divisions
      // both engines reproduce bit-for-bit)
      val labeled = wl.filter(col("label").isNotNull)
        .select(col("doc_id"), col("label"),
          least(col("n_tokens") / 100.0, lit(1.0)).as("f_len"),
          col("alpha_ratio").as("f_alpha"),
          col("uniq_ratio").as("f_uniq"))
      val feats = bucketCounts(docs).join(labeled, Seq("doc_id"))
        .select(col("label"), array_to_vector(concat(col("tf"),
          array(col("f_len"), col("f_alpha"), col("f_uniq")))).as("features"))
      val Array(train, holdout) = feats.randomSplit(Array(0.8, 0.2), seed = 42)
      val lr = new LogisticRegression()
        .setLabelCol("label").setFeaturesCol("features")
        .setMaxIter(100).setRegParam(0.001)
      val model = lr.fit(train)
      val auc = new BinaryClassificationEvaluator()
        .setLabelCol("label").setMetricName("areaUnderROC")
        .evaluate(model.transform(holdout))
      // 6-decimal freeze: enough precision that the frozen model scores
      // like the float model, short enough to live as a source literal
      val w = model.coefficients.toArray.map(v => f"$v%.6f")
      val (tfW, structW) = w.splitAt(NumBuckets)
      val b = f"${model.intercept}%.6f"
      println(s"[freeze] holdout AUC = $auc (train=${train.count()}, holdout=${holdout.count()})")
      println(s"[freeze] intercept = $b")
      println(s"[freeze] tf weights: Seq(${tfW.mkString(", ")})")
      println(s"[freeze] struct weights (f_len, f_alpha, f_uniq): ${structW.mkString(", ")}")
    } finally spark.stop()
  }
}
