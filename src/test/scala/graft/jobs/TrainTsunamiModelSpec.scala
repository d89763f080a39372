package graft.jobs

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ingest.UsgsGeoJson

class TrainTsunamiModelSpec extends SparkSpec {

  private lazy val lake = Files.createTempDirectory("tm_spec").toString
  private lazy val silver = {
    UsgsGeoJson.writeBronze(s"$lake/bronze/raw.json")
    BronzeToSilver.run(SparkSpec.session, s"$lake/bronze/raw.json", s"$lake/silver")
  }

  test("prepare filters to earthquakes, drops nulls, encodes label") {
    val p = TrainTsunamiModel.prepare(silver)
    assert(!p.select("event_id").collect().map(_.getString(0)).contains("ev11"))
    assert(p.columns.contains("label"))
    val labels = p.select("label").distinct().collect().map(_.getDouble(0)).toSet
    assert(labels.subsetOf(Set(0.0, 1.0)))
  }

  test("rebalance downsamples the majority class toward parity") {
    val p = TrainTsunamiModel.prepare(silver)
    val b = TrainTsunamiModel.rebalance(p)
    val nMin = b.filter(col("label") === 1.0).count()
    val nMaj = b.filter(col("label") === 0.0).count()
    // Bernoulli sampling is approximate; assert property not exact count
    assert(nMin == p.filter(col("label") === 1.0).count())
    assert(nMaj <= p.filter(col("label") === 0.0).count())
  }

  test("full train run: pipeline fits, metrics computable, predictions schema") {
    val res = TrainTsunamiModel.run(SparkSpec.session, silver,
      Some(s"$lake/ml_models/rf"))
    assert(res.aucRoc >= 0.0 && res.aucRoc <= 1.0)
    assert(res.f1 >= 0.0 && res.f1 <= 1.0)
    assert(res.predictions.columns.toSet == Set("event_id", "actual_tsunami_warning",
      "predicted_tsunami_warning", "tsunami_probability", "prediction_timestamp_utc"))
    val probs = res.predictions.select("tsunami_probability").collect().map(_.getDouble(0))
    assert(probs.forall(p => p >= 0.0 && p <= 1.0))
    // model persisted and reloadable (S9)
    val reloaded = org.apache.spark.ml.PipelineModel.load(s"$lake/ml_models/rf")
    assert(reloaded.stages.length == 3)
  }

  test("seed-42 reproducibility: same input → same predictions") {
    val r1 = TrainTsunamiModel.run(SparkSpec.session, silver)
    val r2 = TrainTsunamiModel.run(SparkSpec.session, silver)
    val p1 = r1.predictions.select("event_id", "predicted_tsunami_warning").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val p2 = r2.predictions.select("event_id", "predicted_tsunami_warning").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(p1 == p2)
  }
}
