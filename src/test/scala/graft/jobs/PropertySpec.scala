package graft.jobs

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.SparkSpec
import graft.functions.TextFunctions

/** Property tests for the pure column functions and dedup semantics
  * (SURVEY §5.2.1): banding totality + boundary behavior, dedup
  * idempotence/latest-wins, MinHash signature invariants. */
class PropertySpec extends AnyFunSuite {

  /** Raw-scalacheck property driver (no scalatestplus bridge in the
    * offline dependency set): evaluate the property over n sampled cases. */
  private def forAllSampled[T](gen: Gen[T], n: Int = 5)(prop: T => Unit): Unit = {
    val seed = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed)(_.next).take(n).foreach { s =>
      gen.apply(Gen.Parameters.default, s).foreach(prop)
    }
  }

  private lazy val spark = SparkSpec.session

  private def bandOf(values: Seq[Double], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[String] = {
    import spark.implicits._
    values.toDF("x").select(f(col("x"))).collect().map(_.getString(0)).toSeq
  }

  test("magnitude banding is total over the valid range and ordered") {
    val bands = Seq("Micro", "Minor", "Light", "Moderate", "Strong", "Major", "Great")
    forAllSampled(Gen.listOfN(20, Gen.choose(-2.0, 10.0))) { xs =>
      if (xs.nonEmpty) {
        val got = bandOf(xs, BronzeToSilver.magnitudeCategory)
        assert(got.forall(bands.contains))
        // monotone: sorting by magnitude never decreases the band index
        val sortedBands = xs.zip(got).sortBy(_._1).map(x => bands.indexOf(x._2))
        assert(sortedBands.zip(sortedBands.tail).forall { case (a, b) => a <= b })
      }
    }
  }

  test("band boundaries are left-closed at each threshold") {
    val thresholds = Seq(3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
    val eps = 1e-9
    val below = bandOf(thresholds.map(_ - eps), BronzeToSilver.magnitudeCategory)
    val at = bandOf(thresholds, BronzeToSilver.magnitudeCategory)
    assert(below.zip(at).forall { case (a, b) => a != b })
  }

  test("depth banding is total") {
    forAllSampled(Gen.listOfN(10, Gen.choose(0.0, 1000.0))) { xs =>
      if (xs.nonEmpty) {
        val got = bandOf(xs, BronzeToSilver.depthCategory)
        assert(got.forall(Seq("Shallow", "Intermediate", "Deep").contains))
      }
    }
  }

  test("dedupLatest is idempotent and keeps the max update per key") {
    import spark.implicits._
    val gen = Gen.listOfN(30, for {
      id <- Gen.oneOf("a", "b", "c", "d")
      upd <- Gen.choose(0L, 5L)
      ts <- Gen.choose(0L, 100L)
    } yield (id, upd, ts))
    forAllSampled(gen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("event_id", "u", "t")
          .select(col("event_id"),
            timestamp_millis(col("u")).as("updated_timestamp_utc"),
            timestamp_millis(col("t")).as("event_timestamp_utc"))
        val once = BronzeToSilver.dedupLatest(df)
        val twice = BronzeToSilver.dedupLatest(once)
        val onceRows = once.collect().toSet
        assert(onceRows == twice.collect().toSet)
        // one row per key, carrying that key's max updated timestamp
        val maxByKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        val got = once.select(col("event_id"), unix_millis(col("updated_timestamp_utc")))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got.size == maxByKey.size)
        assert(got.forall { case (k, v) => maxByKey(k) == v })
      }
    }
  }

  test("identical token arrays yield identical minhash signatures") {
    import spark.implicits._
    forAllSampled(Gen.listOfN(8, Gen.alphaStr.suchThat(_.nonEmpty))) { words =>
      val df = Seq(words, words).toDF("s")
        .withColumn("h", transform(col("s"), x => TextFunctions.hash28(x)))
        .select(TextFunctions.minhashSignature(col("h")).as("sig"))
      val sigs = df.collect().map(_.getSeq[Long](0))
      assert(sigs(0) == sigs(1))
      assert(sigs(0).length == 16)
    }
  }
}
