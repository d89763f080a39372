package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the [[Tables.events]] normalization contract across every `ts`
  * encoding the testdata generator has shipped. The invariant downstream
  * code relies on: `ts` = LongType epoch-NANOS, `event_time` =
  * TimestampType (micros), identical values whichever way the parquet was
  * written. A new encoding must fail HERE with one clear message, not as
  * scattered analysis errors in 27 queries (round-9 regression).
  */
class TablesSpec extends SparkSpec {

  // one event at 2024-03-01T12:30:45.123456Z (micros precision — both
  // encodings can represent it exactly)
  private val micros = 1709296245123456L

  private def scratch(): String =
    Files.createTempDirectory("tables_spec_").toString

  test("timestamp[us] encoding (current generator) normalizes to the contract") {
    val dir = scratch()
    spark.range(1)
      .select(
        lit(7L).as("event_id"),
        timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"),
        lit(42L).as("user_id"),
        lit("click").as("event_type"),
        lit(1.5).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === LongType)
    assert(ev.schema("event_time").dataType === TimestampType)
    val row = ev.select(col("ts"), unix_micros(col("event_time"))).head()
    assert(row.getLong(0) === micros * 1000L)
    assert(row.getLong(1) === micros)
  }

  test("int64-nanos encoding (legacy generator) normalizes to the contract") {
    val dir = scratch()
    spark.range(1)
      .select(
        lit(7L).as("event_id"),
        lit(micros * 1000L).as("ts"),
        lit(42L).as("user_id"),
        lit("click").as("event_type"),
        lit(1.5).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === LongType)
    assert(ev.schema("event_time").dataType === TimestampType)
    val row = ev.select(col("ts"), unix_micros(col("event_time"))).head()
    assert(row.getLong(0) === micros * 1000L)
    assert(row.getLong(1) === micros)
  }

  test("an unknown ts encoding fails loudly at the normalization point") {
    val dir = scratch()
    spark.range(1)
      .select(
        lit(7L).as("event_id"),
        lit("2024-03-01").as("ts"),
        lit(42L).as("user_id"),
        lit("click").as("event_type"),
        lit(1.5).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts"))
    assert(e.getMessage.contains("StringType"))
  }

  test("a renamed/dropped ts column fails loudly at the normalization point") {
    val dir = scratch()
    spark.range(1)
      .select(
        lit(7L).as("event_id"),
        timestamp_micros(lit(micros)).cast(TimestampNTZType).as("timestamp"), // renamed
        lit(42L).as("user_id"),
        lit("click").as("event_type"),
        lit(1.5).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("`ts` is missing"))
    assert(e.getMessage.contains("Tables.events"))
  }

  test("PROPERTY: both ts encodings agree for arbitrary micro-precision instants") {
    // The seam the two fixed-instant tests can't cover: for ARBITRARY
    // micros over the range BOTH encodings can represent (int64 nanos
    // bounds the legacy encoding to ±~292 years around epoch, ≈ years
    // 1677–2262; micros beyond that would overflow us*1000), the LongType
    // branch and the TimestampNTZ branch must produce identical
    // (ts, event_time) pairs. Guards the next encoding flip: whatever the
    // generator ships, the normalization of the same instant must be
    // bit-identical across branches.
    import org.scalacheck.Gen
    val maxNsMicros = Long.MaxValue / 1000L // 9223372036854775
    val instants = Gen.listOfN(24, Gen.choose(-maxNsMicros, maxNsMicros))
    val seed = org.scalacheck.rng.Seed(1109L)
    Iterator.iterate(seed)(_.next).take(4).foreach { s =>
      instants.apply(Gen.Parameters.default, s).foreach { us =>
        val base = spark.createDataset(us)(org.apache.spark.sql.Encoders.scalaLong)
          .toDF("us")
          .withColumn("event_id", monotonically_increasing_id())
          .select(col("event_id"), col("us"), lit(1L).as("user_id"),
            lit("p").as("event_type"), lit(0.0).as("value"), lit("{}").as("props"))

        val dirNs = scratch()
        base.select(col("event_id"), (col("us") * 1000L).as("ts"), col("user_id"),
            col("event_type"), col("value"), col("props"))
          .write.mode("overwrite").parquet(s"$dirNs/events.parquet")
        val dirUs = scratch()
        base.select(col("event_id"),
            timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
            col("user_id"), col("event_type"), col("value"), col("props"))
          .write.mode("overwrite").parquet(s"$dirUs/events.parquet")

        val a = Tables.events(spark, dirNs)
          .select("event_id", "ts", "event_time").orderBy("event_id").collect()
        val b = Tables.events(spark, dirUs)
          .select("event_id", "ts", "event_time").orderBy("event_id").collect()
        assert(a.toSeq === b.toSeq, s"encodings diverged for instants $us")
      }
    }
  }

  test("both encodings of the same instants produce identical event rows") {
    val base = spark.range(8).select(
      col("id").as("event_id"),
      (lit(micros) + col("id") * 1000000L).as("us"),
      (col("id") % 3).as("user_id"),
      lit("view").as("event_type"),
      col("id").cast("double").as("value"),
      lit("{}").as("props"))

    val dirNs = scratch()
    base.select(col("event_id"), (col("us") * 1000L).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dirNs/events.parquet")

    val dirUs = scratch()
    base.select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dirUs/events.parquet")

    val a = Tables.events(spark, dirNs).orderBy("event_id").collect()
    val b = Tables.events(spark, dirUs).orderBy("event_id").collect()
    assert(a.toSeq === b.toSeq)
  }
}
