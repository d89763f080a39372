package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the batch session_window gap semantics q46 relies on: the window
  * boundary is INCLUSIVE — an event at exactly last_ts + gap still merges
  * (measured; a new session starts only when the gap strictly exceeds the
  * threshold), so the DuckDB oracle's gaps-and-islands rewrite must flag
  * new sessions with `gap > threshold`, not `>=`. */
class SessionWindowSpec extends SparkSpec {

  test("gap == threshold merges; gap > threshold splits") {
    val s = SparkSpec.session
    import s.implicits._
    val base = 1700000000000000L // epoch micros
    val h8 = 8L * 3600 * 1000000
    val rows = Seq(
      (1L, base),                 // session A
      (1L, base + h8),            // gap exactly 8h -> still session A
      (1L, base + 2 * h8),        // again exactly 8h -> still A
      (2L, base),                 // session B
      (2L, base + h8 + 1)         // gap 8h + 1us -> NEW session C
    ).toDF("user_id", "tsu")
      .withColumn("t", timestamp_micros(col("tsu")))
    val sessions = rows
      .groupBy(col("user_id"), session_window(col("t"), "8 hours"))
      .agg(count(lit(1)).as("n"))
      .select("user_id", "n").as[(Long, Long)].collect().toSet
    assert(sessions == Set((1L, 3L), (2L, 1L)))
    // user 2 produced two 1-event sessions
    val u2 = rows.filter(col("user_id") === 2)
      .groupBy(col("user_id"), session_window(col("t"), "8 hours"))
      .count().count()
    assert(u2 == 2L)
  }
}
