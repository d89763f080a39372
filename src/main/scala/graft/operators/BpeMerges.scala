package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Distributed BPE tokenizer-training supersteps (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" — the
  * merge-discovery loop every GPT/Llama tokenizer is trained with).
  *
  * Each superstep:
  *   1. count adjacent symbol pairs across the whole corpus — ONE shuffle
  *      keyed by pair. The key space is bounded by |alphabet+merges|², so
  *      partial (map-side) aggregation collapses each task's contribution
  *      to at most that many rows regardless of corpus size; this is the
  *      only data-scale-proportional work in the loop.
  *   2. pick the most frequent pair (count desc, then lexicographic — a
  *      deterministic total order). The argmax is a TakeOrdered over the
  *      tiny aggregated pair census; only K merge rows ever reach the
  *      driver — the learned vocabulary IS driver-side metadata, exactly
  *      like KMeans centroids.
  *   3. apply the merge everywhere: a narrow per-row `replace` with the
  *      chosen pair as a broadcast literal — no shuffle. Merged symbols
  *      are written as reserved sentinel chars (chr(1), chr(2), …) so a
  *      pair of later supersteps can span an earlier merge.
  *
  * At 100 TB the plan is the one you'd want: K (pair-census shuffle +
  * narrow map) passes, nothing quadratic, no growing state. `replace` is
  * left-to-right non-overlapping in both Spark (UTF8String.replace) and
  * the DuckDB oracle, so "aaa" under merge "aa" yields "Xa" in both.
  */
object BpeMerges {

  /** One learned merge: the superstep that chose it, the pair it fuses,
    * its corpus frequency at selection time, and the rank-k runner-up
    * census kept for verification. */
  final case class MergeRow(iter: Int, rnk: Int, pair: String, cnt: Long)

  private def pairCensus(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .filter(char_length(col(textCol)) >= 2)
      .select(explode(expr(
        s"transform(sequence(1, char_length($textCol) - 1), " +
          s"i -> substring($textCol, i, 2))")).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))

  /** Runs `k` merge supersteps over `corpus(textCol)`; returns the per-
    * superstep top-`keep` pair census (rank 1 is the applied merge). */
  def learn(spark: SparkSession, corpus: DataFrame, textCol: String,
            k: Int, keep: Int = 5): DataFrame = {
    require(k >= 1 && k <= 30, s"sentinel alphabet supports 1..30 merges, got $k")
    var cur = corpus
    val rows = Seq.newBuilder[Row]
    for (iter <- 1 to k) {
      val top = pairCensus(cur, textCol)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(keep)
        .collect() // ≤ `keep` rows of learned-vocab metadata
      top.zipWithIndex.foreach { case (r, i) =>
        rows += Row(iter, i + 1, r.getString(0), r.getLong(1))
      }
      val best = top.head.getString(0)
      cur = cur.withColumn(textCol,
        replace(col(textCol), lit(best), lit(iter.toChar.toString)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.result(), 1),
      StructType(Seq(
        StructField("iter", IntegerType, nullable = false),
        StructField("rnk", IntegerType, nullable = false),
        StructField("pair", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))))
  }
}
