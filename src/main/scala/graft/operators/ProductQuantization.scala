package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the standard ANN
  * compression (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search"): split each D-dim vector into M subspaces of D/M dims, quantize
  * every subvector to its nearest codebook centroid, and answer queries
  * with asymmetric distance computation (ADC) — a per-query lookup table of
  * query-to-centroid distances summed over the code columns.
  *
  * The codebook here is the LABEL-SUPERVISED variant (per-(label, subspace)
  * centroids) rather than per-subspace k-means — the same determinism
  * trade the IVF label quantizer (x06) makes, so encode → ADC → rank is
  * exactly reproducible and the whole pipeline carries a value-level
  * oracle. Swapping in k-means centroids changes only [[codebook]].
  *
  * Determinism: centroids are rounded to 4 decimals (the v02-proven stable
  * form of a float mean); every subspace distance is a SEQUENTIAL fold
  * (aggregate ∘ zip_with) over deterministic doubles, then quantized to
  * integer nano-units, so all downstream sums/argmins are order-independent
  * integer math.
  *
  * Scale: the codebook (M · L rows) and the per-query LUT (|Q| · M · L
  * rows) broadcast; corpus codes are M small ints per vector (32× smaller
  * than float32 at D=64, M=8); ADC touches codes only — the full vectors
  * are read once at encode time and never again.
  */
object ProductQuantization {

  /** Nano-unit quantization of a deterministic double distance — integer
    * from here on, so sums over subspaces commute. */
  private def nano(c: Column): Column = floor(c * 1e9 + 0.5).cast("long")

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Regroup a (key, dim, value) long table into per-(key, subspace)
    * fixed-order arrays. `dim` is 1-based; subspace s = (dim-1) div subDim. */
  private def subArrays(df: DataFrame, key: String, value: String): DataFrame =
    df.withColumn("s", ((col("dim") - 1) / lit(8)).cast("int"))
      .groupBy(col(key), col("s"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col(value)))),
        st => st.getField(value)).as("arr"))

  /** Per-(label, subspace) centroid codebook: label-supervised PQ centroids
    * rounded to 4 decimals. Input needs vec_id, label, and a double-array
    * `v` column. Output: (label, s, carr). */
  def codebook(emb: DataFrame): DataFrame = {
    val ex = emb
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .withColumn("dim", (col("pos") + 1).cast("int"))
    subArrays(
      ex.groupBy("label", "dim").agg(round(avg(col("x")), 4).as("cx")),
      "label", "cx")
      .withColumnRenamed("label", "cb_label")
      .withColumnRenamed("arr", "carr")
  }

  /** Distances from every (vector, subspace) to every codebook centroid,
    * in integer nano-units: (vec_id, s, cb_label, dq). The building block
    * for both [[encode]] (argmin per subspace) and the ADC lookup table
    * (rows of the query vectors). */
  def subspaceDistances(emb: DataFrame, cb: DataFrame): DataFrame = {
    val ex = emb
      .select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .withColumn("dim", (col("pos") + 1).cast("int"))
    subArrays(ex, "vec_id", "x")
      .join(broadcast(cb), Seq("s"))
      .select(col("vec_id"), col("s"), col("cb_label"),
        nano(sqDist(col("arr"), col("carr"))).as("dq"))
  }

  /** PQ codes: per (vec_id, s) the label of the nearest centroid (ties →
    * lowest label). min-of-struct argmin — an order-independent aggregate,
    * no window shuffle. */
  def encode(dists: DataFrame): DataFrame =
    dists.groupBy("vec_id", "s")
      .agg(min(struct(col("dq"), col("cb_label"))).getField("cb_label").as("code"))

  /** ADC top-k: approximate distances = sum over subspaces of the query's
    * distance to each code's centroid (integer nano-units), smallest k per
    * query with id tie-break. `lut` is [[subspaceDistances]] of the query
    * vectors (broadcast — |Q| · M · L rows). */
  def adcTopK(codes: DataFrame, lut: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("approx_dist"), col("neighbor_id"))
    val qlut = lut.select(col("vec_id").as("query_id"), col("s"),
      col("cb_label").as("code"), col("dq"))
    codes.join(broadcast(qlut), Seq("s", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("dq")).as("approx_dist"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
