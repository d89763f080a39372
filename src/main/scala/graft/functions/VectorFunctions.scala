package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embedding columns, built
  * from codegen'd higher-order functions (zip_with / aggregate) — stays in
  * whole-stage codegen, no UDF, no MLlib Vector boxing on the hot path.
  * All arithmetic is double (the float inputs are cast up first) so results
  * are bit-reproducible against the DuckDB oracle's DOUBLE[] math.
  */
object VectorFunctions {

  /** Elementwise-double copy of a float array column. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product — delegates to the codegen'd native
    * expression ([[graft.expressions.VectorExpressions]]); identical
    * accumulation order to `aggregate(zip_with(a,b,*),0,+)` and to DuckDB's
    * list_sum, so oracle results are bit-equal. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotNative(a, b)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Sequential-fold squared Euclidean distance — one codegen'd pass,
    * identical element-order accumulation to the oracle's
    * `list_sum(list_transform(list_zip(a,b), z -> (z[1]-z[2])^2))`. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0d), (acc, x) => acc + x)

  /** Cosine similarity of two double arrays (null/NaN-safe only insofar as
    * the inputs are; zero-norm vectors yield NaN, matching the oracle). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Signed random projection (SimHash-for-vectors) bucket id: the sign
    * pattern of `planes.length` fixed hyperplane dot products, packed into a
    * long. Deterministic: planes are generated from a fixed seed. */
  def srpBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(v, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Fixed hyperplanes for SRP-LSH (seeded, deterministic across runs). */
  def srpPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }
}
