package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest
import graft.SparkSpec

/** Independent re-derivation of the d52 frozen-LR inference: a plain
  * Scala implementation of the scoring contract (md5-bucket weight
  * lookup fold + three structural ratios, exact operation order) must
  * reproduce the registered query's logits bit-for-bit on the sf0.001
  * corpus. The DuckDB oracle already checks the SQL translation; this
  * spec checks BOTH translations against a third, dependency-free
  * implementation, so a typo'd frozen weight, a re-associated sum, or a
  * drifted bucket formula fails even if it drifted in the Spark and SQL
  * sides symmetrically. */
class FrozenLrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The d52 contract in plain Scala — mirrors the documented operation
    * sequence exactly (left-to-right token fold, then the three ratio
    * terms in declaration order). */
  private def score(text: String): (Int, Double, Boolean) = {
    val w = CurationQueries.D52TfWeights.map(_.toDouble)
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    // Spark's split(str, regex) keeps trailing empty strings (limit -1)
    val toks = lower.split("\\s+", -1).toSeq
    val fold = toks.foldLeft(0.0) { (acc, t) =>
      val bucket = (java.lang.Long.parseLong(md5hex(t).take(7), 16) % 64).toInt
      acc + w(bucket)
    }
    val fLen = math.min(toks.length / 100.0, 1.0)
    val alpha = lower.replaceAll("[^a-z]", "").length
    val fAlpha = alpha.toDouble / math.max(text.length, 1)
    val fUniq = toks.distinct.length.toDouble / math.max(toks.length, 1)
    val z = CurationQueries.D52Intercept.toDouble + fold +
      CurationQueries.D52WLen.toDouble * fLen +
      CurationQueries.D52WAlpha.toDouble * fAlpha +
      CurationQueries.D52WUniq.toDouble * fUniq
    // JBigDecimal.valueOf (decimal-string construction) matches Spark's
    // Round expression; `new BigDecimal(double)` (exact binary) does not
    val logit = JBigDecimal.valueOf(z).setScale(4, RoundingMode.HALF_UP)
      .doubleValue
    (toks.length, logit, z > 0)
  }

  test("d52 logits match a dependency-free re-implementation exactly") {
    val got = CurationQueries.trainedQualityInference
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.length == got.size)
    docs.foreach { case (id, text) =>
      val expected = score(text)
      assert(got(id) == expected,
        s"doc $id: query gave ${got(id)}, independent gave $expected")
    }
  }
}
