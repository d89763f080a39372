package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unicode semantics of [[NfcNormalize]] — the oracle gate (d45) runs over
  * ASCII-dominant synthetic text, so canonical-composition behavior is
  * pinned here with real combining sequences. */
class NfcNormalizeSpec extends SparkSpec {

  private def norm(s: String): String = {
    val sess = SparkSpec.session
    import sess.implicits._
    Seq(s).toDF("t")
      .select(TextExpressions.nfcNormalize(col("t"))).head().getString(0)
  }

  test("decomposed combining sequences compose to canonical form") {
    assert(norm("é") == "é")           // e + COMBINING ACUTE → é
    assert(norm("Å") == "Å")           // A + COMBINING RING → Å
    assert(norm("café latte") == "café latte")
  }

  test("already-normalized text is unchanged (ASCII fast path)") {
    assert(norm("plain ascii text 123") == "plain ascii text 123")
    assert(norm("éclair") == "éclair") // precomposed stays put
  }

  test("canonically-equal spellings fingerprint identically after NFC") {
    val sess = SparkSpec.session
    import sess.implicits._
    val fps = Seq("café", "café").toDF("t")
      .select(md5(TextExpressions.nfcNormalize(col("t"))).as("fp"))
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1, "NFC must collapse canonical equivalents")
  }

  test("null input yields null; SQL registration works") {
    val sess = SparkSpec.session
    import sess.implicits._
    val r = Seq(Option.empty[String]).toDF("t")
      .select(TextExpressions.nfcNormalize(col("t"))).head()
    assert(r.isNullAt(0))
    assert(sess.sql("SELECT nfc_normalize('é') AS n").head().getString(0)
      == "é")
  }
}
