package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

class TextOpsSpec extends SparkSpec with TableDrivenPropertyChecks {

  private def fps(text: String): Set[Long] = {
    val s = SparkSpec.session
    import s.implicits._
    Seq(text).toDF("text")
      .withColumn("toks", tokens(col("text")))
      .withColumn("grams", orderedGrams(col("toks"), 4))
      .withColumn("hs", transform(col("grams"), x => hash60(x)))
      .withColumn("f", winnowFingerprints(col("hs"), 5))
      .select("f").as[Seq[Long]].collect().head.toSet
  }

  test("winnowing guarantee: a shared run of k+w-1 tokens shares a fingerprint") {
    // k=4, w=5 → any common 8-token run must yield a common window minimum
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docA = s"one two three $shared four five"
    val docB = s"nine eight seven six $shared"
    val common = fps(docA) intersect fps(docB)
    assert(common.nonEmpty, "shared 8-token run produced no shared fingerprint")
  }

  test("langId kernel matches the reference vote/argmax semantics (property)") {
    // brute-force reference of the pre-r19 Column formulation: per-lang
    // stopword count over the tokens, argmax with declaration-order
    // tie-break, "und" when no list scores above zero
    def ref(toks: Seq[String]): String = {
      val scores = LangStopwords.map { case (lang, ws) =>
        lang -> toks.count(t => t != null && ws.contains(t)) }
      val best = scores.map(_._2).max
      if (best == 0) "und" else scores.find(_._2 == best).get._1
    }
    val s = SparkSpec.session
    import s.implicits._
    val vocab: Seq[String] =
      LangStopwords.flatMap(_._2) ++ Seq("xx", "yy", "zz", "1", "")
    val rnd = new scala.util.Random(4711)
    val docs: Seq[Seq[String]] =
      Seq.empty[String] +: // empty array → und
      (1 to 200).map(_ => Seq.fill(rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.size))))
    val got = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
      .select(col("id"), langId(col("toks")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t),
        s"langId diverged on $t: got ${got(i.toLong)}, want ${ref(t)}")
    }
  }

  test("winnowing: unrelated documents share no fingerprints") {
    val a = fps("aa bb cc dd ee ff gg hh ii jj kk")
    val b = fps("zz yy xx ww vv uu tt ss rr qq pp")
    assert((a intersect b).isEmpty)
  }

  test("gram/winnow helpers are total: short inputs yield empty arrays, not errors") {
    val s = SparkSpec.session
    import s.implicits._
    val rows = Seq("", "one", "one two three").toDF("text")
      .withColumn("toks", tokens(col("text")))
      .withColumn("g", orderedGrams(col("toks"), 4))
      .withColumn("f", winnowFingerprints(transform(col("g"), x => hash60(x)), 5))
      .select(size(col("g")), size(col("f")))
      .collect()
    assert(rows.forall(r => r.getInt(0) == 0 && r.getInt(1) == 0))
  }

  test("ordered grams keep duplicates and positions (unlike shingles)") {
    val s = SparkSpec.session
    import s.implicits._
    val row = Seq("x y x y x y").toDF("text")
      .withColumn("toks", tokens(col("text")))
      .select(orderedGrams(col("toks"), 2).as("g"), shingles(col("toks"), 2).as("sh"))
      .head()
    assert(row.getSeq[String](0) == Seq("x y", "y x", "x y", "y x", "x y"))
    assert(row.getSeq[String](1) == Seq("x y", "y x")) // deduped
  }

  test("md5-bucket split is independent of partitioning and ordering") {
    val s = SparkSpec.session
    import s.implicits._
    val bucket =
      expr("conv(substring(md5(cast(doc_id as string)), 1, 7), 16, 10)")
        .cast("long") % 100
    def splits(parts: Int): Map[Long, String] =
      (1L to 500L).toDF("doc_id").repartition(parts)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "eval").otherwise("test"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = splits(1)
    val b = splits(13)
    assert(a == b)
    // ratios within loose bounds: a catastrophic hash bias would show here
    val train = a.values.count(_ == "train")
    assert(train > 350 && train < 450, s"train=$train of 500")
  }
}
