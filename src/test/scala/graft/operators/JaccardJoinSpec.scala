package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

class JaccardJoinSpec extends SparkSpec {

  test("prefix-filtered join equals naive all-pairs exact Jaccard") {
    val s = SparkSpec.session
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    // base docs + perturbed near-copies (drop/replace a couple of words)
    val base = (0 until 30).map { i =>
      (0 until 20 + rnd.nextInt(10)).map(_ => vocab(rnd.nextInt(vocab.size)))
    }
    val docs = base.zipWithIndex.flatMap { case (words, i) =>
      val copy = words.updated(3, vocab(rnd.nextInt(vocab.size))).drop(1)
      Seq((i.toLong * 2, words.mkString(" ")), (i.toLong * 2 + 1, copy.mkString(" ")))
    }.toDF("doc_id", "text")

    // naive reference computed with PLAIN SCALA sets over the collected
    // shingle table: the in-session array_intersect/array_union idiom is
    // rewritten by RewriteSetSimilarity into the very kernel the operator
    // uses, which would make this equivalence test vacuous for the
    // verification arithmetic (the DistinctSetJaccardSpec lesson)
    def naive(threshold: Double) = {
      val sh = docs.withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), shingles(col("toks"), 3).as("s"))
        .filter(size(col("s")) > 0)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      (for {
        (a, sa) <- sh; (b, sb) <- sh if a < b
        if (sa & sb).size.toDouble / (sa | sb).size >= threshold
      } yield (a, b)).toSet
    }

    Seq(0.5, 0.8).foreach { t =>
      val got = JaccardJoin.exactPairs(docs, t)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive(t), s"threshold $t")
      assert(got.nonEmpty, s"threshold $t produced no pairs — fixture too weak")
    }
  }

  test("containment blocking equals naive all-ordered-pairs containment") {
    val s = SparkSpec.session
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (0 until 25).map { _ =>
      (0 until 15 + rnd.nextInt(15)).map(_ => vocab(rnd.nextInt(vocab.size)))
    }
    // quote-style containment: short excerpts embedded in longer hosts
    val docs = base.zipWithIndex.flatMap { case (words, i) =>
      val excerpt = words.slice(2, 2 + 8)
      val host = words ++ excerpt ++ words.take(3)
      Seq((i.toLong * 3, words.mkString(" ")),
        (i.toLong * 3 + 1, excerpt.mkString(" ")),
        (i.toLong * 3 + 2, host.mkString(" ")))
    }.toDF("doc_id", "text")

    // plain-Scala reference (see the Jaccard test for why the in-session
    // idiom can't serve as an independent baseline)
    def naive(threshold: Double) = {
      val sh = docs.withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), shingles(col("toks"), 3).as("s"))
        .filter(size(col("s")) > 0)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      (for {
        (a, sa) <- sh; (b, sb) <- sh if a != b
        if (sa & sb).size.toDouble / sa.size >= threshold
      } yield (a, b)).toSet
    }

    Seq(0.7, 0.9).foreach { t =>
      val got = JaccardJoin.containmentPairs(docs, t)
        .select("doc_inner", "doc_outer")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive(t), s"threshold $t")
      assert(got.nonEmpty, s"threshold $t produced no pairs — fixture too weak")
    }
  }

  test("containment finds the short-inside-long pair Jaccard misses") {
    val s = SparkSpec.session
    import s.implicits._
    val inner = (0 until 10).map(i => s"w$i").mkString(" ")
    val outer = ((0 until 10) ++ (100 until 160)).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, inner), (2L, outer)).toDF("doc_id", "text")
    // the quote relation: every shingle of `inner` appears in `outer`
    val cont = JaccardJoin.containmentPairs(docs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq == Seq((1L, 2L, 1.0)))
    // while no useful Jaccard threshold pairs them (8 shared / 68 union)
    assert(JaccardJoin.exactPairs(docs, 0.5).isEmpty)
  }

  test("containment blocking is lossless across random corpora") {
    val s = SparkSpec.session
    import s.implicits._
    // five independently-seeded corpora with containment structure at
    // several scales — the blocking must equal brute force on every one
    for (seed <- Seq(1, 7, 19, 41, 97)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 8 + rnd.nextInt(8)).map(i => s"v$i")
      val docs = (0 until 20).flatMap { i =>
        val words = (0 until 5 + rnd.nextInt(25)).map(_ => vocab(rnd.nextInt(vocab.size)))
        val sliceLen = math.min(words.length, 4 + rnd.nextInt(8))
        val excerpt = words.take(sliceLen)
        Seq((i.toLong * 2, words.mkString(" ")),
          (i.toLong * 2 + 1, excerpt.mkString(" ")))
      }.toDF("doc_id", "text")

      val sh = docs.withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), shingles(col("toks"), 3).as("s"))
        .filter(size(col("s")) > 0)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      val naive = (for {
        (a, sa) <- sh; (b, sb) <- sh if a != b
        if (sa & sb).size.toDouble / sa.size >= 0.8
      } yield (a, b)).toSet
      val got = JaccardJoin.containmentPairs(docs, 0.8)
        .select("doc_inner", "doc_outer")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"seed $seed")
    }
  }

  test("identical docs always pair with jaccard 1.0") {
    val s = SparkSpec.session
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely here now today"))
      .toDF("doc_id", "text")
    val out = JaccardJoin.exactPairs(docs, 0.9).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(out.head.getDouble(2) == 1.0)
  }
}
