package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** Prefix-doubling suffix ranking vs brute force. The implementation's
  * token order is the engine's plain per-token string collation (the base
  * pass sorts a composite 8-token key, never a joined string), so the
  * element-wise brute-force comparator below is the ground truth for ANY
  * token content — including tokens containing characters that sort below
  * space. */
class SuffixArraySpec extends SparkSpec {

  private def docsDf(docs: Seq[(Long, Seq[String])]) = {
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "toks")
  }

  /** All (doc_id, pos, suffix) triples, brute force. */
  private def allSuffixes(docs: Seq[(Long, Seq[String])]): Seq[(Long, Int, Seq[String])] =
    for {
      (id, toks) <- docs
      p <- 1 to toks.length
    } yield (id, p, toks.drop(p - 1))

  private def lexLt(a: Seq[String], b: Seq[String]): Boolean = {
    val it = a.zip(b).iterator
    while (it.hasNext) {
      val (x, y) = it.next()
      if (x != y) return x < y
    }
    a.length < b.length
  }

  private def checkRanks(docs: Seq[(Long, Seq[String])]): Unit = {
    val sfx = allSuffixes(docs)
    val got = SuffixArray.suffixRanks(docsDf(docs)).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.size == sfx.size, "one rank per suffix")
    val byKey = sfx.map { case (id, p, t) => (id, p) -> t }.toMap
    for {
      (ka, ta) <- byKey
      (kb, tb) <- byKey
    } {
      if (ta == tb)
        assert(got(ka) == got(kb), s"equal suffixes share a rank: $ta")
      else if (lexLt(ta, tb))
        assert(got(ka) < got(kb), s"$ta < $tb but ranks ${got(ka)} >= ${got(kb)}")
    }
    // competition semantics: rank = 1 + #suffixes strictly smaller
    for ((k, t) <- byKey) {
      val smaller = byKey.values.count(o => lexLt(o, t))
      assert(got(k) == smaller + 1,
        s"rank of $t is ${got(k)}, expected ${smaller + 1}")
    }
  }

  test("ranks match brute force on a hand corpus with shared prefixes") {
    checkRanks(Seq(
      1L -> Seq("a", "b", "a", "b", "c"),
      2L -> Seq("b", "a", "b", "c"),
      3L -> Seq("a", "b", "a", "b", "c"), // identical to doc 1
      4L -> Seq("c")))
  }

  test("ranks match brute force on long shared runs (doubling must iterate)") {
    // 40-token docs sharing a 35-token run: the g8 base cannot separate
    // these, so at least two doubling supersteps must do real work
    val shared = (1 to 35).map(i => s"t${i % 3}")
    checkRanks(Seq(
      1L -> (shared ++ Seq("x", "y", "z", "w", "q")),
      2L -> (Seq("p", "r") ++ shared ++ Seq("x", "y", "k")),
      3L -> shared))
  }

  test("randomized corpora match brute force") {
    val gTok = Gen.oneOf("a", "b", "ab", "ba", "c")
    val gDoc = Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, gTok))
    val gCorpus = Gen.choose(2, 7).flatMap(n => Gen.listOfN(n, gDoc))
    val seed = org.scalacheck.rng.Seed(4242L)
    var s = seed
    (1 to 6).foreach { _ =>
      val docs = gCorpus.pureApply(Gen.Parameters.default, s)
        .zipWithIndex.map { case (t, i) => (i + 1).toLong -> t.toSeq }
      s = s.next
      checkRanks(docs.filter(_._2.nonEmpty))
    }
  }

  test("ranks stay consistent when tokens contain sub-space C0 characters") {
    // Regression for the joined-string base pass: with tokens 'a' and
    // "a\u0001", the joined strings gave "a t" < "a\u0001 t" (0x20 < 0x01
    // is false — 0x01 sorts below space) while single-token comparison
    // gave "a" < "a\u0001" — no consistent token order existed, so ranks
    // could violate the adjacent-LCP theorem. The composite-key base pass
    // uses one collation throughout; brute force must now agree exactly.
    checkRanks(Seq(
      1L -> Seq("a", "t", "q"),
      2L -> Seq("a\u0001", "t", "q"),
      3L -> Seq("a", "t"),
      4L -> Seq("a\u0001", "t"),
      5L -> Seq("a\u0001"),
      6L -> Seq("a", "t", "q", "a\u0001", "t", "q")))
  }

  test("saPositions is a permutation with identical suffixes adjacent") {
    val docs = Seq(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("a", "b", "c"), // identical doc → identical suffixes
      3L -> Seq("b", "c", "a"))
    val sa = SuffixArray.saPositions(SuffixArray.suffixRanks(docsDf(docs)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = allSuffixes(docs).size
    assert(sa.map(_._3).sorted.toSeq == (1L to n), "sa_pos is 1..n")
    // the three identical-pair suffixes of docs 1/2 must sit adjacent
    val byPos = sa.map(t => t._3 -> (t._1, t._2)).toMap
    val sfx = allSuffixes(docs).map { case (id, p, t) => (id, p) -> t }.toMap
    (1L until n).foreach { i =>
      val (a, b) = (sfx(byPos(i)), sfx(byPos(i + 1)))
      assert(!lexLt(b, a), s"sa order violated at $i: $a after $b")
    }
  }

  test("adjacentLcpLifted equals the slice-based adjacentLcp (property)") {
    // the lifted variant must be a pure re-implementation: identical
    // (sa_pos, lcp) pairs on arbitrary token arrays, including identical
    // suffixes (cap saturation) and C0-bearing tokens
    val gTok = Gen.oneOf("a", "b", "c", "a\u0001")
    val gDoc = Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, gTok))
    val gCorpus = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, gDoc))
    var s = org.scalacheck.rng.Seed(90125L)
    (1 to 5).foreach { _ =>
      val docs = gCorpus.pureApply(Gen.Parameters.default, s)
        .zipWithIndex.map { case (t, i) => (i + 1).toLong -> t.toSeq }
      s = s.next
      val df = docsDf(docs)
      val (ranks, snaps, _) = SuffixArray.suffixRanksWithSnapshots(df)
      val sa = SuffixArray.saPositions(ranks).localCheckpoint()
      val slice = SuffixArray.adjacentLcp(df, sa).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lifted = SuffixArray.adjacentLcpLifted(df, sa, snaps).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lifted == slice, s"lifted LCP diverged on $docs:\n" +
        s"  slice=$slice\n  lifted=$lifted")
    }
  }

  test("lifted LCP descends through multiple snapshot levels (long runs)") {
    // 70-token shared run forces snapshots at 8/16/32/64/128 and a
    // greedy descent that must take several levels plus a remainder
    val shared = (1 to 70).map(i => s"t${i % 5}")
    val docs = Seq(
      1L -> (shared ++ Seq("x")),
      2L -> (Seq("p") ++ shared ++ Seq("y", "z")),
      3L -> shared.take(40))
    val df = docsDf(docs)
    val (ranks, snaps, _) = SuffixArray.suffixRanksWithSnapshots(df)
    assert(snaps.map(_._1).toList == snaps.map(_._1).toList.sorted &&
      snaps.map(_._1).max >= 64, s"snapshot levels: ${snaps.map(_._1)}")
    val sa = SuffixArray.saPositions(ranks).localCheckpoint()
    val slice = SuffixArray.adjacentLcp(df, sa).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lifted = SuffixArray.adjacentLcpLifted(df, sa, snaps).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lifted == slice)
    assert(slice.values.max >= 70L, "the shared 70-run must surface")
  }

  test("removeRepeatedSpans matches brute-force window coverage (property)") {
    // ground truth: a position is removed iff it lies inside some
    // EXACTLY-minLen window whose token string occurs >= 2 times
    // corpus-wide (equivalent to coverage by >= minLen repeated spans)
    val minLen = 3
    val gTok = Gen.oneOf("a", "b", "c")
    val gDoc = Gen.choose(1, 16).flatMap(n => Gen.listOfN(n, gTok))
    val gCorpus = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, gDoc))
    var s = org.scalacheck.rng.Seed(31337L)
    (1 to 6).foreach { _ =>
      val docs = gCorpus.pureApply(Gen.Parameters.default, s)
        .zipWithIndex.map { case (t, i) => (i + 1).toLong -> t.toSeq }
      s = s.next
      val windows = docs.flatMap { case (id, t) =>
        t.indices.dropRight(minLen - 1).map(p => (id, p, t.slice(p, p + minLen)))
      }
      val hot = windows.groupBy(_._3).collect {
        case (k, vs) if vs.size >= 2 => k
      }.toSet
      val covered = windows.filter(w => hot(w._3))
        .flatMap { case (id, p, _) => (p until p + minLen).map(id -> _) }.toSet
      val expected = docs.map { case (id, t) =>
        val keptToks = t.indices.filterNot(i => covered((id, i))).map(t)
        (id, t.length, t.length - keptToks.length, keptToks.mkString(" "))
      }.toSet
      val got = SuffixArray.removeRepeatedSpans(docsDf(docs), minLen)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSet
      assert(got == expected,
        s"substring dedup diverged on $docs:\n  got=$got\n  exp=$expected")
    }
  }

  test("removeCoveredTokens doc-grain kernel: overlap, unsorted, clamped, full-cover") {
    // focused edge cases for the round-19 ExciseCovered kernel (the
    // doc-grain rewrite of the token-grain window formulation): spans
    // arrive UNSORTED (collect_list order is arbitrary), may overlap,
    // may extend past the document, may cover everything, and a doc may
    // have no spans at all (left_outer null path)
    val s = spark
    import s.implicits._
    val docs = docsDf(Seq(
      1L -> Seq("a", "b", "c", "d", "e", "f"), // overlapping + unsorted
      2L -> Seq("g", "h", "i"),                // span past the end
      3L -> Seq("j", "k"),                     // fully covered
      4L -> Seq("l", "m", "n")))               // no spans
    val spans = Seq(
      (1L, 4L, 6L), // [4,6) — listed FIRST though it starts later
      (1L, 2L, 5L), // [2,5) — overlaps; union [2,6) keeps a, f
      (2L, 2L, 9L), // reaches past n=3: keeps g only
      (3L, 1L, 3L)  // covers the whole doc
    ).toDF("doc_id", "pos", "__end")
    val got = SuffixArray.removeCoveredTokens(docs, spans).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((6, 4, "a f")), s"got ${got(1L)}")
    assert(got(2L) == ((3, 2, "g")), s"got ${got(2L)}")
    assert(got(3L) == ((2, 2, "")), s"got ${got(3L)}")
    assert(got(4L) == ((3, 0, "l m n")), s"got ${got(4L)}")
  }

  test("removeRepeatedSpans removes a within-document repeat") {
    // self-plagiarism: one doc repeats its own 4-token block; with
    // minLen 4 both occurrences are covered and removed
    val block = Seq("q", "r", "s", "t")
    val docs = Seq(
      1L -> (block ++ Seq("m") ++ block),
      2L -> Seq("u", "v", "w"))
    val got = SuffixArray.removeRepeatedSpans(docsDf(docs), 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap
    assert(got(1L) == ((9, 8, "m")), s"got ${got(1L)}")
    assert(got(2L) == ((3, 0, "u v w")))
  }

  test("removeSharedSpans matches brute-force cross-set coverage (property)") {
    // ground truth: a TRAIN position is removed iff it lies inside some
    // EXACTLY-minLen window whose token string also occurs in a BENCH
    // document (equivalent to coverage by >= minLen shared spans);
    // train-internal and bench-internal repeats must NOT remove anything
    val minLen = 3
    val gTok = Gen.oneOf("a", "b", "c")
    val gDoc = Gen.choose(1, 16).flatMap(n => Gen.listOfN(n, gTok))
    val gCorpus = Gen.choose(3, 7).flatMap(n => Gen.listOfN(n, gDoc))
    var s = org.scalacheck.rng.Seed(24601L)
    (1 to 6).foreach { _ =>
      val docs = gCorpus.pureApply(Gen.Parameters.default, s)
        .zipWithIndex.map { case (t, i) => (i + 1).toLong -> t.toSeq }
      s = s.next
      val isBench = (id: Long) => id % 3 == 0
      val windows = docs.flatMap { case (id, t) =>
        t.indices.dropRight(minLen - 1).map(p => (id, p, t.slice(p, p + minLen)))
      }
      val hot = windows.collect { case (id, _, w) if isBench(id) => w }.toSet
      val covered = windows
        .filter { case (id, _, w) => !isBench(id) && hot(w) }
        .flatMap { case (id, p, _) => (p until p + minLen).map(id -> _) }.toSet
      val expected = docs.filterNot(d => isBench(d._1)).map { case (id, t) =>
        val keptToks = t.indices.filterNot(i => covered((id, i))).map(t)
        (id, t.length, t.length - keptToks.length, keptToks.mkString(" "))
      }.toSet
      val got = SuffixArray
        .removeSharedSpans(docsDf(docs), col("doc_id") % 3 === 0, minLen)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSet
      assert(got == expected,
        s"decontamination diverged on $docs:\n  got=$got\n  exp=$expected")
    }
  }

  test("removeSharedSpans is one-directional and span-complete") {
    // bench doc 3 shares a 4-token block with train doc 1 (masked), the
    // train docs 1/2 share a 5-token block only with EACH OTHER (kept —
    // hotness needs a bench occurrence), and train doc 4 is an exact
    // copy of bench doc 6 (fully masked). minLen 4; the shared block
    // inside doc 1 sits mid-document, so both mask boundaries matter.
    val block = Seq("q", "r", "s", "t")
    val trainOnly = Seq("f", "g", "h", "i", "j")
    val docs = Seq(
      1L -> (Seq("m") ++ block ++ trainOnly),
      2L -> (trainOnly ++ Seq("n")),
      3L -> (block ++ Seq("z")), // bench
      4L -> Seq("u", "v", "w", "x", "y"),
      6L -> Seq("u", "v", "w", "x", "y")) // bench
    val got = SuffixArray
      .removeSharedSpans(docsDf(docs), col("doc_id") % 3 === 0, 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3)))
      .toMap
    assert(got.keySet == Set(1L, 2L, 4L), s"non-bench rows only: ${got.keySet}")
    assert(got(1L) == ((10, 4, "m f g h i j")), s"got ${got(1L)}")
    assert(got(2L) == ((6, 0, "f g h i j n")), s"train-train repeat kept: ${got(2L)}")
    assert(got(4L) == ((5, 5, "")), s"bench-identical doc fully masked: ${got(4L)}")
  }

  test("adjacentLcp max equals the brute-force longest repeated span") {
    val gTok = Gen.oneOf("a", "b", "c")
    val gDoc = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, gTok))
    val gCorpus = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, gDoc))
    var s = org.scalacheck.rng.Seed(777L)
    (1 to 5).foreach { _ =>
      val docs = gCorpus.pureApply(Gen.Parameters.default, s)
        .zipWithIndex.map { case (t, i) => (i + 1).toLong -> t.toSeq }
      s = s.next
      val df = docsDf(docs)
      val sa = SuffixArray.saPositions(SuffixArray.suffixRanks(df))
      val gotMax = SuffixArray.adjacentLcp(df, sa)
        .agg(max(col("lcp"))).collect()(0) match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
      // brute force: longest span occurring at ≥ 2 distinct positions
      val spans = for {
        (_, t) <- docs
        p <- t.indices
        l <- 1 to (t.length - p)
      } yield t.slice(p, p + l)
      val bruteMax = spans.groupBy(identity).collect {
        case (k, vs) if vs.size >= 2 => k.length
      }.foldLeft(0)(math.max)
      assert(gotMax == bruteMax.toLong,
        s"LRS mismatch: got $gotMax brute $bruteMax on $docs")
    }
  }
}
