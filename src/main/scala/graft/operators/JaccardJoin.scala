package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** EXACT n-gram set-similarity joins over a (doc_id, text) DataFrame:
  * word-n-gram shingles → rarest-first prefix filter → inverted-index
  * candidate join → exact verification. Two relations share the machinery:
  *
  *  - [[exactPairs]]: symmetric Jaccard ≥ t (near-dup pairs)
  *  - [[containmentPairs]]: asymmetric containment |A∩B|/|A| ≥ t (the
  *    quote/subset relation Jaccard blocking structurally misses)
  *
  * Unlike MinHash-LSH (probabilistic recall) both are lossless: prefix
  * filtering (Chaudhuri et al. SSJoin / Xiao et al. PPJoin) guarantees that
  * any qualifying pair shares at least one shingle inside the probe
  * prefix(es) under a single global shingle ordering. The prefix length for
  * threshold t is |s| − ⌈t·|s|⌉ + 1, computed as |s| − floor(t·|s|) + 1 —
  * float error can only ever over-lengthen, never cut below the safe bound.
  *
  * Scale contract: ordering shingles by ascending document frequency puts
  * the RAREST shingles in the prefixes, so the inverted index the candidate
  * join probes has tiny, skew-bounded postings lists (a stop-shingle like
  * "of the and" never enters a prefix). Every join is a hash equi-join on
  * the shingle — never an all-pairs cross join (PlanShapeSpec pins).
  */
object JaccardJoin {

  /** Distinct-shingle table (doc_id, s). Cached only when the caller will
    * materialize and free it — a plan-only caller (explain, plan tests)
    * must not pin corpus-sized blocks it never unpersists. */
  private def shingled(docs: DataFrame, n: Int, cache: Boolean): DataFrame = {
    val sh = docs
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), shingles(col("toks"), n).as("s"))
      .filter(size(col("s")) > 0)
    if (cache) sh.cache() else sh
  }

  /** One row per (doc, shingle) with the doc's shingle count. */
  private def explodedGrams(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), size(col("s")).as("sz"), explode(col("s")).as("sg"))

  /** The rarest-first probe prefix of every document at `threshold`:
    * global document frequency per shingle → ascending-df rank within each
    * doc → keep rank ≤ |s| − ⌊t·|s|⌋ + 1. The same bound serves both
    * relations (Jaccard and containment both allow at most ⌊(1−t)·|s|⌋
    * probe shingles to miss the other side). */
  private def rarestFirstPrefix(sh: DataFrame, threshold: Double): DataFrame = {
    val df = sh.select(explode(col("s")).as("sg"))
      .groupBy("sg").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sg"))
    explodedGrams(sh)
      .join(df, Seq("sg"))
      .withColumn("rnk", row_number().over(byRarity))
      .filter(col("rnk") <= col("sz") - floor(col("sz") * threshold) + 1)
      .select("doc_id", "sg", "sz")
  }

  /** All pairs (doc_a < doc_b) with word-n-gram Jaccard ≥ threshold —
    * exact result, prefix-filtered candidate generation.
    *
    * With `materialize` (the default) the tiny pair result is
    * localCheckpoint'ed and the shingle/prefix caches are freed before
    * returning — callers (e.g. cluster collapse, which unions and re-joins
    * the pairs) read materialized blocks instead of re-executing the
    * shuffle pipeline, and the session doesn't accumulate corpus-sized
    * cache blocks. Pass false to get the raw lazy plan (plan-shape tests).
    */
  def exactPairs(docs: DataFrame, threshold: Double, n: Int = 3,
                 materialize: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0)
    val sh = shingled(docs, n, cache = materialize)
    // cached: the candidate self-join scans the prefix table twice, and
    // without this each side re-executes the df-join + ranking subtree
    // (measured 15 s → ~4 s at sf0.1)
    val prefixPlan = rarestFirstPrefix(sh, threshold)
    val prefix = if (materialize) prefixPlan.cache() else prefixPlan

    // length filter (PPJoin): Jaccard ≥ t forces t·|a| ≤ |b| ≤ |a|/t, so
    // size-incompatible collisions are pruned BEFORE the distinct/verify —
    // lossless, applied inside the shingle equi-join
    val cand = prefix.as("x")
      .join(prefix.as("y"),
        col("x.sg") === col("y.sg") && col("x.doc_id") < col("y.doc_id")
          && col("y.sz") * threshold <= col("x.sz")
          && col("x.sz") * threshold <= col("y.sz"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    // one-pass native Jaccard kernel + explicit verification spread — the
    // same pair of fixes as MinHashDedup.verifiedPairs: pair rows are 16
    // bytes so byte-based AQE coalescing under-parallelizes the CPU-bound
    // set ops, and the built-in intersect/union pair materializes two
    // throwaway arrays per candidate (see the regime discussion there:
    // round-robin by design; under a sort-merge verify join the spread
    // degenerates to a cheap pass-through, not a pessimization)
    val jac = graft.expressions.TextExpressions
      .distinctSetJaccard(col("sa"), col("sb"))
    val spread = cand.repartition(
      docs.sparkSession.sessionState.conf.numShufflePartitions)
    val pairs = spread
      .join(sh.select(col("doc_id").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
      .withColumn("jac", jac)
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
    if (!materialize) pairs
    else {
      val out = pairs.localCheckpoint() // qualifying pairs only — tiny
      sh.unpersist(blocking = false)
      prefix.unpersist(blocking = false)
      out
    }
  }

  /** All ordered pairs (inner, outer), inner ≠ outer, with n-gram
    * CONTAINMENT |sh(inner) ∩ sh(outer)| / |sh(inner)| ≥ threshold — exact.
    *
    * Containment is the asymmetric near-dup relation Jaccard blocking
    * structurally misses: a short document quoted wholesale inside a long
    * one has containment ≈ 1 but Jaccard ≈ |inner|/|outer| ≈ 0, so no
    * Jaccard threshold finds it. Training-data pipelines need this shape
    * for quote/subset detection (a doc that is mostly a substring of
    * another is a duplicate even though the pair looks dissimilar).
    *
    * Lossless blocking: C(A→B) ≥ t means at most ⌊(1−t)·|A|⌋ of A's
    * shingles are absent from B, so ANY ⌊(1−t)·|A|⌋+1 of them must hit B —
    * A's rarest-first prefix probes the FULL inverted index of all
    * documents. Unlike the Jaccard join only the PROBE side is
    * prefix-truncated (the outer side may be arbitrarily larger — that's
    * the point); the join stays skew-bounded because a stop-shingle has a
    * huge postings list but almost never enters any rarest-first probe
    * prefix, so the per-key join product stays small. |B| ≥ t·|A|
    * (intersection ≤ |B|) prunes size-incompatible candidates inside the
    * join. Verification computes the exact intersection on the candidate
    * pairs only.
    */
  def containmentPairs(docs: DataFrame, threshold: Double, n: Int = 3,
                       materialize: Boolean = true): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0)
    val sh = shingled(docs, n, cache = materialize)
    val probe = rarestFirstPrefix(sh, threshold)
    val index = explodedGrams(sh)

    val cand = probe.as("x")
      .join(index.as("y"),
        col("x.sg") === col("y.sg") && col("x.doc_id") =!= col("y.doc_id")
          && col("y.sz") >= col("x.sz") * threshold)
      .select(col("x.doc_id").as("doc_inner"), col("y.doc_id").as("doc_outer"))
      .distinct()

    // same verification spread + native kernel as exactPairs; containment
    // needs only |A∩B| (|A| is an O(1) size read)
    val spread = cand.repartition(
      docs.sparkSession.sessionState.conf.numShufflePartitions)
    val pairs = spread
      .join(sh.select(col("doc_id").as("doc_inner"), col("s").as("sa")), Seq("doc_inner"))
      .join(sh.select(col("doc_id").as("doc_outer"), col("s").as("sb")), Seq("doc_outer"))
      .withColumn("containment",
        graft.expressions.TextExpressions.distinctSetOverlap(col("sa"), col("sb"))
          .cast("double") / size(col("sa")))
      .filter(col("containment") >= threshold)
      .select(col("doc_inner"), col("doc_outer"),
        round(col("containment"), 4).as("containment"))
    if (!materialize) pairs
    else {
      val out = pairs.localCheckpoint()
      sh.unpersist(blocking = false)
      out
    }
  }
}
