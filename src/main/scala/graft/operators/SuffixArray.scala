package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction over tokenized documents via
  * prefix doubling (Manber–Myers re-expressed as DataFrame supersteps) —
  * the data structure behind Lee et al.'s exact-substring training-data
  * dedup ("Deduplicating Training Data Makes Language Models Better",
  * §4.1), which finds ARBITRARY-length repeats where the fixed-n gram
  * census (d26/d41) can only see spans of a chosen n.
  *
  * Suffixes are per-document (`(doc_id, pos)` = the token sequence from
  * `pos` to the document's end) but ranked GLOBALLY — equivalent to the
  * suffix array of the sentinel-separated corpus concatenation, because a
  * repeated substring never crosses a document boundary.
  *
  * Algorithm: competition ranks (ties allowed) under an arbitrary fixed
  * total token order; each superstep extends the compared prefix from 2^k
  * to 2^(k+1) tokens by re-ranking on `(rank, rank-of-suffix-2^k-ahead)`
  * — missing lookahead (suffix shorter than 2^k) ranks as 0, before
  * every real rank, because a proper prefix sorts first. Competition
  * (not dense) ranks make the superstep ORDER-CONSISTENT without global
  * renumbering: a tied group's new ranks stay inside the group's
  * reserved [rank, rank+size) interval — so only the still-TIED rows are
  * re-ranked each superstep (refine-only-ties), inside a window
  * partitioned by their group. The loop exits when no ties remain or the
  * prefix length covers the longest document; surviving ties are
  * exactly-identical suffixes.
  *
  * Scale shape: the base ranking runs over 8-token BLOCK STRINGS through
  * [[PrefixSum.competitionRankByRange]] (range-partitioned — block
  * frequency skew is absorbed by the sampled range sort, not a group
  * window). Each superstep then touches only the still-TIED positions
  * (refine-only-ties): a group-size window and a within-group re-rank
  * window partitioned by tie group (positions sharing an entire
  * 2^k-token context — a population that collapses geometrically), plus
  * one (doc_id,pos)-keyed lookahead equi-join against the full rank
  * table, the per-superstep full-width cost the classic algorithm also
  * pays. Superstep count is ceil(log2(longest doc)); lineage is pinned
  * per superstep (localCheckpoint, the d13 pattern) and the one driver
  * action per superstep is the tied-set emptiness probe.
  */
object SuffixArray {

  /** Prefix length the base ranking pass covers (8-token block strings);
    * doubling supersteps start from here. */
  val BaseLen = 8

  /** doc_id, pos (1-based), tok — one row per token position. */
  def tokenPositions(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))

  /** Competition ranks of every suffix of every document. Input needs
    * `doc_id` (unique) and `toks` (non-null array<string>). Output:
    * `doc_id, pos, rank` where rank is 1-based, order-consistent with the
    * lexicographic suffix order under the engine's string collation, and
    * two suffixes share a rank iff their token sequences are identical. */
  def suffixRanks(docs: DataFrame): DataFrame = {
    val maxLen = docs.agg(max(size(col("toks")))).collect()(0) match {
      case r if r.isNullAt(0) => 0
      case r => r.getInt(0)
    }
    // Base pass over 8-TOKEN BLOCK STRINGS (suffix prefix length 8): one
    // skew-free range-ranked pass replaces the first three doubling
    // supersteps, and the heavy short-context tie groups ("the ...")
    // never reach a group window — after this base, the only positions
    // still tied are those inside ≥8-token repeated regions. The
    // space-joined block string is order-isomorphic to the token
    // sequence: tokens are \s+-split so they cannot contain the
    // separator, making the join INJECTIVE (equal string ⟺ equal
    // block), and the string order is sequence-lexicographic under the
    // token order "t sorts as t + ' '" — any fixed total token order is
    // valid for suffix ranking, it only has to be one order throughout.
    // A truncated end-of-document block is a proper prefix and sorts
    // first, which is exactly the suffix-order convention.
    val tp8 = docs
      // empty documents contribute no suffixes (and sequence(1, 0) would
      // DESCEND, minting phantom positions 1 and 0)
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"),
        explode(expr("sequence(1, size(toks))")).as("pos"), col("toks"))
      .select(col("doc_id"), col("pos"),
        array_join(expr(s"slice(toks, pos, $BaseLen)"), " ").as("__g"))
    val t0 = System.nanoTime()
    val base = PrefixSum
      .competitionRankByRange(tp8, Seq("__g"), "rank", tiedOut = "__tied")
      .select("doc_id", "pos", "rank", "__tied")
      .localCheckpoint()
    if (sys.env.contains("GRAFT_SA_DEBUG"))
      println(f"[sa] base ${(System.nanoTime() - t0) / 1e9}%.2f s n=${base.count()}")
    // Refine-only-ties: a resolved (unique-rank) suffix stays resolved
    // forever, and new ties only appear INSIDE previously tied groups —
    // so each superstep touches only the still-tied `active` set, which
    // collapses geometrically (the base pass emits its tie flag for
    // free, so even the first superstep starts from the tied minority),
    // while `fullRanks` (resolved pieces ∪ active) serves the lookahead
    // probes read-only.
    var active = base.filter(col("__tied")).select("doc_id", "pos", "rank")
    var resolvedPieces =
      List(base.filter(!col("__tied")).select("doc_id", "pos", "rank"))
    var fullRanks = base.select("doc_id", "pos", "rank")
    var step = BaseLen.toLong
    var done = false
    while (!done && step < maxLen) {
      // Lookahead as a PROBE into the full rank table: the probe side is
      // the (shrinking) tied set, so AQE broadcast-joins it against the
      // big side — the full table is scanned, never shuffled, per
      // superstep. (An active ⟕ shifted(fullRanks) shape could only
      // broadcast the big right side of the left join, forcing a
      // full-width shuffle every superstep.)
      val probe = active.select(col("doc_id"),
        (col("pos") + lit(step)).as("pos"))
      val r2rows = fullRanks.join(probe, Seq("doc_id", "pos"))
        .select(col("doc_id"), (col("pos") - lit(step)).as("pos"),
          col("rank").as("__r2"))
      // One window exchange computes BOTH the tie-group size (did this row
      // resolve last superstep?) and the within-group refinement; the
      // formula rank + sub − 1 is the identity for already-unique rows
      // (sub = 1), so a single projection serves both populations. One
      // materialization per superstep.
      val upd = active.join(r2rows, Seq("doc_id", "pos"), "left")
        .withColumn("__r2", coalesce(col("__r2"), lit(0L)))
        .withColumn("__c", count(lit(1)).over(Window.partitionBy("rank")))
        .withColumn("__sub",
          rank().over(Window.partitionBy("rank").orderBy("__r2")))
        .select(col("doc_id"), col("pos"),
          (col("rank") + col("__sub") - 1).as("rank"), col("__c"))
        .localCheckpoint()
      resolvedPieces ::= upd.filter(col("__c") === 1)
        .select("doc_id", "pos", "rank")
      active = upd.filter(col("__c") > 1).select("doc_id", "pos", "rank")
      if (upd.filter(col("__c") > 1).isEmpty) done = true
      else {
        fullRanks = (active :: resolvedPieces).reduce(_ unionByName _)
        step *= 2
        if (sys.env.contains("GRAFT_SA_DEBUG"))
          println(f"[sa] step=$step ${(System.nanoTime() - t0) / 1e9}%.2f s active=${active.count()}")
      }
    }
    (active :: resolvedPieces).reduce(_ unionByName _)
  }

  /** Resolves [[suffixRanks]] ties (identical suffixes) by `(doc_id,
    * pos)` into the full suffix-array permutation `sa_pos` ∈ 1..n —
    * identical suffixes end up ADJACENT, which the LCP scan relies on.
    *
    * Competition ranks already ARE the positions: rank = 1 + #rows with
    * a strictly smaller key, so a unique-rank row's permutation index is
    * its rank, and a tied group of size g owns exactly [rank, rank+g).
    * One group-keyed window fills the tied intervals — partition size is
    * the identical-suffix multiplicity (rare after exact dedup), not the
    * corpus. */
  def saPositions(ranks: DataFrame): DataFrame =
    ranks.withColumn("sa_pos",
      col("rank") + row_number().over(
        Window.partitionBy("rank").orderBy("doc_id", "pos")) - 1)
      .select("doc_id", "pos", "sa_pos")

  /** One row per suffix-array-adjacent pair with its exact LCP (longest
    * common token prefix). The classic theorem — LCP of ANY two suffixes
    * is the min of adjacent LCPs between them — makes the max adjacent
    * LCP the length of the longest span occurring ≥ 2 times in the
    * corpus. Adjacency is a keyed equi-join on `sa_pos + 1`; the compare
    * materializes each suffix's token slice once (fine at these document
    * lengths; 10^5-token docs would instead binary-lift over the
    * superstep rank snapshots to keep rows narrow). */
  def adjacentLcp(docs: DataFrame, sa: DataFrame): DataFrame = {
    val sfx = sa.join(docs.select("doc_id", "toks"), Seq("doc_id"))
      .select(col("sa_pos"),
        expr("slice(toks, pos, size(toks) - pos + 1)").as("sfx"))
    val right = sfx.select((col("sa_pos") - 1).as("sa_pos"),
      col("sfx").as("sfx_b"))
    sfx.join(right, Seq("sa_pos"))
      .withColumn("__z",
        zip_with(col("sfx"), col("sfx_b"),
          (x, y) => when(x === y, 1).otherwise(0)))
      // array_position = 0 means "no mismatch" → the shorter suffix is a
      // prefix of (or equal to) the other; zip_with pads with null, and
      // null === tok is null → otherwise(0), so padding counts as mismatch
      .withColumn("lcp",
        when(array_position(col("__z"), 0) === 0,
          least(size(col("sfx")), size(col("sfx_b"))))
          .otherwise(array_position(col("__z"), 0) - 1))
      .select("sa_pos", "lcp")
  }
}
