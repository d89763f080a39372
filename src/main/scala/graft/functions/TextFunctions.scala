package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline operators:
  * tokenization, shingling, deterministic hashing, MinHash signatures,
  * SimHash. Everything is built from codegen'd Spark builtins (higher-order
  * array functions + md5/conv) — no UDFs — so the whole pipeline stays
  * inside whole-stage codegen and is reproducible in any engine that has
  * md5 (the DuckDB oracles mirror the arithmetic exactly).
  */
object TextFunctions {

  /** Whitespace tokens of the lower-cased text.
    *
    * PERF: always materialize this as its own projection column
    * (`.withColumn("toks", tokens(col("text")))`) before passing it to
    * [[shingles]]/[[langId]]/etc. Spark's subexpression elimination does not
    * descend into higher-order-function lambda bodies, so an inline
    * `tokens(...)` expression referenced from a lambda re-runs the regex
    * split once per array element (measured 14 s of a 33 s query at sf0.1). */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct word n-gram shingles (space-joined), first-occurrence order.
    * Empty array when the document has fewer than n tokens. Native kernel —
    * see [[graft.expressions.WordShingles]]; the HOF formulation
    * (transform(sequence…) + array_distinct) evaluates interpreted
    * per-element. */
  def shingles(toks: Column, n: Int): Column =
    graft.expressions.TextExpressions.wordShingles(toks, n)

  /** 28-bit deterministic string hash: first 7 hex digits of md5.
    * Small enough that `a*h+b` stays well inside Long for 31-bit `a`. */
  def hash28(s: Column): Column =
    conv(substring(md5(s), 1, 7), 16, 10).cast("long")

  /** 60-bit deterministic string hash: first 15 hex digits of md5. */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Fixed universal-hash parameters (a_k, b_k) for the K MinHash
    * permutations — shared verbatim with the DuckDB oracle SQL. */
  val MinhashPrime: Long = 2147483647L // 2^31 - 1
  val MinhashPerms: Seq[(Long, Long)] =
    (0 until 16).map { k =>
      val a = ((2L * k + 1L) * 40503L) % MinhashPrime
      val b = (k * 104729L + 12345L) % MinhashPrime
      (a, b)
    }

  /** MinHash signature (array<long> of length K) over a PRE-HASHED shingle
    * array (`transform(shingles, hash28)` materialized as its own column):
    * sig_k = min over hashes of (a_k * h + b_k) mod p.
    *
    * Takes the hash column, not the shingle column, on purpose: referencing
    * an md5-bearing expression from all K signature entries would make
    * Catalyst evaluate the md5 transform K times (no CSE across array
    * elements) — a 16× md5 blowup measured at 40 s vs 3 s at sf0.1. */
  def minhashSignature(hashCol: Column): Column =
    graft.expressions.TextExpressions.minhashSignature(
      hashCol, MinhashPerms.map(_._1), MinhashPerms.map(_._2), MinhashPrime)

  /** LSH band keys: md5 of each band's comma-joined signature slice.
    * bands × rowsPerBand must equal the signature length. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat_ws(",",
        transform(slice(sig, (b * rowsPerBand + 1).cast("int"), lit(rowsPerBand)),
          x => x.cast("string")))))

  /** 60-bit SimHash over a PRE-HASHED token array
    * (`transform(toks, hash60)` materialized as its own column — see the
    * [[tokens]] perf note; the 60 bit-sums would otherwise re-evaluate the
    * md5 transform 60×): bit b of the result is the majority vote of bit b
    * across each token's hash60. The bit loop unrolls Scala-side into 60
    * mask constants (functions.shiftright only accepts literal shifts). */
  def simhash60(hs: Column): Column =
    graft.expressions.TextExpressions.simhash60(hs)

  /** Normalized-whitespace md5 document fingerprint (rolling-hash analog). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** d05 canon survivor set as `(doc_id, toks)` — whole-document exact
    * dedup (min doc_id per [[fingerprint]]), the pipeline position the
    * suffix tier runs at. ONE definition shared by the d48/d51 queries,
    * their plan dumps, and the plan-shape specs, so the canon semantics
    * cannot drift between the gated query and its pinned plan. Input
    * needs `doc_id` + `text`. */
  def canonSurvivorToks(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val fp = docs.select(col("doc_id"), col("text"),
      fingerprint(col("text")).as("fp"))
    val canon = fp.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
    fp.join(canon.select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
  }

  /** Ordered (non-distinct) space-joined k-grams — winnowing needs the
    * positional gram SEQUENCE, unlike [[shingles]] which dedupes. Total:
    * inputs shorter than k yield an empty array (an unclamped
    * `sequence(1, size-k+1)` would COUNT DOWN for short inputs — Spark's
    * sequence defaults to step -1 when start > stop — and element_at(0)
    * throws). `toks` MUST be a materialized attribute (a prior
    * `.withColumn`/`.select` alias), never an inline `tokens(text)`
    * subtree: each of the k element_at's re-evaluates its argument, so an
    * inline split() runs k times per window — measured 19 s vs 1.1 s for
    * the x34 window index over the same corpus. */
  def orderedGrams(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(o => element_at(toks, i + o)): _*)))

  /** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, MOSS): hash
    * every ordered k-gram, slide a w-window over the hash sequence, keep
    * each window's minimum; distinct minima are the fingerprints.
    * Guarantee: two documents sharing a token run of ≥ k + w - 1 share at
    * least one fingerprint. Requires size(toks) ≥ k + w - 1. The gram
    * hashes must be a materialized projection before the window transform
    * (HOF lambdas get no CSE). Total: fewer than w hashes yield an empty
    * fingerprint set (same descending-sequence hazard as orderedGrams). */
  def winnowFingerprints(hs: Column, w: Int): Column =
    when(size(hs) < w, array().cast("array<bigint>")).otherwise(
      array_distinct(transform(sequence(lit(1), size(hs) - (w - 1)),
        i => array_min(slice(hs, i, lit(w))))))

  /** Count of tokens that appear in a fixed stopword list. */
  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit): _*)))

  /** C0/DEL control-char class (tab/newline/CR kept) — the d45 scrub
    * contract, owned HERE so every consumer (the d45 operator, the d47
    * composed pipeline, the x32 streaming ingest, and the generated
    * oracle SQL) derives from one value and cannot drift. One form per
    * dialect: DuckDB regex literal vs Java regex with escaped
    * backslashes. */
  val CtrlClassSql = """[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"""
  val CtrlClassSpark = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Per-language stopword lists for the n-gram language-ID heuristic.
    * Order is the tie-break priority. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "不"))

  /** Language-ID heuristic: argmax of stopword votes with strict-majority
    * chain in declaration order; "und" (undetermined) when no list scores
    * above zero.
    *
    * Optimization round 19 (guide §4, "eliminate non-codegen expressions
    * in the hot path"), two steps. The original form built `scores`/
    * `best` as Column expressions and referenced them across the argmax
    * chain — Column trees DUPLICATE at every reference, so the expanded
    * predicate held ~35 `size(filter(toks, …))` occurrences, each an
    * interpreted (CodegenFallback) ArrayFilter pass over the token array,
    * and when `toks` was itself an inline `split(lower(nfc_normalize(…)))`
    * the whole normalize+split re-ran per occurrence. An `aggregate` HOF
    * rewrite made it ONE pass, but the per-token lambda (CreateArray +
    * 5 CaseWhen/In) still evaluated interpreted — stack-sampled at ~10 s
    * of task CPU per streaming-ingest lifecycle at sf0.1 — so the pass is
    * now the [[graft.expressions.LangIdVotes]] native kernel. Semantics
    * are bit-identical throughout: same counts (null tokens vote
    * nowhere — `isin` semantics), same declaration-order tie-break, same
    * "und" on zero votes and on a NULL token array. */
  def langId(toks: Column): Column =
    coalesce( // NULL toks scored "und" in the original
      graft.expressions.TextExpressions.langIdVotes(
        toks, LangStopwords.map(_._1), LangStopwords.map(_._2)),
      lit("und"))
}
