package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis + deduplication operators over the `documents` table — the
  * LLM-training-data-pipeline surface (BASELINE.json north star): exact
  * dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard verification,
  * language ID, quality scoring, token stats, fingerprinting.
  *
  * Every operator is deterministic builtin-only arithmetic (md5-derived
  * hashes), so even MinHash and SimHash carry full DuckDB oracles.
  *
  * Scale: the near-dup pipeline is MinHash-LSH — candidates come from
  * band-bucket equality joins (shuffle on band key, O(docs·bands) rows),
  * never an all-pairs cross join; exact Jaccard runs only on candidates.
  * This is the shape that survives 100 TB: banding keys partition the
  * shuffle, and bucket skew is bounded by the band hash.
  */
object TextQueries {

  /** Shared SQL fragments so the Spark and DuckDB sides can't drift.
    * `private[queries]`: the d47 composed pipeline re-reads the same
    * fragments over its intermediate relations. */
  private[queries] val tokSql = """regexp_split_to_array(lower(text), '\s+')"""
  // the d45 scrub class lives in TextFunctions (shared beyond this
  // package — CurationStream's per-batch scrub uses it too)
  private[queries] val CtrlClassSql = TextFunctions.CtrlClassSql
  private[queries] val CtrlClassSpark = TextFunctions.CtrlClassSpark
  private[queries] def shingleSql(toks: String) =
    s"""list_distinct(CASE WHEN len($toks) >= 3
       | THEN [$toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2]
       |       for i in generate_series(1, len($toks)-2)]
       | ELSE CAST([] AS VARCHAR[]) END)""".stripMargin

  /** Token statistics: whitespace tokens, uniques, chars, plus a BPE-ish
    * subword count (word pieces + standalone punctuation/digits — the
    * pre-tokenizer shape LLM tokenizers apply before merges). */
  val docTokenStats = OracleQuery(
    "d01_doc_token_stats",
    s"""SELECT doc_id,
       |  CAST(len($tokSql) AS INT) AS n_tokens,
       |  CAST(len(list_distinct($tokSql)) AS INT) AS n_unique_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS INT)
       |    AS n_bpe_tokens,
       |  CAST(length(text) AS INT) AS n_chars_calc
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_unique_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))).as("n_bpe_tokens"),
        length(col("text")).as("n_chars_calc"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length/alpha/stopword ratios + when-chain band. */
  val docQuality = OracleQuery(
    "d02_doc_quality",
    s"""WITH t AS (
       |  SELECT doc_id, text, $tokSql AS toks FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    len(toks) AS n_tokens,
       |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
       |      / len(toks) AS avg_tok_len,
       |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
       |      / length(text) AS alpha_ratio,
       |    CAST(len(list_filter(toks,
       |      t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
       |      / len(toks) AS stopword_ratio
       |  FROM t)
       |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       |  round(avg_tok_len, 4) AS avg_tok_len,
       |  round(alpha_ratio, 4) AS alpha_ratio,
       |  round(stopword_ratio, 4) AS stopword_ratio,
       |  CASE WHEN n_tokens >= 50 AND stopword_ratio BETWEEN 0.05 AND 0.6 THEN 'high'
       |       WHEN n_tokens >= 20 THEN 'medium'
       |       ELSE 'low' END AS quality_band
       |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
    val enWords = LangStopwords.head._2
    val m = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        (length(regexp_replace(col("text"), "\\s+", "")).cast("double") / size(col("toks")))
          .as("avg_tok_len"),
        (length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("double")
          / length(col("text"))).as("alpha_ratio"),
        (stopwordCount(col("toks"), enWords).cast("double") / size(col("toks")))
          .as("stopword_ratio"))
    m.select(
      col("doc_id"), col("n_tokens"),
      round(col("avg_tok_len"), 4).as("avg_tok_len"),
      round(col("alpha_ratio"), 4).as("alpha_ratio"),
      round(col("stopword_ratio"), 4).as("stopword_ratio"),
      when(col("n_tokens") >= 50 && col("stopword_ratio").between(0.05, 0.6), "high")
        .when(col("n_tokens") >= 20, "medium")
        .otherwise("low").as("quality_band"))
      .orderBy("doc_id")
  }

  /** Language-ID SQL fragments (shared by d03 and the d47 composed
    * pipeline): per-language stopword vote columns over a `toks` array
    * column, the argmax, and the decision CASE (reads the vote columns
    * plus a `best` column). Mirror [[TextFunctions.langId]] exactly. */
  private[queries] def langScoreColsSql: String = LangStopwords.map { case (lang, words) =>
    val list = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(toks, t -> t IN ($list))) AS s_$lang"
  }.mkString(",\n    ")
  private[queries] def langBestSql: String =
    LangStopwords.map(l => s"s_${l._1}").mkString("greatest(", ", ", ")")
  private[queries] def langCaseSql: String = {
    val cases = LangStopwords.map { case (lang, _) =>
      s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
    }.mkString("\n    ")
    s"CASE $cases ELSE 'und' END"
  }

  /** Language-ID heuristic: stopword votes per language, argmax with
    * declaration-order tie-break, "und" when no votes. */
  val docLangId = OracleQuery(
    "d03_doc_langid",
    s"""WITH t AS (SELECT doc_id, lang, $tokSql AS toks FROM documents),
       |v AS (SELECT doc_id, lang,
       |    $langScoreColsSql
       |  FROM t),
       |b AS (SELECT *, $langBestSql AS best FROM v)
       |SELECT doc_id, lang AS labeled_lang,
       |  $langCaseSql AS predicted_lang
       |FROM b ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"), col("lang").as("labeled_lang"),
        langId(col("toks")).as("predicted_lang"))
      .orderBy("doc_id")
  }

  /** Normalized-md5 document fingerprint. */
  val docFingerprint = OracleQuery(
    "d04_doc_fingerprint",
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
  }

  /** Exact dedup: hash-groupBy on the normalized fingerprint, deterministic
    * canonical survivor (min doc_id). At scale this is one hash shuffle on
    * a 128-bit key — the standard exact-dedup shape. */
  val docExactDedup = OracleQuery(
    "d05_doc_exact_dedup",
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |  min(doc_id) AS canonical_doc_id, count(*) AS n_docs
      |FROM documents GROUP BY 1 ORDER BY canonical_doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("n_docs"))
      .orderBy("canonical_doc_id")
  }

  /** 60-bit SimHash per document (majority-vote bits of md5 token hashes). */
  val docSimhash = OracleQuery(
    "d06_doc_simhash",
    s"""WITH h AS (
       |  SELECT doc_id,
       |    list_transform($tokSql,
       |      t -> ('0x' || substring(md5(t), 1, 15))::BIGINT) AS hs
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(list_sum(list_transform(generate_series(0, 59), b ->
       |    CASE WHEN 2 * list_sum(list_transform(hs, x -> (x >> b) & 1)) > len(hs)
       |         THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
       |FROM h ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("hs", transform(col("toks"), t => hash60(t)))
      .select(col("doc_id"), simhash60(col("hs")).as("simhash"))
      .orderBy("doc_id")
  }

  /** The shingle→signature→band CTEs reading from `t(doc_id, toks)` —
    * the index-build half of the MinHash pipeline, shared by the
    * all-pairs chain below and d29's delta-vs-index probe. Multiply-
    * referenced CTEs are `AS MATERIALIZED`: DuckDB otherwise INLINES each
    * reference and re-executes the whole upstream chain per reference
    * (profiling d47 showed its token CTE evaluated 13× and 21
    * recursive-CTE re-evaluations — the "~14 min oracle" was that, not
    * exhaustive verification; hints cut it to seconds, result-identical). */
  private[queries] def minhashBandCtes: String = {
    val sigEntries = MinhashPerms.map { case (a, b) =>
      s"list_min(list_transform(h, x -> (x * $a + $b) % $MinhashPrime))"
    }.mkString(",\n      ")
    s"""sh AS MATERIALIZED (SELECT doc_id, ${shingleSql("toks")} AS s FROM t),
       |hs AS (
       |  SELECT doc_id, s,
       |    list_transform(s, x -> ('0x' || substring(md5(x), 1, 7))::BIGINT) AS h
       |  FROM sh WHERE len(s) > 0),
       |sig AS MATERIALIZED (
       |  SELECT doc_id, s, [
       |      $sigEntries
       |    ] AS sig
       |  FROM hs),
       |bands AS (
       |  SELECT doc_id, s, b,
       |    md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bh
       |  FROM sig, generate_series(0, 3) g(b))""".stripMargin
  }

  /** The full MinHash-LSH CTE chain (bands → candidate pairs → exact
    * Jaccard verify) reading from `t(doc_id, toks)` — shared by d07 (raw
    * documents) and d08 (curation survivors). Mirrors
    * [[graft.operators.MinHashDedup.verifiedPairs]] arithmetic exactly. */
  private[queries] def minhashPairCtes: String =
    s"""$minhashBandCtes,
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id),
       |verify AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(sa.s, sb.s))) AS jac
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = doc_a
       |  JOIN sh sb ON sb.doc_id = doc_b)""".stripMargin

  /** The capped-bucket candidate chain: buckets up to `cap` emit exact
    * pairs, larger buckets a representative star (min doc_id × members) —
    * mirrors [[graft.operators.MinHashDedup.verifiedPairs]]'s mega-bucket
    * guard arithmetic exactly. */
  private[queries] def minhashCappedPairCtes(cap: Int): String =
    s"""$minhashBandCtes,
       |bsz AS MATERIALIZED (
       |  SELECT doc_id, b, bh,
       |    count(*) OVER (PARTITION BY b, bh) AS n,
       |    min(doc_id) OVER (PARTITION BY b, bh) AS m
       |  FROM bands),
       |cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |    FROM bsz x JOIN bsz y
       |      ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id
       |      AND x.n <= $cap
       |    UNION ALL
       |    SELECT m AS doc_a, doc_id AS doc_b FROM bsz
       |    WHERE n > $cap AND doc_id <> m)),
       |verify AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(sa.s, sb.s))) AS jac
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = doc_a
       |  JOIN sh sb ON sb.doc_id = doc_b)""".stripMargin

  /** MinHash signatures + LSH banding + exact-Jaccard verification: the
    * scalable near-dup pipeline (candidates from band-bucket joins, never
    * an all-pairs cross join). K=16 permutations, 4 bands × 4 rows;
    * verification threshold 0.7 on word-3-gram Jaccard.
    * Implementation: [[graft.operators.MinHashDedup]]. */
  val docMinhashNearDup = OracleQuery(
    "d07_doc_neardup_minhash_lsh",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |$minhashPairCtes
       |SELECT doc_a, doc_b, round(jac, 4) AS jaccard
       |FROM verify WHERE jac >= 0.7 ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    graft.operators.MinHashDedup.verifiedPairs(Tables.documents(s, d), 0.7)
      .orderBy("doc_a", "doc_b")
  }

  /** d07 under the MEGA-BUCKET GUARD (cap deliberately tight at 2 so the
    * oracle exercises BOTH candidate paths on this corpus — production
    * sets it in the thousands): band buckets up to the cap emit exact
    * pairs, larger buckets a representative star, linear in the bucket.
    * This is the shape that survives a mega-cluster of near-identical
    * documents landing whole in one bucket — the one input that turns
    * unguarded LSH quadratic (see SCALE.md skew run). Verification is
    * unchanged exact Jaccard, so every reported pair is still true; the
    * guard only bounds which candidates are probed. */
  val docMinhashNearDupCapped = OracleQuery(
    "d49_neardup_capped_lsh",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |${minhashCappedPairCtes(2)}
       |SELECT doc_a, doc_b, round(jac, 4) AS jaccard
       |FROM verify WHERE jac >= 0.7 ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    graft.operators.MinHashDedup
      .verifiedPairs(Tables.documents(s, d), 0.7, maxBucketSize = 2)
      .orderBy("doc_a", "doc_b")
  }

  /** The composed corpus-curation pipeline — the end-to-end training-data
    * shape: quality gate → exact dedup (canonical = min doc_id per
    * fingerprint) → MinHash near-dup pruning (drop the higher id of every
    * verified pair) → curated corpus. Every stage is the operator already
    * verified standalone (d02/d05/d07), composed into one plan. */
  val docCorpusCuration = OracleQuery(
    "d08_corpus_curation",
    s"""WITH raw AS (
       |  SELECT doc_id, lang, text, $tokSql AS toks FROM documents),
       |q AS (
       |  SELECT *, len(toks) AS n_tokens,
       |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
       |      / length(text) AS alpha_ratio
       |  FROM raw),
       |keep AS (SELECT * FROM q WHERE n_tokens >= 20 AND alpha_ratio >= 0.5),
       |fp AS (
       |  SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM keep),
       |canon AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
       |t AS (SELECT f.doc_id, f.lang, f.toks, f.n_tokens FROM fp f
       |      JOIN canon c ON f.doc_id = c.doc_id),
       |$minhashPairCtes,
       |dropped AS (SELECT DISTINCT doc_b AS doc_id FROM verify WHERE jac >= 0.7)
       |SELECT t.doc_id, t.lang, CAST(t.n_tokens AS INT) AS n_tokens
       |FROM t
       |WHERE NOT EXISTS (SELECT 1 FROM dropped x WHERE x.doc_id = t.doc_id)
       |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    val q = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("alpha_ratio",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("double")
          / length(col("text")))
      .filter(col("n_tokens") >= 20 && col("alpha_ratio") >= 0.5)
    val fp = q.withColumn("fp", fingerprint(col("text")))
    val canon = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    // cached: pruneNearDups scans survivors twice (shingle build + the
    // anti-join probe side) — without this the scan/tokenize/quality/
    // dedup subtree executes twice
    val survivors = fp
      .join(canon.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "text", "n_tokens")
      .cache()
    graft.operators.MinHashDedup.pruneNearDups(survivors, 0.7)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs: 4×15-bit chunk banding generates candidates
    * (EXACT for hamming ≤ 3 — three flipped bits cannot touch all four
    * chunks, so every qualifying pair shares a chunk), then popcount-of-xor
    * verification. The SimHash counterpart of the MinHash-LSH pipeline:
    * same shape — band equi-join, never all-pairs. */
  val docSimhashNearDup = OracleQuery(
    "d09_doc_neardup_simhash",
    s"""WITH h AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(generate_series(0, 59), b ->
       |      CASE WHEN 2 * list_sum(list_transform(hs, x -> (x >> b) & 1)) > len(hs)
       |           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS sh
       |  FROM (SELECT doc_id,
       |          list_transform($tokSql,
       |            t -> ('0x' || substring(md5(t), 1, 15))::BIGINT) AS hs
       |        FROM documents) t),
       |chunks AS (
       |  SELECT doc_id, sh, c AS chunk_idx,
       |    (sh >> (c * 15)) & 32767 AS chunk_val
       |  FROM h, generate_series(0, 3) g(c)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, x.sh AS sha, y.doc_id AS doc_b, y.sh AS shb
       |  FROM chunks x JOIN chunks y
       |    ON x.chunk_idx = y.chunk_idx AND x.chunk_val = y.chunk_val
       |      AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sha, shb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(sha, shb)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val h = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("hs", transform(col("toks"), t => hash60(t)))
      .select(col("doc_id"), simhash60(col("hs")).as("sh"))
      .cache() // scanned by both sides of the chunk self-join
    val chunks = h.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk_idx"),
          shiftright(col("sh"), c * 15).bitwiseAND(lit(32767L)).as("chunk_val"))): _*))
        .as("ch"))
      .select(col("doc_id"), col("sh"),
        col("ch.chunk_idx").as("chunk_idx"), col("ch.chunk_val").as("chunk_val"))
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx")
          && col("x.chunk_val") === col("y.chunk_val")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.sh").as("sha"),
        col("y.doc_id").as("doc_b"), col("y.sh").as("shb"))
      .distinct()
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** EXACT n-gram Jaccard near-dup pairs via rarest-first prefix filtering
    * ([[graft.operators.JaccardJoin]]) — the lossless tier above MinHash
    * (d07 can miss a pair whose bands all differ; this cannot). The oracle
    * is an exhaustive inverted-index ground truth: every pair sharing any
    * shingle gets its true Jaccard (pairs sharing none have J = 0 < t), so
    * a single missed candidate in the Spark prefix filter hash-mismatches. */
  /** Exhaustive n-gram Jaccard pair CTEs ending in `jpairs(doc_a, doc_b,
    * jac)` — shared by d10 (pair listing), d13 (cluster collapse), and the
    * recall evaluations. `rel` is the (doc_id, text) relation to read —
    * `documents` by default, a sampled CTE for d38s. */
  private def ngramPairCtes(threshold: Double, rel: String = "documents"): String =
    s"""t AS (SELECT doc_id, $tokSql AS toks FROM $rel),
       |sh AS MATERIALIZED (SELECT doc_id, ${shingleSql("toks")} AS s FROM t),
       |e AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg
       |      FROM sh WHERE len(s) > 0),
       |i AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter,
       |    any_value(x.sz) AS sza, any_value(y.sz) AS szb
       |  FROM e x JOIN e y ON x.sg = y.sg AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |jpairs AS (
       |  SELECT doc_a, doc_b,
       |    CAST(inter AS DOUBLE) / (sza + szb - inter) AS jac
       |  FROM i
       |  WHERE CAST(inter AS DOUBLE) / (sza + szb - inter) >= $threshold)""".stripMargin

  val docNgramJaccard = OracleQuery(
    "d10_doc_neardup_ngram_jaccard",
    s"""WITH ${ngramPairCtes(0.8)}
       |SELECT doc_a, doc_b, round(jac, 4) AS jaccard
       |FROM jpairs ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    graft.operators.JaccardJoin.exactPairs(Tables.documents(s, d), 0.8)
      .orderBy("doc_a", "doc_b")
  }

  /** Sliding-window document chunking — the split step a training pipeline
    * applies before tokenization/packing: 40-token chunks on a 30-token
    * stride (10-token overlap), one output row per chunk with its token
    * count and content fingerprint. Engine-side end to end: the chunk list
    * is built with sequence+transform+slice and exploded — no UDF, no
    * driver loop, scales as one narrow pass over the corpus. */
  val docChunking = OracleQuery(
    "d11_doc_chunking",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |f AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
       |c AS (
       |  SELECT doc_id, n,
       |    unnest([{'idx': i - 1,
       |             'txt': array_to_string(toks[(i-1)*30+1 : (i-1)*30+40], ' ')}
       |            for i in generate_series(1, CAST(floor((n-1)/30.0) AS BIGINT) + 1)])
       |      AS ch
       |  FROM f)
       |SELECT doc_id, CAST(ch.idx AS INT) AS chunk_idx,
       |  CAST(least(40, n - ch.idx*30) AS INT) AS n_chunk_toks,
       |  md5(ch.txt) AS chunk_fp
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), size(col("toks")).as("n"),
        posexplode(transform(
          sequence(lit(0L), floor((size(col("toks")) - 1) / lit(30))),
          i => concat_ws(" ", slice(col("toks"), (i * 30 + 1).cast("int"), lit(40)))))
          .as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        least(lit(40), col("n") - col("chunk_idx") * 30).cast("int").as("n_chunk_toks"),
        md5(col("chunk_text").cast("binary")).as("chunk_fp"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** TF-IDF top terms per document — the classic relevance weighting as a
    * two-aggregation pipeline: term frequency per (doc, term), document
    * frequency per term, score = tf · ln((N+1)/(df+1)). Ranking uses the
    * ROUNDED score (plus term tie-break) so a last-ulp ln() difference
    * between engines' libm cannot flip the ordering; the EMITTED columns
    * are the exact integer inputs (tf, df, n_docs) — both engines compute
    * those identically, whereas the ln-product itself can differ in the
    * last ulp and flip a 4-dp rounding boundary. */
  val docTfIdf = OracleQuery(
    "d12_doc_tfidf_top_terms",
    s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |s AS (
       |  SELECT doc_id, term, tf, df, n_docs,
       |    round(tf * ln((n_docs + 1.0) / (df + 1.0)), 4) AS tfidf
       |  FROM tf JOIN df USING (term), n),
       |r AS (
       |  SELECT doc_id, term, tf, df, n_docs,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY tfidf DESC, term) AS rnk
       |  FROM s)
       |SELECT doc_id, CAST(rnk AS INT) AS rnk, term,
       |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       |  CAST(n_docs AS BIGINT) AS n_docs
       |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val t = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = t.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = t.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"),
        col("tf"), col("df"), col("n_docs"))
      .orderBy("doc_id", "rnk")
  }

  /** Near-dup CLUSTERS: the pair list (d10) collapsed into connected
    * components ([[graft.operators.ConnectedComponents]]) so chains A~B~C
    * form one cluster with the min doc_id as canonical representative —
    * what a production dedup actually keeps. The oracle walks the same
    * graph with a recursive CTE (transitive closure + min label). */
  val docDedupClusters = OracleQuery(
    "d13_doc_dedup_clusters",
    s"""WITH RECURSIVE ${ngramPairCtes(0.8)},
       |nodes AS (
       |  SELECT DISTINCT id FROM (
       |    SELECT doc_a AS id FROM jpairs
       |    UNION ALL SELECT doc_b FROM jpairs)),
       |edges2 AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
       |  UNION SELECT doc_b, doc_a FROM jpairs),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges2 e ON e.src = r.id),
       |comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id
       |         FROM reach GROUP BY 1)
       |SELECT doc_id, cluster_id,
       |  CAST(count(*) OVER (PARTITION BY cluster_id) AS INT) AS n_members
       |FROM comp ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pairs = graft.operators.JaccardJoin
      .exactPairs(Tables.documents(s, d), 0.8)
      .select(col("doc_a"), col("doc_b"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    graft.operators.ConnectedComponents.components(pairs, "doc_a", "doc_b")
      .withColumn("n_members", count(lit(1)).over(w).cast("int"))
      .select(col("id").as("doc_id"), col("cluster_id"), col("n_members"))
      .orderBy("doc_id")
  }

  /** Token packing offsets — GPT-style pretraining packing concatenates
    * the corpus in a fixed document order and slices fixed-length training
    * sequences (docs straddle sequence boundaries). This computes each
    * document's global token offset range and the 512-token sequences it
    * lands in. The global running offset comes from the two-pass
    * distributed prefix sum ([[graft.operators.PrefixSum]]) — a bare
    * `Window.orderBy` with no partition key would funnel the corpus
    * through one reducer; here only the per-partition totals (one row per
    * partition) see a global window. */
  val docTokenPacking = OracleQuery(
    "d14_doc_token_packing",
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len($tokSql) AS BIGINT) AS n_toks FROM documents),
       |o AS (
       |  SELECT doc_id, n_toks,
       |    sum(n_toks) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
       |  FROM t)
       |SELECT doc_id, n_toks,
       |  CAST(coalesce(prev, 0) AS BIGINT) AS start_offset,
       |  CAST(coalesce(prev, 0) // 512 AS BIGINT) AS first_seq,
       |  CAST((coalesce(prev, 0) + n_toks - 1) // 512 AS BIGINT) AS last_seq
       |FROM o WHERE n_toks > 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val counts = Tables.documents(s, d)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_toks"))
    graft.operators.PrefixSum
      .exclusivePrefixSum(counts, "doc_id", "n_toks", "start_offset")
      .filter(col("n_toks") > 0)
      .select(col("doc_id"), col("n_toks"), col("start_offset"),
        expr("start_offset div 512").as("first_seq"),
        expr("(start_offset + n_toks - 1) div 512").as("last_seq"))
      .orderBy("doc_id")
  }

  /** Sequence PACKING ASSIGNMENTS — d14's offsets materialized into the
    * actual training-batch layout: each document's token span intersects
    * the fixed 512-token sequence grid, emitting one row per (sequence,
    * document) overlap with the in-sequence start position and token
    * count. This is the last step of "greedy-concat" packing (the GPT-2/
    * T5 recipe): a data loader can read WHERE seq_id = s and reconstruct
    * sequence s exactly.
    *
    * Scale: PrefixSum's two-pass cumsum (never a single-reducer window) +
    * a per-row bounded explode (spans/512 + 1 sequences per doc) — no
    * additional shuffle; output rows = n_docs + total_tokens/512. */
  val docSeqPacking = OracleQuery(
    "d33_doc_seq_packing",
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len($tokSql) AS BIGINT) AS n_toks FROM documents),
       |o AS (
       |  SELECT doc_id, n_toks,
       |    CAST(coalesce(sum(n_toks) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS start_offset
       |  FROM t),
       |a AS (
       |  SELECT doc_id, n_toks, start_offset,
       |    start_offset // 512 AS first_seq,
       |    (start_offset + n_toks - 1) // 512 AS last_seq
       |  FROM o WHERE n_toks > 0),
       |s AS (
       |  SELECT a.*, a.first_seq + k AS s
       |  FROM a, generate_series(0, 63) g(k)
       |  WHERE a.first_seq + k <= a.last_seq)
       |SELECT CAST(s AS BIGINT) AS seq_id, doc_id,
       |  CAST(greatest(start_offset, s * 512) - s * 512 AS BIGINT)
       |    AS seq_start_tok,
       |  CAST(least(start_offset + n_toks, (s + 1) * 512)
       |       - greatest(start_offset, s * 512) AS BIGINT) AS n_toks_in_seq
       |FROM s
       |ORDER BY seq_id, doc_id""".stripMargin) { (s, d) =>
    val counts = Tables.documents(s, d)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_toks"))
      .localCheckpoint() // scanned twice by the prefix sum
    val offsets = graft.operators.PrefixSum
      .exclusivePrefixSum(counts, "doc_id", "n_toks", "start_offset")
      .filter(col("n_toks") > 0)
      .withColumn("first_seq", expr("start_offset div 512"))
      .withColumn("last_seq", expr("(start_offset + n_toks - 1) div 512"))
      .localCheckpoint() // scanned by the span guard and the explode
    // the ORACLE unrolls each doc's sequence span with generate_series(0,
    // 63): a doc intersecting >64 grid sequences would overflow that unroll
    // and flip the row red with no hint the oracle (not the engine) is
    // short — fail loudly instead (1-row aggregate, the d36 pattern). The
    // bound is on the ACTUAL span, not n_toks: a misaligned 32258-token doc
    // (start_offset % 512 != 0) intersects 65 sequences even though
    // n_toks < 64*512.
    val maxSpan = offsets.agg(max(col("last_seq") - col("first_seq"))).collect()(0)
    require(maxSpan.isNullAt(0) || maxSpan.getLong(0) <= 63L,
      s"d33: oracle's 64-sequence unroll covers spans of <= 64 sequences, " +
        s"got a doc spanning ${maxSpan.get(0)} + 1")
    offsets
      .select(col("doc_id"), col("n_toks"), col("start_offset"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .select(col("seq_id"), col("doc_id"),
        (greatest(col("start_offset"), col("seq_id") * 512)
          - col("seq_id") * 512).as("seq_start_tok"),
        (least(col("start_offset") + col("n_toks"), (col("seq_id") + 1) * 512)
          - greatest(col("start_offset"), col("seq_id") * 512)).as("n_toks_in_seq"))
      .orderBy("seq_id", "doc_id")
  }

  /** Edit-distance near-dup verification over SKETCH-BLOCKED candidates:
    * pairs whose 60-bit SimHashes collide in at least one 15-bit chunk
    * (d09's candidate generator) and whose lowercased 60-char prefixes are
    * within Levenshtein distance 15. This is the shape edit-distance dedup
    * takes at scale — the O(len²) DP is a verification metric on sketch
    * candidates, never a primary pair generator: naive length-band
    * blocking left 1.6M DP calls at sf0.1 (257 s measured; cheap exact
    * bounds like char-histogram L1 barely prune when docs share a
    * vocabulary), while chunk collisions leave a few hundred. */
  val docEditDistance = OracleQuery(
    "d15_doc_neardup_editdist",
    s"""WITH h AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(generate_series(0, 59), b ->
       |      CASE WHEN 2 * list_sum(list_transform(hs, x -> (x >> b) & 1)) > len(hs)
       |           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS sh
       |  FROM (SELECT doc_id,
       |          list_transform($tokSql,
       |            t -> ('0x' || substring(md5(t), 1, 15))::BIGINT) AS hs
       |        FROM documents) t),
       |chunks AS (
       |  SELECT doc_id, c AS chunk_idx, (sh >> (c * 15)) & 32767 AS chunk_val
       |  FROM h, generate_series(0, 3) g(c)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM chunks x JOIN chunks y
       |    ON x.chunk_idx = y.chunk_idx AND x.chunk_val = y.chunk_val
       |      AND x.doc_id < y.doc_id),
       |p AS (SELECT doc_id, lower(substring(text, 1, 60)) AS pfx FROM documents)
       |SELECT doc_a, doc_b,
       |  CAST(levenshtein(pa.pfx, pb.pfx) AS INT) AS edit_dist
       |FROM cand
       |JOIN p pa ON pa.doc_id = doc_a
       |JOIN p pb ON pb.doc_id = doc_b
       |WHERE levenshtein(pa.pfx, pb.pfx) <= 15
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    // materialized once: the chunk self-join reads h on both sides (a lazy
    // plan would run the tokenize+simhash pass twice)
    val h = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("hs", transform(col("toks"), t => hash60(t)))
      .select(col("doc_id"), simhash60(col("hs")).as("sh"))
      .localCheckpoint()
    val chunks = h.select(col("doc_id"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk_idx"),
          shiftright(col("sh"), c * 15).bitwiseAND(lit(32767L)).as("chunk_val"))): _*))
        .as("ch"))
      .select(col("doc_id"),
        col("ch.chunk_idx").as("chunk_idx"), col("ch.chunk_val").as("chunk_val"))
    val cand = chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx")
          && col("x.chunk_val") === col("y.chunk_val")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val p = Tables.documents(s, d)
      .select(col("doc_id"), lower(substring(col("text"), 1, 60)).as("pfx"))
    cand
      .join(p.select(col("doc_id").as("doc_a"), col("pfx").as("pa")), Seq("doc_a"))
      .join(p.select(col("doc_id").as("doc_b"), col("pfx").as("pb")), Seq("doc_b"))
      // thresholded levenshtein runs the banded O(len·k) DP with early
      // exit instead of the full O(len²) table — identical distances for
      // every kept row (-1 marks only the pairs the filter drops anyway);
      // ~4× less DP work across the ~50 candidates per document
      .withColumn("edit_dist", levenshtein(col("pa"), col("pb"), 15))
      .filter(col("edit_dist") >= 0)
      .select("doc_a", "doc_b", "edit_dist")
      .orderBy("doc_a", "doc_b")
  }

  /** Deterministic train/eval/test split — the held-out partitioning every
    * training pipeline needs: hash the DOCUMENT ID (never random()) into
    * 100 buckets, buckets <80 train / <90 eval / rest test. Content- and
    * run-independent: any engine, any partitioning, any day produces the
    * same split, and a re-run after appending new docs never reassigns an
    * old one. Emits the per-(lang, split) census so stratification drift
    * is visible. */
  val docTrainSplit = OracleQuery(
    "d16_doc_train_split",
    """WITH b AS (
      |  SELECT doc_id, lang,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100
      |      AS bucket
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN bucket < 80 THEN 'train'
      |         WHEN bucket < 90 THEN 'eval'
      |         ELSE 'test' END AS split
      |  FROM b)
      |SELECT lang, split, count(*) AS n_docs,
      |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val bucket =
      expr("conv(substring(md5(cast(doc_id as string)), 1, 7), 16, 10)")
        .cast("long") % 100
    Tables.documents(s, d)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "eval").otherwise("test"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"), max(col("doc_id")).as("max_doc_id"))
      .orderBy("lang", "split")
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS) — rolling-
    * hash document fingerprinting: hash every ORDERED token 4-gram, slide a
    * 5-gram window over the hash sequence, keep each window's minimum; the
    * distinct minima are the document's fingerprint set. Guarantees any
    * shared run of ≥ 8 tokens between two documents shares a fingerprint,
    * at ~2/(w+1) the storage of full shingling. One narrow pass: the gram
    * hashes are materialized as a projection column before the window
    * transform (HOF lambda bodies get no CSE — recomputing md5s per window
    * element would multiply the hash work by w). */
  val docWinnowing = OracleQuery(
    "d17_doc_winnowing_fp",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
       |     for i in generate_series(1, len(toks) - 3)] AS grams
       |  FROM t WHERE len(toks) >= 8),
       |h AS (
       |  SELECT doc_id,
       |    list_transform(grams,
       |      x -> ('0x' || substring(md5(x), 1, 15))::BIGINT) AS hs
       |  FROM g),
       |w AS (
       |  SELECT doc_id,
       |    list_distinct([list_min(hs[i : i+4])
       |                   for i in generate_series(1, len(hs) - 4)]) AS fps
       |  FROM h)
       |SELECT doc_id, CAST(len(fps) AS INT) AS n_fps,
       |  CAST(list_min(fps) AS BIGINT) AS min_fp,
       |  CAST(list_max(fps) AS BIGINT) AS max_fp
       |FROM w ORDER BY doc_id""".stripMargin) { (s, d) =>
    val k = 4 // gram size
    val w = 5 // window of consecutive gram hashes
    val t = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= k + w - 1)
    // ordered grams, then their hashes, each materialized as its own
    // projection so the window transform reads an array column
    t.withColumn("grams", orderedGrams(col("toks"), k))
      .withColumn("hs", transform(col("grams"), x => hash60(x)))
      .withColumn("fps", winnowFingerprints(col("hs"), w))
      .select(col("doc_id"), size(col("fps")).as("n_fps"),
        array_min(col("fps")).as("min_fp"), array_max(col("fps")).as("max_fp"))
      .orderBy("doc_id")
  }

  /** Repetition metrics (Gopher/C4-style quality filters): the fraction of
    * duplicated word 3-grams and the most-frequent-token share — the two
    * signals that catch boilerplate/degenerate text that length and
    * stopword ratios miss. Pure ratios of exact integer counts, so the
    * divide is the same IEEE operation in both engines. */
  val docRepetition = OracleQuery(
    "d18_doc_repetition",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |f AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 3),
       |g AS (
       |  SELECT doc_id, n, n - 2 AS total3,
       |    len(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
       |                       for i in generate_series(1, n - 2)])) AS distinct3
       |  FROM f),
       |tf AS (
       |  SELECT doc_id, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM f)
       |  GROUP BY doc_id, term),
       |mx AS (SELECT doc_id, max(tf) AS max_tf FROM tf GROUP BY 1)
       |SELECT g.doc_id, CAST(g.n AS INT) AS n_tokens,
       |  round(1.0 - CAST(distinct3 AS DOUBLE) / total3, 4) AS dup_3gram_frac,
       |  round(CAST(max_tf AS DOUBLE) / g.n, 4) AS top_tok_frac
       |FROM g JOIN mx ON mx.doc_id = g.doc_id
       |ORDER BY g.doc_id""".stripMargin) { (s, d) =>
    val f = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 3)
    // shingles() already dedupes (first-occurrence order), so its size IS
    // the distinct-3-gram count
    val g = f.select(col("doc_id"), size(col("toks")).as("n"),
      size(shingles(col("toks"), 3)).as("distinct3"))
    val mx = f.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id").agg(max(col("tf")).as("max_tf"))
    g.join(mx, Seq("doc_id"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        round(lit(1.0) - col("distinct3").cast("double") / (col("n") - 2), 4)
          .as("dup_3gram_frac"),
        round(col("max_tf").cast("double") / col("n"), 4).as("top_tok_frac"))
      .orderBy("doc_id")
  }

  /** Vocabulary build + OOV rate — the tokenizer-vocab step of a training
    * pipeline: the corpus-global top-50 terms (count desc, term asc — a
    * deterministic total order) form the vocabulary; each document reports
    * its out-of-vocabulary token fraction. The vocab is a two-level
    * aggregate + broadcast semi-join probe: at 100 TB the vocab build is
    * one shuffle on term and the probe side never shuffles. */
  val docOovRate = OracleQuery(
    "d19_doc_vocab_oov",
    s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       |gc AS (SELECT term, count(*) AS c FROM t GROUP BY 1),
       |v AS (
       |  SELECT term FROM (
       |    SELECT term, row_number() OVER (ORDER BY c DESC, term) AS r
       |    FROM gc) WHERE r <= 50),
       |p AS (
       |  SELECT t.doc_id,
       |    count(*) AS n_tokens,
       |    count(*) FILTER (WHERE v.term IS NULL) AS n_oov
       |  FROM t LEFT JOIN v ON t.term = v.term
       |  GROUP BY 1)
       |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       |  CAST(n_oov AS INT) AS n_oov,
       |  round(CAST(n_oov AS DOUBLE) / n_tokens, 4) AS oov_frac
       |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    // top-50 via orderBy+limit = TakeOrderedAndProject over the term-count
    // aggregate (k-row heaps per partition), not a global-window sort
    val vocab = t.groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term"))
      .limit(50)
      .select(col("term"), lit(true).as("in_vocab"))
    t.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
        col("n_oov").cast("int").as("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 4).as("oov_frac"))
      .orderBy("doc_id")
  }

  /** Benchmark-contamination screen — the eval-set decontamination step of
    * a training pipeline: a deterministic held-out "benchmark" slice
    * (doc_id ≡ 0 mod 40) contributes its distinct word-4-gram set; every
    * training document reports how many of its distinct 4-grams appear in
    * that set (docs with zero overlap are clean and don't appear).
    *
    * Scale: the benchmark gram set is tiny relative to the corpus (eval
    * sets are thousands of docs, the corpus is billions), so the overlap
    * probe is a BROADCAST semi-join — the corpus side streams through map
    * tasks, no shuffle of the training grams. */
  val docContamination = OracleQuery(
    "d20_contamination_screen",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |g AS (SELECT doc_id,
       |    list_distinct(CASE WHEN len(toks) >= 4
       |      THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
       |            for i in generate_series(1, len(toks) - 3)]
       |      ELSE CAST([] AS VARCHAR[]) END) AS grams
       |  FROM t),
       |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
       |bench AS (SELECT DISTINCT gram FROM e WHERE doc_id % 40 = 0),
       |hits AS (
       |  SELECT e.doc_id, count(*) AS shared
       |  FROM e JOIN bench USING (gram)
       |  WHERE e.doc_id % 40 <> 0
       |  GROUP BY e.doc_id)
       |SELECT doc_id, CAST(shared AS INT) AS n_shared_grams
       |FROM hits ORDER BY doc_id""".stripMargin) { (s, d) =>
    val grams = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), explode(shingles(col("toks"), 4)).as("gram"))
    val bench = grams.filter(col("doc_id") % 40 === 0).select("gram").distinct()
    grams.filter(col("doc_id") % 40 =!= 0)
      .join(broadcast(bench), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_shared_grams"))
      .orderBy("doc_id")
  }

  /** BM25 retrieval — the classic probabilistic ranking function over the
    * corpus for a fixed 3-term query, as the retrieval counterpart of d12's
    * TF-IDF weighting: score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b +
    * b·dl/avgdl)) with k1=1.2, b=0.75 and the always-positive idf
    * ln(1 + (N−df+0.5)/(df+0.5)). One narrow aggregation computes per-doc
    * length and per-term tfs (map-side combined); corpus stats (N, avgdl,
    * dfs) are ONE broadcast scalar row — no per-term shuffle join, which is
    * the shape that survives a 100-TB corpus with a fixed query. Ranking
    * follows the d12 determinism rule: order by the ROUNDED score (4 dp,
    * doc_id tie-break) so a last-ulp ln() divergence can't flip ranks, and
    * the emitted columns are the exact integer inputs (dl, per-term tfs);
    * the top-k is orderBy+limit (TakeOrderedAndProject), never a global
    * row_number over the corpus. Both engines evaluate the identical
    * left-to-right float expression, so the rounded score itself is also
    * emitted safely. */
  val docBm25 = OracleQuery(
    "d25_bm25_retrieval",
    s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       |f AS (
       |  SELECT doc_id, count(*) AS dl,
       |    sum(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS tf_spark,
       |    sum(CASE WHEN term = 'shuffle' THEN 1 ELSE 0 END) AS tf_shuffle,
       |    sum(CASE WHEN term = 'stream' THEN 1 ELSE 0 END) AS tf_stream
       |  FROM t GROUP BY 1),
       |g AS (
       |  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
       |    sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
       |    sum(CASE WHEN tf_shuffle > 0 THEN 1 ELSE 0 END) AS df_shuffle,
       |    sum(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) AS df_stream
       |  FROM f),
       |s AS (
       |  SELECT doc_id, dl, tf_spark, tf_shuffle, tf_stream,
       |    round(
       |      ln(1.0 + (n_docs - df_spark + 0.5) / (df_spark + 0.5))
       |        * (tf_spark * 2.2) / (tf_spark + 1.2 * (0.25 + 0.75 * dl / avgdl))
       |      + ln(1.0 + (n_docs - df_shuffle + 0.5) / (df_shuffle + 0.5))
       |        * (tf_shuffle * 2.2) / (tf_shuffle + 1.2 * (0.25 + 0.75 * dl / avgdl))
       |      + ln(1.0 + (n_docs - df_stream + 0.5) / (df_stream + 0.5))
       |        * (tf_stream * 2.2) / (tf_stream + 1.2 * (0.25 + 0.75 * dl / avgdl)),
       |      4) AS score
       |  FROM f, g
       |  WHERE tf_spark + tf_shuffle + tf_stream > 0),
       |r AS (
       |  SELECT doc_id, dl, tf_spark, tf_shuffle, tf_stream, score,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
       |  FROM s)
       |SELECT CAST(rnk AS INT) AS rnk, doc_id, CAST(dl AS BIGINT) AS dl,
       |  CAST(tf_spark AS BIGINT) AS tf_spark,
       |  CAST(tf_shuffle AS BIGINT) AS tf_shuffle,
       |  CAST(tf_stream AS BIGINT) AS tf_stream, score
       |FROM r WHERE rnk <= 10 ORDER BY rnk""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.Column
    val t = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    def tfOf(term: String): Column =
      sum(when(col("term") === term, 1).otherwise(0))
    val f = t.groupBy("doc_id").agg(
      count(lit(1)).as("dl"), tfOf("spark").as("tf_spark"),
      tfOf("shuffle").as("tf_shuffle"), tfOf("stream").as("tf_stream"))
    val g = f.agg(
      count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"),
      sum(when(col("tf_spark") > 0, 1).otherwise(0)).as("df_spark"),
      sum(when(col("tf_shuffle") > 0, 1).otherwise(0)).as("df_shuffle"),
      sum(when(col("tf_stream") > 0, 1).otherwise(0)).as("df_stream"))
    // identical left-to-right float chain as the oracle SQL — same IEEE ops
    // in the same order on the same exact-integer inputs
    def part(tf: Column, df: Column): Column =
      log(lit(1.0) + (col("n_docs") - df + 0.5) / (df + 0.5)) *
        (tf * 2.2) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    f.crossJoin(broadcast(g))
      .filter(col("tf_spark") + col("tf_shuffle") + col("tf_stream") > 0)
      .withColumn("score", round(
        part(col("tf_spark"), col("df_spark"))
          + part(col("tf_shuffle"), col("df_shuffle"))
          + part(col("tf_stream"), col("df_stream")), 4))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))).cast("int"))
      .select(col("rnk"), col("doc_id"), col("dl"),
        col("tf_spark"), col("tf_shuffle"), col("tf_stream"), col("score"))
      .orderBy("rnk")
  }

  /** Cross-document repeated-span census (the substring-dedup signal of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): every ordered token 5-gram is counted across DISTINCT
    * documents; positions whose gram recurs in ≥ 2 docs are duplicated
    * spans. Per doc: total gram positions, duplicated positions, and the
    * duplicated fraction — the removal mask a substring-level dedup would
    * apply. Scale shape: one shuffle keyed by gram for the distinct-doc
    * count (map-side combined), one equi-join back (a hot gram is its own
    * skew bound: a gram can appear at most once per (doc, position), and
    * the flagged set is the duplicated minority). Exact ratios of integer
    * counts per the d18 determinism rule. */
  val docRepeatedSpans = OracleQuery(
    "d26_doc_repeated_spans",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
       |     toks[i+3] || ' ' || toks[i+4]
       |     for i in generate_series(1, len(toks) - 4)] AS grams
       |  FROM t WHERE len(toks) >= 5),
       |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
       |hot AS (
       |  SELECT gram FROM (
       |    SELECT gram, count(DISTINCT doc_id) AS nd FROM e GROUP BY 1)
       |  WHERE nd >= 2),
       |p AS (
       |  SELECT e.doc_id, count(*) AS n_grams,
       |    sum(CASE WHEN hot.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
       |  FROM e LEFT JOIN hot ON e.gram = hot.gram
       |  GROUP BY 1)
       |SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
       |  CAST(n_dup AS INT) AS n_dup,
       |  round(CAST(n_dup AS DOUBLE) / n_grams, 4) AS dup_span_frac
       |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    val grams = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), explode(orderedGrams(col("toks"), 5)).as("gram"))
    val hot = grams.select("doc_id", "gram").distinct()
      .groupBy("gram").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select("gram")
    grams.join(hot.withColumn("is_hot", lit(1)), Seq("gram"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("is_hot").isNotNull, 1).otherwise(0)).as("n_dup"))
      .select(col("doc_id"), col("n_grams").cast("int").as("n_grams"),
        col("n_dup").cast("int").as("n_dup"),
        round(col("n_dup").cast("double") / col("n_grams"), 4)
          .as("dup_span_frac"))
      .orderBy("doc_id")
  }

  /** Repeated-span REMOVAL — the excision step of Lee et al.'s substring
    * dedup that d26 only marks: every token position covered by a hot
    * 5-gram (one recurring in ≥ 2 distinct docs) is dropped, and the
    * surviving tokens re-join into the cleaned text, emitted per doc with
    * its removal counts. The hash gate covers the FULL cleaned string (the
    * d39 pattern), so a one-token-off span boundary fails the round.
    *
    * Scale shape: d26's gram-keyed shuffle + equi-join back, plus one
    * explode of matched spans into (doc, position) coverage — coverage is
    * bounded by 5 × duplicated-gram occurrences (the minority), the
    * anti-join is doc-partition-local after the shuffle, and the rebuild
    * is one sort_array per doc. No driver-side text handling. */
  val docRepeatedSpanRemoval = OracleQuery(
    "d41_repeated_span_removal",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS tok,
       |          unnest([i for i in generate_series(1, len(toks))]) AS pos
       |        FROM t),
       |g AS (
       |  SELECT doc_id,
       |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
       |     toks[i+3] || ' ' || toks[i+4]
       |     for i in generate_series(1, len(toks) - 4)] AS grams
       |  FROM t WHERE len(toks) >= 5),
       |e AS (SELECT doc_id, unnest(grams) AS gram,
       |        unnest([i for i in generate_series(1, len(grams))]) AS gpos
       |      FROM g),
       |hot AS (
       |  SELECT gram FROM (
       |    SELECT gram, count(DISTINCT doc_id) AS nd FROM e GROUP BY 1)
       |  WHERE nd >= 2),
       |cov AS (SELECT DISTINCT doc_id, pos FROM (
       |  SELECT e.doc_id, unnest([e.gpos + k for k in generate_series(0, 4)]) AS pos
       |  FROM e JOIN hot USING (gram))),
       |keep AS (
       |  SELECT tok.doc_id, tok.pos, tok.tok
       |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
       |  WHERE cov.pos IS NULL),
       |a AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
       |  FROM keep GROUP BY 1)
       |SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_toks,
       |  CAST(len(t.toks) - coalesce(a.n_kept, 0) AS INT) AS n_removed,
       |  coalesce(a.cleaned_text, '') AS cleaned_text
       |FROM t LEFT JOIN a ON t.doc_id = a.doc_id
       |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).withColumn("toks", tokens(col("text")))
    val tok = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))
    val grams = docs.filter(size(col("toks")) >= 5)
      .select(col("doc_id"),
        posexplode(orderedGrams(col("toks"), 5)).as(Seq("gpos0", "gram")))
    val hot = grams.select("doc_id", "gram").distinct()
      .groupBy("gram").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select("gram")
    // each hot-gram occurrence covers positions gpos..gpos+4 (1-based)
    val cov = grams.join(hot, Seq("gram"))
      .select(col("doc_id"),
        explode(sequence(col("gpos0") + 1, col("gpos0") + 5)).as("pos"))
      .distinct()
    val agg = tok.join(cov, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("cleaned_text"))
    docs.select(col("doc_id"), size(col("toks")).as("n_toks"))
      .join(agg, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_toks").cast("int").as("n_toks"),
        (col("n_toks") - coalesce(col("n_kept"), lit(0L))).cast("int")
          .as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
      .orderBy("doc_id")
  }

  /** BPE tokenizer-training merge discovery ([[graft.operators.BpeMerges]]):
    * three supersteps of count-adjacent-pairs → pick-most-frequent →
    * apply-merge over the first 120 chars of each doc (bounded per-row
    * work, the d15 prefix convention). Emits each superstep's top-5 pair
    * census; rank 1 is the merge that was applied. The oracle unrolls the
    * identical three iterations as chained CTEs — the chosen pair feeds
    * the next level's `replace` as a scalar subquery, with merged symbols
    * written as the same chr(1)/chr(2)/chr(3) sentinels. Tie-break is
    * (count desc, pair asc) in both dialects, so the learned merges are
    * bit-identical. */
  val docBpeMerges = OracleQuery(
    "d27_bpe_merges", {
      def lvl(i: Int, src: String): String =
        s"""p$i AS (
           |  SELECT unnest([substr(t, j, 2)
           |                 for j in generate_series(1, length(t) - 1)]) AS pair
           |  FROM $src WHERE length(t) >= 2),
           |a$i AS (SELECT pair, count(*) AS cnt FROM p$i GROUP BY 1),
           |r$i AS (SELECT $i AS iter, pair, cnt,
           |  CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT) AS rnk
           |  FROM a$i)""".stripMargin
      s"""WITH c0 AS (
         |  SELECT doc_id, substr(lower(text), 1, 120) AS t FROM documents),
         |${lvl(1, "c0")},
         |c1 AS (SELECT doc_id,
         |  replace(t, (SELECT pair FROM r1 WHERE rnk = 1), chr(1)) AS t
         |  FROM c0),
         |${lvl(2, "c1")},
         |c2 AS (SELECT doc_id,
         |  replace(t, (SELECT pair FROM r2 WHERE rnk = 1), chr(2)) AS t
         |  FROM c1),
         |${lvl(3, "c2")}
         |SELECT iter, rnk, pair, cnt FROM (
         |  SELECT * FROM r1 WHERE rnk <= 5
         |  UNION ALL SELECT * FROM r2 WHERE rnk <= 5
         |  UNION ALL SELECT * FROM r3 WHERE rnk <= 5)
         |ORDER BY iter, rnk""".stripMargin
    }) { (s, d) =>
    val corpus = Tables.documents(s, d)
      .select(col("doc_id"), substring(lower(col("text")), 1, 120).as("t"))
    graft.operators.BpeMerges.learn(s, corpus, "t", k = 3, keep = 5)
      .orderBy("iter", "rnk")
  }

  /** Incremental (delta-vs-index) near-dup screening
    * ([[graft.operators.MinHashDedup.incrementalMatches]]) — the daily-
    * ingest production shape: the "new batch" (doc_id % 10 = 7 stands in
    * for today's ingest) is checked against the existing corpus WITHOUT
    * re-pairing the corpus with itself. Band keys of the delta equi-join
    * the corpus band table on (band, bucket); at 100 TB the corpus side
    * is the LSH index materialized once and only probed, so daily cost
    * scales with the delta, not the corpus. Per delta doc: whether a
    * verified near-dup exists in the corpus, the canonical (lowest-id)
    * match, and that match's exact Jaccard. */
  val docIncrementalNearDup = OracleQuery(
    "d29_incremental_neardup",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |$minhashBandCtes,
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y ON x.b = y.b AND x.bh = y.bh
       |  WHERE x.doc_id % 10 = 7 AND y.doc_id % 10 <> 7),
       |verify AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |      / len(list_distinct(list_concat(sa.s, sb.s))) AS jac
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = doc_a
       |  JOIN sh sb ON sb.doc_id = doc_b),
       |hit AS (SELECT doc_a, min(doc_b) AS match_id
       |        FROM verify WHERE jac >= 0.7 GROUP BY 1),
       |j AS (SELECT hit.doc_a, hit.match_id, round(v.jac, 4) AS jaccard
       |      FROM hit JOIN verify v
       |        ON v.doc_a = hit.doc_a AND v.doc_b = hit.match_id)
       |SELECT d.doc_id, j.match_id IS NOT NULL AS is_dup,
       |  j.match_id, j.jaccard
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
       |LEFT JOIN j ON d.doc_id = j.doc_a
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val delta = docs.filter(col("doc_id") % 10 === 7)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val pairs = graft.operators.MinHashDedup
      .incrementalMatches(delta, corpus, 0.7)
    val hit = pairs.groupBy("doc_a").agg(min(col("doc_b")).as("match_id"))
    val j = hit.join(pairs.withColumnRenamed("doc_b", "match_id"),
      Seq("doc_a", "match_id"))
    delta.select(col("doc_id"))
      .join(j.withColumnRenamed("doc_a", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("match_id").isNotNull.as("is_dup"),
        col("match_id"), col("jaccard"))
      .orderBy("doc_id")
  }

  // ---- d35 hybrid retrieval (RRF fusion) -----------------------------
  /** Hybrid sparse+dense retrieval fused with reciprocal rank fusion
    * (Cormack/Clarke/Buettcher 2009) — the two-tower retrieval shape every
    * RAG/data-selection stack runs: for each seed document, rank the rest
    * of the corpus lexically (token-set Jaccard — the sparse tower) and
    * semantically (embedding cosine — the dense tower; the synthetic
    * corpus aligns embeddings.vec_id with documents.doc_id), then fuse
    * with RRF(60): score = 1/(60+r_dense) + 1/(60+r_sparse), top-10.
    * Rank fusion needs no score calibration between towers — exactly why
    * production hybrid search uses it — and makes the whole pipeline
    * hash-checkable: ranks are integers, the fused score is two exact
    * IEEE divisions and one add.
    *
    * Scale: the seed side is tiny and broadcast everywhere; corpus-side
    * work is one tokenize pass + one token equi-join (sparse) and one
    * v04-shape broadcast cosine scan (dense); each tower's rank is a
    * per-seed window over its |seeds|·N score rows. No all-pairs joins. */
  val docHybridRrf = OracleQuery(
    "d35_hybrid_rrf",
    s"""WITH t AS (
       |  SELECT doc_id, list_distinct($tokSql) AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |sz AS (SELECT doc_id, len(toks) AS n FROM t),
       |pairs AS (
       |  SELECT s.doc_id AS seed_id, c.doc_id AS cand_id
       |  FROM documents s JOIN documents c ON c.doc_id <> s.doc_id
       |  WHERE s.doc_id < 3),
       |inter AS (
       |  SELECT a.doc_id AS seed_id, b.doc_id AS cand_id, count(*) AS i
       |  FROM tok a JOIN tok b ON a.tok = b.tok
       |  WHERE a.doc_id < 3 AND b.doc_id <> a.doc_id
       |  GROUP BY 1, 2),
       |sr AS (
       |  SELECT seed_id, cand_id,
       |    row_number() OVER (PARTITION BY seed_id
       |                       ORDER BY jsim DESC, cand_id) AS rs
       |  FROM (
       |    SELECT p.seed_id, p.cand_id,
       |      CAST(coalesce(i.i, 0) AS DOUBLE)
       |        / (ss.n + sc.n - coalesce(i.i, 0)) AS jsim
       |    FROM pairs p
       |    JOIN sz ss ON ss.doc_id = p.seed_id
       |    JOIN sz sc ON sc.doc_id = p.cand_id
       |    LEFT JOIN inter i
       |      ON i.seed_id = p.seed_id AND i.cand_id = p.cand_id)),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
       |  FROM (SELECT vec_id,
       |          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |        FROM embeddings)),
       |dr AS (
       |  SELECT seed_id, cand_id,
       |    row_number() OVER (PARTITION BY seed_id
       |                       ORDER BY csim DESC, cand_id) AS rd
       |  FROM (
       |    SELECT q.vec_id AS seed_id, c.vec_id AS cand_id,
       |      list_sum(list_transform(list_zip(q.v, c.v), x -> x[1]*x[2]))
       |        / (q.nrm * c.nrm) AS csim
       |    FROM n q JOIN n c ON q.vec_id < 3 AND c.vec_id <> q.vec_id)),
       |f AS (
       |  SELECT sr.seed_id, sr.cand_id, dr.rd, sr.rs,
       |    CAST(1 AS DOUBLE) / (60 + dr.rd) + CAST(1 AS DOUBLE) / (60 + sr.rs)
       |      AS rrf
       |  FROM sr JOIN dr
       |    ON dr.seed_id = sr.seed_id AND dr.cand_id = sr.cand_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY seed_id
       |                                   ORDER BY rrf DESC, cand_id) AS rnk
       |      FROM f)
       |SELECT seed_id, cand_id, CAST(rd AS INT) AS dense_rnk,
       |  CAST(rs AS INT) AS sparse_rnk, round(rrf, 6) AS rrf_score,
       |  CAST(rnk AS INT) AS rnk
       |FROM r WHERE rnk <= 10 ORDER BY seed_id, rnk""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val t = Tables.documents(s, d)
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
    val sz = t.select(col("doc_id"), size(col("toks")).as("n"))
    val tok = t.select(col("doc_id"), explode(col("toks")).as("tok"))
    val seeds = Tables.documents(s, d).filter(col("doc_id") < 3)
      .select(col("doc_id").as("seed_id"))
    val pairs = broadcast(seeds)
      .crossJoin(Tables.documents(s, d).select(col("doc_id").as("cand_id")))
      .filter(col("cand_id") =!= col("seed_id"))
    val seedTok = tok.filter(col("doc_id") < 3)
      .select(col("doc_id").as("seed_id"), col("tok"))
    val inter = broadcast(seedTok)
      .join(tok.select(col("doc_id").as("cand_id"), col("tok")), Seq("tok"))
      .filter(col("cand_id") =!= col("seed_id"))
      .groupBy("seed_id", "cand_id").agg(count(lit(1)).as("i"))
    val wS = Window.partitionBy("seed_id").orderBy(col("jsim").desc, col("cand_id"))
    val sr = pairs
      .join(broadcast(sz.select(col("doc_id").as("seed_id"), col("n").as("sn"))),
        Seq("seed_id"))
      .join(sz.select(col("doc_id").as("cand_id"), col("n").as("cn")), Seq("cand_id"))
      .join(inter, Seq("seed_id", "cand_id"), "left_outer")
      .withColumn("jsim",
        coalesce(col("i"), lit(0L)).cast("double")
          / (col("sn") + col("cn") - coalesce(col("i"), lit(0L))))
      .withColumn("rs", row_number().over(wS))
      .select("seed_id", "cand_id", "rs")
    val n = Tables.embeddings(s, d)
      .select(col("vec_id"), graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", graft.functions.VectorFunctions.l2Norm(col("v")))
    val q = n.filter(col("vec_id") < 3)
      .select(col("vec_id").as("seed_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = n.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
    val wD = Window.partitionBy("seed_id").orderBy(col("csim").desc, col("cand_id"))
    val dr = broadcast(q).join(c, col("cand_id") =!= col("seed_id"))
      .withColumn("csim",
        graft.functions.VectorFunctions.dot(col("qv"), col("cv"))
          / (col("qn") * col("cn")))
      .withColumn("rd", row_number().over(wD))
      .select("seed_id", "cand_id", "rd")
    val wF = Window.partitionBy("seed_id").orderBy(col("rrf").desc, col("cand_id"))
    sr.join(dr, Seq("seed_id", "cand_id"))
      .withColumn("rrf",
        lit(1.0) / (lit(60) + col("rd")) + lit(1.0) / (lit(60) + col("rs")))
      .withColumn("rnk", row_number().over(wF))
      .filter(col("rnk") <= 10)
      .select(col("seed_id"), col("cand_id"), col("rd").cast("int").as("dense_rnk"),
        col("rs").cast("int").as("sparse_rnk"), round(col("rrf"), 6).as("rrf_score"),
        col("rnk").cast("int").as("rnk"))
      .orderBy("seed_id", "rnk")
  }

  // ---- d36 length-bucketed batching ----------------------------------
  /** Padding-waste census for length-bucketed batching — the measurement
    * behind every dynamic-batching / bucketed-sampler decision in a
    * training loader: batch the corpus 32 docs at a time (a) in arrival
    * order and (b) sorted by token length, pad each batch to its max
    * length, and report padded tokens, waste, and efficiency per strategy.
    * Length-sorting is the standard fix (near-uniform lengths per batch ⇒
    * minimal padding); this quantifies exactly what it buys on this corpus.
    *
    * Batch assignment is rank DIV 32 where rank comes from
    * [[graft.operators.PrefixSum]] over ones — the d14 two-pass
    * distributed cumsum, NOT a single-reducer `Window.orderBy` (the
    * sorted tower's rank key is the composite n_toks·2^33 + doc_id, unique
    * and overflow-safe: n_toks < 2^20 and doc_id < 2^33 keep it under
    * 2^53). Everything emitted is integer arithmetic except the final
    * efficiency ratio (one exact IEEE division).
    *
    * Scale: one tokenize pass materialized as a 2-long-per-doc mini table,
    * two prefix-sum passes (keyed windows + a #buckets-row global window),
    * two hash aggregates on batch id. No global sort of the corpus. */
  val docLengthBatching = OracleQuery(
    "d36_length_batching",
    s"""WITH t AS (
       |  SELECT doc_id, len($tokSql) AS n_toks FROM documents),
       |nv AS (SELECT n_toks,
       |    CAST((row_number() OVER (ORDER BY doc_id) - 1) // 32 AS BIGINT)
       |      AS batch
       |  FROM t),
       |sv AS (SELECT n_toks,
       |    CAST((row_number() OVER (ORDER BY n_toks, doc_id) - 1) // 32 AS BIGINT)
       |      AS batch
       |  FROM t),
       |agg AS (
       |  SELECT 'arrival' AS strategy, batch, count(*) AS c, max(n_toks) AS m,
       |    sum(n_toks) AS s
       |  FROM nv GROUP BY 2
       |  UNION ALL
       |  SELECT 'length_sorted', batch, count(*), max(n_toks), sum(n_toks)
       |  FROM sv GROUP BY 2)
       |SELECT strategy, CAST(count(*) AS BIGINT) AS n_batches,
       |  CAST(sum(c) AS BIGINT) AS n_docs,
       |  CAST(sum(s) AS BIGINT) AS total_tokens,
       |  CAST(sum(m * c) AS BIGINT) AS padded_tokens,
       |  CAST(sum(m * c) - sum(s) AS BIGINT) AS pad_waste,
       |  round(CAST(sum(s) AS DOUBLE) / sum(m * c), 4) AS efficiency
       |FROM agg GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import graft.operators.PrefixSum
    val t = Tables.documents(s, d)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_toks"))
      .localCheckpoint() // prefix-sum makes two passes per tower; pin the
                         // tokenize so it runs once, not four times
    // the packed sort key is only order-equivalent to (n_toks, doc_id)
    // within these bounds — enforce them rather than trusting a comment
    // (1-row aggregate over the pinned mini table, the PrefixSum pattern)
    val bounds = t.agg(max(col("doc_id")), max(col("n_toks"))).collect()(0)
    require(bounds.isNullAt(0) ||
        (bounds.getLong(0) < (1L << 33) && bounds.getLong(1) < (1L << 20)),
      s"d36: composite sort key needs doc_id < 2^33 and n_toks < 2^20, " +
        s"got max doc_id ${bounds.get(0)} / max n_toks ${bounds.get(1)}")
    def batches(df: org.apache.spark.sql.DataFrame, orderCol: String) =
      PrefixSum.exclusivePrefixSum(df.withColumn("one", lit(1L)), orderCol, "one", "rk")
        .withColumn("batch", expr("rk DIV 32"))
        .groupBy("batch")
        .agg(count(lit(1)).as("c"), max(col("n_toks")).as("m"),
          sum(col("n_toks")).as("s"))
    val nv = batches(t, "doc_id").withColumn("strategy", lit("arrival"))
    val sv = batches(
      t.withColumn("skey", col("n_toks") * lit(8589934592L) + col("doc_id")),
      "skey").withColumn("strategy", lit("length_sorted"))
    nv.unionByName(sv)
      .groupBy("strategy")
      .agg(count(lit(1)).as("n_batches"), sum(col("c")).as("n_docs"),
        sum(col("s")).as("total_tokens"),
        sum(col("m") * col("c")).as("padded_tokens"),
        (sum(col("m") * col("c")) - sum(col("s"))).as("pad_waste"),
        round(sum(col("s")).cast("double") / sum(col("m") * col("c")), 4)
          .as("efficiency"))
      .orderBy("strategy")
  }

  // ---- d38 LSH recall evaluation -------------------------------------
  /** Recall of MinHash-LSH near-dup detection against lossless ground
    * truth, banded by similarity — the dedup counterpart of v10's ANN
    * recall harness and the number every LSH deployment must publish
    * (banding theory promises recall that RISES with similarity; this
    * measures it): ground truth is the PPJoin exact-Jaccard join at the
    * same threshold/shingle definition (prefix-filtered — lossless
    * without going quadratic, which is what makes exact ground truth
    * computable at scale at all), candidates are d07's band-bucket
    * pipeline; both sides are already-verified registered operators.
    * Banding applies to the ROUNDED jaccard in both engines (v03 trick).
    *
    * Precision is 1.0 by construction (LSH candidates are exact-verified
    * before thresholding), so the eval reports the one number banding can
    * lose: recall. */
  /** The d38 evaluation SQL over `rel` (a (doc_id, text) relation),
    * optionally preceded by `prelude` CTE definitions. With empty prelude
    * and rel = documents this is byte-identical to the original d38 SQL. */
  private def lshRecallEvalSql(prelude: String, rel: String): String = {
    // minhashPairCtes opens with `sh AS (...)` — identical to the sh the
    // ngram CTEs already define (same tokSql + shingleSql) — so compose
    // by stripping that one duplicate CTE rather than renaming the chain
    val shCte = s"sh AS MATERIALIZED (SELECT doc_id, ${shingleSql("toks")} AS s FROM t),\n"
    require(minhashPairCtes.startsWith(shCte),
      "d38: minhash CTE chain no longer opens with the shared sh CTE")
    val minhashTail = minhashPairCtes.stripPrefix(shCte)
    s"""WITH $prelude${ngramPairCtes(0.7, rel)},
       |$minhashTail,
       |found AS (SELECT doc_a, doc_b FROM verify WHERE jac >= 0.7),
       |tb AS (
       |  SELECT CASE WHEN round(tr.jac, 4) >= 0.9 THEN '0.90-1.00'
       |              WHEN round(tr.jac, 4) >= 0.8 THEN '0.80-0.90'
       |              ELSE '0.70-0.80' END AS sim_band,
       |    CASE WHEN f.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM jpairs tr LEFT JOIN found f
       |    ON f.doc_a = tr.doc_a AND f.doc_b = tr.doc_b),
       |b AS (
       |  SELECT sim_band, count(*) AS n_true,
       |    CAST(sum(hit) AS BIGINT) AS n_found
       |  FROM tb GROUP BY 1
       |  UNION ALL
       |  SELECT 'all', count(*), CAST(sum(hit) AS BIGINT) FROM tb)
       |SELECT sim_band, CAST(n_true AS BIGINT) AS n_true, n_found,
       |  round(CAST(n_found AS DOUBLE) / n_true, 4) AS recall
       |FROM b ORDER BY sim_band""".stripMargin
  }

  val docLshRecallEval = OracleQuery(
    "d38_lsh_recall_eval", lshRecallEvalSql("", "documents")) { (s, d) =>
    lshRecallEval(s, d, groundTruthSampleRate = 1.0)
  }

  /** d38 at the 100 TB-REALISTIC cost: the lossless PPJoin ground truth is
    * super-linear in corpus size, so the registered production form runs
    * the whole evaluation over a deterministic 25 % md5-bucket sub-corpus
    * (both sides see the same sample universe — RecallSamplingSpec pins
    * the sub-population semantics). Benched alongside d38 so the recorded
    * series reflects the estimator a 100 TB deployment would actually run,
    * not just the rate-1.0 stress shape. */
  val docLshRecallEvalSampled = OracleQuery(
    "d38s_lsh_recall_eval_sampled",
    lshRecallEvalSql(
      """docs_s AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
        |        % 100 < 25),
        |""".stripMargin,
      "docs_s")) { (s, d) => lshRecallEval(s, d, groundTruthSampleRate = 0.25) }

  /** d38's engine, parameterized by a DETERMINISTIC ground-truth sample
    * rate — the 100 TB form of the evaluation: the exact PPJoin side is
    * lossless but still super-linear in corpus size, so at scale the
    * recall estimate runs over an md5-bucketed sub-corpus (the d16 split
    * machinery: hash the doc ID, keep buckets < rate×100 — content- and
    * run-independent, so the sample is reproducible across engines and
    * reruns). Both sides restrict to the SAME sample, so the measured
    * number is LSH recall on a uniform sub-population — an unbiased
    * estimator of corpus recall. rate = 1.0 (the registered query's
    * setting) bypasses the filter entirely: the plan, and therefore the
    * oracle hash, is identical to the unparameterized form. */
  private[queries] def lshRecallEval(s: org.apache.spark.sql.SparkSession,
                                     d: String,
                                     groundTruthSampleRate: Double)
      : org.apache.spark.sql.DataFrame = {
    require(groundTruthSampleRate > 0.0 && groundTruthSampleRate <= 1.0,
      s"sample rate must be in (0, 1], got $groundTruthSampleRate")
    val docsAll = Tables.documents(s, d)
    val docs =
      if (groundTruthSampleRate >= 1.0) docsAll
      else {
        val bucket =
          expr("conv(substring(md5(cast(doc_id as string)), 1, 7), 16, 10)")
            .cast("long") % 100
        docsAll.filter(bucket < math.round(groundTruthSampleRate * 100))
      }
    val truth = graft.operators.JaccardJoin.exactPairs(docs, 0.7)
    val found = graft.operators.MinHashDedup.verifiedPairs(docs, 0.7)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("hit"))
    val tb = truth.join(found, Seq("doc_a", "doc_b"), "left_outer")
      .select(
        when(col("jaccard") >= 0.9, "0.90-1.00")
          .when(col("jaccard") >= 0.8, "0.80-0.90")
          .otherwise("0.70-0.80").as("sim_band"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .localCheckpoint() // tiny (near-dup pairs); scanned by both rollup arms
    val banded = tb.groupBy("sim_band")
      .agg(count(lit(1)).as("n_true"), sum(col("hit")).as("n_found"))
    val total = tb.agg(count(lit(1)).as("n_true"), sum(col("hit")).as("n_found"))
      .select(lit("all").as("sim_band"), col("n_true"), col("n_found"))
    banded.unionByName(total)
      .select(col("sim_band"), col("n_true"), col("n_found"),
        round(col("n_found").cast("double") / col("n_true"), 4).as("recall"))
      .orderBy("sim_band")
  }

  // ---- d39 BPE segmentation (tokenizer APPLICATION) ------------------
  /** Apply BPE merges to the vocabulary — the tokenizer-application step
    * that pairs with d27's merge DISCOVERY: count character-pair
    * frequencies over the word vocabulary (weighted by word frequency,
    * the real BPE statistic), rank the top 8 merges, and greedily apply
    * them in priority order to the 200 most frequent words. Application
    * is the textbook algorithm: the word becomes a symbol string with
    * every symbol wrapped in TAB delimiters ("\ta\t\tb\t…" — a tab can
    * never occur inside a symbol because tokens are split on whitespace),
    * and each merge rewrites its "\ta\t\tb\t" occurrences left-to-right
    * non-overlapping via literal string replace. The tab wrapping makes
    * replace EQUAL symbol-level greedy merging: every match anchors to
    * whole symbols — no match can start inside a previously merged
    * symbol (a space-separated encoding would match "h e" inside
    * "th e"), and adjacent matches share no characters ("a a a a" under
    * rule (a,a) correctly yields [aa, aa]). Delimiters strip to spaces
    * on emission; the segmentation string itself is hash-gated, not
    * just the subword counts.
    *
    * The merge table reaches the rewrite WITHOUT a driver collect: the 8
    * ranked rules pivot into ONE row that cross-joins (broadcast) onto
    * the word table, and the replace chain reads them as columns — the
    * oracle reads the same 8 rules through scalar subqueries.
    *
    * Scale: pair counting is one narrow aggregation over vocab×(len-1)
    * rows; both the rule table (8 rows) and the segmented output (top-k
    * words) are TakeOrdered-bounded; the corpus is scanned once. */
  val docBpeSegmentation = OracleQuery(
    "d39_bpe_segmentation", {
      def ruleSql(i: Int, arg: String) =
        s"replace($arg, (SELECT sp FROM r WHERE rnk = $i), (SELECT jn FROM r WHERE rnk = $i))"
      val chain = (1 to 8).foldLeft("spaced")((acc, i) => ruleSql(i, acc))
      // tab-delimited symbols stripped back to spaces on emission
      val display = s"replace(replace($chain, chr(9) || chr(9), ' '), chr(9), '')"
      s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
         |w AS (SELECT word, count(*) AS cnt
         |      FROM (SELECT unnest(toks) AS word FROM t)
         |      WHERE length(word) >= 1 GROUP BY 1),
         |p AS (
         |  SELECT pair, sum(cnt) AS wcnt FROM (
         |    SELECT unnest([substring(word, i, 2)
         |                   for i in generate_series(1, length(word) - 1)]) AS pair,
         |      cnt
         |    FROM w WHERE length(word) >= 2)
         |  GROUP BY 1),
         |r AS (
         |  SELECT chr(9) || substring(pair, 1, 1) || chr(9) || chr(9)
         |      || substring(pair, 2, 1) || chr(9) AS sp,
         |    chr(9) || pair || chr(9) AS jn, rnk
         |  FROM (SELECT pair, row_number() OVER (ORDER BY wcnt DESC, pair) AS rnk
         |        FROM p) WHERE rnk <= 8),
         |top AS (
         |  SELECT word, cnt FROM w
         |  ORDER BY cnt DESC, word LIMIT 200),
         |enc AS (
         |  SELECT word, cnt,
         |    chr(9) || array_to_string([substring(word, i, 1)
         |                     for i in generate_series(1, length(word))],
         |                    chr(9) || chr(9)) || chr(9)
         |      AS spaced
         |  FROM top)
         |SELECT word, cnt, $display AS segmented,
         |  CAST(len(string_split($display, ' ')) AS INT) AS n_subwords
         |FROM enc ORDER BY word""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds pair counting AND the top-word slice
    val p = w.filter(length(col("word")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"), col("cnt"))
      .groupBy("pair").agg(sum(col("cnt")).as("wcnt"))
    val tab = lit("\t")
    val r = p.orderBy(col("wcnt").desc, col("pair")).limit(8)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("wcnt").desc, col("pair"))))
      .select(col("rnk"),
        concat(tab, substring(col("pair"), 1, 1), tab, tab,
          substring(col("pair"), 2, 1), tab).as("sp"),
        concat(tab, col("pair"), tab).as("jn"))
    // pivot the 8 rules into one broadcastable row of (sp_i, jn_i) columns
    val ruleCols = (1 to 8).flatMap(i => Seq(
      max(when(col("rnk") === i, col("sp"))).as(s"sp_$i"),
      max(when(col("rnk") === i, col("jn"))).as(s"jn_$i")))
    val ruleRow = r.agg(ruleCols.head, ruleCols.tail: _*)
    val top = w.orderBy(col("cnt").desc, col("word")).limit(200)
    val spaced = concat(tab,
      concat_ws("\t\t", transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1)))), tab)
    // SQL-function `replace` (LITERAL, left-to-right non-overlapping —
    // DuckDB's replace semantics exactly); regexp_replace would
    // reinterpret punctuation in a pair as a metacharacter
    val seg = (1 to 8).foldLeft(spaced)((acc, i) =>
      replace(acc, col(s"sp_$i"), col(s"jn_$i")))
    val display = replace(replace(seg, lit("\t\t"), lit(" ")), tab, lit(""))
    top.crossJoin(broadcast(ruleRow))
      .withColumn("segmented", display)
      .select(col("word"), col("cnt"), col("segmented"),
        size(split(col("segmented"), " ")).as("n_subwords"))
      .orderBy("word")
  }

  // ---- d40 cross-source duplication matrix ---------------------------
  /** Cross-source duplication matrix — the corpus-provenance question
    * behind every multi-source training mix ("is corpus A copied into
    * corpus B, and how much of B would dedup drop?"): take the verified
    * MinHash near-dup pairs (the d07 pipeline, same threshold) and roll
    * them up by unordered source pair, counting both the pair volume and
    * the distinct documents dedup would prune (doc_b, the
    * higher-id/pruned side of each pair). The diagonal is within-source
    * redundancy; off-diagonal cells are cross-source leakage.
    *
    * Scale: everything downstream of the (already-banded) pair pipeline
    * is two broadcast-joinable source lookups and one tiny rollup —
    * near-dup pairs are sparse by construction. */
  val docCrossSourceDup = OracleQuery(
    "d40_cross_source_dup_matrix",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |$minhashPairCtes,
       |pairs AS (SELECT doc_a, doc_b FROM verify WHERE jac >= 0.7),
       |lab AS (
       |  SELECT least(da.source, db.source) AS source_a,
       |    greatest(da.source, db.source) AS source_b, p.doc_b
       |  FROM pairs p
       |  JOIN documents da ON da.doc_id = p.doc_a
       |  JOIN documents db ON db.doc_id = p.doc_b)
       |SELECT source_a, source_b, count(*) AS n_pairs,
       |  CAST(count(DISTINCT doc_b) AS BIGINT) AS n_pruned_docs
       |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val src = docs.select(col("doc_id"), col("source"))
    graft.operators.MinHashDedup.verifiedPairs(docs, 0.7)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"), col("doc_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_b")).as("n_pruned_docs"))
      .orderBy("source_a", "source_b")
  }

  // ---- d42 deterministic epoch shuffle / shard plan ------------------
  /** Deterministic per-epoch shuffle + training-shard assignment — the
    * data-ordering contract of a large-scale training run: every epoch
    * needs a DIFFERENT but fully reproducible global permutation of the
    * corpus, materialized as N shard files each holding its documents in
    * final read order. Seeding a per-(doc, epoch) md5 gives both levels
    * from one hash — shard = prefix bucket (pure hash partitioning: no
    * global sort, any worker can route any doc), within-shard position =
    * rank of the full digest (d16's split machinery, extended to an
    * ordering). The census gates the whole permutation, not just counts:
    * `order_sig` folds every (position × doc_id) product, so two engines
    * agree only if every document landed at the same position of the same
    * shard in both epochs.
    *
    * Scale: one shuffle per epoch on (epoch, shard) — shard count scales
    * with cluster width, the window sort is per-shard local, and no stage
    * ever sees a global ordering. Re-sharding 100 TB per epoch is exactly
    * this plan with the census replaced by a partitioned write. */
  val docEpochShards = OracleQuery(
    "d42_epoch_shard_plan",
    """WITH p AS (
      |  SELECT d.doc_id, d.n_chars, v.epoch,
      |    md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(v.epoch AS VARCHAR))
      |      AS perm
      |  FROM documents d, (VALUES (0), (1)) v(epoch)),
      |s AS (
      |  SELECT *, CAST(('0x' || substring(perm, 1, 7))::BIGINT % 8 AS INT)
      |    AS shard
      |  FROM p),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY epoch, shard
      |                               ORDER BY perm, doc_id) AS pos
      |  FROM s)
      |SELECT epoch, shard, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min_by(doc_id, perm) AS head_doc, max_by(doc_id, perm) AS tail_doc,
      |  CAST(sum(pos * doc_id % 1000000007) AS BIGINT) AS order_sig
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("perm"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        explode(array(lit(0), lit(1))).as("epoch"))
      .withColumn("perm",
        expr("md5(cast(doc_id as string) || ':' || cast(epoch as string))"))
      .withColumn("shard",
        expr("cast(conv(substring(perm, 1, 7), 16, 10) as bigint) % 8")
          .cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min_by(col("doc_id"), col("perm")).as("head_doc"),
        max_by(col("doc_id"), col("perm")).as("tail_doc"),
        sum(col("pos") * col("doc_id") % 1000000007L).as("order_sig"))
      .orderBy("epoch", "shard")
  }

  /** Quality-aware dedup survivor selection — the production completion of
    * d13's cluster collapse: a real pipeline does not keep the MIN doc_id
    * of each near-dup cluster, it keeps the BEST member (longest /
    * highest-quality) and drops the rest. Per cluster, the survivor is the
    * member with the most tokens, doc_id ascending as the deterministic
    * tie-break; every clustered doc is emitted with its verdict so the
    * drop set is auditable.
    *
    * Scale: the cluster graph is pair-sized (orders of magnitude smaller
    * than the corpus — only docs with a ≥0.8 near-dup edge appear), so the
    * per-cluster window sorts tiny groups; the quality join keys on doc_id
    * (the same hash partitioning the components output already has). */
  val docDedupSurvivors = OracleQuery(
    "d43_doc_dedup_survivors",
    s"""WITH RECURSIVE ${ngramPairCtes(0.8)},
       |nodes AS (
       |  SELECT DISTINCT id FROM (
       |    SELECT doc_a AS id FROM jpairs
       |    UNION ALL SELECT doc_b FROM jpairs)),
       |edges2 AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
       |  UNION SELECT doc_b, doc_a FROM jpairs),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges2 e ON e.src = r.id),
       |comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id
       |         FROM reach GROUP BY 1),
       |q AS (SELECT doc_id, len($tokSql) AS n_tokens FROM documents),
       |m AS (SELECT c.doc_id, c.cluster_id, q.n_tokens
       |      FROM comp c JOIN q USING (doc_id)),
       |sv AS (
       |  SELECT *, first_value(doc_id) OVER (
       |      PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id)
       |    AS survivor_id
       |  FROM m)
       |SELECT doc_id, cluster_id, CAST(n_tokens AS INT) AS n_tokens,
       |  survivor_id, CAST(doc_id = survivor_id AS BOOLEAN) AS kept
       |FROM sv ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = graft.operators.JaccardJoin
      .exactPairs(docs, 0.8)
      .select(col("doc_a"), col("doc_b"))
    val comp = graft.operators.ConnectedComponents
      .components(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("cluster_id"))
    val bySurvivorRank = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("n_tokens").desc, col("doc_id"))
    // broadcast the pair-sized member set INTO the corpus scan, then
    // tokenize the survivors only — scoring before the join would pay a
    // full corpus tokenization pass for rows the join immediately drops
    docs.select(col("doc_id"), col("text"))
      .join(broadcast(comp), Seq("doc_id"))
      .withColumn("n_tokens", size(tokens(col("text"))))
      .drop("text")
      .withColumn("survivor_id", first(col("doc_id")).over(bySurvivorRank))
      .select(col("doc_id"), col("cluster_id"), col("n_tokens"),
        col("survivor_id"), (col("doc_id") === col("survivor_id")).as("kept"))
      .orderBy("doc_id")
  }

  /** Asymmetric n-gram CONTAINMENT near-dup — the quote/subset relation
    * Jaccard misses by construction (a short doc wholly inside a long one
    * has containment ≈ 1 but Jaccard ≈ |inner|/|outer|). Exact, via
    * rarest-first probe-prefix blocking against the full inverted index
    * ([[graft.operators.JaccardJoin.containmentPairs]]); the oracle scores
    * EVERY pair sharing at least one shingle exactly (inverted-index
    * intersection counts — a ≥0.9-containment pair must share shingles,
    * so nothing in range is missed), so this also certifies the blocking
    * is lossless at sf0.01. The earlier all-pairs nested-loop oracle was
    * result-identical but O(n²·|s|): 214 s at sf0.1 vs 2 s for this form,
    * which is what keeps full sf0.1 oracle sweeps practical. */
  val docContainment = OracleQuery(
    "d44_doc_containment",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |sh AS (SELECT doc_id, ${shingleSql("toks")} AS s FROM t),
       |nz AS (SELECT doc_id, s, len(s) AS sz FROM sh WHERE len(s) > 0),
       |ev AS (SELECT doc_id, sz, unnest(s) AS sg FROM nz),
       |ic AS (
       |  SELECT a.doc_id AS doc_inner, b.doc_id AS doc_outer,
       |    count(*) AS inter, any_value(a.sz) AS sza, any_value(b.sz) AS szb
       |  FROM ev a JOIN ev b ON a.sg = b.sg AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_inner, doc_outer,
       |  round(CAST(inter AS DOUBLE) / sza, 4) AS containment
       |FROM ic
       |WHERE szb >= sza * 0.9 AND CAST(inter AS DOUBLE) / sza >= 0.9
       |ORDER BY doc_inner, doc_outer""".stripMargin) { (s, d) =>
    graft.operators.JaccardJoin
      .containmentPairs(Tables.documents(s, d), 0.9)
      .orderBy("doc_inner", "doc_outer")
  }

  /** Unicode scrub — the canonicalization pass that must run BEFORE any
    * hashing/dedup operator: NFC-compose (é as e+combining-acute vs U+00E9
    * must fingerprint identically) and strip C0/DEL control characters
    * (keeping tab/newline/CR). The FULL scrubbed string is emitted, so the
    * driver hash-gates every byte of the result against DuckDB's
    * `nfc_normalize` — two independent UAX #15 implementations agreeing.
    * Native Catalyst expression ([[graft.expressions.NfcNormalize]], also
    * SQL-registered); the strip is builtin regexp_replace, so the whole
    * scrub is one zero-shuffle per-row projection. */
  val docUnicodeScrub = OracleQuery(
    "d45_doc_unicode_scrub",
    s"""SELECT doc_id,
       |  regexp_replace(nfc_normalize(text),
       |    '$CtrlClassSql', '', 'g') AS scrubbed,
       |  CAST(regexp_replace(nfc_normalize(text),
       |    '$CtrlClassSql', '', 'g') <> text AS BOOLEAN)
       |    AS changed,
       |  CAST(length(regexp_replace(nfc_normalize(text),
       |    '$CtrlClassSql', '', 'g')) AS INT)
       |    AS n_chars_scrubbed
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        regexp_replace(
          graft.expressions.TextExpressions.nfcNormalize(col("text")),
          CtrlClassSpark, "").as("scrubbed"))
      .select(col("doc_id"), col("scrubbed"),
        (col("scrubbed") =!= col("text")).as("changed"),
        length(col("scrubbed")).as("n_chars_scrubbed"))
      .orderBy("doc_id")
  }

  /** Longest repeated token span via a DISTRIBUTED SUFFIX ARRAY
    * ([[graft.operators.SuffixArray]], prefix doubling) — the
    * arbitrary-length exact-substring discovery of Lee et al.'s suffix-
    * array dedup path, which the fixed-n gram census (d26/d41) cannot
    * express: n must be chosen in advance there, while the suffix array
    * finds the true maximum (93 tokens on this corpus, vs the 5-gram
    * ceiling).
    *
    * Input is the exact-dedup survivor set (d05 canon semantics — the
    * pipeline position substring dedup actually occupies), so the answer
    * is the longest span shared by genuinely DISTINCT documents. The
    * suffix machinery derives the maximum adjacent-LCP length L AND the
    * occurrence set: a position starts a maximal span iff its lmax (max
    * adjacent LCP, the global max by the adjacency theorem) equals L —
    * so span text is built exactly n_occ times. The oracle enumerates
    * ALL O(n·len) spans, the Spark side runs the O(n log len)
    * algorithm, and the driver hash-compares the results: algorithm vs
    * ground truth, the d38 pattern.
    *
    * Scale shape: log2(longest doc) supersteps, each a distinct-key
    * aggregate + range-partitioned rank + keyed join back; the lookahead
    * is a (doc_id,pos)-keyed equi-join; L flows through a broadcast 1-row
    * aggregate (no driver collect); the census shuffles once on the span
    * key over n_occ rows. No all-pairs stage, no corpus-wide window, no
    * per-position span materialization. */
  val docSuffixLrs = OracleQuery(
    "d48_suffix_lrs",
    s"""WITH fpt AS (
       |  SELECT doc_id, text,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM documents),
       |canon AS (SELECT min(doc_id) AS doc_id FROM fpt GROUP BY fp),
       |sv AS (SELECT f.doc_id, f.text FROM fpt f JOIN canon c ON f.doc_id = c.doc_id),
       |t AS (SELECT doc_id, $tokSql AS toks FROM sv),
       |p1 AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS p FROM t),
       |p2 AS (SELECT doc_id, toks, p,
       |         unnest(generate_series(1, len(toks) - p + 1)) AS l FROM p1),
       |spans AS (SELECT doc_id, l,
       |            array_to_string(toks[p : p + l - 1], ' ') AS span FROM p2),
       |rep AS (SELECT span, l AS span_len, count(*) AS n_occ,
       |          count(DISTINCT doc_id) AS n_docs
       |        FROM spans GROUP BY 1, 2 HAVING count(*) >= 2),
       |mx AS (SELECT max(span_len) AS max_len FROM rep)
       |SELECT span, CAST(span_len AS INT) AS span_len,
       |  CAST(n_occ AS BIGINT) AS n_occ, CAST(n_docs AS BIGINT) AS n_docs
       |FROM rep, mx WHERE span_len = max_len ORDER BY span""".stripMargin) { (s, d) =>
    import graft.operators.SuffixArray
    // cached: scanned by the maxLen probe, every doubling superstep's
    // token base, the LCP compare, and the census
    val sv = canonSurvivorToks(Tables.documents(s, d)).cache()
    val (ranks, snaps, maxDocLen) = SuffixArray.suffixRanksWithSnapshots(sv)
    val sa = SuffixArray.saPositions(ranks)
    // short-doc corpora keep the bounded slice compare; a long-document
    // corpus (> LcpLiftThreshold tokens) flips to the binary-lifted LCP
    // so no single document can make the compare quadratic
    val lcp = SuffixArray.adjacentLcpAuto(sv, sa, snaps, maxDocLen)
      .localCheckpoint() // consumed twice: the L aggregate + the start mask
    val lrow = lcp
      .agg(max(col("lcp")).cast("int").as("max_len"))
      .filter(col("max_len") >= 1) // L = 0 → no repeat anywhere → no rows
    // The occurrence set comes from the SUFFIX ARRAY, not a sliding
    // window: a position starts a maximal repeated span iff its lmax
    // (max adjacent LCP on either side — the global max by the
    // adjacency theorem) equals L exactly. An earlier draft enumerated
    // every window of length L per document, which materializes
    // n_positions·L cells — at a 30,000-token maximal span over a
    // 100k-token document that is 2·10⁹ cells and 52 GB of spill
    // (measured, SCALE.md bigdoc run); the lmax filter touches only the
    // true occurrences, so span text is built n_occ times, never per
    // position.
    val cand = SuffixArray.repeatedSpanStarts(lcp, sa, minLen = 1)
      .crossJoin(broadcast(lrow))
      .filter(col("lmax") === col("max_len"))
    cand.join(sv, Seq("doc_id"))
      .select(col("doc_id"), col("max_len"),
        array_join(slice(col("toks"), col("pos"), col("max_len")), " ").as("span"))
      .groupBy("span", "max_len")
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_occ") >= 2)
      .select(col("span"), col("max_len").as("span_len"),
        col("n_occ"), col("n_docs"))
      .orderBy("span")
  }

  /** Suffix-array-driven EXACT-SUBSTRING DEDUP
    * ([[graft.operators.SuffixArray.removeRepeatedSpans]]) — the actual
    * Lee et al. §4.1 application the suffix machinery exists for, and the
    * arbitrary-length generalization of the fixed-n excision d41 runs:
    * every token covered by a span of ≥ 50 tokens occurring ≥ 2 times
    * corpus-wide (within-document repeats included — the self-plagiarism
    * case fixed-n census with DISTINCT-doc counting misses) is removed,
    * and the survivors re-join into cleaned text. Runs on the d05 canon
    * survivor set — the pipeline position substring dedup occupies (after
    * whole-document dedup, which would otherwise mark every token of
    * every duplicated document).
    *
    * The hash gate covers the FULL cleaned string (the d41/d39 pattern):
    * a one-token-off interval boundary, a missed within-doc repeat, or an
    * SA adjacency error changes `cleaned_text` and fails the round. The
    * oracle brute-forces the equivalent characterization — positions
    * covered by repeated ≥50-spans are exactly the positions covered by
    * repeated EXACTLY-50 windows (a sub-window of a repeated span is
    * repeated; a covered position lies in some 50-sub-window) — so the
    * O(n·50) window census is ground truth for the O(n log n) algorithm,
    * the d48 adjudication pattern.
    *
    * Scale shape: suffix ranks + adjacent LCP as in d48 (log₂(longest
    * doc) supersteps, lifted LCP beyond 1024-token docs), then the span
    * mask is ONE per-document window pass (running max of interval ends —
    * linear even when one repeated region spans most of a document,
    * where an explode of [pos, pos+lmax) rows would be quadratic), and
    * the text rebuild is the d41 per-doc collect. No all-pairs stage. */
  val docExactSubstringDedup = OracleQuery(
    "d51_exact_substring_dedup",
    s"""WITH fpt AS (
       |  SELECT doc_id, text,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM documents),
       |canon AS (SELECT min(doc_id) AS doc_id FROM fpt GROUP BY fp),
       |sv AS (SELECT f.doc_id, f.text FROM fpt f JOIN canon c ON f.doc_id = c.doc_id),
       |t AS (SELECT doc_id, $tokSql AS toks FROM sv),
       |p1 AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 49)) AS i
       |       FROM t WHERE len(toks) >= 50),
       |spans AS (SELECT doc_id, i, array_to_string(toks[i : i + 49], ' ') AS g
       |          FROM p1),
       |hot AS (SELECT g FROM spans GROUP BY g HAVING count(*) >= 2),
       |cov AS (SELECT DISTINCT s.doc_id, s.i + k AS pos
       |        FROM spans s JOIN hot USING (g), generate_series(0, 49) g2(k)),
       |tok AS (SELECT doc_id, unnest(toks) AS tok,
       |          unnest([i for i in generate_series(1, len(toks))]) AS pos
       |        FROM t),
       |keep AS (
       |  SELECT tok.doc_id, tok.pos, tok.tok
       |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
       |  WHERE cov.pos IS NULL),
       |a AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
       |  FROM keep GROUP BY 1)
       |SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_toks,
       |  CAST(len(t.toks) - coalesce(a.n_kept, 0) AS INT) AS n_removed,
       |  coalesce(a.cleaned_text, '') AS cleaned_text
       |FROM t LEFT JOIN a ON t.doc_id = a.doc_id
       |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    import graft.operators.SuffixArray
    // cached: the suffix machinery scans the survivor corpus once per
    // superstep plus the LCP compare, the mask pass, and the rebuild
    val sv = canonSurvivorToks(Tables.documents(s, d)).cache()
    val out = SuffixArray.removeRepeatedSpans(sv, minLen = 50)
      .orderBy("doc_id")
      .localCheckpoint()
    sv.unpersist()
    out
  }

  /** Suffix-array benchmark DECONTAMINATION
    * ([[graft.operators.SuffixArray.removeSharedSpans]]) — the
    * arbitrary-length generalization of d20's fixed-4-gram contamination
    * SCREEN, and the cross-set counterpart of d51's corpus-internal
    * substring dedup: using d20's deterministic benchmark split (doc_id ≡
    * 0 mod 40 = the held-out eval slice), every token of a TRAINING
    * document covered by a span of ≥ 13 tokens that also occurs in the
    * benchmark slice is removed, and the survivors re-join into cleaned
    * text. 13 tokens is the GPT-3 decontamination window; unlike that
    * fixed-n device the suffix array masks the FULL shared span whatever
    * its length (the exactly-13 interval mask is provably the same
    * cover: any covered position lies in some 13-sub-window of its
    * shared span, and a sub-window of a shared span is shared). Where
    * d20 reports "how contaminated", d53 emits the decontaminated corpus
    * itself — one row per training document, hash-gated on the full
    * cleaned string (the d51 pattern), so a one-token-off run boundary
    * or a missed bench suffix fails the round.
    *
    * Spark side: ONE suffix array over the union corpus (bench rides the
    * same ranking — no broadcast of bench grams, no second structure),
    * threshold-run ids via the balanced two-pass prefix count
    * ([[graft.operators.PrefixSum.exclusivePrefixSum]] over the dense
    * sa_pos grid — the only global window runs over #buckets rows), one
    * run-keyed bench-membership aggregate, then d51's linear
    * interval-union mask and per-doc rebuild. The oracle brute-forces
    * the window characterization (O(n·13) cells): hot = the bench
    * slice's distinct 13-windows, cover = train windows ∩ hot — ground
    * truth for the O(n log n) algorithm, the d48/d51 adjudication
    * pattern. */
  val docBenchDecontaminate = OracleQuery(
    "d53_bench_decontaminate",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |p1 AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 12)) AS i
       |       FROM t WHERE len(toks) >= 13),
       |w AS (SELECT doc_id, i, array_to_string(toks[i : i + 12], ' ') AS g
       |      FROM p1),
       |hot AS (SELECT DISTINCT g FROM w WHERE doc_id % 40 = 0),
       |cov AS (SELECT DISTINCT s.doc_id, s.i + k AS pos
       |        FROM w s JOIN hot USING (g), generate_series(0, 12) g2(k)
       |        WHERE s.doc_id % 40 <> 0),
       |tok AS (SELECT doc_id, unnest(toks) AS tok,
       |          unnest([i for i in generate_series(1, len(toks))]) AS pos
       |        FROM t WHERE doc_id % 40 <> 0),
       |keep AS (
       |  SELECT tok.doc_id, tok.pos, tok.tok
       |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
       |  WHERE cov.pos IS NULL),
       |a AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
       |  FROM keep GROUP BY 1)
       |SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_toks,
       |  CAST(len(t.toks) - coalesce(a.n_kept, 0) AS INT) AS n_removed,
       |  coalesce(a.cleaned_text, '') AS cleaned_text
       |FROM t LEFT JOIN a ON t.doc_id = a.doc_id
       |WHERE t.doc_id % 40 <> 0
       |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    import graft.operators.SuffixArray
    // cached: the suffix machinery scans the union corpus once per
    // superstep plus the LCP compare, the mask pass, and the rebuild
    val all = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .cache()
    val out = SuffixArray
      .removeSharedSpans(all, col("doc_id") % 40 === 0, minLen = 13)
      .orderBy("doc_id")
      .localCheckpoint()
    all.unpersist()
    out
  }

  /** Order-sensitive n-gram NOVELTY — the dedup-rate/curation-stream
    * curve: treating doc_id as ingestion order, a 5-gram position is
    * novel iff its gram first appears in THIS document (min doc_id over
    * the corpus). Per doc: gram positions, novel positions, novelty
    * fraction. This is what d26's symmetric duplication census cannot
    * express — d26 asks "is this span shared?", novelty asks "who paid
    * for it first?", the quantity a streaming curation pipeline tracks
    * to decide when a source is mined out.
    *
    * Scale shape: gram → min(doc_id) is one map-side-combined gram-keyed
    * shuffle; the join back reuses the gram partitioning; the per-doc
    * rollup is a doc-keyed aggregate. A hot gram is its own skew bound
    * (at most once per (doc, position)). */
  val docNovelty = OracleQuery(
    "d50_doc_novelty",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
       |     toks[i+3] || ' ' || toks[i+4]
       |     for i in generate_series(1, len(toks) - 4)] AS grams
       |  FROM t WHERE len(toks) >= 5),
       |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
       |fs AS (SELECT gram, min(doc_id) AS first_doc FROM e GROUP BY 1),
       |p AS (
       |  SELECT e.doc_id, count(*) AS n_grams,
       |    sum(CASE WHEN fs.first_doc = e.doc_id THEN 1 ELSE 0 END) AS n_novel
       |  FROM e JOIN fs USING (gram)
       |  GROUP BY 1)
       |SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
       |  CAST(n_novel AS INT) AS n_novel,
       |  round(CAST(n_novel AS DOUBLE) / n_grams, 4) AS novelty_frac
       |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    val grams = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), explode(orderedGrams(col("toks"), 5)).as("gram"))
    val firstSeen = grams.groupBy("gram").agg(min(col("doc_id")).as("first_doc"))
    grams.join(firstSeen, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1).otherwise(0))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams").cast("int").as("n_grams"),
        col("n_novel").cast("int").as("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 4)
          .as("novelty_frac"))
      .orderBy("doc_id")
  }

  val all: Seq[OracleQuery] = Seq(
    docTokenStats, docQuality, docLangId, docFingerprint,
    docExactDedup, docSimhash, docMinhashNearDup, docCorpusCuration,
    docSimhashNearDup, docNgramJaccard, docChunking, docTfIdf,
    docDedupClusters, docTokenPacking, docSeqPacking, docEditDistance,
    docTrainSplit, docWinnowing, docRepetition, docOovRate,
    docContamination, docBm25, docRepeatedSpans, docBpeMerges,
    docIncrementalNearDup, docHybridRrf, docLengthBatching, docLshRecallEval,
    docLshRecallEvalSampled,
    docBpeSegmentation, docCrossSourceDup, docRepeatedSpanRemoval,
    docEpochShards, docDedupSurvivors, docContainment, docUnicodeScrub,
    docSuffixLrs, docMinhashNearDupCapped, docNovelty,
    docExactSubstringDedup, docBenchDecontaminate)
}
