package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Corpus-curation operators layered on the `documents` table — the
  * second tier of the LLM-training-data surface (beyond d01–d20): PII
  * scrubbing, stratified corpus mixing, unigram-LM surprisal scoring, and
  * boilerplate n-gram pruning.
  *
  * Same determinism discipline as TextQueries: every emitted column is
  * either integer-exact or a rounded value of an identically-computed
  * double, so all four queries carry full DuckDB oracles. Surprisal in
  * particular uses the integer-exact form floor(log2(total/c)) =
  * length(bin(total div c)) - 1 rather than floating log, so per-doc sums
  * are order-independent (the round-2 d12 lesson).
  */
object CurationQueries {

  private val tokSql = """regexp_split_to_array(lower(text), '\s+')"""

  // ---- d21 PII scrub -------------------------------------------------
  // The test corpus contains no PII (letters + spaces only), so the query
  // first LACES deterministic synthetic PII into the text — md5-derived
  // emails / US-format phones / IPv4s, a pure function of doc_id that the
  // DuckDB oracle reproduces byte-for-byte (the x03 multimodal pattern) —
  // then runs the real detection + redaction pass over the laced text.
  // Detection and redaction are what ship; the lacing is test scaffolding.
  private[queries] val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[queries] val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private[queries] val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** The deterministic synthetic-PII lacing PREFIX as a SQL expression
    * (a pure function of doc_id — the caller appends `|| text`) and its
    * Spark twin; shared by d21 and the d47 composed pipeline so the two
    * call sites can't drift. */
  // NOTE: this value is interpolated into s"""...""".stripMargin templates,
  // so no line may BEGIN with '|' (a leading `||` operator would be eaten
  // as a margin pipe by the OUTER template's stripMargin) — every `||`
  // lands at end of line.
  private[queries] val piiLacePrefixSql: String =
    """CASE WHEN doc_id % 2 = 0
      |      THEN 'user' || substring(md5(CAST(doc_id AS VARCHAR) || ':e'), 1, 6) ||
      |           '@example.com ' ELSE '' END ||
      |    CASE WHEN doc_id % 3 = 0
      |      THEN '555-' ||
      |        lpad(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':p1'), 1, 6))::BIGINT
      |             % 1000 AS VARCHAR), 3, '0') || '-' ||
      |        lpad(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':p2'), 1, 6))::BIGINT
      |             % 10000 AS VARCHAR), 4, '0') || ' ' ELSE '' END ||
      |    CASE WHEN doc_id % 5 = 0
      |      THEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':i1'), 1, 2))::BIGINT AS VARCHAR) ||
      |        '.' ||
      |        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':i2'), 1, 2))::BIGINT AS VARCHAR) ||
      |        '.' ||
      |        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':i3'), 1, 2))::BIGINT AS VARCHAR) ||
      |        '.' ||
      |        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':i4'), 1, 2))::BIGINT AS VARCHAR) ||
      |        ' ' ELSE '' END""".stripMargin

  private[queries] def piiLacePrefix: org.apache.spark.sql.Column = {
    def h(salt: String, hexLen: Int) =
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))), 1, hexLen), 16, 10)
        .cast("long")
    val email = when(col("doc_id") % 2 === 0,
      concat(lit("user"),
        substring(md5(concat(col("doc_id").cast("string"), lit(":e"))), 1, 6),
        lit("@example.com "))).otherwise("")
    val phone = when(col("doc_id") % 3 === 0,
      concat(lit("555-"),
        lpad((h(":p1", 6) % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((h(":p2", 6) % 10000).cast("string"), 4, "0"), lit(" "))).otherwise("")
    val ip = when(col("doc_id") % 5 === 0,
      concat(h(":i1", 2).cast("string"), lit("."), h(":i2", 2).cast("string"),
        lit("."), h(":i3", 2).cast("string"), lit("."), h(":i4", 2).cast("string"),
        lit(" "))).otherwise("")
    concat(email, phone, ip)
  }

  /** EMAIL → IP → PHONE redaction chain (order is part of the contract). */
  private[queries] def piiRedact(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(t,
      lit(EmailRe), lit("<EMAIL>")),
      lit(Ipv4Re), lit("<IP>")),
      lit(PhoneRe), lit("<PHONE>"))

  /** The same chain as SQL over expression `t`. */
  private[queries] def piiRedactSql(t: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($t,
       |      '$EmailRe', '<EMAIL>', 'g'),
       |      '$Ipv4Re', '<IP>', 'g'),
       |      '$PhoneRe', '<PHONE>', 'g')""".stripMargin

  /** PII detection + redaction: count emails/phones/IPv4s and emit the md5
    * of the redacted text (EMAIL → IP → PHONE replacement order; the
    * patterns are disjoint here but the order is part of the contract).
    *
    * Scale: a pure per-row projection — no shuffle, no join; the plan is a
    * single WholeStageCodegen map over the scan (PlanShapeSpec pins
    * zero exchanges). At 100 TB this runs at scan speed. */
  val piiScrub = OracleQuery(
    "d21_pii_scrub",
    s"""WITH laced AS (
       |  SELECT doc_id,
       |    $piiLacePrefixSql ||
       |    text AS t
       |  FROM documents),
       |r AS (
       |  SELECT doc_id,
       |    len(regexp_extract_all(t, '$EmailRe')) AS n_emails,
       |    len(regexp_extract_all(t, '$PhoneRe')) AS n_phones,
       |    len(regexp_extract_all(t, '$Ipv4Re')) AS n_ipv4,
       |    ${piiRedactSql("t")} AS redacted
       |  FROM laced)
       |SELECT doc_id, CAST(n_emails AS INT) AS n_emails,
       |  CAST(n_phones AS INT) AS n_phones, CAST(n_ipv4 AS INT) AS n_ipv4,
       |  md5(redacted) AS redacted_md5,
       |  CAST(length(redacted) AS INT) AS n_redacted_chars
       |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
    val laced = Tables.documents(s, d)
      .select(col("doc_id"), concat(piiLacePrefix, col("text")).as("t"))
    val redacted = piiRedact(col("t"))
    laced.select(
      col("doc_id"),
      size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).as("n_phones"),
      size(regexp_extract_all(col("t"), lit(Ipv4Re), lit(0))).as("n_ipv4"),
      md5(redacted).as("redacted_md5"),
      length(redacted).as("n_redacted_chars"))
      .orderBy("doc_id")
  }

  // ---- d22 corpus mixing ---------------------------------------------
  /** Per-language sampling rates in ‰ (integer thresholds against a
    * 1000-bucket md5 hash — exact in both engines). */
  private val MixRates: Seq[(String, Int)] =
    Seq("en" -> 500, "zh" -> 900, "de" -> 700, "es" -> 700, "fr" -> 700)
  private val MixDefault = 700

  /** Stratified corpus mixing — the sampling step that rebalances language
    * (or source/quality) proportions before training: each document keeps
    * or drops by a deterministic md5 bucket against its language's target
    * rate, and the query emits the per-(source, language) census. Being
    * hash-based, the same document always makes the same decision across
    * reruns and engines — resumable sampling, no RNG state.
    *
    * Scale: per-row hash + one aggregation shuffle on the (tiny) stratum
    * key; the keep decision never shuffles the corpus. */
  val corpusMixing = OracleQuery(
    "d22_corpus_mixing", {
      val rateCases = MixRates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
        .mkString(" ")
      s"""WITH k AS (
         |  SELECT source, lang,
         |    CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 7))::BIGINT
         |           % 1000 < CASE $rateCases ELSE $MixDefault END
         |         THEN 1 ELSE 0 END AS keep
         |  FROM documents)
         |SELECT source, lang, CAST(count(*) AS INT) AS n_docs,
         |  CAST(sum(keep) AS INT) AS n_kept,
         |  round(CAST(sum(keep) AS DOUBLE) / count(*), 4) AS kept_frac
         |FROM k GROUP BY source, lang ORDER BY source, lang""".stripMargin
    }) { (s, d) =>
    val rate = MixRates.foldRight(lit(MixDefault): org.apache.spark.sql.Column) {
      case ((l, r), els) => when(col("lang") === l, r).otherwise(els)
    }
    val bucket =
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(":mix"))), 1, 7), 16, 10)
        .cast("long") % 1000
    Tables.documents(s, d)
      .select(col("source"), col("lang"),
        when(bucket < rate, 1).otherwise(0).as("keep"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(col("keep")).cast("int").as("n_kept"))
      .select(col("source"), col("lang"), col("n_docs"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_docs"), 4).as("kept_frac"))
      .orderBy("source", "lang")
  }

  // ---- d23 unigram surprisal -----------------------------------------
  /** Unigram-LM surprisal scoring — the perplexity-proxy quality signal:
    * each token scores floor(log2(corpus_total / corpus_count(term))) bits
    * of surprisal, documents report the sum and mean. The log2 floor is
    * computed as length(bin(total div c)) - 1 — INTEGER-exact, so the
    * per-document sum is order-independent and hash-checkable (floating
    * log + float sum would be neither, per the round-2 d12 lesson).
    *
    * Scale: one shuffle builds the term-count table; the per-token probe
    * is a broadcast join (a real vocabulary is ≤ millions of rows — the
    * d19 vocab shape); the doc-level sum shuffles on doc_id. */
  val unigramSurprisal = OracleQuery(
    "d23_doc_unigram_surprisal",
    s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       |gc AS (SELECT term, count(*) AS c FROM t GROUP BY 1),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM gc),
       |b AS (SELECT term, CAST(length(bin(total // c)) - 1 AS BIGINT) AS bits
       |      FROM gc, tot)
       |SELECT t.doc_id, CAST(count(*) AS INT) AS n_tokens,
       |  CAST(sum(bits) AS BIGINT) AS sum_bits,
       |  round(CAST(sum(bits) AS DOUBLE) / count(*), 4) AS avg_bits
       |FROM t JOIN b USING (term)
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val gc = t.groupBy("term").agg(count(lit(1)).as("c"))
    val total = gc.agg(sum(col("c")).as("total"))
    val bits = gc.crossJoin(broadcast(total))
      .select(col("term"),
        (length(bin(expr("total div c"))) - 1).cast("long").as("bits"))
    t.join(broadcast(bits), Seq("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(col("bits")).as("sum_bits"))
      .select(col("doc_id"), col("n_tokens"), col("sum_bits"),
        round(col("sum_bits").cast("double") / col("n_tokens"), 4).as("avg_bits"))
      .orderBy("doc_id")
  }

  // ---- d24 boilerplate pruning ---------------------------------------
  /** Boilerplate n-gram pruning — the C4-style repeated-content filter at
    * the n-gram level (the corpus has no newlines, so line-level dedup
    * degenerates; 3-gram doc-frequency is the same signal): a 3-gram
    * appearing in ≥ 1% of documents is boilerplate; each document reports
    * its distinct-gram census, boilerplate fraction, and the resulting
    * keep/drop flag. The threshold is RELATIVE (df · 100 ≥ N, integer
    * math), so the definition holds unchanged at any corpus size.
    *
    * Scale: gram doc-frequency is one shuffle on the gram key; the
    * boilerplate set (df ≥ 1% of docs) is inherently small — high-df
    * grams are few — so the probe back onto the corpus is a broadcast
    * semi-join, the d20 shape. */
  val boilerplatePrune = OracleQuery(
    "d24_boilerplate_prune",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |g AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
       |    THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
       |          for i in generate_series(1, len(toks) - 2)]
       |    ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM t),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS total_docs FROM documents),
       |f AS (SELECT gram, count(*) AS df FROM g GROUP BY 1),
       |boiler AS (SELECT gram FROM f, nd WHERE df * 100 >= total_docs),
       |p AS (
       |  SELECT g.doc_id, count(*) AS n_grams,
       |    count(*) FILTER (WHERE b.gram IS NOT NULL) AS n_boiler
       |  FROM g LEFT JOIN boiler b ON g.gram = b.gram
       |  GROUP BY g.doc_id)
       |SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
       |  CAST(n_boiler AS INT) AS n_boiler,
       |  round(CAST(n_boiler AS DOUBLE) / n_grams, 4) AS boiler_frac,
       |  CAST(n_boiler * 10 < n_grams AS BOOLEAN) AS keep
       |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val g = docs
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), explode(shingles(col("toks"), 3)).as("gram"))
    val totalDocs = docs.agg(count(lit(1)).as("total_docs"))
    val boiler = g.groupBy("gram").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totalDocs))
      .filter(col("df") * 100 >= col("total_docs"))
      .select(col("gram"), lit(true).as("is_boiler"))
    g.join(broadcast(boiler), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_grams"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).cast("int").as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_grams"), 4).as("boiler_frac"),
        (col("n_boiler") * 10 < col("n_grams")).as("keep"))
      .orderBy("doc_id")
  }

  /** DSIR importance weighting (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its tokens are under a TARGET distribution (the
    * English slice here) than under the RAW corpus distribution —
    * importance = Σ log p_target(w) − log p_raw(w). Both log-probs use
    * the d23 integer-exact surprisal form floor(log2(total/c)) =
    * length(bin(total div c)) − 1, so per-doc sums are order-independent
    * and the whole pass is oracle-checkable: imp_bits = Σ (raw_bits −
    * target_bits) over tokens present in the target vocabulary; tokens
    * the target has never seen are counted as OOV, not scored (the d19
    * convention).
    *
    * Scale: two token-keyed count aggregations (map-side combined) build
    * the vocab tables; both are vocabulary-sized — orders of magnitude
    * smaller than the corpus — so scoring is a BROADCAST probe of the
    * token stream, never a corpus-sized shuffle. At 100 TB the only big
    * movement is the one combine-collapsed count per vocab table. */
  val dsirImportance = OracleQuery(
    "d28_dsir_importance",
    s"""WITH t AS (
       |  SELECT doc_id, lang, unnest($tokSql) AS term FROM documents),
       |rc AS (SELECT term, count(*) AS c FROM t GROUP BY 1),
       |rtot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM rc),
       |rb AS (SELECT term, CAST(length(bin(total // c)) - 1 AS BIGINT) AS rbits
       |       FROM rc, rtot),
       |tc AS (SELECT term, count(*) AS c FROM t WHERE lang = 'en' GROUP BY 1),
       |ttot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM tc),
       |tb AS (SELECT term, CAST(length(bin(total // c)) - 1 AS BIGINT) AS tbits
       |       FROM tc, ttot),
       |b AS (SELECT rb.term, rbits, tbits FROM rb LEFT JOIN tb USING (term))
       |SELECT t.doc_id, t.lang,
       |  CAST(count(*) AS INT) AS n_tokens,
       |  CAST(sum(CASE WHEN tbits IS NULL THEN 1 ELSE 0 END) AS INT) AS n_oov,
       |  CAST(sum(CASE WHEN tbits IS NOT NULL THEN rbits - tbits ELSE 0 END)
       |       AS BIGINT) AS imp_bits
       |FROM t JOIN b USING (term)
       |GROUP BY t.doc_id, t.lang ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("term"))
    def bits(counts: org.apache.spark.sql.DataFrame, out: String) = {
      val total = counts.agg(sum(col("c")).as("total"))
      counts.crossJoin(broadcast(total))
        .select(col("term"),
          (length(bin(expr("total div c"))) - 1).cast("long").as(out))
    }
    val rb = bits(t.groupBy("term").agg(count(lit(1)).as("c")), "rbits")
    val tb = bits(t.filter(col("lang") === "en")
      .groupBy("term").agg(count(lit(1)).as("c")), "tbits")
    val b = rb.join(broadcast(tb), Seq("term"), "left_outer")
    t.join(broadcast(b), Seq("term"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(when(col("tbits").isNull, 1).otherwise(0)).cast("int").as("n_oov"),
        sum(when(col("tbits").isNotNull, col("rbits") - col("tbits"))
          .otherwise(0L)).cast("long").as("imp_bits"))
      .orderBy("doc_id")
  }

  // ---- d30 bigram conditional surprisal ------------------------------
  /** Bigram-LM conditional surprisal — the KenLM-style perplexity filter
    * one order up from d23: each bigram (w1,w2) scores
    * floor(log2(c(w1·) / c(w1,w2))) bits, the integer-exact form of
    * −log2 p(w2|w1); documents report bigram count, total and mean bits.
    * c(w1·) counts w1 as a LEFT CONTEXT (over the bigram stream, not raw
    * unigrams), so conditional probabilities normalize exactly. Same
    * length(bin(a div b))−1 trick as d23 keeps every emitted value
    * integer-exact and the per-doc sum order-independent.
    *
    * Scale: unlike d23's broadcast-sized vocabulary, the bigram table
    * grows toward vocab² under Zipf — too big to assume broadcastable —
    * so the probe back onto the bigram stream is left to the optimizer:
    * at sf it broadcasts, at 100 TB AQE picks a sort-merge join keyed on
    * the gram, which is the honest linear-shuffle plan for distributed
    * LM counting (map-side combine collapses the count shuffles). */
  val bigramSurprisal = OracleQuery(
    "d30_doc_bigram_surprisal",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |g AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
       |        for i in generate_series(1, len(toks) - 1)]) AS gram
       |      FROM t WHERE len(toks) >= 2),
       |bc AS (SELECT gram, count(*) AS c2 FROM g GROUP BY 1),
       |uc AS (SELECT split_part(gram, ' ', 1) AS w1, count(*) AS c1
       |       FROM g GROUP BY 1),
       |b AS (SELECT gram, CAST(length(bin(c1 // c2)) - 1 AS BIGINT) AS bits
       |      FROM bc JOIN uc ON split_part(bc.gram, ' ', 1) = uc.w1)
       |SELECT g.doc_id, CAST(count(*) AS INT) AS n_bigrams,
       |  CAST(sum(bits) AS BIGINT) AS sum_bits,
       |  round(CAST(sum(bits) AS DOUBLE) / count(*), 4) AS avg_bits
       |FROM g JOIN b USING (gram)
       |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin) { (s, d) =>
    val g = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"
      )).as("gram"))
    val bc = g.groupBy("gram").agg(count(lit(1)).as("c2"))
    val uc = g.select(expr("split_part(gram, ' ', 1)").as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val bits = bc.withColumn("w1", expr("split_part(gram, ' ', 1)"))
      .join(uc, "w1")
      .select(col("gram"),
        (length(bin(expr("c1 div c2"))) - 1).cast("long").as("bits"))
    g.join(bits, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        sum(col("bits")).as("sum_bits"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_bits"),
        round(col("sum_bits").cast("double") / col("n_bigrams"), 4).as("avg_bits"))
      .orderBy("doc_id")
  }

  // ---- d31 hashed-feature linear classifier --------------------------
  /** Hashed-feature linear quality classifier — the fastText-style "score
    * every document with a frozen model" pass used to filter web corpora
    * (e.g. the GPT-3 / LLaMA quality classifiers): each token hashes into
    * one of 64 feature buckets, each bucket carries a fixed integer weight
    * in [−10, 10], a document's score is the sum of its tokens' weights
    * and the keep label is score > 0. Weights here are md5-derived (a
    * pure function of the bucket id the oracle reproduces exactly) —
    * standing in for trained parameters; the SHAPE of the computation
    * (hash → bucket → weight lookup → sum) is exactly the production one.
    *
    * Scale: the model is a pure function baked into the row expression —
    * no join, no shuffle, no state. The plan is a single WholeStageCodegen
    * projection over the scan (PlanShapeSpec pins zero exchanges): at
    * 100 TB this runs at scan speed on any number of executors, the ideal
    * shape for model-scoring passes (a real weight table would broadcast). */
  val hashedClassifier = OracleQuery(
    "d31_quality_classifier",
    s"""WITH t AS (SELECT doc_id, $tokSql AS toks FROM documents),
       |s AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
       |  CAST(coalesce(list_sum(list_transform(toks, t ->
       |    ('0x' || substring(md5('w:' ||
       |        CAST(('0x' || substring(md5(t), 1, 7))::BIGINT % 64 AS VARCHAR)),
       |      1, 7))::BIGINT % 21 - 10)), 0) AS BIGINT) AS score
       |  FROM t)
       |SELECT doc_id, n_tokens, score, score > 0 AS label
       |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("int").as("n_tokens"),
        expr("""aggregate(toks, 0L, (acc, t) -> acc +
          CAST(conv(substring(md5(concat('w:',
            CAST(CAST(conv(substring(md5(t), 1, 7), 16, 10) AS BIGINT) % 64 AS STRING))),
          1, 7), 16, 10) AS BIGINT) % 21 - 10)""").as("score"))
      .select(col("doc_id"), col("n_tokens"), col("score"),
        (col("score") > 0).as("label"))
      .orderBy("doc_id")
  }

  // ---- d52 frozen TRAINED quality classifier -------------------------
  /** Inference with a TRAINED-then-FROZEN logistic regression — the d31
    * hashed-feature scoring shape with real learned parameters: the
    * weights below are the verbatim 6-decimal freeze of the LR trained by
    * [[graft.jobs.FreezeQualityLr]] (seed-42 split over the
    * [[graft.jobs.TrainQualityClassifier]] weak labels at sf0.01,
    * holdout AUC 1.0 — the labels are quartiles of a near-linear
    * function of these features, and the model recovers it). Features:
    * 64 md5-bucket hashed term-frequency counts (the d31 device) plus
    * three structural ratios (length-capped token count, alpha ratio,
    * unique-token ratio) — the TrainQualityClassifier feature contract
    * re-expressed as oracle-exact arithmetic.
    *
    * The registered output is the LOGIT and the keep decision (z > 0 ⟺
    * p > 0.5): sigmoid is strictly monotone, so the decision needs no
    * transcendental — exp's last-bit libm rounding is the one piece of
    * LR inference that is NOT cross-engine-reproducible (the d34
    * doctrine), and a production filter thresholds the logit anyway.
    * Every term is IEEE arithmetic both engines execute in the IDENTICAL
    * sequence: a left-to-right per-token fold of weight lookups (one md5,
    * one modulo, one list index per token), then the three weighted
    * ratios added in fixed order. Do not re-associate.
    *
    * Scale: the frozen model is a literal baked into one codegen'd
    * projection — no join, no shuffle, no model service; at 100 TB this
    * scores at scan speed (the d31 adjudication), which is exactly why
    * corpus-scale quality filters freeze weights instead of calling a
    * model endpoint. */
  private[queries] val D52TfWeights: Seq[String] = Seq(
    "0.000000", "0.426046", "0.000000", "0.472589", "0.370231", "0.476863",
    "0.417316", "0.000000", "0.147896", "0.000000", "0.000000", "0.000000",
    "0.000000", "0.000000", "0.000000", "0.489883", "0.000000", "0.000000",
    "0.000000", "0.000000", "0.000000", "0.000000", "0.282719", "0.000000",
    "0.000000", "0.000000", "0.000000", "0.382362", "0.000000", "0.058400",
    "0.000000", "0.000000", "0.000000", "0.000000", "0.000000", "0.000000",
    "0.000000", "0.000000", "0.217196", "0.000000", "0.305937", "0.000000",
    "0.000000", "0.323276", "0.201289", "0.274656", "0.211681", "0.000000",
    "0.000000", "0.000000", "0.000000", "0.335159", "0.283182", "0.000000",
    "0.000000", "0.353368", "0.325131", "0.232316", "0.000000", "0.000000",
    "0.000000", "0.000000", "0.359410", "0.337749")
  private[queries] val D52Intercept = "-162.165203"
  private[queries] val D52WLen = "3.585552"
  private[queries] val D52WAlpha = "142.588014"
  private[queries] val D52WUniq = "50.756480"

  val trainedQualityInference = OracleQuery(
    "d52_trained_quality_inference",
    s"""WITH w AS (SELECT CAST([${D52TfWeights.mkString(", ")}] AS DOUBLE[]) AS tw),
       |t AS (SELECT doc_id, text, $tokSql AS toks FROM documents),
       |s AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
       |  CAST($D52Intercept AS DOUBLE)
       |  + coalesce(list_sum(list_transform(toks, tk ->
       |      tw[(('0x' || substring(md5(tk), 1, 7))::BIGINT % 64) + 1])), 0.0)
       |  + CAST($D52WLen AS DOUBLE)
       |    * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
       |  + CAST($D52WAlpha AS DOUBLE)
       |    * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
       |       / greatest(length(text), 1))
       |  + CAST($D52WUniq AS DOUBLE)
       |    * (CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1))
       |  AS z
       |  FROM t, w)
       |SELECT doc_id, n_tokens, round(z, 4) AS logit, z > 0 AS label
       |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tfArr = D52TfWeights.map(_ + "D").mkString(", ")
    val tfFold = expr(
      s"""aggregate(toks, 0.0D, (acc, t) -> acc +
         |  element_at(array($tfArr),
         |    CAST(CAST(conv(substring(md5(t), 1, 7), 16, 10) AS BIGINT)
         |         % 64 AS INT) + 1))""".stripMargin)
    val z = lit(D52Intercept.toDouble) + tfFold +
      lit(D52WLen.toDouble) *
        least(size(col("toks")).cast("double") / lit(100.0), lit(1.0)) +
      lit(D52WAlpha.toDouble) *
        (length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("double")
          / greatest(length(col("text")), lit(1))) +
      lit(D52WUniq.toDouble) *
        (size(array_distinct(col("toks"))).cast("double")
          / greatest(size(col("toks")), lit(1)))
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .withColumn("z", z)
      .select(col("doc_id"), size(col("toks")).cast("int").as("n_tokens"),
        round(col("z"), 4).as("logit"), (col("z") > 0).as("label"))
      .orderBy("doc_id")
  }

  // ---- d34 weighted priority sampling --------------------------------
  /** Deterministic weighted sampling without replacement — priority
    * sampling (Duffield/Lund/Thorup 2007; the top-k form of
    * Efraimidis–Spirakis weighted reservoir sampling): each document gets
    * priority w/u where w is its weight (here n_chars — swap in any
    * quality score) and u a uniform in (0,1]; the k highest priorities ARE
    * a weighted sample without replacement. u derives from md5(doc_id),
    * not random(): the d16/d22 resumability property — any engine, any
    * run, any partitioning draws the SAME sample, and appending new
    * documents never evicts an old one except by honest priority.
    *
    * u = (h+1)/2^48 with h the first 48 md5 bits, so priority =
    * w·2^48/(h+1) — one multiply and one divide. The product/quotient can
    * exceed 2^53 and round, but both engines execute the IDENTICAL
    * IEEE-754 operation sequence on identical inputs, so they round
    * identically — the actual cross-engine invariant (do not reorder
    * this expression). What the w/u form buys over the u^(1/w) original
    * is the absence of log/exp transcendentals, whose libm last-bit
    * rounding is NOT specified and does diverge between runtimes.
    *
    * Scale: one scan + TakeOrderedAndProject distributed top-k (per-
    * partition heaps, driver merges k rows) — no full sort, no shuffle of
    * the corpus; the rank window runs on the 100 surviving rows. */
  val prioritySample = OracleQuery(
    "d34_weighted_priority_sample",
    """WITH w AS (
      |  SELECT doc_id, lang, n_chars,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 12))::BIGINT
      |      AS h
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(greatest(n_chars, 1) AS DOUBLE) * 281474976710656 / (h + 1)
      |      AS priority
      |  FROM w),
      |r AS (SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS rnk
      |      FROM p)
      |SELECT doc_id, lang, n_chars, round(priority, 4) AS priority,
      |  CAST(rnk AS INT) AS rnk
      |FROM r WHERE rnk <= 100 ORDER BY rnk""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":ws"))),
      1, 12), 16, 10).cast("long")
    val top = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (greatest(col("n_chars"), lit(1L)).cast("double")
          * lit(281474976710656.0) / (h + 1)).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(100) // TakeOrderedAndProject: distributed top-k, no full sort
    top
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("priority").desc, col("doc_id"))))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("priority"), 4).as("priority"), col("rnk"))
      .orderBy("rnk")
  }

  // ---- d37 temperature-scaled mixture weights ------------------------
  /** Temperature-scaled domain mixture — the multi-source sampling-weight
    * computation from multilingual/multi-domain pretraining (mT5, XLM-R:
    * p_i ∝ n_i^α): with α = 0.5 the weight is sqrt(n_i), which IEEE
    * specifies correctly-rounded in both engines — no libm pow/exp whose
    * last-bit rounding could diverge. Weights are floored to integer
    * micro-units so the normalizing total is an exact BIGINT sum
    * (order-independent), rates are one exact division, and per-epoch
    * document budgets (epoch = 100k docs) are integer division.
    *
    * Scale: one hash aggregate on source (the census) and a broadcast of
    * the one-row total — the per-document application of these rates is
    * d22's md5-bucket sampling, which this query parameterizes. */
  val temperatureMixing = OracleQuery(
    "d37_temperature_mixing",
    """WITH src AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      |w AS (SELECT source, n_docs,
      |        CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
      |          AS wgt
      |      FROM src),
      |t AS (SELECT CAST(sum(wgt) AS BIGINT) AS total FROM w)
      |SELECT source, n_docs, wgt,
      |  round(CAST(wgt AS DOUBLE) / total, 6) AS sample_rate,
      |  CAST((wgt * 100000) // total AS BIGINT) AS docs_per_epoch
      |FROM w, t ORDER BY source""".stripMargin) { (s, d) =>
    val w = Tables.documents(s, d)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("wgt",
        floor(sqrt(col("n_docs").cast("double")) * 1000000).cast("long"))
    val t = w.agg(sum(col("wgt")).as("total"))
    w.crossJoin(broadcast(t))
      .select(col("source"), col("n_docs"), col("wgt"),
        round(col("wgt").cast("double") / col("total"), 6).as("sample_rate"),
        expr("CAST((wgt * 100000) DIV total AS BIGINT)").as("docs_per_epoch"))
      .orderBy("source")
  }

  // ---- d46 surprisal-quantile bucket mixing ---------------------------
  /** Surprisal-quantile bucketed sampling — the Nemotron-CC curation
    * shape: score every document with the unigram-LM surprisal proxy
    * (d23's integer-exact bits), split the corpus into exact population
    * quartiles of mean surprisal, and sample each quartile at its own
    * deterministic rate (downweight the most-predictable quartile —
    * boilerplate — AND the noisiest top quartile; keep the informative
    * middle-high band nearly whole).
    *
    * Exact quartiles WITHOUT a single-reducer global window: documents
    * are ranked by the COMPOSITE (quantized surprisal, doc_id) order —
    * integer-exact, unique for ANY id range, identical in both engines —
    * via the composite-key two-pass distributed prefix sum
    * ([[graft.operators.PrefixSum.exclusivePrefixSumByRange]]); only
    * per-partition totals ever see a global window. Earlier rounds
    * packed the order into one synthetic key
    * (quantized·2^24 + doc_id), which is unique only while
    * doc_id < 2^24 — a ceiling a 100 TB id space blows through — and
    * carried a loud runtime guard; the composite ordering removes both.
    * bucket = (4·rank) div N assigns ntile-balanced
    * quartiles. The keep decision is the d22 md5-bucket rule — hash-based,
    * so the same document decides the same way across reruns and engines. */
  private[queries] val BucketRatesPermille = Seq(200, 500, 900, 600)

  val surprisalBucketMix = OracleQuery(
    "d46_surprisal_bucket_mix", {
      val rateCases = BucketRatesPermille.zipWithIndex
        .map { case (r, b) => s"WHEN $b THEN $r" }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         |gc AS (SELECT term, count(*) AS c FROM t GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM gc),
         |b AS (SELECT term, CAST(length(bin(total // c)) - 1 AS BIGINT) AS bits
         |      FROM gc, tot),
         |ds AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |         CAST(sum(bits) AS BIGINT) AS sum_bits
         |       FROM t JOIN b USING (term) GROUP BY 1),
         |k AS (SELECT doc_id, sum_bits * 1048576 // n_tokens AS qs FROM ds),
         |r AS (SELECT doc_id,
         |        row_number() OVER (ORDER BY qs, doc_id) - 1 AS rk,
         |        (SELECT count(*) FROM ds) AS n
         |      FROM k),
         |m AS (SELECT doc_id, CAST((4 * rk) // n AS INT) AS bucket FROM r)
         |SELECT doc_id, bucket,
         |  CAST(CASE bucket $rateCases END AS INT) AS rate_permille,
         |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':mix46'), 1, 7))::BIGINT
         |         % 1000 < CASE bucket $rateCases END AS BOOLEAN) AS kept
         |FROM m ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val gc = t.groupBy("term").agg(count(lit(1)).as("c"))
    val total = gc.agg(sum(col("c")).as("total"))
    val bits = gc.crossJoin(broadcast(total))
      .select(col("term"),
        (length(bin(expr("total div c"))) - 1).cast("long").as("bits"))
    val ds = t.join(broadcast(bits), Seq("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("sum_bits"))
    val keyed = ds.select(col("doc_id"),
      expr("(sum_bits * 1048576) div n_tokens").as("__qs"),
      lit(1L).as("one"))
    val nDocs = ds.agg(count(lit(1)).as("n"))
    val rate = BucketRatesPermille.zipWithIndex.foldRight(lit(-1): org.apache.spark.sql.Column) {
      case ((r, b), els) => when(col("bucket") === b, r).otherwise(els)
    }
    val hb = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":mix46"))), 1, 7),
      16, 10).cast("long") % 1000
    graft.operators.PrefixSum
      .exclusivePrefixSumByRange(keyed, Seq("__qs", "doc_id"), "one", "rk")
      .crossJoin(broadcast(nDocs))
      .withColumn("bucket", expr("cast((4 * rk) div n as int)"))
      .select(col("doc_id"), col("bucket"),
        rate.cast("int").as("rate_permille"),
        (hb < rate).as("kept"))
      .orderBy("doc_id")
  }

  // ---- d54 token-budget corpus selection -------------------------------
  /** Greedy token-budget selection — the stage that turns a scored corpus
    * into a TRAINING SET of a fixed size: order documents by quality
    * (best first), keep each document whose tokens still fit the budget
    * in that order, stop charging once full (the Pile/DoReMi-style
    * "top-quality B tokens" construction; budget here = half the corpus'
    * total tokens, so the decision boundary cuts through the middle of
    * the quality distribution where it is hardest to get right).
    *
    * Quality is an integer-exact alpha-ratio permille (the d02 signal
    * quantized so both engines order identically), and the greedy
    * cumulative charge is the (quality desc, doc_id)-ordered WEIGHTED
    * prefix sum of n_tokens —
    * [[graft.operators.PrefixSum.exclusivePrefixSumByRange]] over the
    * COMPOSITE key, so the whole selection runs as the two-pass
    * distributed cumsum with no single-reducer window AND no id ceiling
    * (earlier rounds packed a synthetic okey needing doc_id < 2^24 for
    * uniqueness; the composite order is unique for any id range — the
    * shape that actually survives 100 TB doc-id spaces). Keep rule:
    * cum_before + n_tokens <= budget — a PREFIX CUT: the kept set is
    * the maximal quality-prefix whose inclusive token sum fits, and the
    * first document that does not fit ends the fill (cum_before charges
    * every prior document, so nothing after the boundary can re-enter).
    * That is deliberate: the skip-and-continue greedy variant makes
    * every decision depend on the running KEPT sum — an inherently
    * sequential scan no prefix-sum (or SQL window) parallelizes — while
    * the prefix cut is the order-respecting rule a distributed engine
    * can compute exactly, and the one the oracle's window recomputes.
    *
    * Scale: one token-count aggregate, one bucketed cumsum (global
    * window over #buckets rows only), one broadcast of the 1-row budget
    * — the same shapes d36/d46 adjudicated; selection at 100 TB is
    * exactly this plan with more buckets. */
  val tokenBudgetSelect = OracleQuery(
    "d54_token_budget_select",
    s"""WITH t AS (SELECT doc_id, text, $tokSql AS toks FROM documents),
       |m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |        (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
       |           AS BIGINT) * 1000)
       |          // greatest(length(text), 1) AS alpha_permille
       |      FROM t),
       |b AS (SELECT CAST(sum(n_tokens) // 2 AS BIGINT) AS budget FROM m),
       |r AS (SELECT doc_id, n_tokens, alpha_permille,
       |        CAST(coalesce(sum(n_tokens) OVER (
       |          ORDER BY alpha_permille DESC, doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS BIGINT) AS cum_before
       |      FROM m)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(alpha_permille AS BIGINT) AS alpha_permille, cum_before,
       |  CAST(cum_before + n_tokens <= budget AS BOOLEAN) AS kept
       |FROM r, b ORDER BY doc_id""".stripMargin) { (s, d) =>
    // greatest(…, 1) + the BIGINT cast before *1000: an empty text must
    // not raise ANSI DIVIDE_BY_ZERO where DuckDB's `// 0` yields NULL,
    // and a >2.1M-char document must not overflow the INT multiply (the
    // d52 alpha-ratio precedent)
    val m = Tables.documents(s, d).select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      expr("(cast(length(regexp_replace(lower(text), '[^a-z]', '')) as bigint)" +
        " * 1000) div greatest(length(text), 1)").as("alpha_permille"))
    // integer division in BOTH engines: `/` on a Spark long sum is DOUBLE
    // division and would shift the boundary by a fractional token
    val budget = m.agg(expr("sum(n_tokens) div 2").cast("long").as("budget"))
    // ascending (999 - quality, doc_id) ≡ ORDER BY quality DESC, doc_id
    val keyed = m.withColumn("__q", lit(999L) - col("alpha_permille"))
    graft.operators.PrefixSum
      .exclusivePrefixSumByRange(keyed, Seq("__q", "doc_id"),
        "n_tokens", "cum_before")
      .drop("__q")
      .crossJoin(broadcast(budget))
      .select(col("doc_id"), col("n_tokens"), col("alpha_permille"),
        col("cum_before"),
        (col("cum_before") + col("n_tokens") <= col("budget")).as("kept"))
      .orderBy("doc_id")
  }

  val all: Seq[OracleQuery] =
    Seq(piiScrub, corpusMixing, unigramSurprisal, boilerplatePrune,
      dsirImportance, bigramSurprisal, hashedClassifier, prioritySample,
      temperatureMixing, surprisalBucketMix, trainedQualityInference,
      tokenBudgetSelect)
}
