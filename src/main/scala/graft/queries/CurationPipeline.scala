package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** The LLM-curation tier composed END TO END as one oracle-gated pipeline —
  * the q48 analog for training data. Every stage is an operator already
  * verified standalone; the value of this query is catching what
  * per-operator gates cannot: cache/unpersist hygiene across stages,
  * column-contract drift between stage boundaries, and order-sensitivity
  * of the final shard assignment (hash-gated via `order_sig`).
  *
  * documents
  *   → unicode NFC scrub + control-char strip        (d45)
  *   → quality gate + language-ID filter             (d02/d03 metrics)
  *   → exact dedup, canonical = min doc_id           (d05)
  *   → MinHash-LSH near-dup pairs (t = 0.7)          (d07)
  *       → connected-component cluster collapse      (d13)
  *       → quality-aware survivor per cluster        (d43)
  *   → asymmetric containment prune (t = 0.9)        (d44)
  *   → PII lacing + detection + redaction            (d21)
  *   → surprisal-quantile bucketed sampling          (d46 machinery, ':mix47')
  *   → deterministic epoch/shard plan                (d42)
  *
  * Output: one row per (epoch, shard) with membership counts, the summed
  * per-stage artifacts (redacted char counts gate the PII stage, token and
  * surprisal-bit sums gate the scoring stage), the permutation head/tail
  * docs, and the order-sensitive position signature — a single wrong
  * drop/keep/reorder ANYWHERE upstream changes some shard's row.
  *
  * Reference analog: the medallion flow — scripts/
  * process_bronze_to_silver.py:38-146 chained into
  * process_silver_to_gold.py:40-158 — re-expressed for the training-data
  * tier, every stage Spark-first (the same operators the standalone
  * queries register; no stage is re-implemented here).
  *
  * Scale: the composition adds NOTHING beyond its stages' own shapes — the
  * per-row scrubs never shuffle; dedup/near-dup are the bucketed equi-join
  * tiers; the quartile rank is the two-pass distributed prefix sum; the
  * shard window partitions by (epoch, shard). Stage boundaries that feed
  * multiple consumers are pinned (cache/localCheckpoint) exactly once —
  * at 100 TB those boundaries become lake writes, same topology.
  *
  * Oracle formulation: multiply-referenced CTEs are `AS MATERIALIZED` —
  * DuckDB otherwise inlines each reference, re-executing the whole
  * upstream pipeline per reference (the minhash chain alone references
  * the token CTE 13 times; profiling showed 21 recursive-CTE
  * re-evaluations) — and the containment prune scores pairs via
  * inverted-index intersection counts instead of an all-pairs
  * nested-loop (exact: a ≥0.9-containment pair shares shingles).
  * Result-identical at sf0.01 and sf0.1; sf0.1 oracle wall time
  * 886 s → 1.9 s, which is what makes full-scale oracle sweeps routine.
  */
object CurationPipeline {

  // shared with d45 — TextQueries owns the scrub class so the composed
  // stage-0 and the standalone operator can't drift
  private def CtrlClassSql = TextQueries.CtrlClassSql
  private def CtrlClassSpark = TextQueries.CtrlClassSpark

  val curationPipeline: OracleQuery = OracleQuery(
    "d47_curation_pipeline", {
      val rateCases = CurationQueries.BucketRatesPermille.zipWithIndex
        .map { case (r, b) => s"WHEN $b THEN $r" }.mkString(" ")
      s"""WITH RECURSIVE scrub AS (
         |  SELECT doc_id,
         |    regexp_replace(nfc_normalize(text), '$CtrlClassSql', '', 'g') AS text
         |  FROM documents),
         |t0 AS (SELECT doc_id, text, ${TextQueries.tokSql} AS toks FROM scrub),
         |v AS MATERIALIZED (
         |  SELECT doc_id, text, toks, len(toks) AS n_tokens,
         |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
         |      / length(text) AS alpha_ratio,
         |    ${TextQueries.langScoreColsSql}
         |  FROM t0),
         |vb AS (SELECT *, ${TextQueries.langBestSql} AS best FROM v),
         |st1 AS (
         |  SELECT doc_id, text, toks, n_tokens FROM vb
         |  WHERE n_tokens >= 20 AND alpha_ratio >= 0.5
         |    AND ${TextQueries.langCaseSql} <> 'und'),
         |fpt AS MATERIALIZED (
         |  SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM st1),
         |canon AS (SELECT min(doc_id) AS doc_id FROM fpt GROUP BY fp),
         |ex AS MATERIALIZED (SELECT f.doc_id, f.text, f.toks, f.n_tokens
         |       FROM fpt f JOIN canon c ON f.doc_id = c.doc_id),
         |t AS MATERIALIZED (SELECT doc_id, toks FROM ex),
         |${TextQueries.minhashCappedPairCtes(64)},
         |jp AS MATERIALIZED (SELECT doc_a, doc_b FROM verify WHERE jac >= 0.7),
         |nodes AS (
         |  SELECT DISTINCT id FROM (
         |    SELECT doc_a AS id FROM jp UNION ALL SELECT doc_b FROM jp)),
         |edges2 AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM jp
         |  UNION SELECT doc_b, doc_a FROM jp),
         |reach(id, lbl) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges2 e ON e.src = r.id),
         |comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id
         |         FROM reach GROUP BY 1),
         |sv AS (
         |  SELECT m.doc_id,
         |    first_value(m.doc_id) OVER (
         |      PARTITION BY m.cluster_id ORDER BY m.n_tokens DESC, m.doc_id)
         |      AS survivor_id
         |  FROM (SELECT c.doc_id, c.cluster_id, e.n_tokens
         |        FROM comp c JOIN ex e USING (doc_id)) m),
         |drop3 AS (SELECT doc_id FROM sv WHERE doc_id <> survivor_id),
         |s3 AS MATERIALIZED (SELECT e.* FROM ex e
         |       WHERE NOT EXISTS (SELECT 1 FROM drop3 x WHERE x.doc_id = e.doc_id)),
         |shc AS (SELECT doc_id, ${TextQueries.shingleSql("toks")} AS s FROM s3),
         |nz AS MATERIALIZED (SELECT doc_id, s, len(s) AS sz FROM shc WHERE len(s) > 0),
         |ev AS (SELECT doc_id, sz, unnest(s) AS sg FROM nz),
         |ic AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter,
         |    any_value(a.sz) AS sza, any_value(b.sz) AS szb
         |  FROM ev a JOIN ev b ON a.sg = b.sg AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2),
         |drop4 AS (
         |  SELECT DISTINCT doc_a AS doc_id FROM ic
         |  WHERE (szb > sza OR (szb = sza AND doc_b < doc_a))
         |    AND CAST(inter AS DOUBLE) / sza >= 0.9),
         |s4 AS (SELECT e.doc_id, e.text FROM s3 e
         |       WHERE NOT EXISTS (SELECT 1 FROM drop4 x WHERE x.doc_id = e.doc_id)),
         |laced AS (
         |  SELECT doc_id,
         |    ${CurationQueries.piiLacePrefixSql} ||
         |    text AS t
         |  FROM s4),
         |red AS MATERIALIZED (
         |  SELECT doc_id, rtext, CAST(length(rtext) AS BIGINT) AS n_red_chars
         |  FROM (SELECT doc_id, ${CurationQueries.piiRedactSql("t")} AS rtext
         |        FROM laced)),
         |t6 AS MATERIALIZED (SELECT doc_id,
         |    unnest(regexp_split_to_array(lower(rtext), '\\s+')) AS term
         |  FROM red),
         |gc6 AS MATERIALIZED (SELECT term, count(*) AS c FROM t6 GROUP BY 1),
         |tot6 AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM gc6),
         |b6 AS (SELECT term, CAST(length(bin(total // c)) - 1 AS BIGINT) AS bits
         |       FROM gc6, tot6),
         |ds6 AS MATERIALIZED (SELECT t6.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |          CAST(sum(bits) AS BIGINT) AS sum_bits
         |        FROM t6 JOIN b6 USING (term) GROUP BY 1),
         |k6 AS (SELECT doc_id, n_toks, sum_bits,
         |         sum_bits * 1048576 // n_toks AS qs
         |       FROM ds6),
         |r6 AS (SELECT *, row_number() OVER (ORDER BY qs, doc_id) - 1 AS rk,
         |         (SELECT count(*) FROM ds6) AS n
         |       FROM k6),
         |m6 AS (SELECT doc_id, n_toks, sum_bits,
         |         CAST((4 * rk) // n AS INT) AS bucket FROM r6),
         |kept AS (
         |  SELECT doc_id, n_toks, sum_bits FROM m6
         |  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':mix47'), 1, 7))::BIGINT
         |        % 1000 < CASE bucket $rateCases END),
         |p7 AS (
         |  SELECT k.doc_id, k.n_toks, k.sum_bits, r.n_red_chars, v.epoch,
         |    md5(CAST(k.doc_id AS VARCHAR) || ':' || CAST(v.epoch AS VARCHAR))
         |      AS perm
         |  FROM kept k JOIN red r USING (doc_id), (VALUES (0), (1)) v(epoch)),
         |s7 AS (
         |  SELECT *, CAST(('0x' || substring(perm, 1, 7))::BIGINT % 8 AS INT)
         |    AS shard
         |  FROM p7),
         |r7 AS (
         |  SELECT *, row_number() OVER (PARTITION BY epoch, shard
         |                               ORDER BY perm, doc_id) AS pos
         |  FROM s7)
         |SELECT epoch, shard, count(*) AS n_docs,
         |  CAST(sum(n_red_chars) AS BIGINT) AS sum_red_chars,
         |  CAST(sum(n_toks) AS BIGINT) AS sum_toks,
         |  CAST(sum(sum_bits) AS BIGINT) AS sum_bits,
         |  min_by(doc_id, perm) AS head_doc, max_by(doc_id, perm) AS tail_doc,
         |  CAST(sum(pos * doc_id % 1000000007) AS BIGINT) AS order_sig
         |FROM r7 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }) { (s, d) => shardAssignments(s, d)
    .groupBy("epoch", "shard")
    .agg(count(lit(1)).as("n_docs"),
      sum(col("n_red_chars")).as("sum_red_chars"),
      sum(col("n_toks")).as("sum_toks"),
      sum(col("sum_bits")).as("sum_bits"),
      min_by(col("doc_id"), col("perm")).as("head_doc"),
      max_by(col("doc_id"), col("perm")).as("tail_doc"),
      sum(col("pos") * col("doc_id") % 1000000007L).as("order_sig"))
    .orderBy("epoch", "shard")
  }

  /** The pipeline's per-(doc, epoch) SHARD ASSIGNMENT — every stage of
    * d47 up to (and including) the within-shard position, one row per
    * curated document per epoch. The registered query is exactly the
    * (epoch, shard) rollup of this relation; [[graft.jobs.CurateCorpus]]
    * materializes it to a transactional lake table, so the lake contents
    * provably reproduce the oracle-gated plan. `withText = true` carries
    * the redacted document text for sinks (the rollup never needs it —
    * don't push corpus bytes through the shard window when only counts
    * are consumed). */
  def shardAssignments(s: org.apache.spark.sql.SparkSession, d: String,
                       withText: Boolean = false): org.apache.spark.sql.DataFrame = {
    // ---- stage 0/1: scrub, quality gate, language-ID filter ------------
    val scrubbed = Tables.documents(s, d).select(col("doc_id"),
      regexp_replace(
        graft.expressions.TextExpressions.nfcNormalize(col("text")),
        CtrlClassSpark, "").as("text"))
    val st1 = scrubbed
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("alpha_ratio",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("double")
          / length(col("text")))
      .filter(col("n_tokens") >= 20 && col("alpha_ratio") >= 0.5
        && langId(col("toks")) =!= "und")
      .select("doc_id", "text", "n_tokens")
    // ---- stage 2: exact dedup (canonical = min doc_id per fingerprint) -
    val fp = st1.withColumn("fp", fingerprint(col("text")))
    val canon = fp.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
    // cached: scanned by the near-dup pair build, the survivor join, and
    // the anti-join (the d08 boundary-pinning pattern)
    val ex = fp.join(canon.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id", "text", "n_tokens")
      .cache()
    // ---- stage 3: near-dup clusters, quality-aware survivors -----------
    // production LSH config: the mega-bucket guard bounds any
    // near-identical cluster that survived exact dedup (exact copies
    // can't — stage 2 collapsed them); cap 64 never binds on honest data,
    // only on dup-storms (SCALE.md skew run)
    val pairs = graft.operators.MinHashDedup
      .verifiedPairs(ex, 0.7, maxBucketSize = 64)
      .select("doc_a", "doc_b")
    val comp = graft.operators.ConnectedComponents
      .components(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("cluster_id"))
    val bySurv = Window.partitionBy("cluster_id")
      .orderBy(col("n_tokens").desc, col("doc_id"))
    val drop3 = ex.select("doc_id", "n_tokens")
      .join(broadcast(comp), Seq("doc_id"))
      .withColumn("survivor_id", first(col("doc_id")).over(bySurv))
      .filter(col("doc_id") =!= col("survivor_id"))
      .select("doc_id")
    val s3 = ex.join(drop3, Seq("doc_id"), "left_anti").cache()
    // ---- stage 4: containment prune (keep the larger / lower-id side) --
    val cp = graft.operators.JaccardJoin.containmentPairs(s3, 0.9)
      .select("doc_inner", "doc_outer")
    val sz = s3.withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), size(shingles(col("toks"), 3)).as("sz"))
    val drop4 = cp
      .join(sz.select(col("doc_id").as("doc_inner"), col("sz").as("sz_in")),
        Seq("doc_inner"))
      .join(sz.select(col("doc_id").as("doc_outer"), col("sz").as("sz_out")),
        Seq("doc_outer"))
      .filter(col("sz_out") > col("sz_in") ||
        (col("sz_out") === col("sz_in") && col("doc_outer") < col("doc_inner")))
      .select(col("doc_inner").as("doc_id")).distinct()
    val s4 = s3.join(drop4, Seq("doc_id"), "left_anti")
    // ---- stage 5: PII lacing + redaction (the d21 contract) ------------
    val red = s4
      .select(col("doc_id"),
        CurationQueries.piiRedact(
          concat(CurationQueries.piiLacePrefix, col("text"))).as("rtext"))
      .withColumn("n_red_chars", length(col("rtext")).cast("long"))
      .cache() // scanned by the term explode and the shard-stage join
    // ---- stage 6: surprisal-quantile bucketed sampling (':mix47') ------
    val t6 = red.select(col("doc_id"), explode(tokens(col("rtext"))).as("term"))
    val gc = t6.groupBy("term").agg(count(lit(1)).as("c"))
    val total = gc.agg(sum(col("c")).as("total"))
    val bits = gc.crossJoin(broadcast(total))
      .select(col("term"),
        (length(bin(expr("total div c"))) - 1).cast("long").as("bits"))
    // one row per doc — pinned so the prefix sum's two passes + pre-pass
    // aggregate don't re-execute the whole upstream pipeline
    val ds = t6.join(broadcast(bits), Seq("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum(col("bits")).as("sum_bits"))
      .localCheckpoint()
    // composite (quantized surprisal, doc_id) ordering — unique for any
    // id range (the synthetic okey packing capped doc_id at 2^24)
    val keyed = ds.select(col("doc_id"), col("n_toks"), col("sum_bits"),
      expr("(sum_bits * 1048576) div n_toks").as("__qs"),
      lit(1L).as("one"))
    val nDocs = ds.agg(count(lit(1)).as("n"))
    val rate = CurationQueries.BucketRatesPermille.zipWithIndex
      .foldRight(lit(-1): Column) {
        case ((r, b), els) => when(col("bucket") === b, r).otherwise(els)
      }
    val hb = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":mix47"))),
      1, 7), 16, 10).cast("long") % 1000
    val kept = graft.operators.PrefixSum
      .exclusivePrefixSumByRange(keyed, Seq("__qs", "doc_id"), "one", "rk")
      .crossJoin(broadcast(nDocs))
      .withColumn("bucket", expr("cast((4 * rk) div n as int)"))
      .filter(hb < rate)
      .select("doc_id", "n_toks", "sum_bits")
    // ---- stage 7: deterministic epoch/shard plan (the d42 contract) ----
    val w7 = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("perm"), col("doc_id"))
    val redCols =
      if (withText) red.select("doc_id", "rtext", "n_red_chars")
      else red.select("doc_id", "n_red_chars")
    val carried =
      (if (withText) Seq(col("rtext")) else Nil) ++
        Seq(col("n_toks"), col("sum_bits"), col("n_red_chars"))
    kept.join(redCols, Seq("doc_id"))
      .select(col("doc_id") +: carried :+
        explode(array(lit(0), lit(1))).as("epoch"): _*)
      .withColumn("perm",
        expr("md5(cast(doc_id as string) || ':' || cast(epoch as string))"))
      .withColumn("shard",
        expr("cast(conv(substring(perm, 1, 7), 16, 10) as bigint) % 8")
          .cast("int"))
      .withColumn("pos", row_number().over(w7).cast("long"))
  }

  val all: Seq[OracleQuery] = Seq(curationPipeline)
}
