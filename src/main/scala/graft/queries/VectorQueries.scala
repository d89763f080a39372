package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Embedding-column operators over the `embeddings` table: norms, per-label
  * centroids, cosine near-dup pairs, and brute-force ANN top-k (the exact
  * baseline the LSH/IVF variants are measured against).
  *
  * All math is double (float inputs cast up) through codegen'd zip_with /
  * aggregate — identical sequential fold order to the DuckDB oracle, so
  * results hash-match after round(…,4).
  *
  * Scale: brute-force top-k is O(|Q|·N) with broadcast of the query set —
  * the right baseline when |Q| is small; the bucketed variant
  * (SimilaritySearch.srpTopK) bounds candidates per query for large |Q|.
  */
object VectorQueries {

  private val embSql =
    "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings"
  private val normSql =
    s"SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM ($embSql)"
  private val dotSql =
    "list_sum(list_transform(list_zip(q.v, c.v), x -> x[1] * x[2]))"

  // ---- SRP banding (shared by v03/v05): the DuckDB mirror of
  // SimilaritySearch.bandedNearDupPairs. The fixed hyperplanes inline as
  // literals (Double.toString round-trips exactly through DuckDB's parser),
  // so band/bucket assignment matches Spark's bit-for-bit — both engines
  // compute the same sequential-fold plane dots, hence the same signs.
  private val nBands = 8
  private val planesPerBand = 4
  private lazy val bandPlanes =
    graft.functions.VectorFunctions.srpPlanes(nBands * planesPerBand, 64)
  private def dotPlaneSql(p: Seq[Double]): String =
    s"list_sum(list_transform(list_zip(v, [${p.mkString(", ")}]), x -> x[1] * x[2]))"
  private lazy val bandBucketsSql: String =
    bandPlanes.grouped(planesPerBand).toSeq.map { ps =>
      ps.zipWithIndex.map { case (p, j) =>
        s"(CASE WHEN ${dotPlaneSql(p)} >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
      }.mkString(" + ")
    }.mkString("[\n", ",\n", "\n]")
  // DuckDB lists are 1-based; `band` is engine-internal and never emitted.
  // `cells` mirrors the operator's mega-bucket guard (maxBucket): cells
  // above the cap contribute no candidates. Inert at test SFs by design.
  private val maxBucket = 4096
  private lazy val bandsSql =
    s"""nb AS (SELECT vec_id, v, nrm, $bandBucketsSql AS bks FROM ($normSql)),
       |bands0 AS (SELECT vec_id, v, nrm, band, bks[band] AS bucket
       |           FROM nb, generate_series(1, $nBands) g(band)),
       |cells AS (SELECT band, bucket FROM bands0
       |          GROUP BY band, bucket HAVING count(*) <= $maxBucket),
       |bands AS (SELECT b.* FROM bands0 b JOIN cells USING (band, bucket))""".stripMargin
  private val bandedPairSql =
    s"""SELECT DISTINCT q.vec_id AS id_a, c.vec_id AS id_b,
       |    round($dotSql / (q.nrm * c.nrm), 4) AS cos_sim
       |  FROM bands q JOIN bands c
       |    ON q.band = c.band AND q.bucket = c.bucket AND q.vec_id < c.vec_id
       |  WHERE round($dotSql / (q.nrm * c.nrm), 4) >= 0.4""".stripMargin

  /** L2 norms per vector. */
  val embNorms = OracleQuery(
    "v01_emb_norms",
    s"""SELECT vec_id, round(nrm, 4) AS l2_norm
       |FROM ($normSql) ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        round(l2Norm(toDouble(col("embedding"))), 4).as("l2_norm"))
      .orderBy("vec_id")
  }

  /** Per-label centroids, one row per (label, dimension) — elementwise mean
    * via posexplode + grouped avg (the distributed way to average vectors;
    * no driver-side collection). */
  val embCentroids = OracleQuery(
    "v02_emb_centroids",
    """SELECT label, CAST(i AS INT) AS dim, round(avg(v[i]), 4) AS centroid
      |FROM (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |      FROM embeddings), generate_series(1, 64) g(i)
      |GROUP BY label, i ORDER BY label, dim""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(toDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy(col("label"), (col("pos") + 1).cast("int").as("dim"))
      .agg(round(avg(col("x")), 4).as("centroid"))
      .orderBy("label", "dim")
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * LSH-BANDED (8 SRP bands × 4 planes): candidates come from a (band,
    * bucket) equi-join — never an all-pairs nested loop over N²/2 — and
    * only candidates get the exact cosine. Threshold applies to the
    * *rounded* value in both engines so borderline floating-point noise
    * cannot flip membership; the oracle mirrors the identical banding
    * (same inline hyperplanes), the d09/d15 pattern. */
  val embNearDupPairs = OracleQuery(
    "v03_emb_neardup_pairs",
    s"""WITH $bandsSql,
       |pairs AS (
       |  $bandedPairSql)
       |SELECT id_a, id_b, cos_sim FROM pairs ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.SimilaritySearch
      .bandedNearDupPairs(Tables.embeddings(s, d), 0.4, nBands, planesPerBand,
        maxBucket = maxBucket)
      .orderBy("id_a", "id_b")
  }

  /** Brute-force cosine top-k: exact nearest neighbors for the query set
    * (vec_id < 5), ranked desc with id tie-break. */
  val embAnnTopK = OracleQuery(
    "v04_emb_ann_topk",
    s"""WITH n AS ($normSql),
       |p AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    $dotSql / (q.nrm * c.nrm) AS cos
       |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM p)
       |SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim, CAST(rnk AS INT) AS rnk
       |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    bruteForceTopKRun(s, d, lit(true))
  }

  /** v04's engine with an extra pushed-down query-set predicate — the seam
    * v10's sampled evaluation uses to shrink the EXACT side's work (brute
    * force is per-query corpus-linear, so restricting queries restricts
    * compute, not just output). */
  private def bruteForceTopKRun(s: SparkSession, d: String,
                                queryFilter: Column): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val q = e.filter(col("vec_id") < 5 && queryFilter)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(c, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** Embedding near-dup PRUNING (the dedup action on v03's pairs): drop the
    * higher id of every banded pair at/above the threshold, keep the rest.
    * Same LSH-banded candidate generation as v03, mirrored in the oracle. */
  val embDedup = OracleQuery(
    "v05_emb_dedup",
    s"""WITH $bandsSql,
       |pairs AS (
       |  $bandedPairSql)
       |SELECT e.vec_id, e.label FROM embeddings e
       |WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.id_b = e.vec_id)
       |ORDER BY e.vec_id""".stripMargin) { (s, d) =>
    val drop = graft.operators.SimilaritySearch
      .bandedNearDupPairs(Tables.embeddings(s, d), 0.4, nBands, planesPerBand,
        maxBucket = maxBucket)
      .select(col("id_b").as("vec_id")).distinct()
    Tables.embeddings(s, d)
      .join(drop, Seq("vec_id"), "left_anti")
      .select("vec_id", "label")
      .orderBy("vec_id")
  }

  /** Int8 scalar quantization of the embedding column — the compression
    * step before ANN indexing at scale (4× smaller than float32, 8× smaller
    * than the double math): per-dimension min/max over the corpus define a
    * 256-level grid; each value maps to a code in [-128, 127]. Emits a
    * per-vector code checksum plus mean/max reconstruction error.
    *
    * Rounding is floor(z + 0.5) in BOTH dialects (identical IEEE semantics;
    * engine `round` half-up vs half-even differences cannot creep in).
    *
    * Scale: one posexplode (N·64 rows), a 64-row broadcast of the
    * per-dimension grid, one hash shuffle back onto vec_id — no driver
    * collection, no cross join. */
  val embQuantize = OracleQuery(
    "v06_emb_quantize_int8",
    s"""WITH e AS ($embSql),
       |ex AS (SELECT vec_id, i AS dim, v[i] AS x
       |       FROM e, generate_series(1, 64) g(i)),
       |mm AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM ex GROUP BY dim),
       |qc AS (
       |  SELECT vec_id, x, lo, hi,
       |    CAST(CASE WHEN hi = lo THEN 0
       |         ELSE floor((x - lo) / (hi - lo) * 255 + 0.5) END AS BIGINT)
       |      - 128 AS code
       |  FROM ex JOIN mm USING (dim)),
       |r AS (
       |  SELECT vec_id, code,
       |    CASE WHEN hi = lo THEN lo
       |         ELSE lo + (code + 128) * (hi - lo) / 255 END AS xr, x
       |  FROM qc)
       |SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
       |  round(avg(abs(x - xr)), 6) AS mae,
       |  round(max(abs(x - xr)), 6) AS max_abs_err
       |FROM r GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, d) =>
    val ex = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(toDouble(col("embedding"))).as(Seq("pos", "x")))
      .withColumn("dim", (col("pos") + 1).cast("int"))
    val mm = ex.groupBy("dim").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val qc = ex.join(broadcast(mm), Seq("dim"))
      .withColumn("code",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(floor((col("x") - col("lo")) / (col("hi") - col("lo")) * 255 + 0.5))
          - 128)
      .withColumn("xr",
        when(col("hi") === col("lo"), col("lo"))
          .otherwise(col("lo") + (col("code") + 128) * (col("hi") - col("lo")) / 255))
    qc.groupBy("vec_id")
      .agg(sum(col("code")).as("code_sum"),
        round(avg(abs(col("x") - col("xr"))), 6).as("mae"),
        round(max(abs(col("x") - col("xr"))), 6).as("max_abs_err"))
      .orderBy("vec_id")
  }

  /** Quantized-prefilter ANN with exact re-rank — the composition that
    * makes brute force viable at scale: score every corpus vector with the
    * int8 codes from v06's grid (integer math, 8× less data than doubles),
    * keep the top-50 candidates per query, then exact-cosine re-rank just
    * those to top-10. Deterministic end to end (grid → codes → integer dot
    * → tie-broken ranks), so the full two-stage pipeline is oracle-checked.
    *
    * Scale: the coarse pass is the only corpus-wide scan and touches 64
    * bytes/vector; the float math runs on |Q|·50 rows. */
  val embQuantRerankAnn = OracleQuery(
    "v07_emb_quantized_rerank_ann",
    s"""WITH e AS ($embSql),
       |ex AS (SELECT vec_id, i AS dim, v[i] AS x
       |       FROM e, generate_series(1, 64) g(i)),
       |mm AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM ex GROUP BY dim),
       |qc AS (
       |  SELECT vec_id, dim,
       |    CAST(CASE WHEN hi = lo THEN 0
       |         ELSE floor((x - lo) / (hi - lo) * 255 + 0.5) END AS BIGINT)
       |      - 128 AS code
       |  FROM ex JOIN mm USING (dim)),
       |codes AS (SELECT vec_id, list(code ORDER BY dim) AS codes
       |          FROM qc GROUP BY vec_id),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    list_sum(list_transform(list_zip(q.codes, c.codes), z -> z[1] * z[2]))
       |      AS qscore
       |  FROM codes q JOIN codes c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
       |cand AS (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY qscore DESC, vec_id) AS crnk
       |  FROM scored),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
       |      FROM e),
       |rr AS (
       |  SELECT cand.query_id, cand.vec_id AS neighbor_id,
       |    list_sum(list_transform(list_zip(q.v, c.v), z -> z[1] * z[2]))
       |      / (q.nrm * c.nrm) AS cos
       |  FROM cand JOIN n q ON q.vec_id = cand.query_id
       |            JOIN n c ON c.vec_id = cand.vec_id
       |  WHERE crnk <= 50),
       |r AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM rr)
       |SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim, CAST(rnk AS INT) AS rnk
       |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val ex = e.select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .withColumn("dim", (col("pos") + 1).cast("int"))
    val mm = ex.groupBy("dim").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val codes = ex.join(broadcast(mm), Seq("dim"))
      .withColumn("code",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(floor((col("x") - col("lo")) / (col("hi") - col("lo")) * 255 + 0.5))
          - 128)
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("code")))),
        st => st.getField("code")).as("codes"))
      .cache() // scanned as both the query side and the corpus side
    val qcodes = codes.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("codes").as("qcodes"))
    val w50 = Window.partitionBy("query_id").orderBy(col("qscore").desc, col("vec_id"))
    // The coarse pass is the only consumer of the codes cache; pin its
    // (|Q|·50-row) candidate list eagerly and release the cache here
    // rather than leaking corpus-sized storage to the session.
    val cand = broadcast(qcodes).join(codes, col("vec_id") =!= col("query_id"))
      .withColumn("qscore",
        aggregate(zip_with(col("qcodes"), col("codes"), (a, b) => a * b),
          lit(0L), (acc, z) => acc + z))
      .withColumn("crnk", row_number().over(w50))
      .filter(col("crnk") <= 50)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .localCheckpoint()
    codes.unpersist()
    val n = e.withColumn("nrm", l2Norm(col("v")))
    val qv = n.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cv = n.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w10 = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w10))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  // ---- d32 SemDeDup (cluster-scoped semantic dedup) -------------------
  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): the third dedup family
    * after exact (d05) and sketch-banded (v05) — coarse-cluster the
    * embedding space, then prune within each cluster every vector whose
    * cosine to a lower-id cluster-mate reaches epsilon; the min-id vector
    * survives as the semantic representative. Cluster assignment here is
    * the deterministic label quantizer (the x06 convention — the synthetic
    * embeddings are generated per label, so labels ARE the coarse
    * partition); production swaps in x02's KMeans centroids and nothing
    * else changes.
    *
    * Scale: this is exactly the published algorithm's cost model — a hash
    * equi-join on the CLUSTER key with the quadratic confined within each
    * cluster, where cluster count k is the knob that bounds cluster size
    * (n/k). No corpus×corpus nested loop exists anywhere in the plan
    * (PlanShapeSpec pins it); the per-cluster pair set never leaves its
    * partition. The operator additionally defends against a skewed cluster
    * (`maxCluster` in [[graft.operators.SimilaritySearch.semDedupSurvivors]]):
    * labels above the cap skip pruning entirely — the `kept` census below
    * mirrors that rule so the oracle stays hash-checked. Inert at test SFs. */
  val semDedup = OracleQuery(
    "d32_semantic_dedup",
    s"""WITH e AS ($embSql),
       |el AS (SELECT e.vec_id, emb.label, e.v
       |       FROM e JOIN embeddings emb ON e.vec_id = emb.vec_id),
       |n AS (SELECT vec_id, label, v,
       |        sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM el),
       |kept AS (SELECT label FROM n GROUP BY label HAVING count(*) <= 4096),
       |ns AS (SELECT n.* FROM n JOIN kept USING (label)),
       |drop AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM ns a JOIN ns b ON a.label = b.label AND a.vec_id < b.vec_id
       |  WHERE list_sum(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]))
       |          / (a.nrm * b.nrm) >= 0.35)
       |SELECT emb.vec_id, emb.label FROM embeddings emb
       |WHERE NOT EXISTS (SELECT 1 FROM drop d WHERE d.vec_id = emb.vec_id)
       |ORDER BY emb.vec_id""".stripMargin) { (s, d) =>
    graft.operators.SimilaritySearch
      .semDedupSurvivors(Tables.embeddings(s, d), eps = 0.35)
      .orderBy("vec_id")
  }

  // ---- v08 MMR diversified re-rank -----------------------------------
  private def mmrStepSql(k: Int): String =
    s"""g$k AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    CAST(0.7 AS DOUBLE) * c.rel - CAST(0.3 AS DOUBLE) * max(p.sim) AS score
       |  FROM cand c
       |  JOIN ps p ON p.query_id = c.query_id AND p.ia = c.neighbor_id
       |  JOIN sel${k - 1} s ON s.query_id = p.query_id AND s.neighbor_id = p.ib
       |  WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} x
       |                    WHERE x.query_id = c.query_id
       |                      AND x.neighbor_id = c.neighbor_id)
       |  GROUP BY c.query_id, c.neighbor_id, c.rel),
       |s$k AS (SELECT query_id, neighbor_id, score, $k AS step FROM (
       |    SELECT query_id, neighbor_id, score,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY score DESC, neighbor_id) AS r
       |    FROM g$k) WHERE r = 1),
       |sel$k AS (SELECT query_id, neighbor_id FROM sel${k - 1}
       |          UNION ALL SELECT query_id, neighbor_id FROM s$k)""".stripMargin

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * diversified top-k — the re-rank between retrieval and selection that
    * keeps a training-data sampler or RAG context from returning five
    * near-copies: greedily pick k=5 of the top-20 cosine candidates,
    * scoring each remaining candidate λ·rel(q,c) − (1−λ)·max_{s∈S} sim(c,s)
    * against the already-selected set S (λ=0.7).
    *
    * The greedy loop is inherently sequential in k, so the unroll is five
    * DataFrame steps — but each step's state is the (query, selected) set,
    * never the corpus: the ONLY corpus-wide work is the v04-style candidate
    * pass (broadcast query side, one scan). Candidate lists and their
    * pairwise sims are localCheckpointed once (|Q|·20 and |Q|·20·19 rows);
    * every iteration is joins over those pinned minis, and each step's
    * 5-row pick is pinned so the lazy plan stays flat instead of growing
    * 3^k. The oracle unrolls the identical five steps as CTEs; scores
    * compare unrounded in both engines (same sequential-fold doubles, the
    * v04 precedent), rounding only at emission. */
  val mmrRerank = OracleQuery(
    "v08_mmr_rerank",
    s"""WITH n AS ($normSql),
       |c0 AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    $dotSql / (q.nrm * c.nrm) AS rel
       |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
       |cand0 AS (
       |  SELECT query_id, neighbor_id, rel FROM (
       |    SELECT query_id, neighbor_id, rel,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY rel DESC, neighbor_id) AS r
       |    FROM c0) WHERE r <= 20),
       |cand AS (SELECT c.*, n.v, n.nrm FROM cand0 c
       |         JOIN n ON n.vec_id = c.neighbor_id),
       |ps AS (
       |  SELECT a.query_id, a.neighbor_id AS ia, b.neighbor_id AS ib,
       |    list_sum(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]))
       |      / (a.nrm * b.nrm) AS sim
       |  FROM cand a JOIN cand b
       |    ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id),
       |s1 AS (
       |  SELECT query_id, neighbor_id, CAST(0.7 AS DOUBLE) * rel AS score,
       |    1 AS step
       |  FROM (
       |    SELECT query_id, neighbor_id, rel,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY rel DESC, neighbor_id) AS r
       |    FROM cand0) WHERE r = 1),
       |sel1 AS (SELECT query_id, neighbor_id FROM s1),
       |${(2 to 5).map(mmrStepSql).mkString(",\n")}
       |SELECT query_id, neighbor_id, CAST(step AS INT) AS step,
       |  round(score, 4) AS mmr_score
       |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
       |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
       |      UNION ALL SELECT * FROM s5)
       |ORDER BY query_id, step""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w20 = Window.partitionBy("query_id").orderBy(col("rel").desc, col("neighbor_id"))
    val cand = broadcast(q).join(c, col("neighbor_id") =!= col("query_id"))
      .withColumn("rel", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("r", row_number().over(w20)).filter(col("r") <= 20)
      .select("query_id", "neighbor_id", "rel", "cv", "cn")
      .localCheckpoint() // |Q|·20 rows; ends the corpus's role in the query
    val ps = cand.as("a")
      .join(cand.as("b"),
        col("a.query_id") === col("b.query_id")
          && col("a.neighbor_id") =!= col("b.neighbor_id"))
      .select(col("a.query_id").as("query_id"), col("a.neighbor_id").as("ia"),
        col("b.neighbor_id").as("ib"),
        (dot(col("a.cv"), col("b.cv")) / (col("a.cn") * col("b.cn"))).as("sim"))
      .localCheckpoint() // |Q|·20·19 rows
    val candSlim = cand.select("query_id", "neighbor_id", "rel")
    val wPick = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    var picks = candSlim
      .withColumn("r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rel").desc, col("neighbor_id"))))
      .filter(col("r") === 1)
      .select(col("query_id"), col("neighbor_id"),
        (lit(0.7) * col("rel")).as("score"), lit(1).as("step"))
      .localCheckpoint()
    for (k <- 2 to 5) {
      val selIds = picks.select("query_id", "neighbor_id")
      val step = candSlim
        .join(selIds, Seq("query_id", "neighbor_id"), "left_anti")
        .join(ps.withColumnRenamed("ia", "neighbor_id"), Seq("query_id", "neighbor_id"))
        .join(selIds.withColumnRenamed("neighbor_id", "ib"), Seq("query_id", "ib"))
        .groupBy("query_id", "neighbor_id", "rel")
        .agg(max(col("sim")).as("msim"))
        .withColumn("score", lit(0.7) * col("rel") - lit(0.3) * col("msim"))
        .withColumn("r", row_number().over(wPick)).filter(col("r") === 1)
        .select(col("query_id"), col("neighbor_id"), col("score"), lit(k).as("step"))
      picks = picks.unionByName(step).localCheckpoint() // ≤ |Q|·k rows
    }
    picks
      .select(col("query_id"), col("neighbor_id"), col("step").cast("int").as("step"),
        round(col("score"), 4).as("mmr_score"))
      .orderBy("query_id", "step")
  }

  // ---- v09 embedding outlier scores ----------------------------------
  /** Per-label embedding outlier scoring — the anomaly screen a curation
    * pipeline runs before trusting cluster structure (mislabeled rows,
    * corrupt embeddings, off-distribution content): distance of each
    * vector to its label centroid, z-scored against the label's distance
    * distribution; `is_outlier` flags z ≥ 2. The threshold applies to the
    * ROUNDED z in both engines (the v03 borderline trick), and every
    * score is emitted rather than only the outliers, so membership can't
    * silently drift.
    *
    * Scale: centroids are the v02 posexplode+avg shape (k·64 rows,
    * broadcast back); distances are one hash aggregate on vec_id; label
    * stats are a k-row aggregate. Two corpus-wide shuffles total, both on
    * high-cardinality keys. */
  val embOutliers = OracleQuery(
    "v09_emb_outliers",
    s"""WITH e AS ($embSql),
       |el AS (SELECT e.vec_id, emb.label, e.v
       |       FROM e JOIN embeddings emb ON e.vec_id = emb.vec_id),
       |ex AS (SELECT vec_id, label, i AS dim, v[i] AS x
       |       FROM el, generate_series(1, 64) g(i)),
       |cent AS (SELECT label, dim, avg(x) AS c FROM ex GROUP BY 1, 2),
       |dist AS (
       |  SELECT vec_id, label, sqrt(sum((x - c) * (x - c))) AS dst
       |  FROM ex JOIN cent USING (label, dim) GROUP BY 1, 2),
       |st AS (
       |  SELECT label, avg(dst) AS mu,
       |    sqrt(greatest(avg(dst * dst) - avg(dst) * avg(dst), 0)) AS sd
       |  FROM dist GROUP BY 1)
       |SELECT d.vec_id, d.label, round(d.dst, 4) AS centroid_dist,
       |  round((d.dst - s.mu) / nullif(s.sd, 0), 4) AS z_score,
       |  (round((d.dst - s.mu) / nullif(s.sd, 0), 4) >= 2.0) AS is_outlier
       |FROM dist d JOIN st s USING (label)
       |ORDER BY d.vec_id""".stripMargin) { (s, d) =>
    val ex = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(toDouble(col("embedding"))).as(Seq("pos", "x")))
      .withColumn("dim", (col("pos") + 1).cast("int"))
    val cent = ex.groupBy("label", "dim").agg(avg(col("x")).as("c"))
    val dist = ex.join(broadcast(cent), Seq("label", "dim"))
      .groupBy("vec_id", "label")
      .agg(sqrt(sum((col("x") - col("c")) * (col("x") - col("c")))).as("dst"))
    val st = dist.groupBy("label")
      .agg(avg(col("dst")).as("mu"),
        sqrt(greatest(avg(col("dst") * col("dst"))
          - avg(col("dst")) * avg(col("dst")), lit(0.0))).as("sd"))
    // sd = 0 (single-vector label, or identical centroid distances) must
    // yield a DEFINED null z_score/is_outlier, not x/0 = Inf or 0/0 = NaN
    // whose round/compare/hash behavior diverges across engines
    dist.join(broadcast(st), Seq("label"))
      .withColumn("z_score", when(col("sd") =!= 0.0,
        round((col("dst") - col("mu")) / col("sd"), 4)))
      .select(col("vec_id"), col("label"), round(col("dst"), 4).as("centroid_dist"),
        col("z_score"), (col("z_score") >= 2.0).as("is_outlier"))
      .orderBy("vec_id")
  }

  // ---- v10 ANN recall evaluation -------------------------------------
  /** Recall@10 of the SRP-LSH ANN tier against the exact brute-force
    * baseline — the evaluation harness that justifies every approximate
    * tier in this library: for each query both pipelines serve, count how
    * many of the exact top-10 the approximate index returned. BOTH sides
    * are deterministic registered queries (x01, v04), so the whole
    * evaluation composes their SQL verbatim into one oracle — the
    * measured recall itself is hash-checked, not just spot-asserted (the
    * x02 recall gate pattern, upgraded to exact values).
    *
    * Scale: evaluation cost is the two pipelines' cost plus a join on
    * (query, neighbor) over k rows per query — negligible; run it on a
    * sampled query set to monitor index drift in production. */
  val annRecallEval = OracleQuery(
    "v10_ann_recall_eval",
    s"""WITH srp AS (
       |${graft.queries.OperatorQueries.srpAnn.sql.get}
       |), ex AS (
       |${embAnnTopK.sql.get}
       |)
       |SELECT e.query_id, CAST(count(*) AS BIGINT) AS exact_k,
       |  CAST(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS hits,
       |  round(CAST(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / count(*), 4) AS recall
       |FROM ex e LEFT JOIN srp s
       |  ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin) { (s, d) =>
    annRecallEvalRun(s, d, querySampleRate = 1.0)
  }

  /** v10 at the 100 TB-REALISTIC cost: exact ground truth is per-query
    * corpus-linear, so the production form estimates recall over a
    * deterministic 25 % md5-bucket query sample (keeps queries 2 and 4 of
    * the 0–4 set; per-query rows are identical to the full run on the
    * shared queries — RecallSamplingSpec pins this). The sample predicate
    * pushes INTO the exact side's query set, so the measured cost shrinks
    * with the rate. Benched alongside v10 so the recorded series reflects
    * the deployable estimator, not just the rate-1.0 stress shape. */
  val annRecallEvalSampled = OracleQuery(
    "v10s_ann_recall_eval_sampled",
    s"""WITH srp AS (
       |${graft.queries.OperatorQueries.srpAnn.sql.get}
       |), ex AS (
       |${embAnnTopK.sql.get}
       |)
       |SELECT e.query_id, CAST(count(*) AS BIGINT) AS exact_k,
       |  CAST(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS hits,
       |  round(CAST(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / count(*), 4) AS recall
       |FROM ex e LEFT JOIN srp s
       |  ON s.query_id = e.query_id AND s.neighbor_id = e.neighbor_id
       |WHERE ('0x' || substring(md5(CAST(e.query_id AS VARCHAR)), 1, 7))::BIGINT
       |      % 100 < 25
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin) { (s, d) =>
    annRecallEvalRun(s, d, querySampleRate = 0.25)
  }

  /** v10's engine, parameterized by a DETERMINISTIC query sample rate —
    * the 100 TB form of the evaluation: exact ground truth is per-query
    * corpus-linear, so at scale recall is estimated over an md5-bucketed
    * query subset (the d16 split machinery — content- and run-independent,
    * reproducible across engines). The sample predicate pushes INTO the
    * brute-force pipeline's query set, so the exact side's compute shrinks
    * with the rate; the approximate index side is filtered to the same
    * queries. rate = 1.0 (the registered query's setting) bypasses the
    * filter: plan and oracle hash identical to the unparameterized form. */
  private[queries] def annRecallEvalRun(s: SparkSession, d: String,
                                        querySampleRate: Double): DataFrame = {
    require(querySampleRate > 0.0 && querySampleRate <= 1.0,
      s"sample rate must be in (0, 1], got $querySampleRate")
    def sampled(idCol: String) =
      expr(s"conv(substring(md5(cast($idCol as string)), 1, 7), 16, 10)")
        .cast("long") % 100 < math.round(querySampleRate * 100)
    val ex =
      (if (querySampleRate >= 1.0) embAnnTopK.run(s, d)
       else bruteForceTopKRun(s, d, sampled("vec_id")))
        .select(col("query_id"), col("neighbor_id"))
    val srpAll = graft.queries.OperatorQueries.srpAnn.run(s, d)
    val srp =
      (if (querySampleRate >= 1.0) srpAll else srpAll.filter(sampled("query_id")))
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    ex.join(srp, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy("query_id")
      .agg(count(lit(1)).as("exact_k"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"))
      .select(col("query_id"), col("exact_k"),
        col("hits"),
        round(col("hits").cast("double") / col("exact_k"), 4).as("recall"))
      .orderBy("query_id")
  }

  // ---- v11 distributed k-means ---------------------------------------

  /** One Lloyd iteration as DuckDB CTEs: assign each vector to its nearest
    * centroid from `c{n-1}` (distance rounded to 8 dp, centroid-id
    * tie-break — both engines argmin identically), then recompute
    * per-dimension means rounded to 5 dp (rounding re-synchronizes the two
    * engines' summation orders before the next iteration's distances).
    * Empty clusters keep their previous centroid (the LEFT JOIN coalesce). */
  private def kmIterSql(n: Int): String = {
    val p = n - 1
    s"""d$n AS (
       |  SELECT e.vec_id, e.v, c.cid,
       |    round(list_sum(list_transform(list_zip(e.v, c.cv),
       |      z -> (z[1]-z[2])*(z[1]-z[2]))), 8) AS dist
       |  FROM e CROSS JOIN c$p c),
       |a$n AS (
       |  SELECT vec_id, v, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                                 ORDER BY dist, cid) AS rn
       |    FROM d$n) WHERE rn = 1),
       |m$n AS (
       |  SELECT cid, i AS dim, round(avg(v[i]), 5) AS c
       |  FROM a$n, generate_series(1, 64) g(i) GROUP BY 1, 2),
       |n$n AS (SELECT cid, list(c ORDER BY dim) AS cv FROM m$n GROUP BY cid),
       |c$n AS (
       |  SELECT p.cid, coalesce(nn.cv, p.cv) AS cv
       |  FROM c$p p LEFT JOIN n$n nn USING (cid))""".stripMargin
  }

  /** Distributed k-means (Lloyd's, k=8, 3 iterations) over the embedding
    * column — the clustering step under cluster-balanced sampling, SemDeDup
    * partitioning, and topic bucketing of a training corpus. Fully
    * deterministic: init is the k lowest vec_ids, assignment breaks
    * distance ties by centroid id, and every update re-rounds the means so
    * the iteration stays in lockstep across engines.
    *
    * Scale: the canonical broadcast-Lloyd plan, with the broadcast done by
    * the PLAN itself — the k centroids inline as literal arrays into one
    * codegen'd per-row argmin expression (array_min over (dist, cid)
    * structs; struct ordering IS the tie-break), so assignment is a pure
    * narrow map: no join, no window, the vectors never shuffle. The update
    * is one k·dim-cell aggregate (map-side partials shrink it to k·64 per
    * partition before the exchange); only k·64 rows reach the driver per
    * iteration — the same bounded collect MLlib's KMeans performs. */
  val kmeansClusters = OracleQuery(
    "v11_kmeans_clusters",
    s"""WITH e AS ($embSql),
       |c0 AS (
       |  SELECT CAST(rn - 1 AS INT) AS cid, v AS cv FROM (
       |    SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM e)
       |  WHERE rn <= 8),
       |${kmIterSql(1)},
       |${kmIterSql(2)},
       |${kmIterSql(3)},
       |sz AS (SELECT cid, count(*) AS n_vecs FROM a3 GROUP BY cid),
       |f AS (
       |  SELECT c.cid, CAST(i AS INT) AS dim, round(c.cv[i], 5) AS centroid
       |  FROM c3 c, generate_series(1, 64) g(i))
       |SELECT f.cid, f.dim, f.centroid,
       |  CAST(coalesce(sz.n_vecs, 0) AS BIGINT) AS n_vecs
       |FROM f LEFT JOIN sz USING (cid) ORDER BY cid, dim""".stripMargin) { (s, d) =>
    import s.implicits._
    val k = 8
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // deterministic init: the k lowest vec_ids (bounded k-row fetch)
    var cents: Seq[(Int, Seq[Double])] = e.orderBy("vec_id").limit(k).collect()
      .sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
    var lastAssign: DataFrame = null
    for (_ <- 1 to 3) {
      val distStructs = cents.map { case (cid, cv) =>
        struct(round(sqDist(col("v"), array(cv.map(lit): _*)), 8).as("dist"),
          lit(cid).as("cid"))
      }
      val assigned = e
        .withColumn("cid", array_min(array(distStructs: _*)).getField("cid"))
        .select(col("vec_id"), col("v"), col("cid"))
      lastAssign = assigned
      // k·64 mean cells — the bounded per-iteration driver fetch
      val means: Map[Int, Seq[Double]] = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(round(avg(col("x")), 5).as("c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    val sizes = lastAssign.groupBy("cid").agg(count(lit(1)).as("n_vecs"))
    cents.toDF("cid", "cv")
      .select(col("cid"), posexplode(col("cv")).as(Seq("pos", "c")))
      .select(col("cid"), (col("pos") + 1).cast("int").as("dim"),
        round(col("c"), 5).as("centroid"))
      .join(broadcast(sizes), Seq("cid"), "left_outer")
      .select(col("cid"), col("dim"), col("centroid"),
        coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
      .orderBy("cid", "dim")
  }

  /** Johnson–Lindenstrauss random-projection ANN: vectors project from
    * 64 to 16 dimensions through a deterministic Rademacher (±1) matrix
    * (entry sign = parity of the first md5 hex digit of "jl:k:j", so both
    * engines build the identical matrix), the coarse top-50 ranks by
    * projected dot product, and exact cosine re-ranks the top-10 — the
    * dimensionality-reduction ANN tier alongside quantization (v07),
    * SRP-LSH (x01), IVF (x02) and PQ (x16).
    *
    * Scale: the projection is one broadcast of the 16-row matrix against
    * a single corpus scan (4× fewer bytes downstream of it); the coarse
    * pass scores 16-d vectors instead of 64-d — the JL tradeoff paid
    * once per corpus, amortized across every query batch. Exact math is
    * confined to |Q|·50 candidates. Coarse scores are unrounded doubles
    * in identical sequential fold order (the v03/v07 determinism rule). */
  val embJlRerankAnn = OracleQuery(
    "v12_emb_jl_rerank_ann",
    s"""WITH e AS ($embSql),
       |rm AS (
       |  SELECT k, list(CASE
       |      WHEN ('0x' || substring(md5('jl:' || k || ':' || j), 1, 1))::INT % 2 = 0
       |      THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END ORDER BY j) AS rvec
       |  FROM generate_series(1, 16) gk(k), generate_series(1, 64) gj(j)
       |  GROUP BY k),
       |proj AS (
       |  SELECT vec_id, list(p ORDER BY k) AS pv FROM (
       |    SELECT e.vec_id, rm.k,
       |      list_sum(list_transform(list_zip(e.v, rm.rvec), z -> z[1] * z[2])) AS p
       |    FROM e, rm)
       |  GROUP BY vec_id),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    list_sum(list_transform(list_zip(q.pv, c.pv), z -> z[1] * z[2])) AS pscore
       |  FROM proj q JOIN proj c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
       |cand AS (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY pscore DESC, vec_id) AS crnk
       |  FROM scored),
       |n AS ($normSql),
       |rr AS (
       |  SELECT cand.query_id, cand.vec_id AS neighbor_id,
       |    list_sum(list_transform(list_zip(q.v, c.v), z -> z[1] * z[2]))
       |      / (q.nrm * c.nrm) AS cos
       |  FROM cand JOIN n q ON q.vec_id = cand.query_id
       |            JOIN n c ON c.vec_id = cand.vec_id
       |  WHERE crnk <= 50),
       |r AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM rr)
       |SELECT query_id, neighbor_id, round(cos, 4) AS cos_sim, CAST(rnk AS INT) AS rnk
       |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    val rm = s.range(1, 17).select(col("id").cast("int").as("k"))
      .crossJoin(s.range(1, 65).select(col("id").cast("int").as("j")))
      .withColumn("r",
        when(conv(substring(md5(concat(lit("jl:"), col("k"), lit(":"), col("j"))),
          1, 1), 16, 10).cast("int") % 2 === 0, lit(1.0)).otherwise(lit(-1.0)))
      .groupBy("k")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("r")))),
        st => st.getField("r")).as("rvec"))
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val proj = e.crossJoin(broadcast(rm))
      .withColumn("p",
        aggregate(zip_with(col("v"), col("rvec"), (a, b) => a * b),
          lit(0.0), (acc, z) => acc + z))
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("k"), col("p")))),
        st => st.getField("p")).as("pv"))
      .cache() // scanned as both the query side and the corpus side
    val qp = proj.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("pv").as("qpv"))
    val w50 = Window.partitionBy("query_id").orderBy(col("pscore").desc, col("vec_id"))
    // coarse candidates pinned eagerly so the projection cache can be
    // released instead of leaking corpus-sized storage to the session
    val cand = broadcast(qp).join(proj, col("vec_id") =!= col("query_id"))
      .withColumn("pscore",
        aggregate(zip_with(col("qpv"), col("pv"), (a, b) => a * b),
          lit(0.0), (acc, z) => acc + z))
      .withColumn("crnk", row_number().over(w50))
      .filter(col("crnk") <= 50)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .localCheckpoint()
    proj.unpersist()
    val n = e.withColumn("nrm", l2Norm(col("v")))
    val qv = n.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cv = n.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
      col("nrm").as("cn"))
    val w10 = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .withColumn("cos",
        aggregate(zip_with(col("qv"), col("cv"), (a, b) => a * b),
          lit(0.0), (acc, z) => acc + z) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w10))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"), col("rnk").cast("int").as("rnk"))
      .orderBy("query_id", "rnk")
  }

  val all: Seq[OracleQuery] =
    Seq(embNorms, embCentroids, embNearDupPairs, embAnnTopK, embDedup, embQuantize,
      embQuantRerankAnn, semDedup, mmrRerank, embOutliers, annRecallEval,
      annRecallEvalSampled,
      kmeansClusters, embJlRerankAnn)
}
