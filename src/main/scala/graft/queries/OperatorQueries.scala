package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalPipeline
import graft.operators.SimilaritySearch
import graft.sources.Tables
import graft.streaming.EventStream

/** The operator-tier registry: approximate similarity search (SRP-LSH,
  * IVF), the multimodal feature pipeline, the Structured Streaming rollup,
  * and sketch-based distinct counts. SRP-LSH (x01) and the streaming rollup
  * (x04) carry full DuckDB oracles (deterministic arithmetic mirrors);
  * IVF (x02, KMeans quantizer), multimodal (x03, Scala-side synthesis) and
  * approx-distinct (x05, engine-specific sketch) are rows-only — still
  * deterministic for fixed seeds, just not SQL-expressible. */
object OperatorQueries {

  /** SRP-LSH approximate top-k (multi-probe hamming-1) for 10 query ids.
    * Fully oracle-checked: the fixed hyperplanes inline into the SQL as
    * literals (Double.toString round-trips exactly through DuckDB's
    * parser), so bucket assignment, probing, and ranking mirror bit-for-bit. */
  val srpAnn = OracleQuery(
    "x01_srp_ann_topk", {
      import graft.functions.VectorFunctions
      val planes = VectorFunctions.srpPlanes(4, 64)
      def dotPlane(p: Seq[Double]): String =
        s"list_sum(list_transform(list_zip(v, [${p.mkString(", ")}]), x -> x[1] * x[2]))"
      val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN ${dotPlane(p)} >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm,
         |    $bucketExpr AS bucket
         |  FROM e),
         |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qb
         |      FROM n WHERE vec_id < 10),
         |probes AS (
         |  SELECT query_id, qv, qn, xor(qb, CAST(m AS BIGINT)) AS bucket
         |  FROM q, (VALUES (0), (1), (2), (4), (8)) p(m)),
         |j AS (
         |  SELECT query_id, c.vec_id AS neighbor_id,
         |    list_sum(list_transform(list_zip(qv, c.v), x -> x[1] * x[2]))
         |      / (qn * c.nrm) AS cos
         |  FROM probes JOIN n c USING (bucket)
         |  WHERE c.vec_id <> query_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM j)
         |SELECT query_id, neighbor_id, round(cos, 4) AS cos, CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin
    }) { (s, d) =>
    val p = SimilaritySearch.prepared(Tables.embeddings(s, d))
    SimilaritySearch.srpTopK(
      SimilaritySearch.asQueries(p.filter(col("vec_id") < 10)),
      SimilaritySearch.asCorpus(p), k = 10, nPlanes = 4)
      .withColumn("cos", round(col("cos"), 4))
      .orderBy("query_id", "rnk")
  }

  /** IVF approximate top-k (8 lists, 3 probes, seeded KMeans quantizer). */
  val ivfAnn = OracleQuery.noOracle("x02_ivf_ann_topk") { (s, d) =>
    SimilaritySearch.ivfTopK(s, Tables.embeddings(s, d),
      (0L until 10L).toSeq, k = 10, nLists = 8, nProbe = 3)
      .withColumn("cos", round(col("cos"), 4))
      .orderBy("query_id", "rnk")
  }

  /** Multimodal feature extraction over the synthetic media table
    * (decode stubbed; Spark plumbing real — see MultimodalPipeline). */
  val multimodal = OracleQuery.noOracle("x03_multimodal_features") { (s, _) =>
    MultimodalPipeline.extractFeatures(MultimodalPipeline.synthesize(s, 120))
      .toDF()
      .withColumn("mean_byte", round(col("mean_byte"), 4))
      .withColumn("byte_entropy", round(col("byte_entropy"), 4))
      .orderBy("media_id")
  }

  /** Structured Streaming windowed rollup driven to completion over the
    * events table (file-source → watermark → tumbling window → memory sink).
    * Fully oracle-checked: append mode emits exactly the windows whose end
    * is at or before the final watermark (max event_time − 10 min), so the
    * batch SQL filters to closed windows — validated row-identical at
    * sf0.01 and sf0.1. */
  val streamRollup = OracleQuery(
    "x04_stream_windowed_counts",
    """WITH e AS (
      |  SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP)
      |           - INTERVAL (CAST(minute(ts) AS INT) % 5) MINUTE AS ws,
      |         event_type, value
      |  FROM events),
      |mx AS (SELECT CAST(max(ts) AS TIMESTAMP) AS m FROM events)
      |SELECT ws AS window_start, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM e, mx
      |WHERE ws + INTERVAL 5 MINUTE <= m - INTERVAL 10 MINUTE
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    // Landing dir reused across invocations so the normalization write runs
    // once per (source dir, landed schema) — the key is an md5 of both, so
    // distinct sources can't collide and a schema change in a later build
    // invalidates the old landing instead of silently serving stale columns.
    // (Single driver process; no concurrent-writer guard needed here.)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|${EventStream.eventSchema.json}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val landing = s"/tmp/graft_stream_landing_$key"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$landing/_SUCCESS")))
      Tables.events(s, d)
        .select("event_id", "event_time", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(landing)
    val sink = s"stream_sink_${java.util.UUID.randomUUID().toString.take(8)}"
    EventStream.runToMemorySink(
      EventStream.windowedCounts(EventStream.readEvents(s, landing)), sink)
      .withColumn("sum_value", round(col("sum_value"), 2))
      .orderBy("window_start", "event_type")
  }

  /** HLL-sketch approximate distinct counts (deterministic for fixed input,
    * but the sketch differs from DuckDB's → rows-only). */
  val approxDistinct = OracleQuery.noOracle("x05_approx_count_distinct") { (s, d) =>
    Tables.orders(s, d).agg(
      approx_count_distinct(col("o_custkey")).as("approx_cust"),
      approx_count_distinct(col("o_custkey"), rsd = 0.01).as("approx_cust_precise"),
      countDistinct(col("o_custkey")).as("exact_cust"))
  }

  /** IVF with a per-label mean quantizer — the SQL-expressible IVF tier
    * (see SimilaritySearch.ivfLabelTopK); fully oracle-checked. */
  val ivfLabelAnn = OracleQuery(
    "x06_ivf_label_ann_topk",
    """WITH e AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, v,
      |    sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
      |  FROM e),
      |ex AS (
      |  SELECT label, i AS pos, v[i] AS x
      |  FROM e, generate_series(1, 64) g(i)),
      |cm AS (SELECT label, pos, avg(x) AS m FROM ex GROUP BY 1, 2),
      |cent AS (
      |  SELECT label AS clabel, list(m ORDER BY pos) AS cv
      |  FROM cm GROUP BY label),
      |cent2 AS (
      |  SELECT clabel, cv, sqrt(list_sum(list_transform(cv, x -> x*x))) AS cnrm
      |  FROM cent),
      |asg AS (
      |  SELECT vec_id, v, nrm, clabel,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, clabel) AS rn
      |  FROM (
      |    SELECT n.vec_id, n.v, n.nrm, c.clabel,
      |      list_sum(list_transform(list_zip(n.v, c.cv), x -> x[1] * x[2]))
      |        / (n.nrm * c.cnrm) AS ccos
      |    FROM n, cent2 c) t),
      |corpus AS (SELECT vec_id, v, nrm, clabel FROM asg WHERE rn = 1),
      |probes AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, clabel
      |           FROM asg WHERE vec_id < 10 AND rn <= 3),
      |j AS (
      |  SELECT query_id, c.vec_id AS neighbor_id,
      |    list_sum(list_transform(list_zip(qv, c.v), x -> x[1] * x[2]))
      |      / (qn * c.nrm) AS cos
      |  FROM probes p JOIN corpus c
      |    ON p.clabel = c.clabel AND c.vec_id <> p.query_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cos DESC, neighbor_id) AS rnk
      |  FROM j)
      |SELECT query_id, neighbor_id, round(cos, 4) AS cos, CAST(rnk AS INT) AS rnk
      |FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    SimilaritySearch.ivfLabelTopK(Tables.embeddings(s, d), queryMaxId = 10, k = 10)
      .withColumn("cos", round(col("cos"), 4))
      .orderBy("query_id", "rnk")
  }

  val all: Seq[OracleQuery] =
    Seq(srpAnn, ivfAnn, multimodal, streamRollup, approxDistinct, ivfLabelAnn)
}
