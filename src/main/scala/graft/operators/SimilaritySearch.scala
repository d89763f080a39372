package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers, trading recall for scan fraction:
  *  - [[bruteForceTopK]] — exact O(|Q|·N) baseline (what VectorQueries
  *    exposes to the oracle);
  *  - [[srpTopK]] — signed-random-projection LSH: corpus bucketed by the
  *    sign pattern of `nPlanes` fixed hyperplane projections; queries probe
  *    their own bucket plus all hamming-1 neighbors (multi-probe);
  *  - [[ivfTopK]] — IVF: KMeans coarse quantizer (seeded), corpus
  *    partitioned into nLists inverted lists, queries scan the nProbe
  *    nearest lists.
  *
  * Scale: both approximate tiers turn the O(N) scan per query into a
  * bucket-equi-join — a hash shuffle on bucket id — so cost per query is
  * the expected bucket population, not N. Recall on *random* vectors is
  * roughly the scanned fraction; on real clustered embeddings it is far
  * higher (neighbors co-bucket). Expected-vs-measured recall is asserted
  * in SimilaritySearchSpec.
  */
object SimilaritySearch {

  /** (id, v: array<double>, nrm) projection of an embeddings table. */
  def prepared(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))

  /** Exact top-k for each query id (queries must be a subset projection of
    * the corpus with columns query_id/qv/qn). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries)
      .join(corpus, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk"))
  }

  def asQueries(p: DataFrame): DataFrame =
    p.select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))

  def asCorpus(p: DataFrame): DataFrame =
    p.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))

  /** SRP-LSH bucketed top-k with hamming-1 multi-probe. */
  def srpTopK(queriesP: DataFrame, corpusP: DataFrame, k: Int,
              nPlanes: Int = 4, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = srpPlanes(nPlanes, dim, seed)
    val corpus = corpusP.withColumn("bucket", srpBucket(col("cv"), planes))
    // each query probes its own bucket and every bucket at hamming dist 1
    val probes = (0L +: (0 until nPlanes).map(1L << _)).map(lit)
    val queries = queriesP
      .withColumn("qbucket", srpBucket(col("qv"), planes))
      .withColumn("probe", explode(array(probes: _*)))
      .withColumn("bucket", col("probe").bitwiseXOR(col("qbucket")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(queries)
      .join(corpus, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk"))
  }

  /** IVF: seeded KMeans coarse quantizer; queries scan the nProbe nearest
    * inverted lists. Centroids are broadcast (nLists ≪ N). */
  def ivfTopK(spark: SparkSession, emb: DataFrame, queryIds: Seq[Long], k: Int,
              nLists: Int = 8, nProbe: Int = 3, seed: Long = 42L): DataFrame = {
    val p = prepared(emb)
    val withVec = p.withColumn("features", array_to_vector(col("v")))
    // random init + few iterations: a coarse quantizer doesn't need
    // k-means|| convergence, and each MLlib iteration is a full Spark job
    val km = new KMeans().setK(nLists).setSeed(seed).setFeaturesCol("features")
      .setInitMode("random").setMaxIter(8)
    val model = km.fit(withVec)
    val assigned = model.transform(withVec)
      .select(col("vec_id"), col("v"), col("nrm"), col("prediction").as("list_id"))

    // centroid table (tiny) — distance from each query to each centroid
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("list_id", "centroid")

    val queries = assigned.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("list_id"))
    val probeLists = queries.crossJoin(broadcast(centroids))
      .withColumn("dist",
        -dot(col("qv"), col("centroid")) / (col("qn") * l2Norm(col("centroid"))))
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("list_id"))

    val corpus = assigned.select(col("vec_id").as("neighbor_id"),
      col("v").as("cv"), col("nrm").as("cn"), col("list_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(probeLists)
      .join(corpus, Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk"))
  }

  /** IVF with a per-label mean-vector quantizer: inverted lists are the
    * label classes, centroids are the per-dimension class means — entirely
    * relational (posexplode → grouped avg → collect), so unlike the KMeans
    * tier this one is SQL-expressible end-to-end and DuckDB-oracle-checked
    * (x06). One centroid ranking serves both corpus assignment (rank 1)
    * and query probing (rank ≤ nProbe). */
  def ivfLabelTopK(emb: DataFrame, queryMaxId: Long, k: Int,
                   nProbe: Int = 3): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val cent = e
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x")).as("m"))
      .groupBy(col("label").as("clabel"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))
      .withColumn("cnrm", l2Norm(col("cv")))

    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("clabel"))
    val asg = e.crossJoin(broadcast(cent))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .withColumn("rn", row_number().over(wAssign))
      .select("vec_id", "v", "nrm", "clabel", "rn")

    val corpus = asg.filter(col("rn") === 1)
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv2"),
        col("nrm").as("cn"), col("clabel"))
    val probes = asg.filter(col("vec_id") < queryMaxId && col("rn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("clabel"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(probes)
      .join(corpus, Seq("clabel"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("cv2")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk"))
  }

  /** LSH-banded cosine near-duplicate PAIRS — the scale-safe replacement
    * for the all-pairs `id_a < id_b` theta join (which is a broadcast
    * nested loop over N²/2 candidates): `nBands` independent SRP bands of
    * `planesPerBand` hyperplanes each; two vectors are candidates iff they
    * share a (band, bucket) key in at least one band — a plain equi-join
    * shuffle keyed by (band, bucket) — and only candidates get the exact
    * cosine, with the threshold applied to the ROUNDED value so borderline
    * float noise cannot flip membership. Multi-band collisions collapse
    * via distinct on the emitted pair.
    *
    * Semantics: banded (like the SimHash-chunk d09 and MinHash-LSH d07
    * detectors) — recall for a pair at angle θ is 1-(1-p^r)^B with
    * p = 1-θ/π. Tune: more planes/band → fewer candidates, lower recall;
    * more bands → higher recall, more candidate volume. At 100 TB, grow
    * planesPerBand ~ log2(N) to keep expected bucket population constant.
    *
    * `maxBucket` is the mega-bucket guard: a dense region of embedding
    * space can land a large fraction of the corpus in ONE (band, bucket)
    * cell, and the within-bucket join is quadratic in the cell size — the
    * classic LSH failure at scale. Cells above the cap contribute no
    * candidates (documented recall trade: a pair colliding ONLY in capped
    * cells is missed; with 8 independent bands the loss is tiny unless the
    * corpus is pathologically concentrated). The default never triggers at
    * test SFs — it exists to bound the worst case, not to change results.
    */
  def bandedNearDupPairs(emb: DataFrame, threshold: Double,
                         nBands: Int = 8, planesPerBand: Int = 4,
                         dim: Int = 64, seed: Long = 42L,
                         maxBucket: Int = 4096): DataFrame = {
    val planes = srpPlanes(nBands * planesPerBand, dim, seed)
    val p = prepared(emb)
    val buckets = array(planes.grouped(planesPerBand).toSeq
      .map(ps => srpBucket(col("v"), ps)): _*)
    // Candidate keys only through the band join — a pair colliding in k of
    // the 8 bands would otherwise be exact-verified k times (and drag two
    // 64-dim vectors through the shuffle each time). Dedup the (id_a, id_b)
    // keys FIRST, then join the vectors back and verify each pair once —
    // the standard LSH candidate/verify split. Result set is identical
    // (same pairs, same rounded cosine), so the oracle mirror is unchanged.
    val banded = p.withColumn("bks", buckets)
      .select(col("vec_id"), posexplode(col("bks")).as(Seq("band", "bucket")))
    // mega-bucket guard: cell census is tiny (bands × 2^planes rows),
    // broadcast it and drop oversized cells BEFORE the within-cell join
    val cells = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") <= maxBucket)
      .select("band", "bucket")
    val kept = banded.join(broadcast(cells), Seq("band", "bucket"))
    val cand = kept.select(col("band"), col("bucket"), col("vec_id").as("id_a"))
      .join(kept.select(col("band"), col("bucket"), col("vec_id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(p.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")),
        Seq("id_a"))
      .join(p.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")),
        Seq("id_b"))
      .withColumn("cos_sim",
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** SemDeDup survivor set (Abbas et al. 2023): within each coarse cluster
    * (`label`), drop every vector whose cosine to a lower-id cluster-mate
    * reaches `eps`; the min-id vector survives as the semantic
    * representative. Input needs (vec_id, label, embedding); output is the
    * surviving (vec_id, label) rows.
    *
    * Mega-cluster guard: the within-cluster join is quadratic in cluster
    * population, and the published algorithm's only defense is "raise k".
    * The operator defends itself the same way [[bandedNearDupPairs]]'
    * maxBucket does — a tiny label census (k rows, broadcast) excludes
    * clusters above `maxCluster` from pruning entirely, so every row of an
    * oversized cluster survives (a documented recall trade, never a
    * quadratic cell). One skewed cluster holding 10% of a 100 TB corpus
    * thus costs one anti-join, not (0.1·N)² candidate pairs. Inert at test
    * SFs by design; SimilaritySearchSpec pins the skewed-fixture behavior.
    */
  def semDedupSurvivors(emb: DataFrame, eps: Double,
                        maxCluster: Int = 4096): DataFrame = {
    val n = emb
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val keptLabels = n.groupBy("label").agg(count(lit(1)).as("cluster_n"))
      .filter(col("cluster_n") <= maxCluster)
      .select("label")
    val scoped = n.join(broadcast(keptLabels), Seq("label"))
    val a = scoped.select(col("vec_id").as("id_a"), col("label"),
      col("v").as("va"), col("nrm").as("na"))
    val b = scoped.select(col("vec_id").as("id_b"), col("label"),
      col("v").as("vb"), col("nrm").as("nb"))
    val drop = a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= eps)
      .select(col("id_b").as("vec_id")).distinct()
    emb.join(drop, Seq("vec_id"), "left_anti")
      .select("vec_id", "label")
  }

  /** Recall@k of an approximate result against the exact baseline. */
  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val a = approx.select("query_id", "neighbor_id")
    val hits = a.join(exact.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "inner").count()
    hits.toDouble / exact.count()
  }
}
