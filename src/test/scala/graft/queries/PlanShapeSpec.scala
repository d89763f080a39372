package graft.queries

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the 100 TB design contract: filters and
  * projections must reach the parquet scan, dimension joins must broadcast,
  * and hot paths must stay inside whole-stage codegen. These tests pin the
  * *plan*, not the result, so a regression that silently de-optimizes (a
  * lost pushdown, a broadcast that became a shuffle) fails CI even though
  * results stay correct. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntryPlan(name)

  private def SparkEntryPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(SparkSpec.session, dir)
    df.queryExecution.executedPlan.toString
  }

  test("range filter pushes predicates into the parquet scan") {
    val plan = planOf("q02_filter_range")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(l_quantity,5.0)")
      || plan.contains("IsNotNull(l_quantity)"), plan.take(2000))
  }

  test("projection prunes the scan schema to referenced columns") {
    val plan = planOf("q13_top_nations")
    // orders scan must not read o_totalprice/o_orderdate etc.
    val scanLines = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!scanLines.contains("o_totalprice"), scanLines)
    assert(!scanLines.contains("o_orderpriority"), scanLines)
  }

  test("star joins broadcast the dimension sides") {
    val plan = planOf("q04_star_revenue")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // the only shuffle join allowed is lineitem⋈orders; nation/region/customer
    // must not introduce SortMergeJoin
    assert(!plan.contains("SortMergeJoin")
      || plan.sliding("SortMergeJoin".length).count(_ == "SortMergeJoin") <= 1)
  }

  test("semi/anti joins stay broadcast at dimension scale") {
    assert(planOf("q19_customers_with_orders").contains("BroadcastHashJoin")
      || planOf("q19_customers_with_orders").contains("ShuffledHashJoin"))
  }

  test("window dedup partitions by the dedup key (single exchange)") {
    val plan = planOf("q03_latest_order_per_customer")
    assert(plan.contains("hashpartitioning(o_custkey"), plan.take(3000))
  }

  test("banded near-dup candidates are an equi-join, never corpus×corpus") {
    // the 100 TB contract for v03/v05: candidate pairs come from the
    // (band, bucket) hash join; an all-pairs id_a < id_b theta join would
    // surface as BroadcastNestedLoopJoin / CartesianProduct
    for (q <- Seq("v03_emb_neardup_pairs", "v05_emb_dedup")) {
      val plan = planOf(q)
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q: ${plan.take(3000)}")
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(3000)}")
    }
  }

  test("IVF-PQ ANN restricts candidates before scoring — no corpus-wide work") {
    // x23: probe set broadcasts, candidates come from the cluster-key
    // equi-join, ADC scoring is a (query, s, code) hash join — never a
    // nested loop over corpus×queries. (The registry query materializes
    // via localCheckpoint, so rebuild the raw lazy pipeline, the x16
    // pattern.)
    import graft.operators.ProductQuantization
    import graft.functions.VectorFunctions.toDouble
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(SparkSpec.session, dir)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
    val cb = ProductQuantization.codebook(emb)
    val dists = ProductQuantization.subspaceDistances(emb, cb)
    val codes = ProductQuantization.encode(dists)
    val lut = dists.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("s"),
        col("cb_label").as("code"), col("dq"))
    val probes = lut.groupBy(col("query_id"), col("code").as("plabel"))
      .agg(sum(col("dq")).as("cdist"))
      .withColumn("r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist"), col("plabel"))))
      .filter(col("r") <= 2).select("query_id", "plabel")
    val out = emb.select(col("vec_id"), col("label").as("plabel"))
      .join(broadcast(probes), Seq("plabel"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(codes, Seq("vec_id"))
      .join(lut, Seq("query_id", "s", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("dq")).as("approx_dist"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("SemDeDup confines the quadratic to the cluster key equi-join") {
    // d32's within-cluster pair generation must be a hash join on the
    // cluster key (label) with the id ordering as a post-filter — never a
    // corpus×corpus nested loop
    val plan = planOf("d32_semantic_dedup")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("codegen dot product runs inside whole-stage codegen") {
    val df = graft.SparkEntry.queries("v04_emb_ann_topk")(SparkSpec.session, dir)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen span in the tree string
    val dotLine = plan.linesIterator.find(_.contains("dot_product_double"))
    assert(dotLine.isDefined, plan.take(3000))
    assert(dotLine.get.contains("*("), dotLine.get)
  }

  test("year/month partition layout prunes silver scans") {
    val s = SparkSpec.session
    val lake = java.nio.file.Files.createTempDirectory("prune_spec").toString
    graft.ingest.UsgsGeoJson.writeBronze(s"$lake/bronze/raw.json")
    graft.jobs.BronzeToSilver.run(s, s"$lake/bronze/raw.json", s"$lake/silver")
    val df = s.read.parquet(s"$lake/silver")
      .filter(col("year") === 2024 && col("month") === 1)
      .groupBy("magnitude_category").agg(count(lit(1)))
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("year") && scanLine.contains("month"), plan.take(2000))
  }

  test("prefix-filtered jaccard join never plans a cross join") {
    // the registry query materializes internally (its returned plan is a
    // checkpoint scan), so assert on the raw lazy plan instead
    val docs = Tables.documents(SparkSpec.session, dir)
    val plan = graft.operators.JaccardJoin
      .exactPairs(docs, 0.8, materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("image phash dedup candidates come from the band equi-join") {
    // x31: same no-cross-join discipline as every LSH tier — candidates
    // from the (band, value) hash join, never hashes × hashes
    val plan = planOf("x31_image_phash_dedup")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("containment join probes the inverted index with an equi-join") {
    // d44's 100 TB contract: probe-prefix × full-index candidates come
    // from the shingle hash join (with the ≠ and size bounds as residual
    // predicates), never an all-ordered-pairs theta join
    val docs = Tables.documents(SparkSpec.session, dir)
    val plan = graft.operators.JaccardJoin
      .containmentPairs(docs, 0.9, materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("bucketed co-located join has no exchange between scan and join") {
    val s = SparkSpec.session
    val df = graft.SparkEntry.queries("x08_bucketed_colocated_join")(s, dir)
    df.collect() // finalize adaptive plan (and materialize the bucket tables)
    val plan = df.queryExecution.executedPlan.toString
    // neither side may be hash-exchanged on the join key: bucketed scans
    // feed the join directly (SMJ at scale, or a broadcast under AQE at
    // tiny SF — both exchange-free on the key; shuffle was paid at write)
    assert(plan.contains("Bucketed: true"), plan.take(3000))
    assert(!plan.contains("Exchange hashpartitioning(custkey"), plan.take(3000))
  }

  test("salted aggregation keeps both phases as hash aggregates") {
    val plan = planOf("q36_salted_skew_agg")
    // two-phase decomposition: partial agg on (key, salt), final on key —
    // four HashAggregate nodes (partial+final per phase), no sort-based agg
    assert(plan.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 4,
      plan.take(3000))
    assert(!plan.contains("SortAggregate"), plan.take(3000))
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    val plan = planOf("q43_global_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("PII scrub is a pure per-row map — zero exchanges") {
    // d21 must run at scan speed: detection + redaction are projections,
    // so the plan may contain no shuffle at all (the trailing orderBy is
    // presentation-only and plans as a range-partitioned sort; everything
    // before it must be exchange-free). Assert on the pre-sort query.
    val docs = Tables.documents(SparkSpec.session, dir)
    val df = graft.SparkEntry.queries("d21_pii_scrub")(SparkSpec.session, dir)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    // exactly the one rangepartitioning exchange for the final sort
    assert(exchanges <= 1, plan.take(3000))
    assert(!plan.contains("hashpartitioning"), plan.take(3000))
    assert(docs.columns.contains("text")) // guard: table shape assumed above
  }

  test("hashed classifier scoring is a pure per-row map — zero exchanges") {
    // d31's model is baked into the row expression (hash → bucket →
    // md5-derived weight → sum), so like d21 the plan may contain only the
    // presentation sort's range exchange: model scoring runs at scan speed.
    val df = graft.SparkEntry.queries("d31_quality_classifier")(SparkSpec.session, dir)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, plan.take(3000))
    assert(!plan.contains("hashpartitioning"), plan.take(3000))
  }

  test("surprisal and boilerplate probes broadcast the small side") {
    // d23's term-bits table and d24's boilerplate set are vocabulary-scale;
    // the corpus-side probe must be a broadcast hash join, never a shuffle
    // of the exploded token/gram stream against them
    for (q <- Seq("d23_doc_unigram_surprisal", "d24_boilerplate_prune")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q: ${plan.take(3000)}")
    }
  }

  test("PQ ADC never plans a corpus×corpus join") {
    // x16's ADC is a broadcast LUT equi-join on (s, code) + one hash
    // aggregate — an all-pairs nested loop would defeat the point of PQ.
    // (The registry query materializes via localCheckpoint, so assert on
    // the raw lazy pipeline, the Jaccard pattern above.)
    import graft.operators.ProductQuantization
    import graft.functions.VectorFunctions.toDouble
    val emb = Tables.embeddings(SparkSpec.session, dir)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
    val cb = ProductQuantization.codebook(emb)
    val dists = ProductQuantization.subspaceDistances(emb, cb)
    val out = ProductQuantization.adcTopK(
      ProductQuantization.encode(dists), dists.filter(col("vec_id") < 5), 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("table profile computes every statistic in ONE scan") {
    // x17's contract: multi-aggregate + 1-row explode, not a
    // scan-per-column UNION — the plan must contain exactly one file scan
    val plan = planOf("x17_table_profile")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 scan, got $scans: ${plan.take(3000)}")
  }

  test("pagerank edge build broadcasts dims; supersteps reuse the pinned graph") {
    // x18: supplier/customer are broadcast; the only shuffle join is the
    // lineitem⋈orders fact join; the iteration input is a checkpoint scan
    val plan = planOf("x18_pagerank_trade")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("BM25 corpus stats are one broadcast row; top-k is TakeOrdered") {
    // d25's 100 TB contract: the per-doc side never shuffles against a
    // per-term table — corpus stats (N, avgdl, dfs) arrive as ONE broadcast
    // scalar row — and the global top-k is TakeOrderedAndProject, never a
    // full sort or a corpus-wide single-partition window
    val plan = planOf("d25_bm25_retrieval")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("repeated-span census joins grams back as an equi-join") {
    // d26: the gram-frequency join must be a hash equi-join on gram (hot
    // grams are bounded: one occurrence per (doc, position)), never a
    // nested loop
    val plan = planOf("d26_doc_repeated_spans")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("DSIR scoring probes broadcast vocab tables, never a join shuffle") {
    // d28: both vocab tables are broadcast (they are vocabulary-sized,
    // orders of magnitude under the corpus), so the token stream is never
    // shuffled for a join — the only exchanges are the count aggregations
    val df = graft.SparkEntry.queries("d28_dsir_importance")(SparkSpec.session, dir)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("ShuffledHashJoin"), plan.take(3000))
  }

  test("incremental near-dup probes the corpus index with an equi-join") {
    // d29: delta bands equi-join the corpus band table on (band, bucket);
    // an all-pairs delta×corpus nested loop would defeat the LSH index.
    // (The registry query materializes via localCheckpoint, so assert on
    // the raw lazy pipeline, the Jaccard pattern above.)
    val docs = Tables.documents(SparkSpec.session, dir)
    val plan = graft.operators.MinHashDedup.incrementalMatches(
        docs.filter(col("doc_id") % 10 === 7),
        docs.filter(col("doc_id") % 10 =!= 7),
        0.7, materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("weighted priority sample is a distributed top-k, never a full sort") {
    // d34: the corpus must reach the driver as at most k rows per
    // partition (TakeOrderedAndProject's per-partition heaps); a global
    // Sort+Limit would shuffle the whole table at 100 TB.
    val plan = planOf("d34_weighted_priority_sample")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("hybrid RRF towers join the corpus with hash joins, seeds broadcast") {
    // d35: the sparse tower's token intersection and the dense tower's
    // cosine scan both keep the seed side broadcast; the only nested-loop
    // product allowed is the tiny seeds×corpus rank grid (the q42
    // date-grid precedent) — corpus×corpus must never appear, which would
    // surface as a CartesianProduct.
    val plan = planOf("d35_hybrid_rrf")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("funnel and cohort queries key every heavy join on user/cohort ids") {
    // q49/q50: stage joins and retention joins must stay hash/broadcast
    // joins on their keys — a CartesianProduct would mean a stage search
    // degenerated to all-pairs. (The tiny 1-row/scalar-count assemblies
    // may broadcast-nested-loop; that is the q42 grid precedent.)
    for (q <- Seq("q49_event_funnel", "q50_cohort_retention")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(3000)}")
    }
    assert(planOf("q50_cohort_retention").contains("BroadcastHashJoin"))
  }

  test("epoch sharding reuses ONE hash exchange for window and census") {
    // d42: the window (position rank) and the census aggregate both key on
    // (epoch, shard) — the plan must carry a single hashpartitioning
    // exchange through both, plus only the final presentation range sort.
    // A second hash exchange would double-shuffle the corpus per epoch.
    val plan = planOf("d42_epoch_shard_plan")
    val hashExchanges = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("token-budget selection (d54) cumsum is bucketed, never a global window") {
    // the greedy charge must run as the composite-key two-pass shape: a
    // range exchange on (quality, doc_id) pinned at a checkpoint, a
    // __pid-keyed local cumsum (hash exchange on the partition id), plus
    // at most the two structural SinglePartition exchanges — a naive
    // Window.orderBy would show no __pid exchange and drag every row
    // through the single partition
    val plan = planOf("d54_token_budget_select")
    assert(plan.contains("hashpartitioning(__pid"),
      s"missing the partitioned local-cumsum exchange:\n${plan.take(3000)}")
    val singles = plan.sliding("Exchange SinglePartition".length)
      .count(_ == "Exchange SinglePartition")
    // two tiny single-partition exchanges are structural: the per-bucket
    // totals (one row per bucket) and the 1-row budget aggregate — a
    // third would mean corpus rows entered a global stage
    assert(singles <= 2, s"expected at most the bucket-total + budget " +
      s"single-partition exchanges, got $singles:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("k-means assignment is a pure map; vectors never shuffle") {
    // v11: the centroids inline as literals into the argmin expression, so
    // the assignment pass must plan NO join against the corpus and no
    // vec_id exchange — the only exchanges are the k·64-cell mean/size
    // aggregates (cid-keyed) and the 8-row size join back (broadcast).
    val plan = planOf("v11_kmeans_clusters")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"vectors shuffled in the assignment pass:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("recall evaluation harnesses join candidate and truth sets by key") {
    // v10/d38: the eval join is (query,neighbor)/(doc_a,doc_b) equi-join
    // over two bounded result sets — never a nested loop over either side.
    for (q <- Seq("v10_ann_recall_eval", "d38_lsh_recall_eval")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(3000)}")
    }
  }

  test("events scan prunes to referenced columns only") {
    val df = Tables.events(SparkSpec.session, dir)
      .groupBy("event_type").agg(count(lit(1)))
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!scan.contains("props"), scan)
    assert(!scan.contains("value"), scan)
  }

  test("events normalization is projection-only: pushdown and pruning survive") {
    // The ts/event_time normalization in Tables.events is a per-row
    // projection, so Catalyst must still (a) push a filter on an untouched
    // source column into the parquet scan and (b) prune ts itself away when
    // no derived column is referenced — at 100 TB the difference between
    // scanning two columns and scanning six is the query.
    val df = Tables.events(SparkSpec.session, dir)
      .filter(col("event_type") === "click")
      .select("user_id", "event_type")
    val scanLines = df.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("ReadSchema") || l.contains("PushedFilters"))
      .mkString("\n")
    assert(scanLines.contains("EqualTo(event_type,click)"), scanLines)
    val readFields = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(scanLines).map(_.group(1)).getOrElse(fail(scanLines))
      .split(",").map(_.split(":")(0).trim).toSet
    assert(readFields === Set("user_id", "event_type"), scanLines)
  }

  test("composed curation pipeline (d47) keeps its composition scale-safe") {
    // The stages' own shapes are pinned standalone (Jaccard/containment
    // no-cross-join, components salted supersteps, PrefixSum two-pass);
    // this pins what only COMPOSITION can regress. The upstream stages
    // materialize eagerly (checkpoint/cache boundaries), so the returned
    // plan is the lazy tail: anti-joins → PII projection → surprisal probe
    // → quartile rank → mix filter → shard plan.
    val df = graft.SparkEntry.queries("d47_curation_pipeline")(SparkSpec.session, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the only nested-loop joins allowed are the two 1-row broadcasts
    // (surprisal total, quartile denominator); anything larger is a
    // composition regression
    val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"$bnlj nested-loop joins: ${plan.take(3000)}")
    // the shard position window partitions by (epoch, shard) — the corpus
    // is never funneled through an unpartitioned window
    assert(plan.contains("hashpartitioning(epoch"), plan.take(3000))
    // composition tripwire: the lazy tail stays within a bounded exchange
    // budget (measured 10 at sf0.001; headroom for AQE variance, but a
    // stage accidentally un-pinned or a join degrading to shuffle trips it)
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 14, s"$exchanges exchanges: ${plan.take(3000)}")
  }

  test("suffix-array LRS (d48) stays candidate-bounded") {
    // The doubling supersteps materialize eagerly (checkpoint per step);
    // the returned plan is the lazy tail: sa window → suffix slices →
    // adjacency join → LCP max → census. Pins: the only cross join is the
    // broadcast of the 1-row L aggregate; adjacency is an equi-join on
    // sa_pos (never a nested loop over suffix pairs); the census groups by
    // span hash-partitioned — the corpus never funnels through a single
    // unpartitioned window or a quadratic pair build.
    val df = graft.SparkEntry.queries("d48_suffix_lrs")(SparkSpec.session, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"$bnlj nested-loop joins: ${plan.take(3000)}")
    assert(plan.contains("hashpartitioning(span"), plan.take(3000))
  }

  test("exact-substring dedup (d51) masks via doc-keyed windows, no pair build") {
    // The suffix construction materializes eagerly (checkpoint per
    // superstep); the lazy tail is: sa window → adjacency equi-join on
    // sa_pos → lmax side-joins → start/token join → per-doc running-max
    // window → rebuild rollup. Pins: no cartesian/nested-loop anywhere
    // (there is no 1-row broadcast in this query — unlike d48 it never
    // crosses with an L aggregate); the adjacency and LCP joins key on
    // sa_pos; the interval-union mask and the rebuild partition by
    // doc_id — a span explode or corpus-wide window would change shape.
    val sv = graft.functions.TextFunctions
      .canonSurvivorToks(Tables.documents(SparkSpec.session, dir))
    val df = graft.operators.SuffixArray.removeRepeatedSpans(sv, 50)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("hashpartitioning(sa_pos"), plan.take(3000))
    assert(plan.contains("hashpartitioning(doc_id"), plan.take(3000))
  }

  test("bench decontamination (d53) run ids are balanced, no pair build") {
    // The suffix construction AND the run table materialize eagerly (the
    // run table — boundary equi-join on sa_pos + two-pass prefix count —
    // is pinned because it feeds both the bench-membership aggregate and
    // the semi-join probe; the sa_pos adjacency shape stays pinned by the
    // d51 spec above, whose tail keeps it lazy). The lazy tail here is:
    // run-keyed bench-membership semi-join → per-doc running-max mask →
    // rebuild rollup. Pins: no cartesian/nested-loop pair build anywhere;
    // run grouping hash-partitions on the run id; mask and rebuild
    // partition by doc_id.
    val all = Tables.documents(SparkSpec.session, dir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val df = graft.operators.SuffixArray
      .removeSharedSpans(all, col("doc_id") % 40 === 0, 13)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("hashpartitioning(__run"), plan.take(3000))
    assert(plan.contains("hashpartitioning(doc_id"), plan.take(3000))
  }

  test("guarded LSH (d49) candidates stay bucket-keyed") {
    // The guard must not cost the plan its shape: candidates still come
    // from (band, bucket) hash exchanges — never a cartesian pair build —
    // and the star path adds only window functions inside the same
    // bucket partitioning. Inspect the raw lazy plan (the registered
    // query materializes, leaving only an ExistingRDD tail).
    val docs = Tables.documents(SparkSpec.session, dir)
    val df = graft.operators.MinHashDedup
      .verifiedPairs(docs, 0.7, materialize = false, maxBucketSize = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("hashpartitioning(b"), plan.take(3000))
  }

  test("novelty (d50) is two gram-keyed exchanges plus the doc rollup") {
    // first-seen aggregate and join back both key on gram; the rollup
    // keys on doc_id; nothing corpus-wide funnels through one partition
    val df = graft.SparkEntry.queries("d50_doc_novelty")(SparkSpec.session, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("hashpartitioning(gram"), plan.take(3000))
    assert(plan.contains("hashpartitioning(doc_id"), plan.take(3000))
  }

  test("JL ANN (v12) broadcasts the matrix and the query side") {
    // the 16-row Rademacher matrix and the |Q|-row projected query set
    // broadcast; the corpus never shuffles for the coarse pass, and the
    // only nested-loop joins are those two broadcasts (the =!= predicate)
    val df = graft.SparkEntry.queries("v12_emb_jl_rerank_ann")(SparkSpec.session, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("BroadcastExchange"), plan.take(3000))
    val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"$bnlj nested-loop joins: ${plan.take(3000)}")
  }
}
