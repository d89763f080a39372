package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Analytic-function breadth beyond the reference's single row_number
  * (SURVEY §2.5 notes what the reference lacks — these are the standard
  * warehouse asks a migrating user hits next): running frames, lag/lead,
  * exact percentiles, pivoted conditional aggregation. */
object AnalyticQueries {

  /** Running total + previous-order gap per customer (frame spec + lag). */
  val q26 = OracleQuery(
    "q26_running_totals",
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
      |  lag(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
      |  lead(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS next_orderkey
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_spend"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ≡ DuckDB
    * `quantile_cont`). */
  val q27 = OracleQuery(
    "q27_percentiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        // exact interpolated percentile (matches quantile_cont), not the
        // GK-sketch percentile_approx
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90"),
        round(percentile(col("l_extendedprice"), lit(0.99)), 4).as("p99"))
      .orderBy("l_returnflag")
  }

  /** String-function suite: case, pad, substring, replace, position. */
  val q28 = OracleQuery(
    "q28_string_suite",
    """SELECT c_custkey,
      |  upper(c_mktsegment) AS seg_upper,
      |  lower(c_name) AS name_lower,
      |  substring(c_name, 1, 8) AS name_prefix,
      |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
      |  replace(c_name, '#', '-') AS name_dashed,
      |  CAST(strpos(c_name, '#') AS INT) AS hash_pos,
      |  CAST(length(c_name) AS INT) AS name_len
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
        regexp_replace(col("c_name"), "#", "-").as("name_dashed"),
        instr(col("c_name"), "#").as("hash_pos"),
        length(col("c_name")).as("name_len"))
      .orderBy("c_custkey")
  }

  /** Pivoted conditional aggregation (groupBy().pivot() on a closed value
    * set; oracle mirrors with CASE — the portable form of PIVOT). */
  val q29 = OracleQuery(
    "q29_pivot_status_counts",
    """SELECT o_orderpriority,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_f,
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_o,
      |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("status_f"),
        coalesce(col("O"), lit(0L)).as("status_o"),
        coalesce(col("P"), lit(0L)).as("status_p"))
      .orderBy("o_orderpriority")
  }

  /** Set operations the reference lacks: INTERSECT / EXCEPT (both
    * set-semantic — dedup applied, matching Spark intersect/except). */
  val q30 = OracleQuery(
    "q30_set_ops",
    """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      |     o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      |     both_ AS (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o),
      |     only_f AS (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
      |SELECT o_custkey, 'both' AS side FROM both_
      |UNION ALL
      |SELECT o_custkey, 'only_f' AS side FROM only_f
      |ORDER BY side, o_custkey""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d)
    val f = orders.filter(col("o_orderstatus") === "F").select("o_custkey")
    val o = orders.filter(col("o_orderstatus") === "O").select("o_custkey")
    f.intersect(o).withColumn("side", lit("both"))
      .union(f.except(o).withColumn("side", lit("only_f")))
      .orderBy("side", "o_custkey")
  }

  /** Null-safe equality (`<=>` / IS NOT DISTINCT FROM) — the join nuance
    * SURVEY §7.5.4 contrasts with J4's null-dropping `===`. Null regions
    * (synthesized for odd keys) match each other instead of dropping. */
  val q31 = OracleQuery(
    "q31_null_safe_equality",
    """WITH t AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment END AS seg
      |  FROM customer)
      |SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
      |FROM t a JOIN t b
      |  ON a.seg IS NOT DISTINCT FROM b.seg AND a.c_custkey < b.c_custkey
      |WHERE a.c_custkey <= 20
      |ORDER BY key_a, key_b""".stripMargin) { (s, d) =>
    val t = Tables.customer(s, d)
      .select(col("c_custkey"),
        when(col("c_custkey") % 2 === 0, col("c_mktsegment")).as("seg"))
    t.as("a").join(t.as("b"),
        col("a.seg") <=> col("b.seg") && col("a.c_custkey") < col("b.c_custkey"))
      .filter(col("a.c_custkey") <= 20)
      .select(col("a.c_custkey").as("key_a"), col("b.c_custkey").as("key_b"))
      .orderBy("key_a", "key_b")
  }

  /** Ranking-function family: rank/dense_rank/ntile/percent_rank/cume_dist
    * (deterministic under a total order). */
  val q32 = OracleQuery(
    "q32_ranking_suite",
    """SELECT o_orderstatus, o_orderkey,
      |  CAST(rank() OVER w AS INTEGER) AS rnk,
      |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM orders
      |WHERE o_custkey <= 50
      |WINDOW w AS (PARTITION BY o_orderstatus
      |             ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderstatus, rnk, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 50)
      .select(col("o_orderstatus"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_orderstatus", "rnk", "o_orderkey")
  }

  /** Conditional-expression family: coalesce/nullif/least/greatest/CASE
    * over synthesized nulls. */
  val q33 = OracleQuery(
    "q33_conditional_suite",
    """SELECT c_custkey,
      |  coalesce(seg, 'NONE') AS seg_or_none,
      |  nullif(c_mktsegment, 'BUILDING') AS seg_not_building,
      |  round(least(c_acctbal, 5000.0), 2) AS capped_low,
      |  round(greatest(c_acctbal, 0.0), 2) AS capped_high,
      |  CASE WHEN seg IS NULL THEN 'missing'
      |       WHEN c_acctbal < 0 THEN 'debtor'
      |       ELSE 'ok' END AS status
      |FROM (
      |  SELECT c_custkey, c_mktsegment, c_acctbal,
      |    CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment END AS seg
      |  FROM customer) t
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .withColumn("seg", when(col("c_custkey") % 3 === 0, col("c_mktsegment")))
      .select(col("c_custkey"),
        coalesce(col("seg"), lit("NONE")).as("seg_or_none"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_not_building"),
        round(least(col("c_acctbal"), lit(5000.0)), 2).as("capped_low"),
        round(greatest(col("c_acctbal"), lit(0.0)), 2).as("capped_high"),
        when(col("seg").isNull, "missing")
          .when(col("c_acctbal") < 0, "debtor")
          .otherwise("ok").as("status"))
      .orderBy("c_custkey")
  }

  /** Array-function family over the embedding column: slice, concat,
    * contains, position, sort, reverse (all order-deterministic). */
  val q34 = OracleQuery(
    "q34_array_suite",
    """SELECT vec_id,
      |  CAST(len(embedding) AS INT) AS n_dims,
      |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
      |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_dim,
      |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_dim,
      |  round(CAST(list_sort(embedding)[len(embedding)] AS DOUBLE), 6) AS sorted_last,
      |  round(CAST(list_reverse(embedding)[1] AS DOUBLE), 6) AS last_dim,
      |  CAST(len(list_slice(embedding, 1, 8)) AS INT) AS head_len
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = col("embedding")
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        size(e).as("n_dims"),
        round(element_at(e, 1).cast("double"), 6).as("first_dim"),
        round(array_max(e).cast("double"), 6).as("max_dim"),
        round(array_min(e).cast("double"), 6).as("min_dim"),
        round(element_at(sort_array(e), size(e)).cast("double"), 6).as("sorted_last"),
        round(element_at(reverse(e), 1).cast("double"), 6).as("last_dim"),
        size(slice(e, 1, 8)).as("head_len"))
      .orderBy("vec_id")
  }

  /** CUBE grouping sets (all four aggregation levels in one pass through
    * Expand) — completes the grouping-sets family next to q21's ROLLUP. */
  val q35 = OracleQuery(
    "q35_cube_returnflag_status",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select("l_returnflag", "l_linestatus", "gid", "n", "revenue")
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** Skew-safe two-phase aggregation ([[graft.operators.SkewUtils
    * .saltedSumCount]]): a hot key's rows spread over salt partitions in
    * the partial phase, so no single reducer owns a hot key. The oracle is
    * the PLAIN single-phase GROUP BY — result-identicality of the salted
    * decomposition is exactly what's being verified (l_quantity is
    * integral, so the two-phase double sum is exact). l_returnflag has 3
    * values over the whole table — maximal skew for a keyed aggregate. */
  val q36 = OracleQuery(
    "q36_salted_skew_agg",
    """SELECT l_returnflag, count(*) AS n,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    graft.operators.SkewUtils
      .saltedSumCount(Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity")
      .select(col("l_returnflag"), col("n"),
        round(col("sum_value"), 2).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Correlated scalar subquery — each order compared against its own
    * customer's average order price. Catalyst decorrelates this into an
    * aggregate + join (no per-row subquery execution); both engines run
    * the identical SQL text. */
  val q37 = OracleQuery(
    "q37_correlated_subquery",
    """SELECT o_custkey AS c_custkey, count(*) AS n_above_avg
      |FROM orders o
      |WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
      |                      WHERE o2.o_custkey = o.o_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("q37_orders")
    s.sql(
      """SELECT o_custkey AS c_custkey, count(*) AS n_above_avg
        |FROM q37_orders o
        |WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM q37_orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** RANGE window frame over event time — trailing-hour totals per user
    * (rate-limit / rolling-rate analytics). Unlike q26's ROWS frame, the
    * frame bound is a VALUE distance on the ordering column (epoch micros),
    * so timestamp ties are all peers of the current row in both engines. */
  val q38 = OracleQuery(
    "q38_range_frame_trailing_hour",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, value
      |  FROM events)
      |SELECT user_id, event_id,
      |  CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
      |  round(sum(value) OVER w, 2) AS value_last_hour
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY t_us
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("t_us")
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("event_time")).as("t_us"), col("value"))
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_last_hour"),
        round(sum(col("value")).over(w), 2).as("value_last_hour"))
      .orderBy("user_id", "event_id")
  }

  /** GROUPING SETS — the general form of q21's ROLLUP / q35's CUBE: an
    * explicit lattice of grouping levels in one pass (Spark expands to a
    * single Expand + hash aggregate, no per-level rescan). Grouped-out
    * columns are marked with a sentinel via coalesce so both engines emit
    * identical rows without relying on engine-specific grouping_id bit
    * orders. */
  val q39 = OracleQuery(
    "q39_grouping_sets",
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("q39_lineitem")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM q39_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** Statistical aggregate suite — correlation, covariance, dispersion and
    * simple linear regression per group, all in one partial-aggregable
    * pass (each is a co-moment sketch that merges across partitions — the
    * shape that scales). Ratio-valued outputs (corr, slope, r2) are O(1)
    * magnitude, and the co-moment inputs here are small enough that a 4-dp
    * round absorbs summation-order float noise. */
  val q40 = OracleQuery(
    "q40_stats_suite",
    """SELECT l_returnflag,
      |  count(*) AS n,
      |  round(stddev_samp(l_quantity), 4) AS sd_qty,
      |  round(var_samp(l_quantity), 4) AS var_qty,
      |  round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc,
      |  round(covar_pop(l_quantity, l_discount), 4) AS covp_qty_disc,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      |  round(regr_slope(l_extendedprice, l_quantity), 2) AS slope_price_qty,
      |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS icpt_price_qty,
      |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2_price_qty
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qty_disc"),
        round(covar_pop(col("l_quantity"), col("l_discount")), 4).as("covp_qty_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 2).as("slope_price_qty"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2).as("icpt_price_qty"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 4).as("r2_price_qty"))
      .orderBy("l_returnflag")
  }

  /** Incremental upsert (lakehouse MERGE semantics without Delta): a delta
    * batch of corrected orders (the trailing window, prices restated)
    * merged into the base snapshot — delta wins on key collision, both
    * sides' unmatched rows survive. One full-outer join on the key +
    * coalesce per column: the merge shape that works at any scale (key
    * hash shuffle, no driver involvement), and what `MERGE INTO` lowers
    * to on engines without transactional sinks. */
  val q41 = OracleQuery(
    "q41_incremental_upsert",
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
      |delta AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    round(o_totalprice + 100, 2) AS o_totalprice
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
      |SELECT coalesce(d.o_orderkey, b.o_orderkey) AS o_orderkey,
      |  coalesce(d.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
      |  coalesce(d.o_totalprice, b.o_totalprice) AS o_totalprice,
      |  CASE WHEN d.o_orderkey IS NOT NULL THEN 'delta' ELSE 'base' END AS src
      |FROM base b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d)
    val base = orders
      .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
    val delta = orders
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")))
      .select(col("o_orderkey").as("d_orderkey"),
        col("o_orderstatus").as("d_orderstatus"),
        round(col("o_totalprice") + 100, 2).as("d_totalprice"))
    base.join(delta, col("o_orderkey") === col("d_orderkey"), "full_outer")
      .select(
        coalesce(col("d_orderkey"), col("o_orderkey")).as("o_orderkey"),
        coalesce(col("d_orderstatus"), col("o_orderstatus")).as("o_orderstatus"),
        coalesce(col("d_totalprice"), col("o_totalprice")).as("o_totalprice"),
        when(col("d_orderkey").isNotNull, "delta").otherwise("base").as("src"))
      .orderBy("o_orderkey")
  }

  /** Time-series gap filling — the resample step before any rolling-window
    * feature: a dense (day × priority) grid built engine-side with
    * sequence+explode (never a driver loop), daily order counts left-joined
    * onto it, gaps zero-filled, plus the running cumulative count per
    * priority. The grid sides are tiny (days × a 5-value dimension), so
    * the only full-data shuffle is the daily aggregate itself. */
  val q42 = OracleQuery(
    "q42_date_gapfill",
    """WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS dmin,
      |                  CAST(max(o_orderdate) AS DATE) AS dmax FROM orders),
      |days AS (SELECT CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS DATE)
      |           AS day FROM b),
      |prios AS (SELECT DISTINCT o_orderpriority FROM orders),
      |grid AS (SELECT day, o_orderpriority FROM days CROSS JOIN prios),
      |daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority,
      |    count(*) AS n
      |  FROM orders GROUP BY 1, 2)
      |SELECT g.day, g.o_orderpriority,
      |  CAST(coalesce(d.n, 0) AS BIGINT) AS n,
      |  CAST(sum(coalesce(d.n, 0)) OVER (PARTITION BY g.o_orderpriority
      |    ORDER BY g.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
      |FROM grid g LEFT JOIN daily d
      |  ON d.day = g.day AND d.o_orderpriority = g.o_orderpriority
      |ORDER BY g.o_orderpriority, g.day""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d)
    val bounds = orders.agg(
      min(to_date(col("o_orderdate"))).as("dmin"),
      max(to_date(col("o_orderdate"))).as("dmax"))
    val days = bounds.select(
      explode(sequence(col("dmin"), col("dmax"))).as("day"))
    val prios = orders.select("o_orderpriority").distinct()
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"), col("o_orderpriority"))
      .agg(count(lit(1)).as("dn"))
    val w = Window.partitionBy("o_orderpriority").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    days.crossJoin(prios)
      .join(daily, Seq("day", "o_orderpriority"), "left")
      .withColumn("n", coalesce(col("dn"), lit(0L)))
      .select(col("day"), col("o_orderpriority"), col("n"),
        sum(col("n")).over(w).as("cum_n"))
      .orderBy("o_orderpriority", "day")
  }

  /** Global top-k — `ORDER BY … LIMIT k` planned as TakeOrderedAndProject:
    * each partition keeps a k-row heap and only k·partitions rows reach the
    * driver-side merge, never a full global sort (the difference between a
    * top-25 and sorting 100 TB). Tie-broken on the full key so the row set
    * is deterministic. */
  val q43 = OracleQuery(
    "q43_global_topk",
    """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 25""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"),
        col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(25)
      .drop("l_extendedprice")
  }

  /** Z-order (Morton) clustering keys — the data-layout operator behind
    * multi-dimensional data skipping ([[graft.operators.ZOrder]]): quantity
    * and price quantized into 256-cell grids from their GLOBAL bounds (one
    * broadcast aggregate, no driver round-trip), bit-interleaved into a
    * 16-bit Morton key. The census per 256-key z-bucket pins the exact key
    * assignment of every row in both engines — quantization and
    * interleaving are integer/IEEE-identical arithmetic. */
  val q44 = OracleQuery(
    "q44_zorder_clustering", {
      val interleave = (0 until 8).map(b =>
        s"(((cx >> $b) & 1) << ${2 * b}) | (((cy >> $b) & 1) << ${2 * b + 1})")
        .mkString(" | ")
      s"""WITH b AS (
         |  SELECT min(l_quantity) AS xmin, max(l_quantity) AS xmax,
         |         min(l_extendedprice) AS ymin, max(l_extendedprice) AS ymax
         |  FROM lineitem),
         |c AS (
         |  SELECT
         |    CASE WHEN xmax = xmin THEN 0
         |         ELSE CAST(least(floor((l_quantity - xmin) / (xmax - xmin) * 256),
         |                         255) AS BIGINT) END AS cx,
         |    CASE WHEN ymax = ymin THEN 0
         |         ELSE CAST(least(floor((l_extendedprice - ymin) / (ymax - ymin) * 256),
         |                         255) AS BIGINT) END AS cy
         |  FROM lineitem, b),
         |z AS (SELECT ($interleave) AS zv FROM c)
         |SELECT zv // 256 AS z_bucket, count(*) AS n,
         |  min(zv) AS z_min, max(zv) AS z_max
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
    import graft.operators.ZOrder
    val li = Tables.lineitem(s, d)
    val bounds = li.agg(
      min(col("l_quantity")).as("xmin"), max(col("l_quantity")).as("xmax"),
      min(col("l_extendedprice")).as("ymin"), max(col("l_extendedprice")).as("ymax"))
    li.crossJoin(broadcast(bounds))
      .withColumn("zv", ZOrder.zValue2(
        ZOrder.cell(col("l_quantity"), col("xmin"), col("xmax"), 8),
        ZOrder.cell(col("l_extendedprice"), col("ymin"), col("ymax"), 8), 8))
      .groupBy(expr("zv div 256").as("z_bucket"))
      .agg(count(lit(1)).as("n"), min(col("zv")).as("z_min"), max(col("zv")).as("z_max"))
      .orderBy("z_bucket")
  }

  /** Per-group top-K via the typed Aggregator API
    * ([[graft.operators.TopKAggregator]]) — q20's window-row_number
    * semantics recomputed with O(K) state per group instead of a per-group
    * sort: partition-local partial aggregates carry at most K pairs and
    * merges are K-bounded, the shape that survives a billion-row group.
    * The oracle is the window formulation — result-identicality of the
    * bounded-state decomposition is exactly what's verified. */
  val q45 = OracleQuery(
    "q45_topk_aggregator",
    """SELECT o_orderstatus, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk FROM (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) t
      |WHERE rnk <= 3
      |ORDER BY o_orderstatus, rnk""".stripMargin) { (s, d) =>
    import s.implicits._
    val agg = new graft.operators.TopKAggregator(3)
    Tables.orders(s, d)
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (status, top) =>
        top.zipWithIndex.map { case ((price, key), i) => (status, key, price, i + 1) }
      }
      .toDF("o_orderstatus", "o_orderkey", "o_totalprice", "rnk")
      .orderBy("o_orderstatus", "rnk")
  }

  /** Sessionization: merge each user's event stream into sessions separated
    * by more than 8h of inactivity, via the native `session_window`
    * aggregate (batch mode). Spark's session boundary is inclusive — an
    * event at exactly last_ts + gap still merges (pinned by
    * SessionWindowSpec) — so the DuckDB gaps-and-islands mirror (lag +
    * running sum of new-session flags) flags new sessions strictly:
    * `gap > threshold`. One shuffle on user_id either way; Spark's
    * session merge is the same sort-within-partition the window rewrite
    * needs, so the decomposition survives a billion-user scale-up.
    * Timestamps compare as epoch-micros BIGINTs (events.parquet is
    * nanos → `ts div 1000`, never a double divide). */
  val q46 = OracleQuery(
    "q46_sessionization",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
      |m AS (SELECT user_id, tsu,
      |  CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
      |         > 28800000000 THEN 1
      |       WHEN lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
      |         IS NULL THEN 1
      |       ELSE 0 END AS new_s
      |  FROM e),
      |s AS (SELECT user_id, tsu,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY tsu
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT user_id, min(tsu) AS session_start, max(tsu) AS session_end,
      |  count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("event_time")).as("tsu"), col("event_time"))
      .groupBy(col("user_id"), session_window(col("event_time"), "8 hours"))
      .agg(min(col("tsu")).as("session_start"), max(col("tsu")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start")
  }

  /** SCD Type-2 dimension build — the warehouse pattern for turning an
    * event/change stream into validity intervals: per user, collapse
    * consecutive runs of the same event_type and emit
    * [valid_from, valid_to) with an open interval for the current state.
    * Change detection is lag(), interval close is lead() — both windows
    * share the user_id partitioning, so the whole build is ONE shuffle.
    * Deterministic: (ts, event_id) total order breaks timestamp ties. */
  val q47 = OracleQuery(
    "q47_scd2_intervals",
    """WITH o AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |c AS (SELECT user_id, event_type, ts_us, event_id FROM o
      |      WHERE prev IS NULL OR prev <> event_type),
      |i AS (SELECT user_id, event_type, ts_us AS valid_from_us,
      |        lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
      |          AS valid_to_us
      |      FROM c)
      |SELECT user_id, event_type, valid_from_us, valid_to_us,
      |  CAST(valid_to_us IS NULL AS BOOLEAN) AS is_current
      |FROM i ORDER BY user_id, valid_from_us""".stripMargin) { (s, d) =>
    val wo = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wc = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("event_time")).as("ts_us"), col("event_id"), col("ts"))
      .withColumn("prev", lag(col("event_type"), 1).over(wo))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(wc))
      .select(col("user_id"), col("event_type"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy("user_id", "valid_from_us")
  }

  /** Sequential funnel analysis over the event stream — the product-
    * analytics staple (Amplitude/Mixpanel "funnels"): per user, the first
    * `view`, the first `click` strictly AFTER that view, and the first
    * `purchase` strictly after that click; emit the per-stage user census
    * and stage-over-stage conversion. Strict ordering (not mere presence)
    * is what makes it a funnel — each stage's min-timestamp search is
    * conditioned on the previous stage's timestamp.
    *
    * Scale: three filtered min-aggregates and two joins, ALL keyed on
    * user_id — one shuffle partitioning serves every stage (no per-user
    * event sorting, no window over the whole stream); the 3-row output
    * assembles from broadcast scalar counts. */
  val q49 = OracleQuery(
    "q49_event_funnel",
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t_click
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t_purchase
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1),
      |n AS (SELECT (SELECT count(*) FROM v) AS nv,
      |             (SELECT count(*) FROM c) AS nc,
      |             (SELECT count(*) FROM p) AS np)
      |SELECT stage, n_users,
      |  round(CAST(n_users AS DOUBLE) / nullif(prev_users, 0), 4) AS conversion
      |FROM (
      |  SELECT 1 AS ord, 'view' AS stage, nv AS n_users, nv AS prev_users FROM n
      |  UNION ALL
      |  SELECT 2, 'click', nc, nv FROM n
      |  UNION ALL
      |  SELECT 3, 'purchase', np, nc FROM n)
      |ORDER BY ord""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    // each stage is pinned: the scalar-count assembly and the next stage
    // both read it, and unpinned lineage would rescan events once per
    // nesting level (6 corpus scans for a 3-row output)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
      .localCheckpoint()
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
      .localCheckpoint()
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    val n = v.agg(count(lit(1)).as("nv"))
      .crossJoin(c.agg(count(lit(1)).as("nc")))
      .crossJoin(p.agg(count(lit(1)).as("np")))
    val stages = n.select(
      explode(array(
        struct(lit(1).as("ord"), lit("view").as("stage"),
          col("nv").as("n_users"), col("nv").as("prev_users")),
        struct(lit(2).as("ord"), lit("click").as("stage"),
          col("nc").as("n_users"), col("nv").as("prev_users")),
        struct(lit(3).as("ord"), lit("purchase").as("stage"),
          col("np").as("n_users"), col("nc").as("prev_users")))).as("r"))
    stages.select(col("r.ord").as("ord"), col("r.stage").as("stage"),
        col("r.n_users").as("n_users"),
        round(col("r.n_users").cast("double")
          / nullif(col("r.prev_users"), lit(0)), 4).as("conversion"))
      .orderBy("ord")
      .select("stage", "n_users", "conversion")
  }

  /** Weekly cohort retention — the other product-analytics staple next to
    * q49's funnel: users cohorted by the epoch-week of their first event,
    * then counted distinct per (cohort, weeks-since-cohort) with the rate
    * against cohort size. Week bucketing is pure integer arithmetic on
    * epoch nanos (`ts DIV 604800e9` / DuckDB `epoch_ns // …`) — no
    * calendar/timezone functions whose week-numbering conventions could
    * diverge between engines.
    *
    * Scale: first-event and activity aggregations both key on user_id
    * (one partitioning serves both), the rate join keys on cohort week —
    * no window over the event stream, no driver-side state. */
  val q50 = OracleQuery(
    "q50_cohort_retention",
    """WITH wk AS (
      |  SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk FROM events),
      |coh AS (SELECT user_id, min(wk) AS cwk FROM wk GROUP BY 1),
      |act AS (SELECT DISTINCT w.user_id, c.cwk, w.wk - c.cwk AS period
      |        FROM wk w JOIN coh c ON c.user_id = w.user_id),
      |sz AS (SELECT cwk, count(*) AS cohort_users FROM coh GROUP BY 1),
      |r AS (SELECT cwk, period, count(*) AS n_active FROM act GROUP BY 1, 2)
      |SELECT r.cwk AS cohort_week, CAST(r.period AS INT) AS period,
      |  r.n_active, sz.cohort_users,
      |  round(CAST(r.n_active AS DOUBLE) / sz.cohort_users, 4) AS retention
      |FROM r JOIN sz ON sz.cwk = r.cwk
      |ORDER BY cohort_week, period""".stripMargin) { (s, d) =>
    val wk = Tables.events(s, d)
      .select(col("user_id"), expr("ts DIV 604800000000000").as("wk"))
    val coh = wk.groupBy("user_id").agg(min(col("wk")).as("cwk"))
    val act = wk.join(coh, Seq("user_id"))
      .select(col("user_id"), col("cwk"), (col("wk") - col("cwk")).as("period"))
      .distinct()
    val sz = coh.groupBy("cwk").agg(count(lit(1)).as("cohort_users"))
    act.groupBy("cwk", "period").agg(count(lit(1)).as("n_active"))
      .join(broadcast(sz), Seq("cwk"))
      .select(col("cwk").as("cohort_week"), col("period").cast("int").as("period"),
        col("n_active"), col("cohort_users"),
        round(col("n_active").cast("double") / col("cohort_users"), 4)
          .as("retention"))
      .orderBy("cohort_week", "period")
  }

  /** Batch sessionization — the warehouse twin of x07's streaming session
    * windows: a session break is a >30-minute gap between a user's
    * consecutive events (lag), the session id is the running count of
    * breaks (cumulative sum over the same ordering), and the rollup
    * reports per-session event counts and duration. All arithmetic is
    * integer epoch-nanos — no timestamp intervals whose engine semantics
    * could diverge.
    *
    * Scale: lag, the cumulative sum, and the final aggregate all
    * partition by user_id — ONE shuffle serves the whole query; no
    * global ordering anywhere. */
  val q51 = OracleQuery(
    "q51_batch_sessionization",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tn FROM events),
      |l AS (
      |  SELECT user_id, event_id, tn,
      |    CASE WHEN lag(tn) OVER w IS NULL
      |           OR tn - lag(tn) OVER w > 1800000000000 THEN 1
      |         ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tn, event_id)),
      |s AS (
      |  SELECT user_id, tn,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY tn, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS sid
      |  FROM l)
      |SELECT user_id, CAST(sid AS INT) AS session_id,
      |  count(*) AS n_events,
      |  CAST((max(tn) - min(tn)) // 1000000000 AS BIGINT) AS duration_secs
      |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("tn"), col("event_id"))
    val cum = Window.partitionBy("user_id").orderBy(col("tn"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts").as("tn"))
      .withColumn("brk",
        when(lag(col("tn"), 1).over(w).isNull
          || col("tn") - lag(col("tn"), 1).over(w) > 1800000000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(cum))
      .groupBy(col("user_id"), col("sid").cast("int").as("session_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("CAST((max(tn) - min(tn)) DIV 1000000000 AS BIGINT)")
          .as("duration_secs"))
      .orderBy("user_id", "session_id")
  }

  val all: Seq[OracleQuery] =
    Seq(q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37, q38,
      q39, q40, q41, q42, q43, q44, q45, q46, q47, q49, q50, q51)
}
