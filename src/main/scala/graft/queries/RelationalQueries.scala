package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Core relational operator inventory (SURVEY.md §2.1–§2.9) re-expressed over
  * the driver testdata tables, each paired with its DuckDB oracle SQL.
  *
  * Scale notes (100 TB design intent):
  *  - every query is a declarative single plan — filters/projections reach the
  *    parquet scan (PushedFilters/ReadSchema), aggregation is partial
  *    (map-side combine) before the shuffle;
  *  - dimension-side joins (nation/region/customer) are broadcast by Catalyst
  *    (well under the autoBroadcast threshold at any SF — dims grow ~O(SF^0)
  *    or sublinearly); the only unavoidable shuffles are keyed aggregations
  *    and the fact⋈orders join, both AQE-coalesced;
  *  - no collect()/driver-side loops anywhere; the date dimension is built
  *    engine-side with sequence+explode instead of a driver loop
  *    (SURVEY §4.3.3).
  *
  * Floating-point policy: double aggregates are `round(x, 2..4)` in BOTH
  * dialects so partial-aggregation ordering differences (~1e-9 relative)
  * cannot flip the hash compare.
  */
object RelationalQueries {

  /** A6/O3 — grouped sum/avg/count pricing summary (TPC-H Q1 shape).
    * Ref: scripts/process_silver_to_gold.py:116-139 (BI implicit aggregates). */
  val q01 = OracleQuery(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** P5 — conjunctive range-validation filter (ref: process_bronze_to_silver.py:103-109). */
  val q02 = OracleQuery(
    "q02_filter_range",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_quantity IS NOT NULL AND l_quantity BETWEEN 5 AND 45
      |  AND l_extendedprice BETWEEN 1000.0 AND 50000.0
      |  AND l_discount BETWEEN 0.02 AND 0.08
      |  AND l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity").isNotNull && col("l_quantity").between(5, 45)
        && col("l_extendedprice").between(1000.0, 50000.0)
        && col("l_discount").between(0.02, 0.08)
        && col("l_orderkey").isNotNull && col("l_shipdate").isNotNull)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** W1 — latest-update-wins dedup via row_number (ref: process_bronze_to_silver.py:112-113),
    * with deterministic secondary sort key (SURVEY §7.5.2). */
  val q03 = OracleQuery(
    "q03_latest_order_per_customer",
    """SELECT o_custkey, o_orderkey, o_totalprice, o_orderstatus FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice, o_orderstatus,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) t
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_custkey")
  }

  /** J1–J4/A6 — star-schema assembly: fact ⋈ 4 levels, grouped revenue
    * (ref: process_silver_to_gold.py:115-119). nation/region/customer are
    * broadcast; lineitem⋈orders is the one genuine shuffle join. */
  val q04 = OracleQuery(
    "q04_star_revenue",
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")
  }

  /** A1 — global min/max driving the date-dim range (ref: process_silver_to_gold.py:53-59). */
  val q05 = OracleQuery(
    "q05_minmax_orderdate",
    """SELECT CAST(min(o_orderdate) AS DATE) AS min_date,
      |  CAST(max(o_orderdate) AS DATE) AS max_date,
      |  count(*) AS n_orders
      |FROM orders""".stripMargin) { (s, d) =>
    Tables.orders(s, d).agg(
      min(to_date(col("o_orderdate"))).as("min_date"),
      max(to_date(col("o_orderdate"))).as("max_date"),
      count(lit(1)).as("n_orders"))
  }

  /** A3 — multi-column distinct building a dimension (ref: process_silver_to_gold.py:82-85). */
  val q06 = OracleQuery(
    "q06_distinct_dims",
    """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select("c_nationkey", "c_mktsegment")
      .distinct()
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** A4 — keyed dedup with a *deterministic* survivor (first order per customer);
    * the reference's dropDuplicates survivor is arbitrary (SURVEY §7.5.1) so the
    * testable form fixes the survivor by min key. */
  val q07 = OracleQuery(
    "q07_first_order_per_customer",
    """SELECT o_custkey, min(o_orderkey) AS first_orderkey, count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderkey")).as("first_orderkey"), count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")
  }

  /** F1–F3 — ordered when/otherwise banding chains
    * (ref: process_bronze_to_silver.py:119-132). */
  val q08 = OracleQuery(
    "q08_quantity_bands",
    """SELECT
      |  CASE WHEN l_quantity < 5 THEN 'micro' WHEN l_quantity < 10 THEN 'minor'
      |       WHEN l_quantity < 20 THEN 'light' WHEN l_quantity < 30 THEN 'moderate'
      |       WHEN l_quantity < 40 THEN 'strong' WHEN l_quantity < 50 THEN 'major'
      |       ELSE 'great' END AS qty_band,
      |  CASE WHEN l_extendedprice <= 10000 THEN 'shallow'
      |       WHEN l_extendedprice <= 30000 THEN 'intermediate'
      |       ELSE 'deep' END AS price_band,
      |  CASE WHEN l_discount >= 0.05 THEN 'N' ELSE 'S' END AS disc_hemisphere,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    val q = col("l_quantity")
    Tables.lineitem(s, d)
      .withColumn("qty_band",
        when(q < 5, "micro").when(q < 10, "minor").when(q < 20, "light")
          .when(q < 30, "moderate").when(q < 40, "strong").when(q < 50, "major")
          .otherwise("great"))
      .withColumn("price_band",
        when(col("l_extendedprice") <= 10000, "shallow")
          .when(col("l_extendedprice") <= 30000, "intermediate")
          .otherwise("deep"))
      .withColumn("disc_hemisphere", when(col("l_discount") >= 0.05, "N").otherwise("S"))
      .groupBy("qty_band", "price_band", "disc_hemisphere")
      .agg(count(lit(1)).as("n"))
      .orderBy("qty_band", "price_band", "disc_hemisphere")
  }

  /** F7/F8 — date-part extraction + yyyyMMdd DateKey derivation
    * (ref: process_bronze_to_silver.py:133-137, process_silver_to_gold.py:112).
    * DuckDB dayofweek is 0=Sunday; Spark is 1=Sunday → oracle adds 1. */
  val q09 = OracleQuery(
    "q09_date_parts",
    """SELECT
      |  CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
      |  CAST(year(o_orderdate) AS INT) AS year,
      |  CAST(quarter(o_orderdate) AS INT) AS quarter,
      |  CAST(month(o_orderdate) AS INT) AS month,
      |  CAST(dayofmonth(o_orderdate) AS INT) AS day_of_month,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS day_of_week,
      |  count(*) AS n
      |FROM orders
      |GROUP BY 1, 2, 3, 4, 5, 6
      |ORDER BY date_key""".stripMargin) { (s, d) =>
    val ts = col("o_orderdate")
    Tables.orders(s, d)
      .select(
        date_format(ts, "yyyyMMdd").cast("int").as("date_key"),
        year(ts).as("year"), quarter(ts).as("quarter"), month(ts).as("month"),
        dayofmonth(ts).as("day_of_month"), dayofweek(ts).as("day_of_week"))
      .groupBy("date_key", "year", "quarter", "month", "day_of_month", "day_of_week")
      .agg(count(lit(1)).as("n"))
      .orderBy("date_key")
  }

  /** F16 — engine-side date dimension via sequence+explode replacing the
    * reference's driver-side Python loop (ref: process_silver_to_gold.py:61-78;
    * SURVEY §4.3.3). Scales as O(days) inside the engine, zero driver state. */
  val q10 = OracleQuery(
    "q10_date_dim",
    """WITH r AS (
      |  SELECT CAST(min(o_orderdate) AS DATE) AS mn,
      |         CAST(max(o_orderdate) AS DATE) + 30 AS mx
      |  FROM orders),
      |d AS (
      |  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS full_date
      |  FROM r)
      |SELECT full_date,
      |  CAST(strftime(full_date, '%Y%m%d') AS INT) AS date_key,
      |  CAST(year(full_date) AS INT) AS year,
      |  CAST(quarter(full_date) AS INT) AS quarter,
      |  CAST(month(full_date) AS INT) AS month,
      |  monthname(full_date) AS month_name,
      |  CAST(dayofmonth(full_date) AS INT) AS day_of_month,
      |  CAST(dayofweek(full_date) + 1 AS INT) AS day_of_week,
      |  dayname(full_date) AS day_name,
      |  dayofweek(full_date) IN (0, 6) AS is_weekend
      |FROM d
      |ORDER BY date_key""".stripMargin) { (s, d) =>
    val fd = col("full_date")
    Tables.orders(s, d)
      .agg(min(to_date(col("o_orderdate"))).as("mn"),
           date_add(max(to_date(col("o_orderdate"))), 30).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("full_date"))
      .select(fd,
        date_format(fd, "yyyyMMdd").cast("int").as("date_key"),
        year(fd).as("year"), quarter(fd).as("quarter"), month(fd).as("month"),
        date_format(fd, "MMMM").as("month_name"),
        dayofmonth(fd).as("day_of_month"),
        dayofweek(fd).as("day_of_week"),
        date_format(fd, "EEEE").as("day_name"),
        dayofweek(fd).isin(1, 7).as("is_weekend"))
      .orderBy("date_key")
  }

  /** F10/F11/F12 — regexp_extract after-comma region + trim + fallback country
    * (ref: process_bronze_to_silver.py:138-141). Even partkeys get a
    * synthesized `", "` so both the match and fallback branches execute. */
  val q11 = OracleQuery(
    "q11_region_extract",
    """SELECT p_partkey,
      |  trim(regexp_extract(place, ',\s*(.*)$', 1)) AS region_detail,
      |  CASE WHEN trim(regexp_extract(place, ',\s*(.*)$', 1)) <> ''
      |       THEN trim(regexp_extract(place, ',\s*(.*)$', 1))
      |       ELSE trim(place) END AS country
      |FROM (
      |  SELECT p_partkey,
      |    CASE WHEN p_partkey % 2 = 0 THEN p_name || ', ' || p_brand
      |         ELSE p_name END AS place
      |  FROM part) t
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val rx = ",\\s*(.*)$"
    val region = trim(regexp_extract(col("place"), rx, 1))
    Tables.part(s, d)
      .withColumn("place",
        when(col("p_partkey") % 2 === 0, concat(col("p_name"), lit(", "), col("p_brand")))
          .otherwise(col("p_name")))
      .select(col("p_partkey"),
        region.as("region_detail"),
        when(region =!= "", region).otherwise(trim(col("place"))).as("country"))
      .orderBy("p_partkey")
  }

  /** U1/P6 — positional bag union of two filtered splits (ref: train_tsunami_model.py:57-66). */
  val q12 = OracleQuery(
    "q12_union_splits",
    """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderstatus")
      .union(o.filter(col("o_orderstatus") === "O").select("o_orderkey", "o_orderstatus"))
      .orderBy("o_orderkey")
  }

  /** O3 — group-count descending (the BI column-chart query,
    * ref: visuals/c9ef1058c99bdd3ec18c/visual.json:59), tie-broken by name. */
  val q13 = OracleQuery(
    "q13_top_nations",
    """SELECT n_name, count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_orders DESC, n_name""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("n_name"))
  }

  /** A6 — the four BI card aggregates: Count / Avg / Max / CountNonNull-with-filter
    * (ref: SURVEY §2.9 Function codes 2/1/4/5). */
  val q14 = OracleQuery(
    "q14_bi_cards",
    """SELECT count(l_orderkey) AS total_events,
      |  round(avg(l_quantity), 4) AS avg_magnitude,
      |  max(l_quantity) AS max_magnitude,
      |  count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS flagged_count
      |FROM lineitem""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).agg(
      count(col("l_orderkey")).as("total_events"),
      round(avg(col("l_quantity")), 4).as("avg_magnitude"),
      max(col("l_quantity")).as("max_magnitude"),
      count(when(col("l_returnflag") === "R", lit(1))).as("flagged_count"))
  }

  /** Time-bucketed event rollup (the `events` analog of the BI line chart).
    * Nanos survive the micro truncation identically in both engines. */
  val q15 = OracleQuery(
    "q15_events_hourly",
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP_NS) AS hour_ts, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("hour_ts", date_trunc("hour", col("event_time")))
      .groupBy("hour_ts", "event_type")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("hour_ts", "event_type")
  }

  /** S3-analog — semi-structured JSON extraction from a string column
    * (the engine-side counterpart of the GeoJSON flatten, b2s:46-74). */
  val q16 = OracleQuery(
    "q16_events_json",
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  count(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** W1 on events — latest event per user (ingestion-shaped dedup,
    * FIXTURES.md §B). Timestamps compared as epoch micros (integer floor
    * division in both engines). */
  val q17 = OracleQuery(
    "q17_events_latest_per_user",
    """SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM (
      |  SELECT user_id, event_id, event_type, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("event_time")).as("ts_us"))
      .orderBy("user_id")
  }

  /** Extension beyond the reference: left-semi / left-anti joins (EXISTS /
    * NOT EXISTS) — shuffle-free when the probe side is broadcast. */
  val q18 = OracleQuery(
    "q18_customers_without_orders",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val q19 = OracleQuery(
    "q19_customers_with_orders",
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Extension: top-k per group via rank window (deterministic tie-break). */
  val q20 = OracleQuery(
    "q20_top3_orders_per_status",
    """SELECT o_orderstatus, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk FROM (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) t
      |WHERE rnk <= 3
      |ORDER BY o_orderstatus, rnk""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_orderstatus", "o_orderkey", "o_totalprice", "rnk")
      .orderBy("o_orderstatus", "rnk")
  }

  /** Extension: rollup (hierarchical subtotals) — grouping_id distinguishes
    * subtotal levels; DuckDB mirrors with GROUP BY ROLLUP + GROUPING. */
  val q21 = OracleQuery(
    "q21_rollup_region_nation",
    """SELECT r_name, n_name,
      |  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
      |  count(*) AS n
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, d) =>
    // DataFrame `.rollup` on a joined base trips Spark's
    // DetectAmbiguousSelfJoin misdetection (grouping cols appear twice in the
    // Expand with identical dataset-id tags) — express via SQL instead; the
    // logical plan is identical.
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name")
      .createOrReplaceTempView("q21_base")
    s.sql(
      """SELECT r_name, n_name, grouping_id() AS gid, count(*) AS n
        |FROM q21_base
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  /** Extension: point-in-time (as-of) join — for each click, the latest
    * error by the same user at or before it. Spark side composes union +
    * window ([[graft.operators.AsOfJoin]], one shuffle); DuckDB mirrors
    * with its native ASOF LEFT JOIN. */
  val q22 = OracleQuery(
    "q22_asof_click_error",
    """WITH c AS (SELECT user_id, ts, event_id AS click_id FROM events
      |           WHERE event_type = 'click'),
      |     e AS (SELECT user_id, ts, event_id AS error_id, value AS error_value
      |           FROM events WHERE event_type = 'error')
      |SELECT c.user_id, c.click_id, epoch_us(c.ts) AS click_ts_us,
      |  e.error_id AS last_error_id, round(e.error_value, 2) AS last_error_value
      |FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.ts >= e.ts
      |ORDER BY c.click_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_time"),
        col("event_id").as("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id").as("error_id"),
        col("value").as("error_value"))
    graft.operators.AsOfJoin.asofLeft(clicks, errors, Seq("user_id"), "ts", "ts")
      .select(col("user_id"), col("click_id"), unix_micros(col("event_time")).as("click_ts_us"),
        col("right_error_id").as("last_error_id"),
        round(col("right_error_value"), 2).as("last_error_value"))
      .orderBy("click_id")
  }

  /** Extension: point-in-interval range join — clicks within one hour after
    * an error by the same user. Spark side is the bucketized equi-join
    * ([[graft.operators.IntervalJoin]], no nested loop); DuckDB mirrors with
    * a plain inequality join. Nanos arithmetic is exact long math. */
  val q23 = OracleQuery(
    "q23_interval_join_click_after_error",
    """WITH c AS (SELECT user_id, ts, event_id AS click_id FROM events
      |           WHERE event_type = 'click'),
      |     e AS (SELECT user_id, ts AS est, event_id AS error_id FROM events
      |           WHERE event_type = 'error')
      |SELECT c.user_id, c.click_id, e.error_id
      |FROM c JOIN e ON c.user_id = e.user_id
      |  AND c.ts >= e.est AND c.ts <= e.est + INTERVAL 1 HOUR
      |ORDER BY click_id, error_id""".stripMargin) { (s, d) =>
    val hourNanos = 3600L * 1000 * 1000 * 1000
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("est"),
        (col("ts") + hourNanos).as("eend"), col("event_id").as("error_id"))
    graft.operators.IntervalJoin.pointInInterval(
        clicks, errors, Seq("user_id"), "ts", "est", "eend", hourNanos)
      .select("user_id", "click_id", "error_id")
      .orderBy("click_id", "error_id")
  }

  /** A2/A6 — exact multi-column distinct counts (the HLL-approximate tier is
    * x05 in OperatorQueries; approx algorithms differ per engine so only the
    * exact form carries an oracle). */
  val q24 = OracleQuery(
    "q24_count_distinct",
    """SELECT count(DISTINCT o_custkey) AS n_cust,
      |  count(DISTINCT o_orderpriority) AS n_prio,
      |  count(DISTINCT o_orderstatus) AS n_status
      |FROM orders""".stripMargin) { (s, d) =>
    Tables.orders(s, d).agg(
      countDistinct(col("o_custkey")).as("n_cust"),
      countDistinct(col("o_orderpriority")).as("n_prio"),
      countDistinct(col("o_orderstatus")).as("n_status"))
  }

  /** §2.9 slicer composition — the BI drill query with date-range and
    * categorical slicers applied (the shape every dashboard visual must
    * answer under filter context). */
  val q25 = OracleQuery(
    "q25_bi_drill_with_slicers",
    """SELECT CAST(year(o_orderdate) AS INT) AS year,
      |  CAST(quarter(o_orderdate) AS INT) AS quarter,
      |  count(*) AS event_count,
      |  round(avg(o_totalprice), 4) AS avg_price
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1993-01-01' AND DATE '1995-12-31'
      |  AND o_orderstatus = 'F'
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(to_date(col("o_orderdate"))
        .between(lit("1993-01-01"), lit("1995-12-31"))
        && col("o_orderstatus") === "F")
      .groupBy(year(col("o_orderdate")).as("year"),
        quarter(col("o_orderdate")).as("quarter"))
      .agg(count(lit(1)).as("event_count"),
        round(avg(col("o_totalprice")), 4).as("avg_price"))
      .orderBy("year", "quarter")
  }

  val all: Seq[OracleQuery] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25)
}
