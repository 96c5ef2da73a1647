package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** The generalized relational surface of the engine (SURVEY.md §2.4):
  * scan/filter/project/join/aggregate/window/rollup/sort/set-op plus the
  * scalar string/date/json function library, each grounded in a reference
  * behavior (reference file:line cited per query). Every query here has a
  * DuckDB oracle and is part of the t2 correctness gate.
  *
  * Numeric discipline for oracle parity: monetary doubles are cast to
  * DECIMAL(18,2) before arithmetic so sums are exact and order-independent
  * (a 1000-executor partial-agg plan must hash-match a single-threaded
  * DuckDB run), then cast back to DOUBLE for a stable output type. Averages
  * are computed as exact-decimal-sum / count in DOUBLE, never float
  * accumulation.
  */
object Relational {

  /** Exact 2-dp decimal view of a monetary double column. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a monetary double column, as DOUBLE. */
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  type Q = (SparkSession, String) => DataFrame

  /** (name, spark query, oracle SQL). */
  val defs: Seq[(String, Q, Option[String])] = Seq(

    // ── Aggregation ────────────────────────────────────────────────────
    // Pricing-summary agg (generalizes the per-band raster statistics of
    // reference build-stac/utils/stac.py:33-48 — grouped min/max/avg/count).
    ("q01_agg", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    // Selective single-row aggregate (TPC-H Q6 shape); the predicate mix
    // (range + numeric between) generalizes reference temporal filtering
    // (cmr-query/handler.py:15-27).
    ("q02_selective_agg", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_rows"))
    },
    Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      count(*) AS n_rows
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""")),

    // ── Joins ──────────────────────────────────────────────────────────
    // Broadcast dim-chain join (customer⋈nation⋈region), the generalized
    // catalog-enrichment join of reference stac.py:113-129 (A16).
    ("q03_broadcast_join", (s: SparkSession, d: String) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name, count(*) AS n_customers,
      CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // Fact-fact shuffle join orders⋈lineitem with post-join aggregation.
    ("q04_join_agg", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      count(*) AS n_items
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Left-semi join — EXISTS, the dual of the reference's transfer
    // existence check (data-transfer/handler.py:44-53).
    ("q05_semi_join", (s: SparkSession, d: String) => {
      val recent = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      Tables.orders(s, d)
        .join(recent, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, count(*) AS n_orders FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                    AND l_shipdate >= TIMESTAMP '1997-01-01')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Left-anti join — NOT EXISTS: the reference's idempotent-copy skip
    // (data-transfer/handler.py:44-53, SURVEY §2.2 A10) as set difference.
    ("q06_anti_join", (s: SparkSession, d: String) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")),

    // Left-outer join with zero-preservation (count of possibly-absent side).
    ("q07_left_join", (s: SparkSession, d: String) => {
      Tables.nation(s, d)
        .join(Tables.supplier(s, d), col("n_nationkey") === col("s_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(count(col("s_suppkey")).as("n_suppliers"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name, count(s_suppkey) AS n_suppliers
      FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
      GROUP BY n_name ORDER BY n_name""")),

    // ── Window functions ───────────────────────────────────────────────
    // Latest/top row per key via row_number — the engine's idempotent
    // re-ingest rule (SURVEY §2.4 windows; reference scripts/item.py:19-23
    // re-run semantics).
    ("q08_window_topper", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) WHERE rn = 1 ORDER BY o_custkey""")),

    // Running (cumulative) sum per partition — range-window analytics over
    // datetime (SURVEY §2.4 windows row).
    ("q09_window_running", (s: SparkSession, d: String) => {
      // l_quantity is the last tiebreak: (orderkey, linenumber, shipdate)
      // is not unique at sf0.1, and rows tying on quantity too yield the
      // same cumulative sequence in either order
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .withColumn("running_qty", sum(dec(col("l_quantity"))).over(w).cast(DoubleType))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), col("running_qty"))
        // (orderkey, linenumber) is not unique in the synthetic data — the
        // shipdate column keeps the output ordering total
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), col("running_qty"))
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, l_shipdate, running_qty""")),

    // ── Rollup / grouping sets ─────────────────────────────────────────
    // collection × time-density style summary with totals (SURVEY §2.4,
    // dashboard:time_density of reference data/collections/no2-monthly.json:44).
    ("q10_rollup", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    ("q11_cube", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ── Sort / limit / top-k ───────────────────────────────────────────
    // Planned as TakeOrderedAndProject — no full sort at scale.
    ("q12_topk", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(15)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15""")),

    // ── Set operations ─────────────────────────────────────────────────
    // Union of discovery streams (S3 ∪ CMR feeding one publish stream,
    // SURVEY §2.3 B1/B8).
    ("q13_union", (s: SparkSession, d: String) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .union(o.filter(col("o_totalprice") > 200000).select(col("o_custkey")))
        .distinct()
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      UNION SELECT o_custkey FROM orders WHERE o_totalprice > 200000
      ORDER BY o_custkey""")),

    ("q14_intersect", (s: SparkSession, d: String) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY o_custkey""")),

    ("q15_except", (s: SparkSession, d: String) => {
      Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .except(Tables.orders(s, d).select(col("o_custkey").as("custkey")))
        .orderBy(col("custkey"))
    },
    Some("""SELECT c_custkey AS custkey FROM customer
      EXCEPT SELECT o_custkey AS custkey FROM orders
      ORDER BY custkey""")),

    // ── Scalar string functions ────────────────────────────────────────
    // The reference's string surface: regex match/extract, basename/stem,
    // concat (s3-discovery/handler.py:30-34, events.py:22-29; A2/A13/A15).
    ("q16_string_fns", (s: SparkSession, d: String) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_type"), "([A-Za-z]+)", 1).as("type_head"),
          col("p_name").rlike("^[a-m]").as("first_half"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey, upper(p_brand) AS brand_upper,
      substring(p_name, 1, 8) AS name_prefix,
      CAST(length(p_name) AS INTEGER) AS name_len,
      concat_ws('-', p_brand, p_type) AS brand_type,
      coalesce(regexp_extract(p_type, '([A-Za-z]+)', 1), '') AS type_head,
      regexp_matches(p_name, '^[a-m]') AS first_half
      FROM part ORDER BY p_partkey""")),

    // ── Date functions ─────────────────────────────────────────────────
    // Calendar bucketing + month-end (the A13/A14 expansion primitives:
    // reference build-stac/utils/regex.py:12-21).
    ("q17_date_fns", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .select(
          date_trunc("month", col("o_orderdate")).as("order_month"),
          last_day(col("o_orderdate")).as("month_end"),
          year(col("o_orderdate")).as("order_year"))
        .groupBy(col("order_month"), col("month_end"), col("order_year"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("order_month"))
    },
    Some("""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
      CAST(last_day(o_orderdate) AS DATE) AS month_end,
      CAST(year(o_orderdate) AS INTEGER) AS order_year,
      count(*) AS n_orders
      FROM orders GROUP BY 1, 2, 3 ORDER BY order_month""")),

    // ── Conditional / case-when routing ────────────────────────────────
    // The Choice-state predicate router (SURVEY §2.3 B1/B2,
    // step_function_stack.py:80-112) as a value-routing projection.
    ("q18_case_route", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .withColumn("price_band",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy(col("price_band"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("price_band"))
    },
    Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                 WHEN o_totalprice < 150000 THEN 'medium'
                 ELSE 'large' END AS price_band,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY 1 ORDER BY price_band""")),

    // ── Grouped statistics (exact, order-independent) ──────────────────
    // Per-group min/max/count/distinct + stddev derived from exact decimal
    // sums (identical double arithmetic on both engines) — the per-band
    // raster-stats shape of reference stac.py:33-48 (A12) in pure columns.
    ("q19_group_stats", (s: SparkSession, d: String) => {
      val n = count(lit(1)).cast(DoubleType)
      val sx = sum(dec(col("l_quantity"))).cast(DoubleType)
      val sxx = sum(dec(col("l_quantity")) * dec(col("l_quantity"))).cast(DoubleType)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_suppkey")).as("n_suppliers"),
          sqrt((sxx - sx * sx / n) / (n - lit(1.0))).as("stddev_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      count(*) AS n_rows, count(DISTINCT l_suppkey) AS n_suppliers,
      sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE))
           / (CAST(count(*) AS DOUBLE) - 1.0)) AS stddev_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── Explode / flatten (generator) ──────────────────────────────────
    // The links[] exploder of reference cmr-query/handler.py:29-46 (A5)
    // generalized to word-level term frequency over documents.
    ("q20_explode_words", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(20)
    },
    Some("""SELECT word, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""")),

    // ── Events: time-bucketed aggregation (batch form of the streaming
    // tumbling window, SURVEY §2.4 streaming row) ───────────────────────
    ("q21_events_hourly", (s: SparkSession, d: String) => {
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    },
    Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
      count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // ── JSON extraction (the pass-through properties map of the
    // reference events, s3-discovery/handler.py:55-60 / stac.py:118-123) ─
    ("q22_json_extract", (s: SparkSession, d: String) => {
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
      FROM events ORDER BY event_id""")),

    // ── Distinct projection ────────────────────────────────────────────
    ("q23_distinct", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""")),

    // ── Mid-dim join (part) with per-brand aggregate ───────────────────
    ("q24_part_join", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand"""))
  )
}
