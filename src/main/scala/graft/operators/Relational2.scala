package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** Second tranche of the relational surface: exact histograms, exact
  * percentiles, lead/lag analytics, gap-based sessionization, array
  * aggregation, SQL-text entry with subqueries, and conditional
  * aggregation (SURVEY §2.4 windows/aggregations/UDF rows).
  */
object Relational2 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Fixed-width exact histogram (the deterministic form of A12's
    // per-band histogram; BandStats.Agg is its streaming/mergeable twin).
    ("q27_histogram", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_quantity") / 5).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT CAST(floor(l_quantity / 5) AS BIGINT) AS bucket, count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY bucket""")),

    // Exact interpolated median per group (A12 percentile statistics).
    ("q28_median", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_extendedprice, 0.25)").as("p25_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      quantile_cont(l_quantity, 0.5) AS median_qty,
      quantile_cont(l_extendedprice, 0.25) AS p25_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // lead/lag analytics: price delta between a customer's consecutive
    // orders (SURVEY §2.4 windows row).
    ("q29_lead_lag", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("prev_price", lag(dec(col("o_totalprice")), 1).over(w))
        .withColumn("delta",
          (dec(col("o_totalprice")) - col("prev_price")).cast(DoubleType))
        .select(col("o_custkey"), col("o_orderkey"),
          col("prev_price").cast(DoubleType).as("prev_price"), col("delta"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(lag(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS prev_price,
      CAST(CAST(o_totalprice AS DECIMAL(18,2))
           - lag(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS delta
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""")),

    // Gap-based sessionization over the events stream (30-minute
    // inactivity closes a session) — the batch twin of the streaming
    // session semantics; pure window algebra, no UDF.
    ("q30_sessionize", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val withGap = Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        // Gap compared at microsecond precision on BOTH engines
        // (unix_micros here, epoch_us in the oracle): second-truncated
        // casts would disagree with DuckDB's fractional epoch() for any
        // gap inside (1800, 1801) seconds.
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      withGap.groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""WITH g AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          lag(CAST(ts AS TIMESTAMP), 1) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
      m AS (
        SELECT user_id, event_id, ts,
          CASE WHEN prev_ts IS NULL
                 OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM g),
      sess AS (
        SELECT user_id,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM m)
      SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM sess GROUP BY user_id ORDER BY user_id""")),

    // Array aggregation: ordered collect per key + element access
    // (SURVEY §2.4 array/map row; the links[] shape of A5 inverted).
    // The aggregated list is emitted as a deterministically joined string
    // (not a raw array column): the driver's comparator sorts and hashes
    // scalar cells and cannot hash array values. An array-typed variant
    // stays spec-gated in RelationalSpec.
    ("q31_array_agg", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("linenos"))
        .select(col("l_orderkey"),
          array_join(col("linenos").cast("array<string>"), ",").as("linenos_csv"),
          size(col("linenos")).as("n_lines"),
          element_at(col("linenos"), 1).as("first_line"))
        .orderBy(col("l_orderkey"))
    },
    Some("""SELECT l_orderkey,
      array_to_string(list_sort(list(l_linenumber)), ',') AS linenos_csv,
      CAST(len(list(l_linenumber)) AS INTEGER) AS n_lines,
      list_sort(list(l_linenumber))[1] AS first_line
      FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // SQL-text entry with correlated EXISTS + IN subqueries (the declared
    // surface includes spark.sql; Catalyst rewrites these to semi-joins).
    ("q32_sql_subquery", (s: SparkSession, d: String) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.nation(s, d).createOrReplaceTempView("nation_v")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer_v
        WHERE EXISTS (SELECT 1 FROM orders_v
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000)
          AND c_nationkey IN (SELECT n_nationkey FROM nation_v WHERE n_regionkey < 3)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_customers
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey < 3)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Ranking-function family over one deterministic window (SURVEY
    // §2.4 windows row): rank/dense_rank/ntile/percent_rank + boundary
    // values.
    ("q34_rank_family", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prank"),
          first_value(col("o_orderkey")).over(w).as("top_order"))
        .filter(col("rnk") <= 25)
        .orderBy(col("o_orderstatus"), col("rnk"))
    },
    Some("""SELECT o_orderstatus, o_orderkey,
        CAST(rank() OVER w AS INTEGER) AS rnk,
        CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        percent_rank() OVER w AS prank,
        first_value(o_orderkey) OVER w AS top_order
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
      QUALIFY rnk <= 25
      ORDER BY o_orderstatus, rnk""")),

    // Pivot (wide conditional aggregation) — status columns per priority.
    ("q35_pivot", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority,
        count(*) FILTER (o_orderstatus = 'F') AS "F",
        count(*) FILTER (o_orderstatus = 'O') AS "O",
        count(*) FILTER (o_orderstatus = 'P') AS "P"
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Non-equi (range) join against a small derived band dim — planned
    // as a broadcast nested-loop join; the theta-join row of SURVEY
    // §2.4's join inventory.
    ("q36_range_join", (s: SparkSession, d: String) => {
      import s.implicits._
      val bands = Seq(
        ("band0", 0.0, 100000.0), ("band1", 100000.0, 200000.0),
        ("band2", 200000.0, 1e9))
        .toDF("band", "lo", "hi")
      Tables.orders(s, d)
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("band"))
    },
    Some("""WITH bands(band, lo, hi) AS (
        VALUES ('band0', 0.0, 100000.0), ('band1', 100000.0, 200000.0),
               ('band2', 200000.0, 1e9))
      SELECT band, count(*) AS n_orders
      FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY band ORDER BY band""")),

    // Correlated scalar subquery (Catalyst decorrelates to a join):
    // orders above their customer's average.
    ("q37_correlated", (s: SparkSession, d: String) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_corr")
      s.sql("""
        SELECT o_custkey, count(*) AS n_above_avg
        FROM orders_corr o
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_corr i
                              WHERE i.o_custkey = o.o_custkey)
        GROUP BY o_custkey ORDER BY o_custkey""")
    },
    Some("""SELECT o_custkey, count(*) AS n_above_avg
      FROM orders o
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i
                            WHERE i.o_custkey = o.o_custkey)
      GROUP BY o_custkey ORDER BY o_custkey""")),

    // Funnel analysis over the events stream: per user, the first signup
    // and the purchases that follow it (event-sequence analytics via
    // conditional window minimums — no self-join).
    ("q38_funnel", (s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, d)
        .withColumn("first_signup",
          min(when(col("event_type") === "signup", col("ts"))).over(w))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
          count(when(col("event_type") === "purchase" &&
            col("ts") > col("first_signup"), 1)).as("purchases_after_signup"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
          min(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END)
            OVER (PARTITION BY user_id) AS first_signup
        FROM events)
      SELECT user_id,
        min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
        count(CASE WHEN event_type = 'purchase' AND ts > first_signup
              THEN 1 END) AS purchases_after_signup,
        count(*) AS n_events
      FROM e GROUP BY user_id ORDER BY user_id""")),

    // Six-table join chain (TPC-H Q5 shape): local-supplier revenue per
    // nation — the full join-graph stress case (dims broadcast, facts
    // shuffled, join reorder left to Catalyst).
    ("q39_multijoin", (s: SparkSession, d: String) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(org.apache.spark.sql.types.DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // Ordered string aggregation (listagg / string_agg parity).
    ("q40_listagg", (s: SparkSession, d: String) => {
      Tables.nation(s, d)
        .join(Tables.supplier(s, d), col("n_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(concat_ws(",", array_sort(collect_list(col("s_name")))).as("suppliers"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name,
        string_agg(s_name, ',' ORDER BY s_name) AS suppliers
      FROM nation JOIN supplier ON n_nationkey = s_nationkey
      GROUP BY n_name ORDER BY n_name""")),

    // Date arithmetic: day diffs, month offsets, fractional month spans.
    ("q41_date_arith", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
            .as("days_to_98"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("month_index"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
        CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER)
          AS days_to_98,
        CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INTEGER) AS month_index
      FROM orders ORDER BY o_orderkey""")),

    // Conditional aggregation (count_if / filtered sums) — the Choice-
    // router metrics shape (B2) as single-pass aggregates.
    ("q33_conditional_agg", (s: SparkSession, d: String) => {
      Tables.orders(s, d)
        .agg(
          count_if(col("o_orderstatus") === "F").as("n_f"),
          count_if(col("o_orderstatus") === "O").as("n_o"),
          sum(when(col("o_orderpriority").startsWith("1"),
            dec(col("o_totalprice"))).otherwise(lit(0).cast(DecimalType(18, 2))))
            .cast(DoubleType).as("urgent_total"))
    },
    Some("""SELECT count(*) FILTER (o_orderstatus = 'F') AS n_f,
      count(*) FILTER (o_orderstatus = 'O') AS n_o,
      CAST(sum(CASE WHEN o_orderpriority LIKE '1%'
               THEN CAST(o_totalprice AS DECIMAL(18,2))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent_total
      FROM orders""")),

    // Unpivot/melt — wide measure columns to (measure, value) rows, the
    // reshape every feature-extraction pipeline runs before per-measure
    // aggregation. Spark's native unpivot operator (an Expand node: one
    // pass, no join/union of N projections).
    ("q44_unpivot", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 20)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(DoubleType).as("qty"),
          col("l_extendedprice").cast(DoubleType).as("price"),
          col("l_discount").cast(DoubleType).as("disc"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("qty"), col("price"), col("disc")),
          "measure", "val")
        // duplicate (orderkey, linenumber) tuples exist in the synthetic
        // data — val is the required final tiebreak for a total order
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"), col("val"))
    },
    Some("""WITH base AS (
        SELECT l_orderkey, l_linenumber,
          CAST(l_quantity AS DOUBLE) AS qty,
          CAST(l_extendedprice AS DOUBLE) AS price,
          CAST(l_discount AS DOUBLE) AS disc
        FROM lineitem WHERE l_orderkey < 20),
      u AS (SELECT * FROM base UNPIVOT (val FOR measure IN (qty, price, disc)))
      SELECT l_orderkey, l_linenumber, measure, val FROM u
      ORDER BY l_orderkey, l_linenumber, measure, val""")),

    // Explicit GROUPING SETS (beyond q10 rollup / q11 cube): an
    // arbitrary set list with grouping() markers disambiguating real
    // NULLs from subtotal rows — one Expand + one aggregation pass.
    ("q45_grouping_sets", (s: SparkSession, d: String) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
          CAST(grouping(l_returnflag) AS INT) AS g_flag,
          CAST(grouping(l_linestatus) AS INT) AS g_status,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          count(*) AS n_rows
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
          l_linestatus NULLS FIRST""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
        CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        count(*) AS n_rows
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
        l_linestatus NULLS FIRST"""))
  ,
    // Z-order (Morton) keys — the multi-dimensional data-layout
    // primitive behind Delta OPTIMIZE ZORDER / Iceberg sort orders:
    // exact integer bit interleave (codegen'd shift/mask arithmetic),
    // oracle-gated bit-for-bit against DuckDB's replication of the
    // same 5-step spread. The LAYOUT win (per-file min/max boxes
    // pruning 2-D predicates a linear sort cannot) is measured in
    // ScaleSpec over Scale.zorderWrite.
    ("q49_zorder", (s: SparkSession, d: String) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          Scale.zorder2(col("l_partkey"), col("l_suppkey")).as("z"))
        .orderBy(col("z"), col("l_orderkey"), col("l_linenumber")),
    Some("""WITH b AS (
        SELECT l_orderkey, l_linenumber,
          CAST(l_partkey AS BIGINT) AS x, CAST(l_suppkey AS BIGINT) AS y
        FROM lineitem),
      s1 AS (SELECT l_orderkey, l_linenumber,
        ((x | (x << 16)) & 281470681808895) AS x,
        ((y | (y << 16)) & 281470681808895) AS y FROM b),
      s2 AS (SELECT l_orderkey, l_linenumber,
        ((x | (x << 8)) & 71777214294589695) AS x,
        ((y | (y << 8)) & 71777214294589695) AS y FROM s1),
      s3 AS (SELECT l_orderkey, l_linenumber,
        ((x | (x << 4)) & 1085102592571150095) AS x,
        ((y | (y << 4)) & 1085102592571150095) AS y FROM s2),
      s4 AS (SELECT l_orderkey, l_linenumber,
        ((x | (x << 2)) & 3689348814741910323) AS x,
        ((y | (y << 2)) & 3689348814741910323) AS y FROM s3),
      s5 AS (SELECT l_orderkey, l_linenumber,
        ((x | (x << 1)) & 6148914691236517205) AS x,
        ((y | (y << 1)) & 6148914691236517205) AS y FROM s4)
      SELECT l_orderkey, l_linenumber, (x | (y << 1)) AS z
      FROM s5 ORDER BY z, l_orderkey, l_linenumber"""))
  )
}
