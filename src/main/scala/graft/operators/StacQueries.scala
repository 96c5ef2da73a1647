package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** Reference-shaped queries that drive the engine's custom STAC scalar
  * functions (A13/A15) through the DuckDB-oracle gate. Filenames are
  * synthesized deterministically from the `orders` table so the oracle can
  * derive the expected values independently via calendar SQL.
  */
object StacQueries {

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // A13+A14: ordered-strategy date extraction incl. month/year expansion
    // (reference build-stac/utils/regex.py:30-83,12-21), via the native
    // ExtractFilenameDates expression over synthesized s3 filenames.
    ("q25_filename_dates", (s: SparkSession, d: String) => {
      val fn = concat(lit("s3://data-bucket/coll/file_"),
        date_format(col("o_orderdate"), "yyyyMMdd"), lit(".tif"))
      val rng = when(col("o_orderkey") % 3 === 0, "month")
        .when(col("o_orderkey") % 3 === 1, "year")
        .otherwise(lit(null))
      Tables.orders(s, d)
        .withColumn("dts", extract_filename_dates(fn, rng))
        .select(col("o_orderkey"),
          col("dts.start_datetime").as("start_datetime"),
          col("dts.end_datetime").as("end_datetime"),
          col("dts.single_datetime").as("single_datetime"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
      CASE WHEN o_orderkey % 3 = 0 THEN CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
           WHEN o_orderkey % 3 = 1 THEN CAST(date_trunc('year', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
           END AS start_datetime,
      CASE WHEN o_orderkey % 3 = 0 THEN CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
           WHEN o_orderkey % 3 = 1 THEN CAST(make_date(CAST(year(o_orderdate) AS INTEGER), 12, 31) AS TIMESTAMP)
           END AS end_datetime,
      CASE WHEN o_orderkey % 3 = 2 THEN CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)
           END AS single_datetime
      FROM orders ORDER BY o_orderkey""")),

    // A15: item-id derivation — capture-group join for even keys, stem for
    // odd (reference build-stac/utils/events.py:22-29).
    ("q26_item_id", (s: SparkSession, d: String) => {
      val fn = concat(lit("s3://data-bucket/coll/file_"),
        date_format(col("o_orderdate"), "yyyyMMdd"), lit(".tif"))
      val rx = when(col("o_orderkey") % 2 === 0, "s3://([^/]*)/(.+)\\.tif$")
        .otherwise(lit(null))
      Tables.orders(s, d)
        .select(col("o_orderkey"), derive_item_id(fn, rx).as("item_id"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
      CASE WHEN o_orderkey % 2 = 0
           THEN 'data-bucket-coll/file_' || strftime(o_orderdate, '%Y%m%d')
           ELSE 'file_' || strftime(o_orderdate, '%Y%m%d') END AS item_id
      FROM orders ORDER BY o_orderkey""")),

    // A12 full item fields: bbox from the affine through the REAL
    // buildItems path (rio_stac with_proj semantics, stac.py:32-48) —
    // the oracle re-derives the axis-aligned bbox arithmetic in SQL.
    ("q46_stac_item_fields", (s: SparkSession, d: String) => {
      import graft.pipeline.Ingest
      val orders = Tables.orders(s, d)
      val events = orders.select(
        col("o_orderkey"),
        lit("coll").as("collection"),
        // '_k<key>' keeps hrefs unique (the raster-meta join is 1:1)
        // without adding a digit run the date strategies could match
        concat(lit("s3://b/coll/file_"),
          date_format(col("o_orderdate"), "yyyyMMdd"),
          lit("_k"), col("o_orderkey").cast("string"), lit(".tif"))
          .as("s3_filename"),
        lit(null).cast("string").as("granule_id"),
        lit(null).cast("string").as("datetime_range"),
        lit(null).cast("string").as("id_regex"))
      val statsType = "struct<count:bigint,min:double,max:double,mean:double," +
        "stddev:double,p25:double,p50:double,p75:double,p98:double," +
        "histogram:array<bigint>>"
      val meta = events.select(col("s3_filename"),
        (lit(100) + col("o_orderkey") % 7).cast("int").as("width"),
        (lit(50) + col("o_orderkey") % 5).cast("int").as("height"),
        array(lit(0.25), lit(0.0),
          (col("o_orderkey") % 10 - lit(180)).cast("double"), lit(0.0),
          lit(-0.5), (lit(90) - col("o_orderkey") % 4).cast("double"))
          .as("affine"),
        lit(4326).as("epsg"),
        lit(null).cast(statsType).as("stats"))
      Ingest.buildItems(events, None, Some(meta))
        .select(col("o_orderkey"), col("item_id"),
          element_at(col("bbox"), 1).as("west"),
          element_at(col("bbox"), 2).as("south"),
          element_at(col("bbox"), 3).as("east"),
          element_at(col("bbox"), 4).as("north"),
          col("dts.single_datetime").as("datetime"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH m AS (
        SELECT o_orderkey,
          100 + o_orderkey % 7 AS w, 50 + o_orderkey % 5 AS h,
          CAST(o_orderkey % 10 - 180 AS DOUBLE) AS cx,
          CAST(90 - o_orderkey % 4 AS DOUBLE) AS fy
        FROM orders)
      SELECT o_orderkey,
        'file_' || strftime(o_orderdate, '%Y%m%d') || '_k' || o_orderkey AS item_id,
        least(cx, cx + 0.25 * w) AS west,
        least(fy, fy + (-0.5) * h) AS south,
        greatest(cx, cx + 0.25 * w) AS east,
        greatest(fy, fy + (-0.5) * h) AS north,
        CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS datetime
      FROM orders JOIN m USING (o_orderkey)
      ORDER BY o_orderkey""")),

    // A12 per-event asset overrides (reference events.py:17-20 →
    // stac.py:42-47): events cycle through full-override, name-only,
    // roles-only, and all-defaults shapes; the asset key, media type,
    // roles, and href are parsed BACK out of the item JSON the real
    // buildItems emitted, and DuckDB rebuilds the expected values from
    // the plant rule — so a dropped override OR a broken default breaks
    // the hash.
    ("q50_stac_asset_overrides", (s: SparkSession, d: String) => {
      import graft.pipeline.Ingest
      val orders = Tables.orders(s, d)
      val k4 = col("o_orderkey") % 4
      val events = orders.select(
        col("o_orderkey"),
        lit("coll").as("collection"),
        concat(lit("s3://b/coll/file_"),
          date_format(col("o_orderdate"), "yyyyMMdd"),
          lit("_k"), col("o_orderkey").cast("string"), lit(".tif"))
          .as("s3_filename"),
        lit(null).cast("string").as("granule_id"),
        lit(null).cast("string").as("datetime_range"),
        lit(null).cast("string").as("id_regex"),
        when(k4 === 0, concat(lit("band_"),
            (col("o_orderkey") % 3).cast("string")))
          .when(k4 === 1, lit("visual"))
          .otherwise(lit(null).cast("string")).as("asset_name"),
        when(k4 === 0, array(lit("data")))
          .when(k4 === 2, array(lit("overview"), lit("thumbnail")))
          .otherwise(lit(null).cast("array<string>")).as("asset_roles"),
        when(k4 === 0, lit("image/jp2"))
          .otherwise(lit(null).cast("string")).as("asset_media_type"))
      val statsType = "struct<count:bigint,min:double,max:double,mean:double," +
        "stddev:double,p25:double,p50:double,p75:double,p98:double," +
        "histogram:array<bigint>>"
      val meta = events.select(col("s3_filename"),
        lit(10).cast("int").as("width"), lit(10).cast("int").as("height"),
        array(lit(0.25), lit(0.0), lit(-180.0), lit(0.0), lit(-0.5),
          lit(90.0)).as("affine"),
        lit(4326).as("epsg"),
        struct(lit(50L).as("count"), lit(0.0).as("min"), lit(1.0).as("max"),
          lit(0.5).as("mean"), lit(0.25).as("stddev"), lit(0.1).as("p25"),
          lit(0.5).as("p50"), lit(0.75).as("p75"), lit(0.98).as("p98"),
          array(lit(1L)).as("histogram")).cast(statsType).as("stats"))
      val assetsMap = from_json(
        get_json_object(col("item_json"), "$.assets"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "map<string,struct<href:string,type:string,roles:array<string>>>"))
      Ingest.buildItems(events, None, Some(meta))
        .withColumn("__a", assetsMap)
        .select(col("o_orderkey"),
          element_at(map_keys(col("__a")), 1).as("asset_key"),
          element_at(map_values(col("__a")), 1).getField("href").as("href"),
          element_at(map_values(col("__a")), 1).getField("type")
            .as("media_type"),
          array_join(element_at(map_values(col("__a")), 1).getField("roles"),
            ",").as("roles"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
        CASE WHEN o_orderkey % 4 = 0 THEN 'band_' || (o_orderkey % 3)
          WHEN o_orderkey % 4 = 1 THEN 'visual'
          ELSE 'cog_default' END AS asset_key,
        's3://b/coll/file_' || strftime(o_orderdate, '%Y%m%d') ||
          '_k' || o_orderkey || '.tif' AS href,
        CASE WHEN o_orderkey % 4 = 0 THEN 'image/jp2'
          ELSE 'image/tiff; application=geotiff; profile=cloud-optimized'
          END AS media_type,
        CASE WHEN o_orderkey % 4 = 0 THEN 'data'
          WHEN o_orderkey % 4 = 2 THEN 'overview,thumbnail'
          ELSE 'data,layer' END AS roles
      FROM orders ORDER BY o_orderkey""")),

    // Catalog validation: items against their collection's (possibly
    // open-ended) temporal interval via StacCollection.enrich — the
    // broadcast catalog join plus the null-end rule of
    // HLSL30.002.json:16-23.
    ("q47_interval_validation", (s: SparkSession, d: String) => {
      import graft.model.StacCollection
      val collections = Tables.region(s, d).select(
        concat(lit("C"), col("r_regionkey").cast("string")).as("id"),
        col("r_name").as("title"),
        lit("CC0-1.0").as("license"),
        lit("month").as("dashboard:time_density"),
        to_timestamp(concat(lit("199"), col("r_regionkey").cast("string"),
          lit("-01-01"))).as("interval_start"),
        when(col("r_regionkey") % 2 === 0,
          to_timestamp(lit("1997-06-30"))).as("interval_end"))
      val items = Tables.orders(s, d).select(col("o_orderkey"),
        concat(lit("C"), (col("o_orderkey") % 5).cast("string"))
          .as("collection"),
        col("o_orderdate").cast("timestamp").as("item_dt"))
      StacCollection.enrich(items, collections, "item_dt")
        .select(col("o_orderkey"), col("collection"), col("title"),
          col("time_density"), col("in_interval"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH c AS (
        SELECT 'C' || r_regionkey AS collection, r_name AS title,
          CAST('199' || r_regionkey || '-01-01' AS TIMESTAMP) AS interval_start,
          CASE WHEN r_regionkey % 2 = 0 THEN TIMESTAMP '1997-06-30' END AS interval_end
        FROM region)
      SELECT o.o_orderkey, 'C' || (o.o_orderkey % 5) AS collection, c.title,
        'month' AS time_density,
        ((c.interval_start IS NULL OR CAST(o.o_orderdate AS TIMESTAMP) >= c.interval_start)
          AND (c.interval_end IS NULL OR CAST(o.o_orderdate AS TIMESTAMP) <= c.interval_end))
          AS in_interval
      FROM orders o LEFT JOIN c ON c.collection = 'C' || (o.o_orderkey % 5)
      ORDER BY o_orderkey""")),

    // Collection time-density summary — the `dashboard:is_periodic` /
    // `time_density` contract (reference data/collections/*.json:
    // no2-monthly.json:44): items bucket at the declared density
    // (month), and a collection is periodic iff every month between its
    // first and last buckets has at least one item. Two aggregations,
    // both shuffling only (collection, month) keys.
    ("q48_time_density", (s: SparkSession, d: String) => {
      val byMonth = Tables.orders(s, d)
        .select(
          concat(lit("C"), (col("o_orderkey") % 5).cast("string")).as("collection"),
          date_trunc("month", col("o_orderdate").cast("timestamp")).as("month"))
        .groupBy(col("collection"), col("month"))
        .agg(count(lit(1)).as("n"))
      byMonth.groupBy(col("collection"))
        .agg(sum(col("n")).as("n_items"),
          count(lit(1)).as("n_months"),
          min(col("month")).as("first_month"),
          max(col("month")).as("last_month"))
        .withColumn("span_months",
          (months_between(col("last_month"), col("first_month")) + 1).cast("long"))
        .withColumn("n_gaps", col("span_months") - col("n_months"))
        .withColumn("is_periodic", col("n_gaps") === 0)
        .orderBy(col("collection"))
    },
    Some("""WITH m AS (
        SELECT 'C' || (o_orderkey % 5) AS collection,
          CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS TIMESTAMP) AS month,
          count(*) AS n
        FROM orders GROUP BY 1, 2)
      SELECT collection, CAST(sum(n) AS BIGINT) AS n_items,
        count(*) AS n_months, min(month) AS first_month, max(month) AS last_month,
        CAST(date_diff('month', min(month), max(month)) + 1 AS BIGINT) AS span_months,
        CAST(date_diff('month', min(month), max(month)) + 1 - count(*) AS BIGINT) AS n_gaps,
        (date_diff('month', min(month), max(month)) + 1 = count(*)) AS is_periodic
      FROM m GROUP BY collection ORDER BY collection""")),

    // The STAC API's core item-search: bbox intersection (inclusive —
    // touching boxes intersect, per GeoJSON bbox semantics) AND
    // datetime-window overlap, over an item table whose bboxes derive
    // from integer congruences (exact arithmetic, no float geometry).
    // Matches come back in Z-ORDER (q49's Morton key over the shifted
    // bbox origin) — the order a z-laid-out catalog returns them in,
    // where one z-range scan covers a spatial query's file set
    // (Scale.zorderWrite + the measured footer-pruning spec are the
    // storage half of this query).
    ("q51_stac_search", (s: SparkSession, d: String) => {
      val items = Tables.orders(s, d).select(
        col("o_orderkey"),
        (col("o_orderkey") % 360 - 180).cast("long").as("minx"),
        // y decorrelated from x (a shared modulus base would make the
        // conjunction of the two range predicates empty)
        ((col("o_orderkey") * 131) % 180 - 90).cast("long").as("miny"),
        col("o_orderdate").cast("date").as("datetime"))
        .withColumn("maxx", col("minx") + 1 + col("o_orderkey") % 3)
        .withColumn("maxy", col("miny") + 1 + col("o_orderkey") % 2)
      items.filter(
        col("minx") <= 30 && col("maxx") >= -10 &&
          col("miny") <= 25 && col("maxy") >= -10 &&
          col("datetime") >= lit("1994-01-01") &&
          col("datetime") <= lit("1996-12-31"))
        .select(col("o_orderkey"), col("minx"), col("miny"),
          col("maxx"), col("maxy"), col("datetime"),
          Scale.zorder2(col("minx") + 180, col("miny") + 90).as("z"))
        .orderBy(col("z"), col("o_orderkey"))
    },
    Some("""WITH items AS (
        SELECT o_orderkey,
          CAST(o_orderkey % 360 - 180 AS BIGINT) AS minx,
          CAST((o_orderkey * 131) % 180 - 90 AS BIGINT) AS miny,
          CAST(o_orderkey % 360 - 180 + 1 + o_orderkey % 3 AS BIGINT) AS maxx,
          CAST((o_orderkey * 131) % 180 - 90 + 1 + o_orderkey % 2 AS BIGINT) AS maxy,
          CAST(o_orderdate AS DATE) AS datetime
        FROM orders),
      hits AS (
        SELECT * FROM items
        WHERE minx <= 30 AND maxx >= -10 AND miny <= 25 AND maxy >= -10
          AND datetime >= DATE '1994-01-01' AND datetime <= DATE '1996-12-31'),
      b AS (
        SELECT o_orderkey, minx, miny, maxx, maxy, datetime,
          minx + 180 AS x, miny + 90 AS y
        FROM hits),
      s1 AS (SELECT * REPLACE (((x | (x << 16)) & 281470681808895) AS x,
        ((y | (y << 16)) & 281470681808895) AS y) FROM b),
      s2 AS (SELECT * REPLACE (((x | (x << 8)) & 71777214294589695) AS x,
        ((y | (y << 8)) & 71777214294589695) AS y) FROM s1),
      s3 AS (SELECT * REPLACE (((x | (x << 4)) & 1085102592571150095) AS x,
        ((y | (y << 4)) & 1085102592571150095) AS y) FROM s2),
      s4 AS (SELECT * REPLACE (((x | (x << 2)) & 3689348814741910323) AS x,
        ((y | (y << 2)) & 3689348814741910323) AS y) FROM s3),
      s5 AS (SELECT * REPLACE (((x | (x << 1)) & 6148914691236517205) AS x,
        ((y | (y << 1)) & 6148914691236517205) AS y) FROM s4)
      SELECT o_orderkey, minx, miny, maxx, maxy, datetime,
        (x | (y << 1)) AS z
      FROM s5 ORDER BY z, o_orderkey"""))
  )
}
