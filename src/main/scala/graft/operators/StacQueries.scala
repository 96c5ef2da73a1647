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
      FROM orders ORDER BY o_orderkey"""))
  )
}
