package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's TPC-H-ish test tables (TESTDATA.md).
  *
  * Schemas are read from the parquet footers at runtime — never
  * hand-declared — so the harness cannot drift from the data
  * (FIXTURES.md §B). The `events` table carries nanosecond parquet
  * timestamps, which Spark reads as LONG under
  * `spark.sql.legacy.parquet.nanosAsLong`; [[Tables.events]] normalizes
  * that back to a microsecond TIMESTAMP column so downstream operators
  * see one canonical type at every scale factor.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events` with `ts` normalized to a TIMESTAMP (µs) column.
    *
    * The parquet file stores TIMESTAMP(NANOS). Spark cannot represent
    * nanosecond precision; with the `nanosAsLong` legacy flag the column
    * arrives as a LONG of epoch-nanos, which we truncate (not round) to
    * micros — matching DuckDB's own ns→µs truncation, so oracle
    * comparisons agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: double division loses precision on
        // ~1.7e18 epoch-nanos (53-bit mantissa)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw // already a timestamp type
    }
  }
}
