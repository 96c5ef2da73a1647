package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's TPC-H-ish test tables (TESTDATA.md).
  *
  * Schemas are read from the parquet footers at runtime — never
  * hand-declared — so the harness cannot drift from the data
  * (FIXTURES.md §B). The `events` table's `ts` has shipped in two
  * on-disk shapes across testdata generations — TIMESTAMP(NANOS) (read
  * as LONG under `spark.sql.legacy.parquet.nanosAsLong`) and tz-naive
  * microseconds (read as TIMESTAMP_NTZ); [[Tables.events]] normalizes
  * BOTH to a microsecond TIMESTAMP column and asserts the result, so
  * downstream event-time operators see one canonical type at every
  * scale factor and the next silent testdata drift fails loudly.
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
  /** `documents` with the NOT-NULL text assumption enforced LOUDLY at
    * the ingest boundary: the shingle/fingerprint family (word_grams,
    * winnow, minhash) returns NULL for NULL text where a composed
    * explode would have produced [NULL] — a null row entering a dedup
    * pipeline would silently change exploded row counts against the
    * oracles. A filter would hide such rows the same silent way; a
    * per-row assertion turns them into an error instead. The guard is a
    * codegen'd null-check branch — never taken on clean data. */
  def documents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(spark, dir, "documents").withColumn("text",
      when(col("text").isNotNull, col("text"))
        .otherwise(raise_error(concat(
          lit("documents.text is NULL at doc_id="), col("doc_id")))))
  }
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
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(spark, dir, "events")
    val normalized = raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, not `/`: double division loses precision on
        // ~1.7e18 epoch-nanos (53-bit mantissa)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // tz-naive µs parquet: under the UTC session the cast is
        // value-identical, and DuckDB reads the same naive µs values, so
        // oracle parity is unaffected. TIMESTAMP (not NTZ) is required by
        // unix_micros and withWatermark downstream.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw // already a timestamp type
    }
    // Fail loudly on the next silent testdata drift instead of letting
    // event-time operators break one by one at analysis.
    require(normalized.schema("ts").dataType == TimestampType,
      s"events.ts must normalize to TIMESTAMP, got ${normalized.schema("ts").dataType}")
    normalized
  }
}
