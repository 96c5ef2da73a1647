package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The STAC Collection catalog table (SURVEY §1.1 abstraction 2;
  * format: reference OPERATING.md:15-60, 60 instances under reference
  * data/collections/). Collections are the dimension table items join
  * against (`collection` key, s3-discovery/handler.py:52) — always
  * broadcastable.
  */
object StacCollection {

  /** Nested schema mirroring the collection JSON: bbox
    * array<array<double>>, temporal interval array<array<timestamp>>
    * (null end = open-ended, e.g. reference HLSL30.002.json:16-23),
    * dashboard flags, item_assets map. */
  private val spatialType = StructType(Seq(
    StructField("bbox", ArrayType(ArrayType(DoubleType)))))
  private val temporalType = StructType(Seq(
    StructField("interval", ArrayType(ArrayType(StringType)))))
  private val assetType = StructType(Seq(
    StructField("type", StringType),
    StructField("roles", ArrayType(StringType)),
    StructField("title", StringType),
    StructField("description", StringType)))

  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("type", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("license", StringType),
    StructField("extent", StructType(Seq(
      StructField("spatial", spatialType),
      StructField("temporal", temporalType)))),
    StructField("dashboard:is_periodic", BooleanType),
    StructField("dashboard:time_density", StringType),
    StructField("item_assets", MapType(StringType, assetType))))

  /** Load a directory/glob of collection JSON documents into the typed
    * catalog table (multiline JSON, one document per file — the
    * reference's data/collections layout). */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).option("multiLine", true).json(path)
      .withColumn("interval_start",
        to_timestamp(element_at(element_at(col("extent.temporal.interval"), 1), 1)))
      .withColumn("interval_end", // null = open-ended
        to_timestamp(element_at(element_at(col("extent.temporal.interval"), 1), 2)))

  /** Catalog-validation predicate: an item datetime falls inside the
    * collection's (possibly open-ended) temporal interval. */
  def containsDatetime(itemTs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (col("interval_start").isNull || itemTs >= col("interval_start")) &&
      (col("interval_end").isNull || itemTs <= col("interval_end"))

  /** Enrichment join of items against the collection catalog (reference
    * A16 generalization): broadcast the catalog — it is a small dim by
    * construction. Adds `in_interval` validation. */
  def enrich(items: DataFrame, collections: DataFrame,
      itemTsCol: String): DataFrame =
    items.join(broadcast(collections
        .select(col("id").as("collection"), col("title"), col("license"),
          col("dashboard:time_density").as("time_density"),
          col("interval_start"), col("interval_end"))),
      Seq("collection"), "left")
      .withColumn("in_interval", containsDatetime(col(itemTsCol)))
}
