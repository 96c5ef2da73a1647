package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.GraftFunctions._
import graft.sinks.{PublishSink, SpillSink, Transfer}
import graft.sources.Discovery

/** The reference's three state machines composed as ONE logical plan
  * (SURVEY §3: discover → [transfer] → build-stac → submit, with the
  * cogify branch split off by the B2 router). What took 7 Lambdas, 3 Step
  * Functions and 2 SQS queues is a single DataFrame pipeline — the
  * process/queue hops become plan stages, and Catalyst sees the whole
  * thing.
  */
object Ingest {

  final case class IngestConfig(
      targetRoot: String, // transfer destination (A10)
      spillDir: String, // oversized-item side storage (A17)
      dryRunDir: String, // publish sink dry-run capture (A19)
      spillThreshold: Int = SpillSink.DefaultThreshold,
      // B3: the reference's Map max_concurrency=100
      // (step_function_stack.py:87,95,140,182) — explicit task fan-out
      // for the side-effecting stages; None = inherit source partitioning
      parallelism: Option[Int] = None)

  /** Discovered assets → published items. Returns (published items,
    * publish dead-letters). */
  def run(assets: DataFrame, cfg: IngestConfig,
      makePoster: () => PublishSink.ItemPoster,
      cmrMeta: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val fanned = cfg.parallelism.fold(assets)(assets.repartition)
    val transferred = Transfer.execute(fanned, cfg.targetRoot)

    val items = buildItems(transferred, cmrMeta)
    val routed = SpillSink.route(items, "item_json", cfg.spillDir, cfg.spillThreshold)
    val resolved = SpillSink.resolve(routed)
    val dlq = PublishSink.publish(resolved, "resolved_item", makePoster)
    (resolved, dlq)
  }

  /** The build-stac enrichment with event-union dispatch (A11,
    * reference build-stac/handler.py:40-41): events carrying a
    * `granule_id` are CMR events — their datetime comes from the catalog
    * metadata's `time_start` via a broadcast lookup join (A16,
    * stac.py:113-129, replacing the per-record remote fetch); the rest
    * are regex events — datetime precedence + filename extraction
    * (A13/A14) and id derivation (A15).
    *
    * @param cmrMeta optional granule-metadata dim
    *   (granule_id, time_start, time_end), e.g. from the
    *   GranuleCatalog source; without it CMR events fall back to the
    *   regex path (offline degradation).
    */
  def buildItems(events: DataFrame, cmrMeta: Option[DataFrame] = None): DataFrame = {
    val withDates = cmrMeta match {
      case Some(meta) =>
        val isCmr = col("granule_id").isNotNull
        val regexDts = extract_filename_dates(col("s3_filename"), col("datetime_range"))
        events
          .join(broadcast(meta.select(col("granule_id"),
            col("time_start").as("__meta_start"))), Seq("granule_id"), "left")
          .withColumn("dts",
            when(isCmr && col("__meta_start").isNotNull,
              struct(lit(null).cast("timestamp").as("start_datetime"),
                lit(null).cast("timestamp").as("end_datetime"),
                col("__meta_start").as("single_datetime")))
              .otherwise(regexDts))
          .drop("__meta_start")
      case None =>
        events.withColumn("dts",
          extract_filename_dates(col("s3_filename"), col("datetime_range")))
    }
    withDates
      .withColumn("item_id",
        // A15 with the CMR rule of stac.py:118: granule id IS the item id
        coalesce(col("granule_id"),
          derive_item_id(col("s3_filename"), col("id_regex"))))
      .withColumn("item_json", to_json(struct(
        col("item_id"), col("collection"), col("s3_filename"),
        col("granule_id"),
        date_format(col("dts.start_datetime"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
          .as("start_datetime"),
        date_format(col("dts.end_datetime"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
          .as("end_datetime"),
        date_format(col("dts.single_datetime"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
          .as("datetime"))))
      // A13 contract: no extractable datetime and no explicit one → the
      // record is dead-letterable, not publishable
      .withColumn("valid", col("dts").isNotNull)
  }

  /** Continuous-ingest mode (SURVEY §0 consequence 2): a stream of
    * discovered-asset batches dropped into `assetDir` drains through the
    * SAME batch pipeline via foreachBatch — micro-batch triggers stand in
    * for the reference's SQS batch windows (B6). */
  def runStream(spark: SparkSession, assetDir: String, cfg: IngestConfig,
      makePoster: () => PublishSink.ItemPoster,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      maxFilesPerTrigger: Int = 10,
      // at-least-once inputs: drop redeliveries within the micro-batch
      // on these key columns (the reference's A10 idempotence for
      // re-delivered SQS messages); None for exactly-once sources
      dedupKeys: Option[Seq[String]] = None): StreamingQuery = {
    val schema = spark.read.parquet(assetDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(assetDir)
    dedupKeys.fold(stream)(ks => stream.dropDuplicates(ks))
      .writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        run(batch, cfg, makePoster)
        () // side-effecting sink stage
      }
      .start()
  }
}
