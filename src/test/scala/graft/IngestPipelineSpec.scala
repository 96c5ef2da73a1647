package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.pipeline.Ingest
import graft.pipeline.Ingest.IngestConfig
import graft.sinks.PublishSink
import graft.sources.Discovery
import graft.sources.Discovery.DiscoveryRequest

/** The composed ingest pipeline, batch and streaming: the reference's
  * end-to-end trace (SURVEY §3.1-3.3) as one plan.
  */
class IngestPipelineSpec extends SparkSuite {

  private def mkBucket(): java.io.File = {
    val bucket = tempDir("ibucket")
    Seq("no2/OMI_20160101.tif", "no2/OMI_20160201.tif", "no2/junk.txt").foreach { k =>
      val p = Paths.get(bucket.getAbsolutePath, k)
      Files.createDirectories(p.getParent)
      Files.write(p, ("payload:" + k).getBytes)
    }
    bucket
  }

  private def cfg(): IngestConfig = {
    val w = tempDir("ingest")
    IngestConfig(
      targetRoot = s"file:${w.getAbsolutePath}/target",
      spillDir = s"file:${w.getAbsolutePath}/spill",
      dryRunDir = s"${w.getAbsolutePath}/dry")
  }

  test("batch ingest: discover → transfer → build → publish, end to end") {
    val bucket = mkBucket()
    val c = cfg()
    val assets = Discovery.discover(spark, DiscoveryRequest(
      bucket = s"file:${bucket.getAbsolutePath}", prefix = "no2/",
      filenameRegex = Some("^(?:.*)\\.tif$"), upload = true,
      datetimeRange = Some("month"))).toDF()

    val dryDir = c.dryRunDir
    val (published, dlq) = Ingest.run(assets, c,
      () => new PublishSink.DryRunPoster(dryDir))

    assert(dlq.count() == 0)
    val rows = published.orderBy("item_id").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("item_id")).toSeq ==
      Seq("OMI_20160101", "OMI_20160201"))
    // month expansion landed in the item JSON
    val json = rows.head.getAs[String]("resolved_item")
    assert(json.contains(""""start_datetime":"2016-01-01T00:00:00Z""""))
    assert(json.contains(""""end_datetime":"2016-01-31T00:00:00Z""""))
    // transfer actually copied the payloads
    assert(Files.exists(Paths.get(
      c.targetRoot.stripPrefix("file:"), "no2", "OMI_20160101.tif")))
    // dry-run capture got both items
    val recorded = new java.io.File(dryDir).listFiles()
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).length
    assert(recorded == 2)
  }

  test("streaming ingest drains asset batches through the same pipeline") {
    val bucket = mkBucket()
    val c = cfg()
    val assetDir = tempDir("assets").getAbsolutePath
    Discovery.discover(spark, DiscoveryRequest(
        bucket = s"file:${bucket.getAbsolutePath}", prefix = "no2/",
        filenameRegex = Some("^(?:.*)\\.tif$"), upload = false,
        datetimeRange = Some("month"))).toDF()
      .write.mode("overwrite").parquet(assetDir)

    val dryDir = c.dryRunDir
    val q = Ingest.runStream(spark, assetDir, c,
      () => new PublishSink.DryRunPoster(dryDir), maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()

    val recorded = new java.io.File(dryDir).listFiles()
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
    assert(recorded.length == 2)
    assert(recorded.forall(_.contains("OMI_")))
  }

  test("records without extractable dates are flagged invalid, not fatal") {
    import spark.implicits._
    val assets = Seq(
      ("no2", "file:/tmp/none/undated.tif", false, null: String, null: String))
      .toDF("collection", "s3_filename", "upload", "datetime_range", "id_regex")
      .withColumn("granule_id", lit(null).cast("string"))
    val items = Ingest.buildItems(assets)
    val row = items.head()
    assert(!row.getAs[Boolean]("valid"))
    assert(row.getAs[String]("item_id") == "undated")
  }
}
