package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.CmrDiscovery
import graft.sources.CmrDiscovery.CmrRequest
import graft.sources.catalog.GranuleCatalog

/** DSv2 granule-catalog source: pushdown of collection/version/temporal/
  * bbox into catalog query parameters (reference A4 semantics,
  * cmr-query/handler.py:13-27) and the link-explode discovery on top
  * (A5/A6).
  */
class CatalogSourceSpec extends SparkSuite {

  private lazy val catalogPath: String = {
    val granules = Seq(
      gran("NO2", "1", "g1", "2016-01-01T00:00:00Z", "2016-01-31T23:59:59Z",
        -180, -90, 180, 90,
        links = Seq(CmrDiscovery.DataRel -> "https://host/g1.nc",
          "browse#" -> "https://host/g1.png")),
      gran("NO2", "1", "g2", "2016-02-01T00:00:00Z", "2016-02-29T23:59:59Z",
        -10, -10, 10, 10,
        links = Seq(CmrDiscovery.DataRel -> "https://host/g2.nc")),
      gran("NO2", "2", "g3", "2016-01-15T00:00:00Z", "2016-01-20T23:59:59Z",
        -180, -90, 180, 90,
        links = Seq(CmrDiscovery.DataRel -> "https://host/g3.nc")),
      gran("OTHER", "1", "g4", "2016-01-10T00:00:00Z", "2016-01-12T23:59:59Z",
        -180, -90, 180, 90,
        links = Seq(CmrDiscovery.DataRel -> "https://host/g4.nc",
          "x" -> "https://host/g4.stac.json")))
    val f = Files.createTempFile("granules", ".jsonl")
    Files.write(f, granules.mkString("\n").getBytes)
    f.toString
  }

  private def gran(coll: String, ver: String, id: String, t0: String, t1: String,
      lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
      links: Seq[(String, String)]): String = {
    val linksJson = links.map { case (rel, href) =>
      s"""{"rel":"$rel","href":"$href"}""" }.mkString("[", ",", "]")
    s"""{"collection":"$coll","version":"$ver","granule_id":"$id",
        "time_start":"$t0","time_end":"$t1",
        "lon_min":$lonMin,"lat_min":$latMin,"lon_max":$lonMax,"lat_max":$latMax,
        "links":$linksJson}""".replaceAll("\n\\s*", "")
  }

  test("collection/version/temporal predicates are pushed into the catalog query") {
    GranuleCatalog.lastPushedQuery = GranuleCatalog.CatalogQuery()
    val df = CmrDiscovery.granules(spark, CmrRequest(catalogPath, "NO2", "1",
      temporal = Some(("2016-01-01T00:00:00Z", "2016-03-01T00:00:00Z"))))
    val got = df.select("granule_id").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("g1", "g2"))
    val q = GranuleCatalog.lastPushedQuery
    assert(q.collection.contains("NO2"))
    assert(q.version.contains("1"))
    // overlap semantics: lower bound on time_end, upper bound on time_start
    assert(q.endAfterMicros.isDefined && q.startBeforeMicros.isDefined)
    // the plan carries no residual Filter for the pushed predicates
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GranuleCatalogScan"))
  }

  test("temporal is OVERLAP, not containment: straddling granules match") {
    // g1 spans all of Jan 2016; a query window starting mid-Jan must
    // still find it (the CMR API's temporal semantics)
    val df = CmrDiscovery.granules(spark, CmrRequest(catalogPath, "NO2", "1",
      temporal = Some(("2016-01-15T00:00:00Z", "2016-01-20T00:00:00Z"))))
    assert(df.select("granule_id").collect().map(_.getString(0)).toSeq == Seq("g1"))
  }

  test("bbox intersection predicate becomes catalog bounding-box params") {
    GranuleCatalog.lastPushedQuery = GranuleCatalog.CatalogQuery()
    val df = CmrDiscovery.granules(spark, CmrRequest(catalogPath, "NO2", "1",
      boundingBox = Some((50.0, 50.0, 60.0, 60.0)))) // misses g2's box
    assert(df.select("granule_id").collect().map(_.getString(0)).toSeq == Seq("g1"))
    val q = GranuleCatalog.lastPushedQuery
    assert(q.lonMinLe.contains(60.0) && q.lonMaxGe.contains(50.0))
    assert(q.latMinLe.contains(60.0) && q.latMaxGe.contains(50.0))
  }

  test("discovery explodes links, keeps data rel, applies include regex") {
    val events = CmrDiscovery.discover(spark, CmrRequest(catalogPath, "NO2", "1",
      include = Some("^.+nc$"))).collect()
    assert(events.map(_.getAs[String]("s3_filename")).sorted.toSeq ==
      Seq("https://host/g1.nc", "https://host/g2.nc"))
    assert(events.forall(_.getAs[String]("granule_id").startsWith("g")))
  }

  test("stac mode keeps only https stac.json links") {
    val events = CmrDiscovery.discover(spark,
      CmrRequest(catalogPath, "OTHER", "1", mode = Some("stac"))).collect()
    assert(events.map(_.getAs[String]("s3_filename")).toSeq ==
      Seq("https://host/g4.stac.json"))
  }

  test("two lower bounds on the same column are BOTH enforced (tightened, not overwritten)") {
    GranuleCatalog.lastPushedQuery = GranuleCatalog.CatalogQuery()
    val df = spark.read.format("graft.sources.catalog.GranuleCatalog")
      .option("path", catalogPath).load()
      .filter(col("time_start") >= lit("2016-01-05 00:00:00").cast("timestamp") &&
        col("time_start") >= lit("2016-01-20 00:00:00").cast("timestamp"))
    // g3 (Jan 15) satisfies the first bound but not the second — a scan
    // that keeps only one bound would leak it
    assert(df.select("granule_id").collect().map(_.getString(0)).sorted.toSeq == Seq("g2"))
    val q = GranuleCatalog.lastPushedQuery
    val jan20 = java.time.Instant.parse("2016-01-20T00:00:00Z")
    assert(q.startAfterMicros.contains(jan20.getEpochSecond * 1000000L))
  }

  test("two upper bounds tighten to the min") {
    GranuleCatalog.lastPushedQuery = GranuleCatalog.CatalogQuery()
    val df = spark.read.format("graft.sources.catalog.GranuleCatalog")
      .option("path", catalogPath).load()
      .filter(col("time_start") <= lit("2016-01-31 00:00:00").cast("timestamp") &&
        col("time_start") <= lit("2016-01-12 00:00:00").cast("timestamp"))
    assert(df.select("granule_id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("g1", "g4"))
    val jan12 = java.time.Instant.parse("2016-01-12T00:00:00Z")
    assert(GranuleCatalog.lastPushedQuery.startBeforeMicros
      .contains(jan12.getEpochSecond * 1000000L))
  }

  test("conflicting collection equalities stay enforced (empty result, not last-wins)") {
    val df = spark.read.format("graft.sources.catalog.GranuleCatalog")
      .option("path", catalogPath).load()
      .filter(col("collection") === "NO2" && col("collection") === "OTHER")
    assert(df.count() == 0)
  }

  test("fetch pages server-side: parsing stops once the page is full") {
    import graft.sources.catalog.CatalogClient
    CatalogClient.recordsParsed.set(0L)
    val page0 = CatalogClient.fetch(catalogPath, GranuleCatalog.CatalogQuery(), 0, 2)
    assert(page0.size == 2)
    // 4 granules in the file; page 0 of size 2 must parse exactly 2
    assert(CatalogClient.recordsParsed.get() == 2L)
    CatalogClient.recordsParsed.set(0L)
    val page1 = CatalogClient.fetch(catalogPath, GranuleCatalog.CatalogQuery(), 1, 2)
    assert(page1.size == 2)
    assert(CatalogClient.recordsParsed.get() == 4L) // skip 2 + take 2
  }

  test("paging yields multiple input partitions") {
    val df = spark.read.format("graft.sources.catalog.GranuleCatalog")
      .option("path", catalogPath).option("pagesize", "2").load()
    assert(df.rdd.getNumPartitions == 2) // 4 granules / pagesize 2
    assert(df.count() == 4)
  }
}
