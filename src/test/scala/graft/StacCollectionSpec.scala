package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.StacCollection

/** Collections catalog: nested-schema load (incl. open-ended temporal
  * interval, reference HLSL30.002.json shape) and the broadcast
  * enrichment join with interval validation (A16 generalization).
  */
class StacCollectionSpec extends SparkSuite {

  private lazy val collDir: String = {
    val d = tempDir("collections")
    def write(name: String, json: String): Unit =
      Files.write(Paths.get(d.getAbsolutePath, name), json.getBytes)
    write("no2-monthly.json",
      """{
        "id": "no2-monthly", "type": "Collection", "title": "NO2 monthly",
        "description": "trop. NO2", "license": "MIT",
        "extent": {
          "spatial": {"bbox": [[-180, -90, 180, 90]]},
          "temporal": {"interval": [["2016-01-01T00:00:00Z", "2022-01-01T00:00:00Z"]]}},
        "dashboard:is_periodic": true,
        "dashboard:time_density": "month",
        "item_assets": {"cog_default": {"type": "image/tiff", "roles": ["data"],
          "title": "Default", "description": "COG"}}
      }""")
    write("open-ended.json",
      """{
        "id": "hls", "type": "Collection", "title": "HLS",
        "description": "open-ended", "license": "MIT",
        "extent": {
          "spatial": {"bbox": [[-180, -90, 180, 90]]},
          "temporal": {"interval": [["2015-01-01T00:00:00Z", null]]}},
        "dashboard:is_periodic": false,
        "dashboard:time_density": null,
        "item_assets": {}
      }""")
    d.getAbsolutePath
  }

  test("loads nested collection JSON incl. open-ended interval") {
    val c = StacCollection.load(spark, collDir)
    assert(c.count() == 2)
    val open = c.filter(col("id") === "hls").head()
    assert(open.getAs[java.sql.Timestamp]("interval_end") == null)
    val no2 = c.filter(col("id") === "no2-monthly").head()
    assert(no2.getAs[String]("dashboard:time_density") == "month")
    assert(no2.getAs[Map[String, Any]]("item_assets").contains("cog_default"))
  }

  test("broadcast enrichment join validates item datetimes against intervals") {
    import spark.implicits._
    val items = Seq(
      ("no2-monthly", "i1", "2016-06-15 00:00:00"),
      ("no2-monthly", "i2", "2025-01-01 00:00:00"), // after interval end
      ("hls", "i3", "2030-01-01 00:00:00"), // open-ended: still inside
      ("unknown", "i4", "2016-06-15 00:00:00")) // no catalog entry
      .toDF("collection", "item_id", "ts")
      .withColumn("ts", to_timestamp(col("ts")))

    val enriched = StacCollection.enrich(items,
      StacCollection.load(spark, collDir), "ts")
    val byId = enriched.collect().map(r =>
      r.getAs[String]("item_id") -> r).toMap
    assert(byId("i1").getAs[Boolean]("in_interval"))
    assert(!byId("i2").getAs[Boolean]("in_interval"))
    assert(byId("i3").getAs[Boolean]("in_interval"))
    assert(byId("i4").getAs[String]("title") == null) // left join survives
    assert(byId("i4").getAs[Boolean]("in_interval")) // no bounds -> vacuously in

    // the catalog side must be planned as a broadcast join
    val plan = enriched.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
