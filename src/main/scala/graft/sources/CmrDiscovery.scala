package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-driven discovery (reference A4-A6,
  * lambdas/cmr-query/handler.py:8-56): query the granule catalog with
  * pushed-down collection/version/temporal/bbox parameters, explode each
  * granule's `links[]`, keep the data links (or, in `stac` mode, the
  * https `stac.json` links), apply the optional `include` regex, and
  * project discovered-asset events.
  */
object CmrDiscovery {

  val DataRel = "http://esipfed.org/ns/fedsearch/1.1/data#" // handler.py:36

  final case class CmrRequest(
      catalogPath: String,
      collection: String,
      version: String,
      temporal: Option[(String, String)] = None, // ISO instants
      boundingBox: Option[(Double, Double, Double, Double)] = None, // W,S,E,N
      include: Option[String] = None,
      mode: Option[String] = None,
      cogify: Boolean = false)

  /** The raw catalog scan with every pushable predicate expressed as a
    * Spark filter (Catalyst hands them to the DSv2 pushdown). */
  def granules(spark: SparkSession, req: CmrRequest): DataFrame = {
    var df = spark.read.format("graft.sources.catalog.GranuleCatalog")
      .option("path", req.catalogPath).load()
      .filter(col("collection") === req.collection)
      .filter(col("version") === req.version)
    req.temporal.foreach { case (start, end) =>
      // CMR temporal semantics: the granule's range OVERLAPS the query
      // range (not containment) — a granule straddling the window edge
      // still matches, like the remote API's temporal parameter
      df = df.filter(col("time_end") >= to_timestamp(lit(start)) &&
        col("time_start") <= to_timestamp(lit(end)))
    }
    req.boundingBox.foreach { case (w, s, e, n) =>
      df = df.filter(col("lon_min") <= e && col("lon_max") >= w &&
        col("lat_min") <= n && col("lat_max") >= s)
    }
    df
  }

  /** Full discovery: scan → link explode → rel/suffix filter → include
    * regex → event projection (handler.py:29-53). */
  def discover(spark: SparkSession, req: CmrRequest): DataFrame = {
    val exploded = granules(spark, req)
      .select(col("collection"), col("granule_id"), explode(col("links")).as("link"))
      .select(col("collection"), col("granule_id"),
        col("link.rel").as("rel"), col("link.href").as("href"))

    val kept = req.mode match {
      case Some("stac") => // https links ending stac.json (handler.py:33)
        exploded.filter(col("href").endsWith("stac.json") &&
          col("href").startsWith("https"))
      case _ => // canonical data links (handler.py:36)
        exploded.filter(col("rel") === DataRel)
    }

    val included = req.include match {
      case Some(rx) => kept.filter(col("href").rlike("^(?:" + rx + ")")) // re.match
      case None => kept
    }

    included.select(
      col("collection"),
      col("href").as("s3_filename"),
      col("granule_id"),
      lit(false).as("upload"),
      lit(req.cogify).as("cogify"),
      lit(req.mode.orNull).cast("string").as("mode"))
  }
}
