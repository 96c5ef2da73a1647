package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Object-store discovery source (reference A1-A3,
  * lambdas/s3-discovery/handler.py:16-65): list keys under a
  * bucket/prefix, keep those matching an anchored regex, and project each
  * into a discovered-asset event with collection/upload/cogify defaults
  * and passthrough extras.
  *
  * Scale design: the reference's single ListObjects loop is replaced by a
  * two-level listing — the driver enumerates only the first level under
  * the prefix, then the recursive expansion fans out across executors
  * (`flatMap` over directories). A 100 TB bucket with millions of keys
  * never materializes on the driver. Works over any Hadoop filesystem
  * (file://, s3a://, …).
  */
object Discovery {

  /** One discovery request (the step-function input event,
    * reference OPERATING.md:68-91; FIXTURES.md §A1). */
  final case class DiscoveryRequest(
      bucket: String,
      prefix: String = "",
      filenameRegex: Option[String] = None,
      collection: Option[String] = None,
      upload: Boolean = false,
      cogify: Boolean = false,
      datetimeRange: Option[String] = None,
      idRegex: Option[String] = None,
      extras: Map[String, String] = Map.empty)

  /** Discovered-asset event (FIXTURES.md §A2). */
  final case class DiscoveredAsset(
      collection: String,
      s3_filename: String,
      size: Long,
      upload: Boolean,
      cogify: Boolean,
      granule_id: Option[String],
      datetime_range: Option[String],
      id_regex: Option[String],
      extras: Map[String, String])

  /** List all keys (relative to the bucket root) under `prefix`,
    * distributed: first level on the driver, recursion on executors.
    *
    * `overlays` is the cross-account seam (reference s3-discovery/
    * handler.py:17-24 assumes an external role to list a provider's
    * bucket): the listing targets ONE bucket, so the matching overlay
    * resolves once on the driver and the effective configuration ships
    * to the executor-side recursion ([[SourceConf]]).
    */
  def listKeys(spark: SparkSession, req: DiscoveryRequest,
      overlays: Map[String, Map[String, String]] = Map.empty)
      : Dataset[(String, Long)] = {
    import spark.implicits._
    val root = if (req.prefix.isEmpty) new Path(req.bucket)
      else new Path(req.bucket, req.prefix)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      SourceConf.resolve(spark.sparkContext.hadoopConfiguration,
        overlays, req.bucket))
    val bucketUri = new Path(req.bucket).toUri

    def rel(p: Path): String = bucketUri.relativize(p.toUri).getPath

    val fs = root.getFileSystem(conf.value)
    if (!fs.exists(root)) return spark.emptyDataset[(String, Long)]
    val firstLevel = fs.listStatus(root).toSeq
    val files = firstLevel.filter(_.isFile).map(s => (rel(s.getPath), s.getLen))
    val dirs = firstLevel.filter(_.isDirectory).map(_.getPath.toString)

    val nested = spark.createDataset(dirs)
      .repartition(math.max(1, math.min(dirs.size, 64)))
      .mapPartitions { it =>
        it.flatMap { dir =>
          val p = new Path(dir)
          val dfs = p.getFileSystem(conf.value)
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
          val iter = dfs.listFiles(p, true)
          while (iter.hasNext) {
            val s = iter.next()
            out += ((bucketUri.relativize(s.getPath.toUri).getPath, s.getLen))
          }
          out
        }
      }
    spark.createDataset(files).union(nested)
  }

  /** Full discovery: listing → anchored-regex filter (`re.match`
    * semantics, handler.py:30-34) → event projection with defaults
    * (handler.py:52-61).
    */
  def discover(spark: SparkSession, req: DiscoveryRequest,
      overlays: Map[String, Map[String, String]] = Map.empty)
      : Dataset[DiscoveredAsset] = {
    import spark.implicits._
    val keys = listKeys(spark, req, overlays).toDF("key", "size")
    // re.match anchors at the start only → translate to ^(?:...)
    val filtered = req.filenameRegex match {
      case Some(rx) => keys.filter(col("key").rlike("^(?:" + rx + ")"))
      case None => keys
    }
    val collection = req.collection.getOrElse(req.prefix.stripSuffix("/"))
    filtered.select(
        lit(collection).as("collection"),
        concat(lit(req.bucket.stripSuffix("/") + "/"), col("key")).as("s3_filename"),
        col("size"),
        lit(req.upload).as("upload"),
        lit(req.cogify).as("cogify"),
        lit(null).cast("string").as("granule_id"),
        lit(req.datetimeRange.orNull).cast("string").as("datetime_range"),
        lit(req.idRegex.orNull).cast("string").as("id_regex"),
        typedLit(req.extras).as("extras"))
      .as[DiscoveredAsset]
  }

  /** The cogify/publish split router (reference B2,
    * deploy/cdk/step_function_stack.py:80-99): one pass, two streams. */
  def routeCogify(assets: DataFrame): (DataFrame, DataFrame) =
    (assets.filter(col("cogify")), assets.filter(!col("cogify")))
}
