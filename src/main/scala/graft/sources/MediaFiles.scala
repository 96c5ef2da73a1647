package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw media-file ingestion — the path from a bucket of image/audio
  * files to the multimodal `binary`-column table the m-operators
  * consume (SURVEY §2.4 scans: the binaryFile + CSV members of the
  * declared scan surface).
  *
  * Layout at scale: `binaryFile` is a DSv2 file source, so the LISTING
  * distributes and `pathGlobFilter` prunes files before any bytes are
  * read (the same listing-side prune as the reference's filename regex,
  * A2/A6 — not a post-scan filter). Each file lands whole in one row;
  * `spark.sql.files.maxPartitionBytes` packs small media files into
  * tasks. Typed per-file metadata (labels, capture info) rides in a
  * sidecar CSV keyed by file name and joins broadcast — metadata tables
  * are tiny next to payload bytes.
  */
object MediaFiles {

  /** Scan a directory of media files into (media_id, path, mtime,
    * byte_len, content). `glob` prunes at listing time.
    *
    * `media_id` is the DECODED base file name: binaryFile's `path`
    * column is URI-form, so a file named `my file.img` surfaces as
    * `.../my%20file.img` — joining that raw form against sidecar keys
    * would silently miss. `url_decode` maps `+` to space
    * (form-encoding), which a literal `+` in a file name must survive,
    * hence the pre-escape. Sidecar keying assumes base names are unique
    * across the scanned tree (the flat-bucket layout media dumps use);
    * duplicate base names fan the sidecar join out — key on `path` in
    * that layout instead. */
  def scan(spark: SparkSession, dir: String,
      glob: Option[String] = None): DataFrame = {
    val base = spark.read.format("binaryFile")
    val withGlob = glob.fold(base)(g => base.option("pathGlobFilter", g))
    val rawName = regexp_extract(col("path"), "([^/]+)$", 1)
    withGlob.load(dir)
      .select(
        url_decode(regexp_replace(rawName, "\\+", "%2B")).as("media_id"),
        col("path"),
        col("modificationTime").as("mtime"),
        col("length").as("byte_len"),
        col("content"))
  }

  /** Sidecar metadata header: media_id,media_type,label — the schema is
    * declared, never inferred (inference would re-read the file per
    * executor at plan time). */
  private val sidecarSchema = "media_id STRING, media_type STRING, label STRING"

  /** Join a sidecar metadata CSV onto a scanned media frame. The CSV is
    * broadcast: sidecars are per-file rows of a few strings, payloads
    * are the heavy side. Files without sidecar rows keep null metadata
    * (left join) so missing annotations don't drop payloads. */
  def withSidecar(media: DataFrame, csvPath: String): DataFrame = {
    val spark = media.sparkSession
    val side = spark.read
      .schema(sidecarSchema)
      .option("header", "true")
      .csv(csvPath)
    media.join(broadcast(side), Seq("media_id"), "left")
  }
}
