package graft.sources

import org.apache.hadoop.conf.Configuration

/** Per-source credential/configuration routing — the cross-account seam
  * the reference assumes via an external IAM role on discovery and
  * transfer (s3-discovery/handler.py:17-24, data-transfer/handler.py:
  * 22-31): a pipeline reading provider bucket A with role X while
  * writing its own bucket B with the task's default credentials.
  *
  * Two public-Hadoop mechanisms, composable:
  *
  *  1. [[bucketKeys]] — the s3a-idiomatic form: per-bucket options as
  *     `fs.s3a.bucket.<name>.<suffix>` keys on ONE configuration; the
  *     S3A filesystem itself propagates them when it initializes for
  *     that bucket (credentials, assumed role ARN, endpoint, …). Zero
  *     custom routing at read time.
  *  2. [[resolve]] — scheme-agnostic longest-prefix overlay: returns a
  *     copy of the base configuration with the winning source's
  *     settings applied, for schemes without native per-bucket support.
  *     Overlays should be keyed per authority (bucket/host): Hadoop's
  *     `FileSystem.get` caches instances by scheme+authority, so two
  *     overlays for the SAME authority would race for one cached
  *     filesystem.
  */
object SourceConf {

  /** Expand per-bucket option maps into the `fs.s3a.bucket.<name>.*`
    * keys S3A resolves natively. Suffixes are relative to `fs.s3a.`
    * (e.g. `"assumed.role.arn"`, `"access.key"`,
    * `"aws.credentials.provider"`). Returns the flat key→value map so
    * callers can apply it to a session conf or a job conf alike. */
  def bucketKeys(buckets: Map[String, Map[String, String]]): Map[String, String] =
    buckets.flatMap { case (bucket, opts) =>
      opts.map { case (suffix, v) => s"fs.s3a.bucket.$bucket.$suffix" -> v }
    }

  /** Apply [[bucketKeys]] to a configuration in place. */
  def applyBucketOverlays(conf: Configuration,
      buckets: Map[String, Map[String, String]]): Unit =
    bucketKeys(buckets).foreach { case (k, v) => conf.set(k, v) }

  /** A copy of `base` with the longest-prefix-matching overlay for `uri`
    * applied (base is never mutated); no match returns `base` itself.
    * Prefix matching is plain string-prefix over the URI, so overlays
    * can scope to a scheme (`"s3a://"`), a bucket
    * (`"s3a://provider-bucket"`), or a path subtree. */
  def resolve(base: Configuration,
      overlays: Map[String, Map[String, String]], uri: String): Configuration = {
    val hit = overlays.keys.filter(uri.startsWith).toSeq.sortBy(-_.length)
      .headOption
    hit match {
      case None => base
      case Some(prefix) =>
        val conf = new Configuration(base)
        overlays(prefix).foreach { case (k, v) => conf.set(k, v) }
        conf
    }
  }

  /** Longest-prefix lookup in a per-source value map (the HTTP-auth
    * analog of [[resolve]]). */
  def lookup[A](bySource: Map[String, A], uri: String): Option[A] =
    bySource.keys.filter(uri.startsWith).toSeq.sortBy(-_.length)
      .headOption.map(bySource)
}
