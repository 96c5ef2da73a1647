package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Loud-failure guards for the stored-model/index loaders (r17 ADVICE →
  * r18): every family's `load` trusted its parquet layout, so a
  * truncated, column-dropped, or hand-edited store surfaced as a
  * downstream ClassCastException mid-probe — or as silently wrong math.
  * These helpers name the failure at load time instead. CodecFuzzSpec
  * covers crawl-path untrusted BYTES; StoreFuzzSpec covers these
  * trusted-path LAYOUTS (a store is our own artifact, but ops reality —
  * partial copies, interrupted writes, version skew — corrupts those
  * too, and an index that loads garbage poisons every probe after it).
  */
private[graft] object StoreGuard {

  /** Read `dir/table`, requiring it to be readable and to carry the
    * named columns. */
  def table(spark: SparkSession, dir: String, table: String,
      cols: String*): DataFrame = {
    val df =
      try spark.read.parquet(s"$dir/$table")
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"stored model at $dir: unreadable $table (${e.getMessage})")
      }
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"stored model at $dir: $table is missing columns " +
        s"${missing.mkString(", ")} (has ${df.columns.mkString(", ")})")
    df
  }

  /** The single meta row every family stores — EXACTLY one, with the
    * named columns (a zero-row meta means a truncated write; more than
    * one means two builds collided on the dir).
    *
    * Memoized per (dir file-listing fingerprint, cols): meta.parquet is
    * written once per build and read on EVERY load/grow/probe — on
    * composed paths (the crawl loop's three grows + dedup load per
    * batch) each read was one more driver round trip for a handful of
    * never-changing scalars. The fingerprint (name, length, mtime of
    * the meta files) invalidates on any rebuild, and the one-row guard
    * still runs on every true read. This is driver-side METADATA
    * caching, like the footerRows ledger counts — the row never derives
    * from query input data, so no result rides the memo. */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Row]()

  private def metaFingerprint(dir: String): String = {
    val root = new java.io.File(dir.stripPrefix("file:"), "meta.parquet")
    val files =
      if (root.isFile) Array(root)
      else Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.isFile)
    files.sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString(root.getAbsolutePath + "|", ",", "")
  }

  def metaRow(spark: SparkSession, dir: String, cols: String*): Row = {
    val key = metaFingerprint(dir) + "#" + cols.mkString(",")
    metaCache.computeIfAbsent(key, { _ =>
      val rows = table(spark, dir, "meta.parquet", cols: _*).limit(2).collect()
      require(rows.length == 1,
        s"stored model at $dir: meta.parquet must hold exactly one row, " +
          s"found ${rows.length}")
      rows(0)
    })
  }

  /** The distinct tombstoned ids of an index dir, or None when the
    * tombstone table is absent or empty. Emptiness comes from the
    * parquet FOOTER row counts (the footerRows discipline) — the
    * previous per-load `isEmpty` was one Spark job on every load of
    * every index family, almost always answering "empty". */
  def tombstoneIds(spark: SparkSession, dir: String,
      idCol: String = "doc_id"): Option[DataFrame] = {
    val p = new java.io.File(dir.stripPrefix("file:"), "tombstones.parquet")
    if (!p.exists()) None
    else if (CrawlLoop.footerRows(s"$dir/tombstones.parquet") == 0L) None
    else Some(spark.read.parquet(s"$dir/tombstones.parquet")
      .select(org.apache.spark.sql.functions.col(idCol)).distinct())
  }
}
