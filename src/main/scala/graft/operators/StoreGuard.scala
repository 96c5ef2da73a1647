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
    * one means two builds collided on the dir). */
  def metaRow(spark: SparkSession, dir: String, cols: String*): Row = {
    val rows = table(spark, dir, "meta.parquet", cols: _*).limit(2).collect()
    require(rows.length == 1,
      s"stored model at $dir: meta.parquet must hold exactly one row, " +
        s"found ${rows.length}")
    rows(0)
  }
}
