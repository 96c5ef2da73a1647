package graft.tools

import org.apache.spark.sql.SparkSession

/** Manual smoke entry point (the reference keeps one per handler,
  * e.g. s3-discovery/handler.py:68-78): drives the flagship entry()
  * and the SQL-registered custom expressions with happy-path and
  * adversarial inputs. Run: sbt "runMain graft.tools.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = graft.SparkEntry.entry(spark)
    println(s"entry() rows=${e.count()}")
    e.show(false)

    graft.functions.GraftFunctions.registerAll(spark)
    spark.sql("""SELECT f, extract_filename_dates(f, r) AS d, derive_item_id(f, rx) AS id
      FROM VALUES
        ('s3://b/x_20200214.tif', 'month', 's3://([^/]*)/(.+)\\.tif$'),
        ('s3://b/nodate.tif', CAST(NULL AS STRING), CAST(NULL AS STRING)),
        ('s3://b/x_202013_bad.tif', CAST(NULL AS STRING), 'nomatch(x)(y)')
      AS t(f, r, rx)""").show(false)

    spark.stop()
  }
}
