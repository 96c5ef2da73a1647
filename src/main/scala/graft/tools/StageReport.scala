package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the c01/c02 per-stage (rows, secs) report N times (dev tool —
  * the wobble diagnosis loop for r11 VERDICT item 7). */
object StageReport {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("c01_corpus_curate", "c02_crawl_curate")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- names; p <- 1 to passes) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, d).collect()
      val total = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val stages = rows.map(r => f"${r.getString(1)}=${r.getDouble(3)}%.2f")
        .mkString(" ")
      println(f"[stagereport] $name pass $p total=$total%.2f  $stages")
    }
    spark.stop()
  }
}
