package graft.tools
import org.apache.spark.sql.SparkSession

/** Print c08's per-stage report with wall seconds (arg: sfDir). */
object CrawlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val rows = graft.SparkEntry.queries("c08_crawl_loop")(spark, sfDir).collect()
    rows.foreach { r =>
      println(f"[crawlprobe] b${r.getInt(0)} ${r.getInt(1)}%2d " +
        f"${r.getString(2)}%-18s rows=${r.getLong(3)}%-7d ${r.getDouble(4)}%7.2fs")
    }
    println(f"[crawlprobe] total ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
