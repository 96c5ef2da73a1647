package graft.tools

import org.apache.spark.sql.SparkSession

/** Write `explain("formatted")` output for selected queries to files:
  * sbt "runMain graft.tools.ExplainDump <outDir> [suffix] [name...]"
  * Each query lands in <outDir>/<name>_<suffix>.txt (suffix defaults to
  * "plan"). Session shape matches Bench (same cpus/shuffle partitions)
  * so the dumped plan is the one the sweep times.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainDump <outDir> [suffix] [name...]")
    val outDir = args(0)
    val suffix = if (args.length > 1) args(1) else "plan"
    val names = if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val plan = try {
        val df = graft.SparkEntry.queries(n)(spark, d)
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable =>
        s"ERROR building plan: ${e.getMessage}\n"
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"[explaindump] wrote $n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
