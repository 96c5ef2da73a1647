package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{JsonUtil, SparkEntry}

/** Verify a NAMED subset of the registry: dump each requested query's
  * result and an `oracle_sql.json` restricted to those names, in the
  * exact layout `graft.Verify` writes — so `tools/check_oracle.py` runs
  * unchanged against the output. Iterating on one query no longer costs
  * a 200-query sweep.
  *
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <name> [name…]
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: VerifyOne <sfDir> <outDir> <queryName> [queryName...]")
    val sfDir = args(0); val outDir = args(1)
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      // some queries persist LSH/IVF intermediates internally — clear
      // between queries exactly like graft.Verify, or caches accumulate
      // across the shared session
      spark.catalog.clearCache()
      println(s"[verifyone] dumped $name")
    }
    val sqls = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
    val json = sqls.map { case (n, q) =>
      s"${JsonUtil.quote(n)}: ${JsonUtil.quote(q)}"
    }.mkString("{", ", ", "}")
    // UTF-8 explicitly (graft.Verify's Files.writeString default):
    // PrintWriter used the platform charset, which in a POSIX-locale
    // JVM mangled non-ASCII oracle literals (w09's 'éü' page) into '?'
    // and made the DuckDB compare fail on a correct engine result
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[verifyone] wrote ${sqls.size} oracle entries")
  }
}
