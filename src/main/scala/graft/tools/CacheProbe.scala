package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Minimal persist/recompute sanity probe (dev tool). */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cacheprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm range")(spark.range(1000000).selectExpr("sum(id)").collect())
    val docs = graft.Tables.documents(spark, d)
    time("docs count cold")(docs.count())
    time("docs count again")(docs.count())
    val p1 = docs.select(col("doc_id"), col("text")).persist(StorageLevel.MEMORY_AND_DISK)
    time("p1 materialize")(p1.count())
    time("p1 cached read")(p1.count())
    val p2 = p1.withColumn("md5", md5(col("text"))).persist(StorageLevel.MEMORY_AND_DISK)
    time("p2 materialize")(p2.count())
    val p3 = p2.groupBy(col("md5")).agg(min(col("doc_id")).as("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("p3 materialize")(p3.count())
    time("p3 cached agg")(p3.agg(sum(col("doc_id"))).collect())
    val j = p2.join(p3, Seq("md5", "doc_id"), "left_semi")
    time("semi join")(j.count())
    time("shingles")(p1.select(explode(graft.operators.Dedup.shingles(col("text")))).count())
    spark.stop()
  }
}
