package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Step-by-step timing of c01's near-dup stage (dev tool). */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    import graft.operators._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[neardupprobe] $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      spark.catalog.clearCache()
      val docs = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"), col("source"))
      val exact = docs.persist(StorageLevel.MEMORY_AND_DISK)
      exact.count()
      val pairs = time("minhash+checkpoint")(
        Dedup.minhashNearDups(exact, tau = 0.8)
          .select(col("doc_a").as("u"), col("doc_b").as("v"))
          .localCheckpoint(true))
      println(s"[neardupprobe] pairs=${pairs.count()}")
      val endpoints = pairs.select(col("u").as("node"))
        .union(pairs.select(col("v").as("node"))).distinct()
      val labeled = time("labelAll")(
        { val l = Clusters.labelAll(endpoints, pairs); l.count(); l })
      val plan = time("dedupPlan")(
        { val p = Clusters.dedupPlan(labeled, exact); p.count(); p })
      val applied = time("applyDedup+count")(
        { val a = Clusters.applyDedup(exact, plan)
            .persist(StorageLevel.MEMORY_AND_DISK)
          a.count(); a })
      exact.unpersist(false); applied.unpersist(false)
    }
    spark.stop()
  }
}
