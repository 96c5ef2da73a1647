package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for the heavy operators (dev tool). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = graft.Tables.documents(spark, d)
    val withSig = docs
      .withColumn("sh", Dedup.shingles(col("text")))
      .withColumn("bands", Dedup.bandKeys(Dedup.minhashSignature(col("sh"), 12), 4, 3))
      .select(col("doc_id"), col("sh"), col("bands"))

    time("shingle+sig compute")(withSig.select(col("doc_id")).count())
    val cached = withSig.cache()
    time("cache materialize")(cached.count())
    val buckets = cached.select(col("doc_id"), explode(col("bands")).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    time("buckets")(buckets.count())
    val cands = buckets.alias("x").join(buckets.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    println(s"candidates=${time("cands")(cands.count())}")
    time("full minhashNearDups")(Dedup.minhashNearDups(docs, 0.5).count())
    cached.unpersist()
    spark.stop()
  }
}
