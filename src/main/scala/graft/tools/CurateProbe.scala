package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing for the c01 curation chain (dev tool). */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.eventLog.enabled",
        sys.env.getOrElse("CURATE_EVENTLOG", "false"))
      .config("spark.eventLog.dir", "/tmp/eventlog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[curateprobe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to 1).foreach { pass =>
      println(s"--- pass $pass ---")
      spark.catalog.clearCache()
      import graft.operators._
      val docs = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"), col("source"))
      val raw = docs.filter(col("doc_id") % 97 =!= 0)
      val evalRef = docs.filter(col("doc_id") % 97 === 0)
      val opts = CorpusPipeline.Opts(lineGate = false)
      val st = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

      val extracted = time("extract")(
        { val p = raw.persist(st); p.count(); p })
      val gatedText = Curate.redactPii(col("text"))
      val gated = time("gate_scrub")({ val p = extracted
        .withColumn("text", gatedText)
        .filter(size(split(trim(col("text")), "\\s+")) >= opts.minDocWords)
        .persist(st); p.count(); p })
      val exact = time("exact_dedup")({ val p = gated
        .withColumn("doc_md5",
          md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))))
        .groupBy(col("doc_md5"))
        .agg(min_by(struct(gated.columns.map(col): _*), col("doc_id")).as("row"))
        .select(col("row.*")).persist(st); p.count(); p })
      val pairs = time("minhash_pairs")(Dedup
        .minhashNearDups(exact, tau = opts.nearDupTau)
        .select(col("doc_a").as("u"), col("doc_b").as("v"))
        .localCheckpoint(true))
      val endpoints = pairs.select(col("u").as("node"))
        .union(pairs.select(col("v").as("node"))).distinct()
      val labeled = time("components")({ val p = Clusters.labelAll(
        endpoints, pairs).persist(st)
        p.count(); p })
      val plan = time("dedup_plan")(Clusters.dedupPlan(labeled, exact))
      val neardup = time("apply_dedup")({ val p =
        Clusters.applyDedup(exact, plan).persist(st); p.count(); p })
      val cut = time("substring_cut")({ val p = Dedup
        .substringDedup(neardup, opts.substrMinLen, hashGrams = opts.hashGrams)
        .select(col("doc_id"), col("cleaned").as("text")).persist(st)
        p.count(); p })
      val substr = time("substring_join")({ val p = neardup.drop("text")
        .join(cut, Seq("doc_id"))
        .filter(size(split(trim(col("text")), "\\s+")) >= opts.minDocWords)
        .persist(st); p.count(); p })
      val evalGrams = evalRef.select(
        explode(Dedup.shingles(col("text"), opts.contaminationN)).as("gram"))
        .withColumn("gram", xxhash64(col("gram"))).distinct()
      val bad = substr.select(col("doc_id"),
          explode(Dedup.shingles(col("text"), opts.contaminationN)).as("gram"))
        .withColumn("gram", xxhash64(col("gram")))
        .join(broadcast(evalGrams), Seq("gram"))
        .select(col("doc_id")).distinct()
      time("decontaminate")(
        substr.join(broadcast(bad), Seq("doc_id"), "left_anti").count())
      time("c01 full query")(
        graft.SparkEntry.queries("c01_corpus_curate")(spark, d).count())
    }
    spark.stop()
  }
}
