package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here: a named
  * Spark query over the driver's test tables plus (where SQL-expressible)
  * an equivalent DuckDB oracle. Column names are aligned between the two
  * on purpose — the driver's compare hashes values under sorted column
  * names.
  */
object SparkEntry {

  private def modules: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    operators.Relational.defs ++ operators.Relational2.defs ++
      operators.StacQueries.defs ++ operators.AsOf.defs ++
      operators.TextAnalysis.defs ++ operators.Dedup.defs ++
      operators.Clusters.defs ++ operators.Curate.defs ++
      operators.Training.defs ++
      operators.Similarity.defs ++ operators.Multimodal.defs ++
      operators.Sketches.defs ++ operators.Retrieval.defs ++
      operators.RetrievalIndex.defs ++ operators.DecontamIndex.defs ++
      operators.HashIndex.defs ++
      operators.CorpusPipeline.defs ++ operators.CrawlLoop.defs ++
      operators.DedupIndex.defs ++ sources.WarcSource.defs ++
      sources.Frontier.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q3-ish: customer⋈orders⋈lineitem revenue per segment/date. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.customer(spark, d)
      .join(Tables.orders(spark, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.collect { case (n, _, Some(sql)) => n -> sql }.toMap

  /** Gate provenance for every query WITHOUT a DuckDB oracle: the named
    * golden-frame / ScalaTest gates that stand in for the hash compare.
    * `golden:X` = a committed expected frame regenerated only on semantic
    * change; `spec:X` = property/witness tests in suite X. Queries absent
    * here are oracle-gated. GatesSpec asserts this map stays total
    * (every rows-only query names at least one existing suite) and in
    * sync with the committed gates.json + COVERAGE.md. */
  private[graft] val rowsOnlyGates: Map[String, Seq[String]] = Map(
    "c01_corpus_curate" -> Seq("spec:CorpusPipelineSpec"),
    "c02_crawl_curate" -> Seq("spec:CorpusPipelineSpec", "spec:WarcSpec"),
    "c08_crawl_loop" -> Seq("spec:CrawlLoopSpec"),
    "c11_crawl_loop_stream" -> Seq("spec:CrawlLoopSpec", "spec:StreamingSpec"),
    "c12_crawl_takedown" -> Seq("spec:CrawlLoopSpec"),
    "d03_minhash_lsh" -> Seq("golden:GoldenDedupSpec", "spec:LlmOpsSpec", "spec:ScaleSpec"),
    "d04_simhash_pairs" -> Seq("golden:GoldenDedupSpec", "spec:ScaleSpec"),
    "d05_winnow_overlap" -> Seq("golden:GoldenDedupSpec", "spec:LlmOpsSpec"),
    "d11_incremental_dedup" -> Seq("spec:DedupIndexSpec", "spec:StreamingSpec"),
    "k01_approx_distinct" -> Seq("golden:SketchesSpec", "spec:SketchesSpec"),
    "k03_approx_quantiles" -> Seq("golden:SketchesSpec", "spec:SketchesSpec"),
    "k04_heavy_hitters" -> Seq("golden:SketchesSpec", "spec:SketchesSpec"),
    "m26_video_keyframes" -> Seq("spec:Y4mSpec"),
    "s02_ann_lsh" -> Seq("golden:GoldenAnnSpec", "spec:LlmOpsSpec"),
    "s03_embedding_neardup" -> Seq("spec:LlmOpsSpec", "spec:ScaleSpec"),
    "s04_ann_ivf" -> Seq("golden:GoldenAnnSpec", "spec:LlmOpsSpec"),
    "s05_ann_pq" -> Seq("golden:GoldenAnnSpec", "spec:LlmOpsSpec"),
    "s06_ann_ivfpq" -> Seq("golden:GoldenAnnSpec", "spec:LlmOpsSpec"),
    "s07_semantic_dedup" -> Seq("spec:LlmOpsSpec"),
    "s10_pca_project" -> Seq("spec:PcaSpec"),
    "s11_opq_encode" -> Seq("spec:PcaSpec"),
    "s12_ann_delete" -> Seq("spec:LlmOpsSpec"),
    "s15_ann_opq" -> Seq("spec:LlmOpsSpec", "spec:PcaSpec"),
    "s08_embedding_admission" -> Seq("spec:LlmOpsSpec", "spec:StreamingSpec"),
    "t08_winnow" -> Seq("golden:GoldenDedupSpec", "spec:LlmOpsSpec"),
    "t34_unigram_train" -> Seq("spec:TrainingSpec"),
    "t35_unigram_segment" -> Seq("spec:TrainingSpec"),
    "t53_unigram_stored" -> Seq("spec:TrainingSpec"),
    "r12_hybrid_rrf_ann" -> Seq("golden:GoldenHybridSpec", "spec:RetrievalIndexSpec"),
    "s14_cluster_mixture" -> Seq("spec:LlmOpsSpec"),
    "t40_dsir_scale" -> Seq("spec:TrainingSpec"),
    "t41_ccnet_buckets_scale" -> Seq("spec:CurateSpec"))

  /** (query → gates) for ALL registered queries — "oracle" where a
    * DuckDB oracle exists, the named rows-only gates otherwise. Written
    * as gates.json by Verify so the per-query correctness story is a
    * machine-checkable artifact rather than prose in COVERAGE.md. */
  def gates: Map[String, Seq[String]] =
    queries.keySet.map { n =>
      n -> (if (oracleSql.contains(n)) Seq("oracle")
            else rowsOnlyGates.getOrElse(n, Seq.empty))
    }.toMap

  /** [[gates]] rendered as deterministic JSON (sorted keys). */
  def gatesJson: String =
    gates.toSeq.sortBy(_._1).map { case (n, gs) =>
      JsonUtil.quote(n) + ":" + gs.map(JsonUtil.quote).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
}
