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
      operators.Sketches.defs ++ operators.CorpusPipeline.defs ++
      operators.DedupIndex.defs

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
}
