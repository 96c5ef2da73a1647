package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based operators for the 100 TB posture: HyperLogLog++
  * approximate distinct counts (the dedup-audit form that doesn't shuffle
  * every key) and Bloom-filter join pruning (filter the big fact side
  * before the shuffle with a compact membership sketch of the dim keys —
  * the manual form of Spark's runtime bloom-filter rewrite).
  */
object Sketches {

  /** Bloom-prefiltered equi-join: build a Bloom filter over the (small)
    * build side's keys, prune the probe side with `might_contain` before
    * the join shuffle, then run the exact join — false positives are
    * eliminated by the join itself, so results are exact while the
    * shuffle carries only (matching + ε) rows.
    *
    * The probe is the native codegen'd
    * [[graft.functions.BloomMightContain]] expression, NOT a Scala UDF:
    * a UDF would break whole-stage codegen on the big-table scan this
    * operator exists to accelerate.
    */
  def bloomPrefilteredJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val bcBloom = probe.sparkSession.sparkContext.broadcast(bloom)
    probe.filter(graft.functions.GraftFunctions.bloom_might_contain(
        col(probeKey), bcBloom))
      .join(build, col(probeKey) === col(buildKey))
  }

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // HLL++ approximate distinct (rows-only: the estimate is
    // implementation-specific; SketchesSpec bounds its error vs exact).
    ("k01_approx_distinct", (s: SparkSession, d: String) => {
      graft.Tables.lineitem(s, d)
        .agg(
          approx_count_distinct(col("l_orderkey")).as("approx_orders"),
          approx_count_distinct(col("l_partkey")).as("approx_parts"))
    }, None),

    // Bloom-pruned join: lineitem pruned by a bloom of high-value order
    // keys before the exact join. Oracle-gated with the PLAIN join SQL:
    // bloom false positives die in the exact join, so the result is
    // identical by construction — which is precisely the operator's
    // contract, and now hash-verified (pruning effectiveness is
    // spec-gated in SketchesSpec).
    ("k02_bloom_join", (s: SparkSession, d: String) => {
      val bigOrders = graft.Tables.orders(s, d)
        .filter(col("o_totalprice") > 200000)
        .select(col("o_orderkey"))
      bloomPrefilteredJoin(
          graft.Tables.lineitem(s, d), "l_orderkey", bigOrders, "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_totalprice > 200000
      GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )
}
