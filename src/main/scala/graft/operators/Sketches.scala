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
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Mergeable approximate quantiles (Greenwald-Khanna via
    // percentile_approx) — the single-pass sketch that replaces the
    // full-sort exact percentile (q28) at scale. Rows-only: the estimate
    // is accuracy-parameter-specific; SketchesSpec bounds rank error vs
    // the exact quantiles.
    ("k03_approx_quantiles", (s: SparkSession, d: String) => {
      graft.Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.99)), lit(1000))
          .as("approx_q"))
        .select(col("l_returnflag"),
          col("approx_q").getItem(0).as("p25"),
          col("approx_q").getItem(1).as("p50"),
          col("approx_q").getItem(2).as("p75"),
          col("approx_q").getItem(3).as("p99"))
        .orderBy(col("l_returnflag"))
    }, None),

    // Count-min-sketch heavy hitters: the sketch builds distributed
    // (mergeable partial aggregation — one pass, no per-key shuffle);
    // the driver probes candidate keys against the one merged sketch.
    // Rows-only: estimates are seed-specific; the CMS overcount
    // guarantee (estimate >= true, bounded overshoot) is spec-gated.
    ("k04_heavy_hitters", (s: SparkSession, d: String) => {
      import org.apache.spark.util.sketch.CountMinSketch
      val docs = graft.Tables.documents(s, d)
      val terms = docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      val sketchBytes = terms
        .agg(count_min_sketch(col("term"), lit(0.001d), lit(0.99d), lit(42)).as("cms"))
        .head().getAs[Array[Byte]]("cms")
      val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))
      // candidate set: the small fixed vocabulary of interest (probing a
      // sketch needs candidates by construction; the exact top-k path is
      // t05)
      val candidates = Seq("table", "value", "query", "scan", "spark",
        "window", "the", "a", "fast", "slow")
      import s.implicits._
      candidates.map(t => (t, cms.estimateCount(t))).toDF("term", "approx_count")
        .orderBy(col("approx_count").desc, col("term"))
    }, None)
  )
}
