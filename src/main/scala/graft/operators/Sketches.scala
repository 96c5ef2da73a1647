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

    // k01's ORACLE TWIN (Flajolet et al. HyperLogLog, the md5-family
    // treatment): a 256-register HLL whose ENTIRE state and estimate
    // are exact integer arithmetic both engines replay — value hash is
    // md5-derived (60 bits: 8-bit bucket + 52-bit suffix), rho is the
    // leading-zero count extracted by the hex-nibble trick (no float
    // log anywhere), registers are plain max-aggregates, Z rides as
    // the EXACT scaled integer Σ 2^(53−M_b), and the estimate is one
    // HUGEINT/decimal floor division against the precomputed constant
    // ⌊α₂₅₆·2^20⌋·256²·2^53 (α₂₅₆ = 0.7213/(1+1.079/256)). The output
    // pins all 256 registers, so the oracle gates the full sketch, not
    // just the one number; exact_distinct rides along as the accuracy
    // witness. The small-range linear-counting correction (m·ln(m/V))
    // is deliberately NOT applied here — ln is not bit-stable across
    // engines, so the output carries the raw estimate plus the
    // zero-register count and the CONSUMER corrects (SketchesSpec
    // does, and gates the error band in both regimes). k01 keeps
    // Spark's HLL++ (implementation-specific bias tables, adjudicated
    // rows-only).
    ("k05_hll_md5", (s: SparkSession, d: String) => {
      import s.implicits._
      val orders = graft.Tables.orders(s, d)
      val h = conv(substring(md5(col("o_custkey").cast("string")), 1, 15),
        16, 10).cast("long")
      val hexs = lpad(upper(hex(shiftrightunsigned(col("h"), 8))), 13, "0")
      val trimmed = ltrim(hexs, "0")
      val lz = substring(trimmed, 1, 1)
      val rho = when(shiftrightunsigned(col("h"), 8) === 0L, 53)
        .otherwise(lit(4) * (lit(13) - length(trimmed)) +
          when(lz === "1", 3)
            .when(lz.isin("2", "3"), 2)
            .when(lz.isin("4", "5", "6", "7"), 1)
            .otherwise(0) + 1)
      val regs = orders.select(h.as("h"))
        .select(col("h").bitwiseAND(lit(255L)).cast("int").as("bucket"),
          rho.as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("mb"))
      val filled = s.range(256)
        .select(col("id").cast("int").as("bucket"))
        .join(regs, Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("mb"), lit(0)).as("mb"))
      val sketch = filled.agg(
        count(when(col("mb") === 0, true)).as("n_zero_buckets"),
        sum(expr("shiftleft(cast(1 as bigint), 53 - mb)")).as("z_int"),
        array_join(transform(
          array_sort(collect_list(struct(col("bucket"), col("mb")))),
          x => x.getField("mb").cast("string")), "-").as("registers"))
      val a = lit("444588963417193824760365056").cast("decimal(38,0)")
      val denom = col("z_int").cast("decimal(38,0)") *
        lit(1048576L).cast("decimal(38,0)")
      val exact = orders.agg(
        countDistinct(col("o_custkey")).as("exact_distinct"))
      sketch.crossJoin(exact)
        .select(lit(256).as("m"),
          col("n_zero_buckets").cast("long").as("n_zero_buckets"),
          col("z_int"),
          // exact floor division: subtract the remainder first so the
          // decimal divide is of an exact multiple (a rounded decimal
          // quotient could floor off by one near integers)
          ((a - pmod(a, denom)) / denom).cast("long").as("hll_estimate"),
          col("exact_distinct"), col("registers"))
        .orderBy(col("m"))
    },
    Some("""WITH h AS (
        SELECT CAST(concat('0x',
          substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM orders),
      hb AS (SELECT h % 256 AS bucket, h // 256 AS rem FROM h),
      rho AS (
        SELECT bucket,
          CASE WHEN rem = 0 THEN 53
          ELSE 4 * (13 - length(ltrim(lpad(upper(to_hex(rem)), 13, '0'), '0')))
            + CASE substr(ltrim(lpad(upper(to_hex(rem)), 13, '0'), '0'), 1, 1)
                WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                WHEN '7' THEN 1 ELSE 0 END + 1
          END AS rho
        FROM hb),
      regs AS (
        SELECT r.range AS bucket, COALESCE(mx.mb, 0) AS mb
        FROM range(256) r LEFT JOIN (
          SELECT bucket, max(rho) AS mb FROM rho GROUP BY bucket) mx
          ON mx.bucket = r.range),
      agg AS (
        SELECT count(CASE WHEN mb = 0 THEN 1 END) AS n_zero_buckets,
          CAST(sum(1::BIGINT << CAST(53 - mb AS INTEGER)) AS BIGINT) AS z_int,
          string_agg(CAST(mb AS VARCHAR), '-' ORDER BY bucket) AS registers
        FROM regs),
      ex AS (
        SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
        FROM orders)
      SELECT 256 AS m,
        CAST(n_zero_buckets AS BIGINT) AS n_zero_buckets, z_int,
        CAST(CAST('444588963417193824760365056' AS HUGEINT)
          // (z_int::HUGEINT * 1048576::HUGEINT) AS BIGINT) AS hll_estimate,
        exact_distinct, registers
      FROM agg, ex
      ORDER BY m""")),

    // k04's ORACLE TWIN (Cormode & Muthukrishnan count-min, the md5
    // treatment): a 4×1024 CMS whose counters are plain exact
    // aggregates over md5-derived bucket assignments — the sketch
    // build is one groupBy((row, bucket)), the probe is a broadcast
    // join of the candidate terms' 4 buckets, the estimate is
    // min-over-rows; every number is an exact integer DuckDB replays,
    // including the per-candidate TRUE count riding along as the
    // overcount witness (CMS never undercounts — spec-gated too). k04
    // keeps Spark's CountMinSketch (implementation-specific hashing,
    // adjudicated rows-only).
    ("k06_cms_md5", (s: SparkSession, d: String) => {
      import s.implicits._
      val W = 1024L; val D = 4
      def bucketOf(i: Column, t: Column): Column =
        pmod(conv(substring(md5(concat(i.cast("string"), lit(":"), t)),
          1, 15), 16, 10).cast("long"), lit(W))
      val toks = graft.Tables.documents(s, d)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val depth = array((0 until D).map(lit): _*)
      val sk = toks
        .select(col("tok"), explode(depth).as("i"))
        .select(col("i"), bucketOf(col("i"), col("tok")).as("bucket"))
        .groupBy(col("i"), col("bucket")).agg(count(lit(1)).as("c"))
      val cands = Seq("table", "value", "query", "scan", "spark",
        "window", "the", "a", "fast", "slow").toDF("term")
      val probes = cands
        .select(col("term"), explode(depth).as("i"))
        .select(col("term"), col("i"),
          bucketOf(col("i"), col("term")).as("bucket"))
      val est = broadcast(probes).join(sk, Seq("i", "bucket"), "left")
        .groupBy(col("term"))
        .agg(min(coalesce(col("c"), lit(0L))).as("approx_count"))
      val exact = toks.groupBy(col("tok").as("term"))
        .agg(count(lit(1)).as("exact_count"))
      est.join(exact, Seq("term"), "left")
        .select(col("term"), col("approx_count"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"))
        .orderBy(col("term"))
    },
    Some("""WITH t2 AS (
        SELECT tok FROM (
          SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
          FROM documents) z
        WHERE tok <> ''),
      sk AS (
        SELECT i.range AS i,
          CAST(concat('0x', substr(md5(concat(CAST(i.range AS VARCHAR),
            ':', tok)), 1, 15)) AS BIGINT) % 1024 AS bucket,
          count(*) AS c
        FROM t2 CROSS JOIN range(4) i GROUP BY 1, 2),
      cand AS (
        SELECT unnest(['table','value','query','scan','spark','window',
          'the','a','fast','slow']) AS term),
      pr AS (
        SELECT term, i.range AS i,
          CAST(concat('0x', substr(md5(concat(CAST(i.range AS VARCHAR),
            ':', term)), 1, 15)) AS BIGINT) % 1024 AS bucket
        FROM cand CROSS JOIN range(4) i),
      est AS (
        SELECT pr.term, min(COALESCE(sk.c, 0)) AS approx_count
        FROM pr LEFT JOIN sk ON sk.i = pr.i AND sk.bucket = pr.bucket
        GROUP BY pr.term),
      ex AS (SELECT tok AS term, count(*) AS exact_count FROM t2 GROUP BY 1)
      SELECT e.term, CAST(e.approx_count AS BIGINT) AS approx_count,
        CAST(COALESCE(x.exact_count, 0) AS BIGINT) AS exact_count
      FROM est e LEFT JOIN ex x ON x.term = e.term
      ORDER BY e.term""")),

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

    // k03's ORACLE TWIN, completing the sketch family (k01→k05 HLL,
    // k04→k06 CMS): a deterministic-sample quantile sketch whose ENTIRE
    // state is exact under the oracle — the sample is the 256 rows with
    // the smallest md5 draw per group (reservoir-free and closed-form:
    // one window rank, no RNG), the estimate is the exact type-1
    // quantile (rank ⌈q·n⌉) over the sorted sample, and the TRUE
    // quantile over the full group rides along as the error witness
    // (the k05/k06 shape). Selection only — no value arithmetic — so
    // every output is a value both engines hold bit-identically. k03
    // keeps Spark's Greenwald-Khanna (accuracy-parameter-specific
    // summary, adjudicated rows-only). At 100 TB the sample stays 256
    // rows/group: the window rank is one exchange on the group key and
    // the md5 order prunes with a per-partition top-256 pre-aggregation
    // under AQE.
    ("k07_quantiles_md5", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val W = 256
      val keyed = graft.Tables.lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        col("l_extendedprice").cast("double").as("v"),
        md5(concat(lit("k07:"), col("l_orderkey").cast("string"),
          lit(":"), col("l_linenumber").cast("string"))).as("mk"),
        col("l_orderkey"), col("l_linenumber"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // lineitem (audited r18: 118k duplicate key groups at sf0.1), so
      // the draw key alone is not total — append the VALUE: rows tied
      // on (mk, okey, lnum, v) are interchangeable, so the sampled
      // value multiset is run-stable even at the rank-256 boundary
      // (the q09 ordering-totality lesson).
      // r19: the rank column was only ever a filter — take the W-row
      // prefix with the engine's own TopKPerKey operator (bounded
      // per-key heaps + map-side partials) instead of the
      // Window(row_number)+Filter plan that fully sorts every group
      // (guide §2: don't sort what you only shortlist). Same total
      // order, same selected multiset.
      val samp = graft.plans.TopKPerKey.topKPerKey(keyed, Seq("flag"),
        Seq(("mk", false), ("l_orderkey", false), ("l_linenumber", false),
          ("v", false)), W)
      val sk = samp.groupBy(col("flag"))
        .agg(sort_array(collect_list(col("v"))).as("vs"),
          count(lit(1)).as("ns"))
      def sel(q: Double): Column =
        element_at(col("vs"), ceil(lit(q) * col("ns")).cast("int"))
      val est = sk.select(col("flag"),
        sel(0.25).as("approx_p25"), sel(0.5).as("approx_p50"),
        sel(0.75).as("approx_p75"), sel(0.99).as("approx_p99"),
        col("ns").cast("long").as("n_sample"))
      val full = keyed.select(col("flag"), col("v"))
        .withColumn("rv", row_number().over(
          Window.partitionBy(col("flag")).orderBy(col("v"))))
        .withColumn("nt", count(lit(1)).over(Window.partitionBy(col("flag"))))
      def ex(q: Double): Column =
        max(when(col("rv") === ceil(lit(q) * col("nt")), col("v")))
      val exact = full.groupBy(col("flag"))
        .agg(ex(0.25).as("exact_p25"), ex(0.5).as("exact_p50"),
          ex(0.75).as("exact_p75"), ex(0.99).as("exact_p99"),
          count(lit(1)).as("n_total"))
      est.join(exact, Seq("flag"))
        .withColumnRenamed("flag", "l_returnflag")
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH keyed AS (
        SELECT l_returnflag AS flag, CAST(l_extendedprice AS DOUBLE) AS v,
          md5('k07:' || CAST(l_orderkey AS VARCHAR) || ':'
            || CAST(l_linenumber AS VARCHAR)) AS mk,
          l_orderkey, l_linenumber
        FROM lineitem),
      samp AS (
        SELECT flag, v, row_number() OVER (PARTITION BY flag
          ORDER BY mk, l_orderkey, l_linenumber, v) AS rn
        FROM keyed),
      sk AS (
        SELECT flag, list_sort(list(v)) AS vs, count(*) AS ns
        FROM samp WHERE rn <= 256 GROUP BY flag),
      est AS (
        SELECT flag,
          vs[CAST(ceil(CAST(0.25 AS DOUBLE) * ns) AS INTEGER)] AS approx_p25,
          vs[CAST(ceil(CAST(0.5 AS DOUBLE) * ns) AS INTEGER)] AS approx_p50,
          vs[CAST(ceil(CAST(0.75 AS DOUBLE) * ns) AS INTEGER)] AS approx_p75,
          vs[CAST(ceil(CAST(0.99 AS DOUBLE) * ns) AS INTEGER)] AS approx_p99,
          CAST(ns AS BIGINT) AS n_sample
        FROM sk),
      fullq AS (
        SELECT flag, v,
          row_number() OVER (PARTITION BY flag ORDER BY v) AS rv,
          count(*) OVER (PARTITION BY flag) AS nt
        FROM keyed),
      ex AS (
        SELECT flag,
          max(CASE WHEN rv = ceil(CAST(0.25 AS DOUBLE) * nt) THEN v END)
            AS exact_p25,
          max(CASE WHEN rv = ceil(CAST(0.5 AS DOUBLE) * nt) THEN v END)
            AS exact_p50,
          max(CASE WHEN rv = ceil(CAST(0.75 AS DOUBLE) * nt) THEN v END)
            AS exact_p75,
          max(CASE WHEN rv = ceil(CAST(0.99 AS DOUBLE) * nt) THEN v END)
            AS exact_p99,
          CAST(count(*) AS BIGINT) AS n_total
        FROM fullq GROUP BY flag)
      SELECT e.flag AS l_returnflag,
        e.approx_p25, e.approx_p50, e.approx_p75, e.approx_p99, e.n_sample,
        x.exact_p25, x.exact_p50, x.exact_p75, x.exact_p99, x.n_total
      FROM est e JOIN ex x ON x.flag = e.flag
      ORDER BY l_returnflag""")),

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
