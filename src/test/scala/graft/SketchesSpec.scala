package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Sketch operators: HLL error bounds and bloom-join exactness. */
class SketchesSpec extends SparkSuite {

  test("approx_count_distinct lands within 5% of exact") {
    val li = Tables.lineitem(spark, sf0001)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("sketch estimates are deterministic: pinned values over a fixed frame") {
    // HLL++, quantile, and count-min are approximate but NOT random —
    // same input ⇒ same estimate. Pinning the estimates over a generated
    // frame gives the rows-only sketch queries (k01/k03/k04) a
    // value-level regression gate, the golden-file spirit without a file.
    import spark.implicits._
    val df = spark.range(10000).select(
      col("id"), (col("id") % 997).as("key"),
      concat(lit("u"), (col("id") * 31 % 4999).cast("string")).as("user"))
    val hll = df.agg(approx_count_distinct(col("user"), 0.02)).head().getLong(0)
    assert(hll == 4961L, s"HLL++ estimate drifted: $hll (exact distinct = 4999)")
    val q = df.stat.approxQuantile("id", Array(0.25, 0.5, 0.75), 0.01)
    assert(q.toSeq == Seq(2407.0, 4999.0, 7499.0),
      s"quantile sketch drifted: ${q.toSeq}")
    val cms = df.stat.countMinSketch(col("key"), eps = 0.001, confidence = 0.99,
      seed = 42)
    assert(cms.estimateCount(0L) == 11L && cms.estimateCount(996L) == 10L,
      s"count-min drifted: ${cms.estimateCount(0L)}, ${cms.estimateCount(996L)}")
  }

  test("bloom-prefiltered join is exactly the plain join") {
    val li = Tables.lineitem(spark, sf0001)
    val bigOrders = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 300000).select(col("o_orderkey"))

    val plain = li.join(bigOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val bloomed = Sketches.bloomPrefilteredJoin(li, "l_orderkey",
        bigOrders, "o_orderkey")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(bloomed.collect().toSet == plain.collect().toSet)

    // and the prefilter actually prunes: surviving probe rows ≈ matches
    val bloom = bigOrders.stat.bloomFilter("o_orderkey", 1000000L, 0.01)
    val bcBloom = spark.sparkContext.broadcast(bloom)
    val survived = li.filter(graft.functions.GraftFunctions
      .bloom_might_contain(col("l_orderkey"), bcBloom)).count()
    val matches = li.join(bigOrders, col("l_orderkey") === col("o_orderkey")).count()
    assert(survived < li.count() / 2, s"prefilter should prune: $survived of ${li.count()}")
    assert(survived >= matches)
  }

  test("bloom probe filter stays inside whole-stage codegen") {
    import org.apache.spark.sql.execution.{FilterExec, WholeStageCodegenExec}
    val li = Tables.lineitem(spark, sf0001)
    val bigOrders = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 300000).select(col("o_orderkey"))
    // AQE wraps stages in QueryStageExec leaves that hide their subtree
    // from collect(); disable it for this plan-shape assertion
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Sketches.bloomPrefilteredJoin(li, "l_orderkey",
        bigOrders, "o_orderkey")
      val plan = joined.queryExecution.executedPlan
      val fused = plan.collect { case w: WholeStageCodegenExec => w }.exists {
        _.collectFirst { case f: FilterExec
          if f.condition.toString.contains("bloom_might_contain") => f }.nonEmpty
      }
      assert(fused,
        s"bloom probe filter fell out of whole-stage codegen:\n${plan.treeString}")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("approx quantiles land within the accuracy bound of exact") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf0001)
    val approx = li.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50a"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50e"))
    val joined = approx.join(exact, "l_returnflag").collect()
    joined.foreach { r =>
      val (a, e) = (r.getDouble(1), r.getDouble(2))
      // GK guarantee is on RANK (1/accuracy); translate loosely to value
      // space: within 5% of the exact median for this distribution
      assert(math.abs(a - e) / e < 0.05, s"p50 approx $a vs exact $e")
    }
  }

  test("count-min estimates overcount-only within eps*N of true counts") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.util.sketch.CountMinSketch
    val docs = graft.Tables.documents(spark, sf0001)
    val terms = docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
    val n = terms.count()
    val bytes = terms
      .agg(count_min_sketch(col("term"), lit(0.001d), lit(0.99d), lit(42)).as("cms"))
      .head().getAs[Array[Byte]]("cms")
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    val truth = terms.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("table", "value", "the", "spark", "window").foreach { t =>
      val est = cms.estimateCount(t)
      val exact = truth.getOrElse(t, 0L)
      assert(est >= exact, s"CMS undercounted $t: $est < $exact")
      assert(est <= exact + (0.001 * n).toLong + 1,
        s"CMS overshot eps*N bound for $t: $est vs $exact (N=$n)")
    }
  }

  test("k05 oracle-replayable HLL lands within the m=256 error bound") {
    // the oracle pins the sketch bit-for-bit; this pins that it is a
    // GOOD estimator. The registered output deliberately reports only
    // bit-stable integers (raw estimate + zero-register count) — the
    // standard small-range linear-counting correction (Flajolet §4:
    // if E ≤ 2.5m and V > 0, use m·ln(m/V)) involves ln, which is not
    // bit-stable across engines, so the CONSUMER applies it — as this
    // gate does, at both the small (sf0.001, linear regime) and the
    // raw-HLL regime the larger SFs exercise.
    val m = 256.0
    val row = SparkEntry.queries("k05_hll_md5")(spark, sf0001).head()
    val raw = row.getAs[Long]("hll_estimate").toDouble
    val v = m - row.getAs[Long]("n_zero_buckets").toDouble // non-zero regs
    val exact = row.getAs[Long]("exact_distinct").toDouble
    assert(exact > 0)
    val zeroRegs = row.getAs[Long]("n_zero_buckets").toDouble
    val est =
      if (raw <= 2.5 * m && zeroRegs > 0) m * math.log(m / zeroRegs)
      else raw
    assert(math.abs(est - exact) / exact < 0.20,
      s"HLL estimate $est (raw $raw, V=$v) vs exact $exact")
    // all 256 registers ride the output — spot the shape
    assert(row.getAs[String]("registers").split("-").length == 256)
  }

  test("k07 oracle-replayable sample quantiles: rank error bounded, " +
      "sample saturates at 256, hand-computed boundary selection") {
    val out = SparkEntry.queries("k07_quantiles_md5")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nTotal = r.getAs[Long]("n_total")
      val nSample = r.getAs[Long]("n_sample")
      assert(nSample == math.min(256L, nTotal), s"sample size $nSample of $nTotal")
      // rank error of each sample estimate vs the true quantile: a
      // 256-point uniform-random sample's quantile rank concentrates
      // within ~2/sqrt(256) of q·N — gate at a loose 0.15·N
      val flag = r.getAs[String]("l_returnflag")
      val vals = Tables.lineitem(spark, sf0001)
        .filter(col("l_returnflag") === flag)
        .select(col("l_extendedprice").cast("double"))
        .collect().map(_.getDouble(0)).sorted
      for ((q, name) <- Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.99 -> "p99")) {
        val approx = r.getAs[Double](s"approx_$name")
        val exact = r.getAs[Double](s"exact_$name")
        assert(exact == vals(math.ceil(q * vals.length).toInt - 1),
          s"$flag exact_$name is not the type-1 quantile")
        val rank = vals.count(_ <= approx)
        assert(math.abs(rank - q * vals.length) <= 0.15 * vals.length,
          s"$flag $name rank error: approx=$approx rank=$rank of ${vals.length}")
      }
    }
    // hand-computed boundary case (the m23 lesson): 4 values, the
    // type-1 rank ⌈q·n⌉ selections are unambiguous by hand —
    // p25 → rank 1, p50 → rank 2, p75 → rank 3, p99 → rank 4
    val vs = Seq(10.0, 20.0, 30.0, 40.0)
    assert(math.ceil(0.25 * 4).toInt == 1 && vs(0) == 10.0)
    assert(math.ceil(0.5 * 4).toInt == 2 && vs(1) == 20.0)
    assert(math.ceil(0.75 * 4).toInt == 3 && vs(2) == 30.0)
    assert(math.ceil(0.99 * 4).toInt == 4 && vs(3) == 40.0)
  }

  test("k06 oracle-replayable CMS never undercounts") {
    val rows = SparkEntry.queries("k06_cms_md5")(spark, sf0001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("approx_count") >= r.getAs[Long]("exact_count"),
        s"CMS undercounted ${r.getAs[String]("term")}")
    }
  }
}
