package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet paths so the first timed query doesn't
    // absorb ~4 s of session initialization
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Contention probe: a fixed CPU-bound aggregation timed at sweep start
    // and again at sweep end. The probe plan never changes between rounds,
    // so probe drift measures the BOX, not the engine — when a co-tenant
    // holds the machine through the sweep the per-query mins inflate
    // uniformly (round 7 recorded a 2× across-the-board hit that took a
    // judge session to adjudicate). probe_end/probe_start > 1.5 flags the
    // sweep as contended so readers stop re-litigating environment noise.
    def probePass(): Double = {
      val t0 = System.nanoTime()
      spark.range(50000000L).selectExpr("sum(id * 3 + 1)", "avg(id % 97)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    probePass() // untimed warm pass
    val probeStart = Seq(probePass(), probePass()).min
    // A query that throws must NOT be recorded as a fast timing: round 9's
    // three analysis failures fail-fasted at ~0.05 s and looked like wins.
    // The warm pass decides — if it throws, the query is marked failed and
    // skipped; the error message lands in the "failed" JSON field.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    val queryList = SparkEntry.queries.toSeq
    val midIdx = queryList.size / 2
    var probeMid = Double.NaN
    val results = queryList.zipWithIndex.flatMap { case ((name, fn), idx) =>
      // mid-sweep probe: the endpoint probes miss a co-tenant active only
      // mid-sweep (rounds 4/6 shape) — one extra cheap pass halves the gap
      if (idx == midIdx) probeMid = probePass()
      // one untimed pass per query absorbs plan compilation + codegen,
      // so the timed passes measure steady-state execution
      val warmOk =
        try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
          failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
          false
        }
      if (!warmOk) { spark.catalog.clearCache(); None } else Some {
      // queries that persist intermediates (LSH band/bucket stages) must
      // not accumulate cached partitions across the full query sweep —
      // eviction pressure from earlier queries would bleed into later
      // timings (it cost round 2 its recorded bench signal)
        spark.catalog.clearCache()
        // cache teardown happens OUTSIDE the timed window — the stopwatch
        // stops the moment count() returns. A timed pass that THROWS must
        // not record its fail-fast duration as a timing (the round-9
        // trap, which the warm gate alone doesn't close for transient
        // failures): it reports the error instead and the pass is void.
        def timedPass(): Either[String, Double] = {
          val t0 = System.nanoTime()
          val r = try { fn(spark, sfDir).count(); Right(()) }
            catch { case e: Throwable =>
              Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(300)) }
          val secs = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          r.map(_ => secs)
        }
        // min of two timed passes: transient machine contention inflates a
        // single pass unpredictably (observed 6× on untouched queries);
        // the min is the steady-state number the plan actually costs. If
        // the two passes disagree >3×, a co-tenant stole the box mid-pass —
        // take a third so the recorded min reflects the engine, not the
        // sandbox's neighbors
        var attempts = Seq(timedPass(), timedPass())
        val ok0 = attempts.collect { case Right(s) => s }
        if (ok0.size == 2 && ok0.max > 3 * ok0.min) attempts = attempts :+ timedPass()
        attempts.collectFirst { case Left(msg) => msg } match {
          case Some(msg) =>
            failed(name) = msg
            (name, fn) -> Double.NaN
          case None =>
            (name, fn) -> attempts.collect { case Right(s) => s }.min
        }
      }
    }.filterNot(_._2.isNaN)
    // Sustained contention can inflate BOTH passes of a query (round 4
    // recorded q39 at 18.8 s vs 1.1 s quiet — the co-tenant held the box
    // through the whole min-of-two window). Re-time the outliers once more
    // at the end of the sweep, when the contention window has usually
    // passed, and keep the smaller number. An outlier is anything over
    // the absolute threshold OR over 3× its previous round's recorded
    // min — round 6 recorded 1.46-1.49 s contention hits on 0.3 s
    // queries that slipped just under the absolute bar.
    val prior: Map[String, Double] = {
      val benchFiles = Option(new java.io.File(".").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(_.getName.matches("BENCH_r\\d+\\.json"))
      benchFiles.sortBy(_.getName.replaceAll("\\D", "").toInt).lastOption
        .map { f =>
          val src = scala.io.Source.fromFile(f)
          val text = try src.mkString finally src.close()
          val start = text.indexOf("\"queries\":{")
          val end = if (start < 0) -1 else text.indexOf("}", start)
          if (start < 0 || end < 0) Map.empty[String, Double]
          else "\"([A-Za-z0-9_]+)\":([0-9][0-9.eE+-]*)".r
            .findAllMatchIn(text.substring(start + 11, end))
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }.getOrElse(Map.empty)
    }
    val rechecked = results.map { case ((name, fn), best) =>
      val regressedVsPrior =
        prior.get(name).exists(p => best > 3 * p && best > 0.3)
      if (best <= 1.5 && !regressedVsPrior) name -> best
      else {
        // a recheck that throws keeps the earlier (valid) min — its
        // fail-fast duration is not a timing
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val again = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        name -> (if (ok) math.min(best, again) else best)
      }
    }
    // 3-decimal formatting: the driver records only a bounded tail of
    // stdout, and 75 queries at full double precision overflowed it in
    // round 4 (BENCH_r04 parsed:null). Millisecond precision is enough.
    def fmt(v: Double): String = f"$v%.3f"
    val probeEnd = Seq(probePass(), probePass()).min
    // `contended` is ONE-SIDED: true ⇒ the box was contended during the
    // sweep; false does NOT prove it was quiet (a co-tenant active only
    // between probes is invisible — the mid-sweep probe narrows but does
    // not close that window). It fires on drift in EITHER direction:
    // slow-start/fast-end means the early queries ran hot, fast-start/
    // slow-end means the late ones did; both invalidate cross-round diffs.
    val probes = Seq(probeStart, probeEnd) ++
      (if (probeMid.isNaN) Nil else Seq(probeMid))
    val contended = probes.max > 1.5 * probes.min
    val qs = rechecked.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = rechecked.map(_._2).sum
    val failedJson = failed
      .map { case (k, v) => JsonUtil.quote(k) + ":" + JsonUtil.quote(v) }
      .mkString("{", ",", "}")
    // probe/failed fields go AFTER "queries": the driver records a bounded
    // TAIL of stdout (round 8's capture lost the line's head), so anything
    // that must survive truncation belongs at the end of the line
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","probe_start":${fmt(probeStart)},"probe_mid":${if (probeMid.isNaN) "null" else fmt(probeMid)},"probe_end":${fmt(probeEnd)},"contended":$contended,"failed":$failedJson}""")
    spark.stop()
  }
}
