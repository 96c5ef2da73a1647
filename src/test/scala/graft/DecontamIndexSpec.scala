package graft

import org.apache.spark.sql.functions._
import graft.operators.{DecontamIndex, Training}

/** Persistent gram-census lifecycle: build-vs-load parity, grow parity
  * (build(A)+grow(B) ≡ build(A∪B)), stored screen ≡ live
  * Training.contamination (incl. the short-doc whole-text gram rule),
  * forget stops attribution / shared grams survive, vacuum physical
  * drop, and the bucket partition-pruning plan shape.
  */
class DecontamIndexSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_dcixspec").toString

  // n = 3 grams keep the fixtures hand-checkable
  private val trainA = Seq(
    1L -> "a b c d e",     // grams: "a b c","b c d","c d e"
    2L -> "x y z q r",
    3L -> "short one")     // < 3 tokens → whole text is the gram
  private val trainB = Seq(
    4L -> "c d e f g",
    5L -> "u v w")

  private def gramSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("gram"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  test("build-vs-load parity: stored grams equal the live census") {
    val dir = tmp()
    DecontamIndex.build(docs(trainA: _*), dir, n = 3, nBuckets = 8)
    val ix = DecontamIndex.load(spark, dir)
    assert(ix.n == 3 && ix.nBuckets == 8)
    assert(gramSet(ix.grams) == Set(
      ("a b c", 1L), ("b c d", 1L), ("c d e", 1L),
      ("x y z", 2L), ("y z q", 2L), ("z q r", 2L),
      ("short one", 3L)))
  }

  test("grow parity: build(A) + grow(B) equals build(A ∪ B)") {
    val grownDir = tmp(); val fullDir = tmp()
    DecontamIndex.build(docs(trainA: _*), grownDir, n = 3, nBuckets = 4)
    DecontamIndex.grow(docs(trainB: _*), grownDir)
    DecontamIndex.build(docs((trainA ++ trainB): _*), fullDir, n = 3,
      nBuckets = 4)
    assert(gramSet(DecontamIndex.load(spark, grownDir).grams) ==
      gramSet(DecontamIndex.load(spark, fullDir).grams))
  }

  test("stored screen equals the live contamination report") {
    val dir = tmp()
    DecontamIndex.build(docs(trainA: _*), dir, n = 3, nBuckets = 4)
    DecontamIndex.grow(docs(trainB: _*), dir)
    val train = docs((trainA ++ trainB): _*)
    // eval docs: 10 overlaps train 1 and 4 ("c d e"), 11 is clean,
    // 12 is short (whole-text gram) and matches train 3 exactly
    val evalDocs = docs(
      10L -> "q q c d e",  // grams "q q c","q c d","c d e" → 1 hit
      11L -> "m n o p",
      12L -> "short one")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val ix = DecontamIndex.load(spark, dir)
    val stored = rows(DecontamIndex.screen(ix, evalDocs))
    val live = rows(Training.contamination(evalDocs, train, n = 3))
    assert(stored == live)
    // hand-computed anchors, not just parity
    assert(stored((10L, 3L, 1L, 1.0 / 3.0)))
    assert(stored((11L, 2L, 0L, 0.0)))
    assert(stored((12L, 1L, 1L, 1.0)))
  }

  test("forget stops attribution; shared grams survive; vacuum drops rows") {
    val dir = tmp()
    DecontamIndex.build(docs(trainA: _*), dir, n = 3, nBuckets = 4)
    DecontamIndex.grow(docs(trainB: _*), dir)
    // eval 20 hits ONLY train 2 ("x y z"); eval 21 hits train 1 AND
    // train 4 ("c d e")
    val evalDocs = docs(20L -> "k k x y z", 21L -> "k k c d e")
    def hits(ix: DecontamIndex.Loaded) =
      DecontamIndex.screen(ix, evalDocs).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val before = hits(DecontamIndex.load(spark, dir))
    assert(before == Map(20L -> 1L, 21L -> 1L))
    // forget train 2: eval 20's only attribution is gone; 21 keeps its
    // hit through train 1 (and 4)
    DecontamIndex.forget(Seq(2L).toDF("doc_id"), dir)
    val masked = DecontamIndex.load(spark, dir)
    assert(hits(masked) == Map(20L -> 0L, 21L -> 1L))
    // forget train 1 too: 21 STILL hits via train 4's "c d e"
    DecontamIndex.forget(Seq(1L).toDF("doc_id"), dir)
    assert(hits(DecontamIndex.load(spark, dir)) ==
      Map(20L -> 0L, 21L -> 1L))
    // vacuum: physical rows drop, answers unchanged, tombstones clear
    DecontamIndex.vacuum(spark, dir)
    val vac = DecontamIndex.load(spark, dir)
    assert(hits(vac) == Map(20L -> 0L, 21L -> 1L))
    assert(!gramSet(vac.grams).exists(g => g._2 == 1L || g._2 == 2L))
    assert(spark.read.parquet(s"$dir/tombstones.parquet").isEmpty)
    // grow after vacuum: index keeps serving
    DecontamIndex.grow(docs(6L -> "x y z again here"), dir)
    assert(hits(DecontamIndex.load(spark, dir)) ==
      Map(20L -> 1L, 21L -> 1L))
  }

  test("probe prunes to the eval grams' bucket partitions at the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmp()
    val many = (1L to 40L).map(i => i -> s"w$i x$i y$i z$i")
    DecontamIndex.build(docs(many: _*), dir, n = 3, nBuckets = 16)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ix = DecontamIndex.load(spark, dir)
      val probed = DecontamIndex.probe(ix, Seq("w7 x7 y7").toDF("gram"))
      val scans = probed.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec
            if s.metadata("Location").contains("grams") => s
      }
      assert(scans.nonEmpty, "expected a grams parquet scan")
      val meta = scans.head.metadata("PartitionFilters")
      assert(meta.contains("bucket"),
        s"bucket partition filter not applied: $meta")
      assert(probed.collect().map(_.getString(0)).toSet == Set("w7 x7 y7"))
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("two-leg service report: stored phrase + gram legs, hand-computed") {
    import graft.operators.RetrievalIndex
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "p q r s t u v w x y"
    val rixDir = tmp(); val dcDir = tmp()
    // both legs under the build→grow lifecycle: t2 arrives by GROW
    RetrievalIndex.build(docs(1L -> t1), rixDir, nBuckets = 8)
    RetrievalIndex.grow(docs(2L -> t2), rixDir)
    DecontamIndex.build(docs(1L -> t1), dcDir, n = 8, nBuckets = 8)
    DecontamIndex.grow(docs(2L -> t2), dcDir)
    val evalDocs = docs(
      // both legs hit: shares t1's 6-token prefix AND its first 8-gram
      100L -> "alpha beta gamma delta epsilon zeta eta theta lambda mu",
      101L -> "one two three four five six seven eight nine", // clean
      // near-miss: a 7-gram of t1 inside, but every 8-gram crosses x1/x2
      102L -> "x1 alpha beta gamma delta epsilon zeta eta x2",
      // phrase-only: 6-token prefix matches, no shared 8-gram
      103L -> "alpha beta gamma delta epsilon zeta qq ww ee rr",
      // hits the GROWN train doc on both legs
      104L -> "p q r s t u v w z1 z2")
    val rep = DecontamIndex.decontaminationReport(
        RetrievalIndex.load(spark, rixDir),
        DecontamIndex.load(spark, dcDir), evalDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    assert(rep(100L) == ((3L, 1L, 1L, 1L, true)), rep(100L))
    assert(rep(101L) == ((2L, 0L, 0L, 0L, false)), rep(101L))
    assert(rep(102L) == ((2L, 0L, 0L, 0L, false)), rep(102L))
    assert(rep(103L) == ((3L, 0L, 1L, 1L, true)), rep(103L))
    assert(rep(104L) == ((3L, 1L, 1L, 1L, true)), rep(104L))
  }

  test("seeded random corpora: grow ≡ rebuild; stored screen ≡ live") {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def text(seed: Long, id: Long): String = {
      val len = 2 + (mix(seed + id * 13) & 7).toInt // some below n → whole-text gram
      (0 until len)
        .map(j => vocab((mix(seed + id * 131 + j) & 0x7fffffff).toInt % vocab.length))
        .mkString(" ")
    }
    for (c <- 0 until 6) {
      val seed = mix(880L + c)
      val nTrain = 6 + (mix(seed) & 5).toInt
      val train = (1L to nTrain).map(i => i -> text(seed, i))
      val evalDocs = (100L until 104L).map(i => i -> text(seed + 7, i))
      val (a, b) = train.partition(_._1 % 3 != 0)
      val grownDir = tmp(); val fullDir = tmp()
      DecontamIndex.build(docs(a: _*), grownDir, n = 3, nBuckets = 4)
      DecontamIndex.grow(docs(b: _*), grownDir)
      DecontamIndex.build(docs(train: _*), fullDir, n = 3, nBuckets = 4)
      assert(gramSet(DecontamIndex.load(spark, grownDir).grams) ==
        gramSet(DecontamIndex.load(spark, fullDir).grams), s"case $c")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSet
      val stored = rows(DecontamIndex.screen(
        DecontamIndex.load(spark, grownDir), docs(evalDocs: _*)))
      val live = rows(Training.contamination(
        docs(evalDocs: _*), docs(train: _*), n = 3))
      assert(stored == live && stored.nonEmpty, s"case $c")
      // forget a random subset: masked screen ≡ live over survivors
      val gone = train.map(_._1).filter(i => (mix(seed + i * 101) & 3) == 0)
      if (gone.nonEmpty && gone.size < nTrain) {
        DecontamIndex.forget(gone.toDF("doc_id"), grownDir)
        val masked = rows(DecontamIndex.screen(
          DecontamIndex.load(spark, grownDir), docs(evalDocs: _*)))
        val survivors = train.filterNot(kv => gone.contains(kv._1))
        assert(masked == rows(Training.contamination(
          docs(evalDocs: _*), docs(survivors: _*), n = 3)),
          s"case $c after forget")
      }
    }
  }

  test("hostile config is loud") {
    intercept[IllegalArgumentException](
      DecontamIndex.build(docs(1L -> "a"), tmp(), nBuckets = 0))
    intercept[IllegalArgumentException](
      DecontamIndex.build(docs(1L -> "a"), tmp(), n = 0))
  }
}
