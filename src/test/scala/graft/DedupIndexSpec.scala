package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Clusters, Dedup, DedupIndex}

/** The persistent incremental-dedup index: witnesses for every verdict
  * status, transitive infection through batch-only edges, and the parity
  * theorem — the incremental result equals a from-scratch run over
  * corpus ∪ batch (with corpus docs taking precedence) restricted to the
  * batch. */
class DedupIndexSpec extends SparkSuite {
  import spark.implicits._

  // spec LSH shape: more, narrower bands than the default so that J≈0.7
  // planted pairs collide with near-certainty (q = 1-(1-J^r)^b ≈ 0.995)
  private val K = 16; private val B = 8; private val R = 2
  private val TAU = 0.5

  private def doc(seed: String, changes: Map[Int, String] = Map.empty): String =
    (0 until 40).map(i => changes.getOrElse(i, s"$seed$i")).mkString(" ")

  // corpus: 6 docs incl. an internal near-dup pair (91~92) that must not
  // leak into batch verdicts
  private val c1 = doc("c")                                   // near-cross anchor
  private val c2 = doc("d")                                   // chain anchor
  private def corpus = Seq(
    1L -> c1,
    2L -> c2,
    3L -> "the corpus exact twin sentence appears verbatim in the next snapshot too.",
    4L -> doc("e"),
    91L -> doc("f"),
    92L -> doc("f", Map(7 -> "fx7", 21 -> "fx21"))
  ).toDF("doc_id", "text")

  // batch: every status's witness
  private val b12 = doc("c", Map(5 -> "y5", 17 -> "y17", 30 -> "y30")) // ~c1 J≈0.62
  private val b13 = doc("d", Map(2 -> "z2", 11 -> "z11", 33 -> "z33")) // ~c2 J≈0.62
  private val b14 = doc("d", Map(2 -> "z2", 11 -> "z11", 33 -> "z33",
    6 -> "w6", 19 -> "w19", 27 -> "w27"))  // ~b13 J≈0.62, vs c2 6 edits J≈0.39<τ
  private val b16 = doc("g")
  private val b17 = doc("g", Map(9 -> "h9", 24 -> "h24"))              // ~b16 J≈0.72
  private def batch = Seq(
    10L -> "the corpus exact twin sentence appears verbatim in the next snapshot too.",
    11L -> "a batch only sentence that repeats inside this very snapshot once more.",
    15L -> "a batch only sentence that repeats inside this very snapshot once more.",
    12L -> b12,
    13L -> b13,
    14L -> b14,
    16L -> b16,
    17L -> b17,
    18L -> doc("q")
  ).toDF("doc_id", "text")

  private def verdicts(): Map[Long, (String, Option[Long])] = {
    val dir = tempDir("graft-dedupix").toString
    DedupIndex.build(corpus, dir, K, B, R)
    DedupIndex.dedupAgainst(batch, corpus, DedupIndex.load(spark, dir), TAU)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
  }

  test("every verdict status lands on its witness") {
    val v = verdicts()
    assert(v.keySet == (10L to 18L).toSet, v)
    assert(v(10L) == ("exact_corpus", Some(3L)), v(10L))
    assert(v(11L) == ("kept", None), v(11L))           // batch exact canonical
    assert(v(15L) == ("exact_batch", Some(11L)), v(15L))
    assert(v(12L) == ("near_corpus", Some(1L)), v(12L))
    assert(v(13L) == ("near_corpus", Some(2L)), v(13L))
    // transitive: 14 never verifies against c2 directly (J<τ) but rides
    // the 14~13~c2 chain — infected component, attributed via 13's link
    assert(v(14L) == ("near_corpus", Some(2L)), v(14L))
    // pure-batch near pair resolves by the dedupPlan canonical
    // (equal-length texts → min id keeps)
    assert(v(16L) == ("kept", None), v(16L))
    assert(v(17L) == ("near_batch", Some(16L)), v(17L))
    assert(v(18L) == ("kept", None), v(18L))
  }

  /** From-scratch comparator: dedup corpus ∪ batch with corpus docs
    * taking precedence (published corpus never loses), restricted to
    * batch ids. Returns the surviving batch ids. */
  private def fromScratchSurvivors(): Set[Long] = {
    val u = corpus.select(col("doc_id"), col("text"), lit(true).as("is_corpus"))
      .unionByName(batch.select(col("doc_id"), col("text"), lit(false).as("is_corpus")))
    val hashed = u.withColumn("doc_md5", DedupIndex.normMd5(col("text")))
    val best = hashed.groupBy(col("doc_md5"))
      .agg(min(struct(when(col("is_corpus"), 0).otherwise(1).as("p"),
        col("doc_id").as("id"))).as("b"))
    val surv = hashed.join(best, "doc_md5")
      .filter(col("doc_id") === col("b.id"))
      .select(col("doc_id"), col("text"), col("is_corpus"))
      .persist()
    val pairs = Dedup.minhashNearDups(surv, TAU, K, B, R)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val labeled = Clusters.labelAll(surv.select(col("doc_id").as("node")), pairs)
    val plan = Clusters.dedupPlan(labeled, surv)
    val corpusComps = labeled
      .join(surv.filter(col("is_corpus")), col("node") === col("doc_id"))
      .select(col("component")).distinct()
    // batch doc survives iff its exact rep survived, its component holds
    // no corpus doc, and it is the canonical of its pure-batch component
    plan.join(corpusComps, Seq("component"), "left_anti")
      .filter(col("keep"))
      .join(surv.filter(!col("is_corpus")), Seq("doc_id"), "left_semi")
      .collect().map(_.getLong(0)).toSet
  }

  test("incremental verdicts match the from-scratch corpus∪batch run") {
    val kept = verdicts().collect { case (id, ("kept", _)) => id }.toSet
    assert(kept == fromScratchSurvivors(), kept)
  }

  test("grow: appended survivors answer like a rebuilt index") {
    val grownDir = tempDir("graft-dedupix-g").toString
    DedupIndex.build(corpus, grownDir, K, B, R)
    val v = DedupIndex.dedupAgainst(batch, corpus,
      DedupIndex.load(spark, grownDir), TAU)
    val keptIds = v.filter(col("status") === "kept").select(col("doc_id"))
    // materialize BEFORE grow: the survivors plan reads the index dir
    // that grow is about to append to
    val survivors = batch.join(keptIds, Seq("doc_id"), "left_semi")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
      .toDF("doc_id", "text")
    DedupIndex.grow(survivors, grownDir)

    val rebuiltDir = tempDir("graft-dedupix-r").toString
    DedupIndex.build(corpus.unionByName(survivors), rebuiltDir, K, B, R)

    // identical stored rows (set semantics) ...
    def rows(d: String, f: String) = spark.read.parquet(s"$d/$f")
      .collect().map(_.toString).sorted.toSeq
    assert(rows(grownDir, "exact.parquet") == rows(rebuiltDir, "exact.parquet"))
    assert(rows(grownDir, "buckets.parquet") == rows(rebuiltDir, "buckets.parquet"))

    // ... and identical verdicts for the next snapshot: batch2 carries a
    // near-dup of a batch-1 SURVIVOR (16 lives in the index now)
    val batch2 = Seq(
      20L -> doc("g", Map(3 -> "k3", 35 -> "k35")),  // ~b16 J≈0.72
      21L -> doc("m")
    ).toDF("doc_id", "text")
    val corpus2 = corpus.unionByName(survivors)
    val a = DedupIndex.dedupAgainst(batch2, corpus2,
      DedupIndex.load(spark, grownDir), TAU).orderBy("doc_id").collect().toSeq
    val b = DedupIndex.dedupAgainst(batch2, corpus2,
      DedupIndex.load(spark, rebuiltDir), TAU).orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(20L -> "near_corpus", 21L -> "kept"), a)
  }

  test("crawl loop: compaction bounds index file count, verdicts identical") {
    import graft.operators.Scale
    // N batches of novel docs (each survives whole) through the crawl
    // loop twice: compaction disabled vs an aggressive threshold. The
    // verdicts of a probe after every grow must be identical, and only
    // the compacted index's file count stays bounded.
    def novelBatch(i: Int): DataFrame =
      (0 until 3).map { j =>
        (1000L + i * 10 + j,
          (0 until 40).map(w => s"loop${i}doc${j}w$w").mkString(" "))
      }.toDF("doc_id", "text")

    def runLoop(compactAbove: Int): (String, Seq[Seq[(Long, String)]]) = {
      val dir = tempDir(s"graft-dedupix-c$compactAbove").toString
      DedupIndex.build(corpus, dir, K, B, R)
      var extra = corpus
      val probes = (0 until 6).map { i =>
        val b = novelBatch(i)
        val v = DedupIndex.dedupAgainst(b, extra,
          DedupIndex.load(spark, dir), TAU)
        val out = v.orderBy("doc_id").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        // all novel: everything admitted, whole batch grows the index
        DedupIndex.grow(b, dir, compactAbove)
        extra = extra.unionByName(b)
        v.unpersist()
        out
      }
      (dir, probes)
    }

    val (plainDir, plainProbes) = runLoop(0)      // never compacts
    val (compDir, compProbes) = runLoop(8)        // compacts aggressively
    assert(compProbes == plainProbes)             // verdict parity per batch
    // a cross-batch re-crawl probe answers identically post-compaction
    val recrawl = Seq((9000L, novelBatch(2).head().getString(1)))
      .toDF("doc_id", "text")
    def probe(d: String) = DedupIndex.dedupAgainst(recrawl, corpus,
      DedupIndex.load(spark, d), TAU).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(probe(compDir) == probe(plainDir))
    assert(probe(compDir) == Seq((9000L, "exact_corpus", 1020L)))
    // and the file counts: unbounded growth vs bounded
    def files(d: String) = Scale.dataFileCount(spark, s"$d/exact.parquet") +
      Scale.dataFileCount(spark, s"$d/buckets.parquet")
    assert(files(compDir) < files(plainDir),
      s"compacted ${files(compDir)} vs plain ${files(plainDir)}")
    // bounded: exact ≤ 8 post-rewrite + ≤1 batch of appends since;
    // buckets likewise (appends land one file per band per task)
    assert(Scale.dataFileCount(spark, s"$compDir/exact.parquet") <= 16,
      Scale.dataFileCount(spark, s"$compDir/exact.parquet"))
  }

  test("broadcastKeys=false (backfill shuffle-join hatch) matches the broadcast path") {
    val dir = tempDir("graft-dedupix-h").toString
    DedupIndex.build(corpus, dir, K, B, R)
    val ix = DedupIndex.load(spark, dir)
    val bc = DedupIndex.dedupAgainst(batch, corpus, ix, TAU)
      .orderBy("doc_id").collect().toSeq
    val sh = DedupIndex.dedupAgainst(batch, corpus, ix, TAU,
        broadcastKeys = false)
      .orderBy("doc_id").collect().toSeq
    assert(bc == sh)
  }

  test("the stored index round-trips: rebuild-free second batch run") {
    val dir = tempDir("graft-dedupix2").toString
    DedupIndex.build(corpus, dir, K, B, R)
    val ix = DedupIndex.load(spark, dir)
    assert((ix.k, ix.b, ix.r) == ((K, B, R)))
    val once = DedupIndex.dedupAgainst(batch, corpus, ix, TAU)
      .orderBy("doc_id").collect().toSeq
    val again = DedupIndex.dedupAgainst(batch, corpus,
      DedupIndex.load(spark, dir), TAU).orderBy("doc_id").collect().toSeq
    assert(once == again)
  }

  test("forget: a taken-down doc stops matching re-crawls; vacuum drops it physically") {
    import spark.implicits._
    val dir = tempDir("graft-dedupix-forget").toString
    DedupIndex.build(corpus, dir, K, B, R)
    def probe(): Map[Long, (String, Option[Long])] =
      DedupIndex.dedupAgainst(batch, corpus, DedupIndex.load(spark, dir), TAU)
        .collect().map(r => r.getLong(0) -> (r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // pre-takedown: batch 10 is an exact re-crawl of corpus 3, batch 12
    // a near-dup of corpus 1
    val before = probe()
    assert(before(10L) == (("exact_corpus", Some(3L))))
    assert(before(12L) == (("near_corpus", Some(1L))))

    DedupIndex.forget(Seq(3L, 1L).toDF("doc_id"), dir)
    val after = probe()
    // the forgotten docs no longer claim the re-crawls: their content
    // re-enters as new (batch-kept), and near-dup attribution moves off
    // the tombstoned anchor
    assert(after(10L)._1 == "kept", after(10L))
    assert(after(12L)._2 != Some(1L), after(12L))
    // untouched corpus anchors keep working
    assert(after(13L) == (("near_corpus", Some(2L))), after(13L))

    // vacuum: both tables shrink, tombstones clear, verdicts unchanged
    val exactBefore = spark.read.parquet(s"$dir/exact.parquet").count()
    val bucketsBefore = spark.read.parquet(s"$dir/buckets.parquet").count()
    DedupIndex.vacuum(spark, dir)
    assert(spark.read.parquet(s"$dir/exact.parquet").count() < exactBefore)
    assert(spark.read.parquet(s"$dir/buckets.parquet").count() < bucketsBefore)
    assert(spark.read.parquet(s"$dir/tombstones.parquet").count() == 0L)
    assert(probe() == after)
    // the lifecycle composes: grow after vacuum, then the grown doc
    // catches its own re-crawl
    DedupIndex.grow(Seq(200L -> doc("r")).toDF("doc_id", "text"), dir)
    val re = DedupIndex.dedupAgainst(
        Seq(201L -> doc("r")).toDF("doc_id", "text"),
        corpus.unionByName(Seq(200L -> doc("r")).toDF("doc_id", "text")),
        DedupIndex.load(spark, dir), TAU)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re(201L) == "exact_corpus")
  }

  test("d16 registered lifecycle: no verdict ever points at a forgotten " +
      "doc, and retained re-posts still resolve exact_corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val forgotten = docs
      .filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 17 === 0)
      .collect().map(_.getLong(0)).toSet
    assert(forgotten.nonEmpty, "fixture must tombstone at least one doc")
    val out = SparkEntry.queries("d16_dedup_forget_md5")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    // the tombstone property: a forgotten doc neither claims exact
    // re-crawls nor attracts near-dup attribution — NOTHING may point
    // at it
    out.foreach { case (id, st, dupOf) =>
      assert(!dupOf.exists(forgotten.contains),
        s"verdict ($id, $st, $dupOf) points at a forgotten doc")
    }
    // every retained re-post (id + 2^31) is an exact_corpus hit — its
    // original is still in the masked index
    val retained = out.filter(_._1 >= 2147483648L)
    assert(retained.nonEmpty)
    retained.foreach { case (id, st, _) =>
      assert(st == "exact_corpus", s"retained re-post $id got $st")
    }
    // at least one forgotten re-post (2^30 band) re-enters as non-exact
    // (its original stopped claiming it); it may still near-match a
    // RETAINED doc organically, which the dup_of assertion above allows
    val reposts = out.filter(t => t._1 >= 1073741824L && t._1 < 2147483648L)
    assert(reposts.nonEmpty)
    assert(reposts.exists(_._2 != "exact_corpus"),
      "every forgotten re-post still resolved exact_corpus — " +
        "tombstone masking is not reaching the exact table")
  }
}
