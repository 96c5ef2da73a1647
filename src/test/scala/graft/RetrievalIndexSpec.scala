package graft

import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, RetrievalIndex}

/** Persistent inverted index lifecycle: build-vs-load parity, grow
  * parity (build(A)+grow(B) ≡ build(A∪B)), stored-path ≡ live-path for
  * phrase/BM25, forget/vacuum takedown semantics (incl. the N/avgdl
  * stat shift), and the bucket partition-pruning plan shape.
  */
class RetrievalIndexSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_rixspec").toString

  private val corpusA = Seq(
    1L -> "a b c a b c",
    2L -> "a b x c",
    3L -> "  c a b  ",
    4L -> "q r s",
    6L -> "a a a")
  private val corpusB = Seq(
    5L -> "a b c q",
    7L -> "x y z a b")

  private def postingsSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("term"), col("doc_id"), col("tf"),
        array_join(col("positions"), ",").as("pos"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet

  test("build-vs-load parity: stored postings equal the live r01 index") {
    val d = docs(corpusA: _*)
    val dir = tmp()
    RetrievalIndex.build(d, dir, nBuckets = 8)
    val ix = RetrievalIndex.load(spark, dir)
    val live = Retrieval.invertedIndex(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(postingsSet(ix.postings) == live)
    // doclens: exact whitespace-token lengths (doc 3 has padding)
    val dl = ix.doclens.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dl == Set((1L, 6L), (2L, 4L), (3L, 3L), (4L, 3L), (6L, 3L)))
  }

  test("grow parity: build(A) + grow(B) equals build(A ∪ B)") {
    val grownDir = tmp(); val fullDir = tmp()
    RetrievalIndex.build(docs(corpusA: _*), grownDir, nBuckets = 4)
    RetrievalIndex.grow(docs(corpusB: _*), grownDir)
    RetrievalIndex.build(docs((corpusA ++ corpusB): _*), fullDir, nBuckets = 4)
    val grown = RetrievalIndex.load(spark, grownDir)
    val full = RetrievalIndex.load(spark, fullDir)
    assert(postingsSet(grown.postings) == postingsSet(full.postings))
    assert(grown.doclens.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == full.doclens.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("stored-path phrase search equals the live path (grown index)") {
    val dir = tmp()
    RetrievalIndex.build(docs(corpusA: _*), dir, nBuckets = 4)
    RetrievalIndex.grow(docs(corpusB: _*), dir)
    val all = docs((corpusA ++ corpusB): _*)
    val phrases = Seq((10L, "a b c"), (11L, "a b"), (12L, "z q"))
      .toDF("query_id", "phrase")
    val ix = RetrievalIndex.load(spark, dir)
    val stored = RetrievalIndex.phraseSearch(ix, phrases)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val live = Retrieval.phraseMatches(all, phrases)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == live)
    // hand-computed anchor, not just parity (the shared-formula rule):
    // "a b c" matches doc 1 at starts 0 and 3, doc 5 at start 0
    assert(stored.contains((10L, 1L, 2L)) && stored.contains((10L, 5L, 1L)))
    // "z q": both terms indexed, never adjacent anywhere — no rows
    assert(!stored.exists(_._1 == 12L))
  }

  test("stored-path BM25 equals the live path bit-for-bit") {
    val dir = tmp()
    RetrievalIndex.build(docs(corpusA: _*), dir, nBuckets = 4)
    RetrievalIndex.grow(docs(corpusB: _*), dir)
    val all = docs((corpusA ++ corpusB): _*)
    val qterms = Seq((1L, "a"), (1L, "q"), (2L, "x")).toDF("query_id", "term")
    val ix = RetrievalIndex.load(spark, dir)
    val stored = RetrievalIndex.bm25TopK(ix, qterms, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val live = Retrieval.bm25TopK(all, qterms, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(stored.sorted == live.sorted && stored.nonEmpty)
  }

  test("hand-computed BM25 anchor on the stored index") {
    // Corpus: d1 = "a b", d2 = "a", d3 = "c c c". N = 3, total = 6,
    // avgdl = 2. Query {a}: df(a) = 2, idf_q = floor(2^20·1.5/2.5) =
    // floor(629145.6) = 629145. d1: tf=1, dl=2 → tfNorm = 2.25/(1 +
    // 1.25·(0.25+0.75·1)) = 2.25/2.25 = 1 → contrib = 629145. d2: tf=1,
    // dl=1 → denom = 1 + 1.25·(0.25+0.375) = 1.78125; tfNorm =
    // 2.25/1.78125 = 1.263157894736842 → floor(629145·that) =
    // floor(794709.4736…) = 794709. d2 ranks above d1.
    val dir = tmp()
    RetrievalIndex.build(
      docs(1L -> "a b", 2L -> "a", 3L -> "c c c"), dir, nBuckets = 4)
    val ix = RetrievalIndex.load(spark, dir)
    val got = RetrievalIndex.bm25TopK(
        ix, Seq((9L, "a")).toDF("query_id", "term"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((9L, 1, 2L, 794709L), (9L, 2, 1L, 629145L)))
  }

  test("forget masks a doc everywhere: matches, tf, df, N and avgdl") {
    val dir = tmp()
    RetrievalIndex.build(
      docs(1L -> "a b", 2L -> "a", 3L -> "c c c"), dir, nBuckets = 4)
    RetrievalIndex.forget(Seq(2L).toDF("doc_id"), dir)
    val ix = RetrievalIndex.load(spark, dir)
    // phrase "a" no longer matches doc 2
    val pm = RetrievalIndex.phraseSearch(
        ix, Seq((1L, "a")).toDF("query_id", "phrase"))
      .collect().map(r => (r.getLong(1))).toSet
    assert(pm == Set(1L))
    // BM25 stats shift to the 2-doc corpus: N = 2, avgdl = 5/2 = 2.5,
    // df(a) = 1 → idf_q = floor(2^20·1.5/1.5) = 1048576. d1: tf=1, dl=2
    // → denom = 1 + 1.25·(0.25 + 0.75·0.8) = 2.0625; tfNorm =
    // 2.25/2.0625 = 1.0909090909090908 → floor(1048576·that) = 1143901.
    val got = RetrievalIndex.bm25TopK(
        ix, Seq((9L, "a")).toDF("query_id", "term"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((9L, 1, 1L, 1143901L)))
  }

  test("vacuum drops rows physically; answers unchanged; tombstones clear") {
    val dir = tmp()
    RetrievalIndex.build(
      docs(1L -> "a b", 2L -> "a", 3L -> "c c c"), dir, nBuckets = 4)
    RetrievalIndex.forget(Seq(2L).toDF("doc_id"), dir)
    val before = RetrievalIndex.bm25TopK(RetrievalIndex.load(spark, dir),
        Seq((9L, "a")).toDF("query_id", "term"), k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    RetrievalIndex.vacuum(spark, dir)
    val ix = RetrievalIndex.load(spark, dir)
    // physically gone, not just masked
    assert(spark.read.parquet(s"$dir/postings.parquet")
      .filter(col("doc_id") === 2L).count() == 0)
    assert(spark.read.parquet(s"$dir/doclens.parquet")
      .filter(col("doc_id") === 2L).count() == 0)
    assert(spark.read.parquet(s"$dir/tombstones.parquet").count() == 0)
    val after = RetrievalIndex.bm25TopK(ix,
        Seq((9L, "a")).toDF("query_id", "term"), k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(after == before)
  }

  test("r13 registered forget lifecycle: no forgotten doc is ever ranked") {
    val out = SparkEntry.queries("r13_index_forget_bm25")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    // every 17th doc is tombstoned in the registered lifecycle — a
    // ranked result naming one means the mask missed the postings table
    out.foreach { r =>
      assert(r.getLong(2) % 17 != 0,
        s"forgotten doc ${r.getLong(2)} still ranked for query ${r.getLong(0)}")
    }
  }

  test("probe prunes to the query terms' bucket partitions at the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmp()
    // many distinct terms spread across 16 buckets; a one-term query
    // must read ONE bucket directory
    val many = (1L to 40L).map(i => i -> s"term$i filler$i")
    RetrievalIndex.build(docs(many: _*), dir, nBuckets = 16)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ix = RetrievalIndex.load(spark, dir)
      val probed = RetrievalIndex.probe(ix, Seq("term7").toDF("term"))
      val scans = probed.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec
            if s.metadata("Location").contains("postings") => s
      }
      assert(scans.nonEmpty, "expected a postings parquet scan")
      val meta = scans.head.metadata("PartitionFilters")
      assert(meta.contains("bucket"),
        s"bucket partition filter not applied: $meta")
      // and the probe answers correctly through the pruning
      val rows = probed.collect()
      assert(rows.map(_.getAs[String]("term")).toSet == Set("term7"))
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("hostile config is loud") {
    intercept[IllegalArgumentException](
      RetrievalIndex.build(docs(1L -> "a"), tmp(), nBuckets = 0))
  }

  test("seeded random corpora: grow parity and stored-vs-live BM25 hold") {
    // deterministic splitmix-driven corpora over a tiny vocabulary so
    // repeated tokens, single-token docs, and high-df terms all occur;
    // each case checks the two load-bearing theorems end to end
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val vocab = Array("ax", "bo", "cu", "de", "el")
    for (c <- 0 until 4) {
      val seed = mix(700L + c)
      val n = 6 + (mix(seed) & 3).toInt
      val corpus = (1L to n).map { id =>
        val len = 1 + (mix(seed + id * 13) & 7).toInt
        id -> (0 until len)
          .map(j => vocab((mix(seed + id * 131 + j) & 0x7fffffff).toInt % vocab.length))
          .mkString(" ")
      }
      val (a, b) = corpus.partition(_._1 % 3 != 0)
      val grownDir = tmp(); val fullDir = tmp()
      RetrievalIndex.build(docs(a: _*), grownDir, nBuckets = 4)
      RetrievalIndex.grow(docs(b: _*), grownDir)
      RetrievalIndex.build(docs(corpus: _*), fullDir, nBuckets = 4)
      val grown = RetrievalIndex.load(spark, grownDir)
      assert(postingsSet(grown.postings) ==
        postingsSet(RetrievalIndex.load(spark, fullDir).postings), s"case $c")
      val qterms = Seq((1L, vocab((c + 1) % vocab.length)),
        (1L, vocab(c % vocab.length))).toDF("query_id", "term")
      val stored = RetrievalIndex.bm25TopK(grown, qterms, k = 4)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
      val live = Retrieval.bm25TopK(docs(corpus: _*), qterms, k = 4)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
      assert(stored == live && stored.nonEmpty, s"case $c")
    }
  }

  test("index-served snippets equal the live path; hand-computed anchor") {
    val dir = tmp()
    RetrievalIndex.build(docs(corpusA: _*), dir, nBuckets = 4)
    RetrievalIndex.grow(docs(corpusB: _*), dir)
    val all = docs((corpusA ++ corpusB): _*)
    val phrases = Seq((10L, "a b c"), (11L, "y z")).toDF("query_id", "phrase")
    val ix = RetrievalIndex.load(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
    val stored = rows(RetrievalIndex.snippets(ix, all, phrases, window = 1))
    val live = rows(Retrieval.phraseSnippets(all, phrases, window = 1))
    assert(stored == live && stored.nonEmpty)
    // hand-computed (worked on paper, not shared-formula): doc 1 =
    // "a b c a b c"; "a b c" matches at 0 (snippet clamps left, one
    // token of right context: "a b c a") and at 3 (clamps right:
    // "c a b c"); doc 5 = "a b c q" start 0 → "a b c q"
    assert(stored((10L, 1L, 0L, "a b c a")))
    assert(stored((10L, 1L, 3L, "c a b c")))
    assert(stored((10L, 5L, 0L, "a b c q")))
    // "y z" in doc 7 = "x y z a b": start 1, window 1 → "x y z a"
    assert(stored((11L, 7L, 1L, "x y z a")))
  }

  test("index-served keywords equal the live path; forget re-ranks") {
    val dir = tmp()
    RetrievalIndex.build(docs(corpusA: _*), dir, nBuckets = 4)
    RetrievalIndex.grow(docs(corpusB: _*), dir)
    val all = docs((corpusA ++ corpusB): _*)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .toSet
    val ix = RetrievalIndex.load(spark, dir)
    assert(rows(RetrievalIndex.keywordsFrom(ix, k = 2)) ==
      rows(Retrieval.tfidfKeywords(all, k = 2)))
    // forget doc 6 ("a a a"): keywords must equal a from-scratch run
    // over the SURVIVORS — tf rows gone, df("a") and N both shifted
    RetrievalIndex.forget(Seq(6L).toDF("doc_id"), dir)
    val masked = RetrievalIndex.load(spark, dir)
    val after = rows(RetrievalIndex.keywordsFrom(masked, k = 2))
    assert(after == rows(Retrieval.tfidfKeywords(
      all.filter(col("doc_id") =!= 6L), k = 2)))
    assert(!after.exists(_._1 == 6L))
  }

  test("r12 hybrid scale twin: ANN vector leg keeps high fused overlap " +
      "with the exact r10 form, identical text contribution, determinism") {
    def fused(name: String): Map[(Long, Long), (Int, Long)] =
      graft.SparkEntry.queries(name)(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(2)) ->
          ((r.getInt(1), r.getLong(3)))).toMap
    val exact = fused("r10_hybrid_rrf")
    val ann = fused("r12_hybrid_rrf_ann")
    assert(exact.nonEmpty && ann.nonEmpty)
    val queries = exact.keys.map(_._1).toSet
    assert(queries == ann.keys.map(_._1).toSet)
    // per query: the ANN-legged fusion keeps at least 7 of the exact
    // form's top-10 (IVFPQ recall on this corpus is spec'd higher
    // still; the text leg is IDENTICAL and contributes half the mass)
    queries.foreach { q =>
      val e = exact.keys.filter(_._1 == q).map(_._2).toSet
      val a = ann.keys.filter(_._1 == q).map(_._2).toSet
      val overlap = (e intersect a).size
      assert(overlap >= 7, s"query $q: overlap $overlap of ${e.size}")
    }
    // determinism: a second run is bit-identical
    assert(fused("r12_hybrid_rrf_ann") == ann)
  }
}
