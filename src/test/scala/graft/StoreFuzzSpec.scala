package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, DecontamIndex, DedupIndex, HashIndex,
  RetrievalIndex, Training}

/** Corrupted-store loaders fail LOUDLY (r17 ADVICE → r18): every stored
  * model/index family must refuse a truncated, column-dropped, emptied,
  * or family-mismatched store at LOAD time with a named error — not
  * surface a ClassCastException mid-probe or silently serve garbage.
  * CodecFuzzSpec is the untrusted-BYTES theorem for the crawl path;
  * this is the trusted-LAYOUT theorem for our own artifacts (partial
  * copies, interrupted writes, version skew).
  */
class StoreFuzzSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text")).cache()

  private def loud(body: => Any): String = {
    val e = intercept[IllegalArgumentException](body)
    e.getMessage
  }

  private def dropColumn(table: String, keep: Seq[String]): Unit = {
    val tmp = tempDir("graft-fuzz-rw").toString
    val df = spark.read.parquet(table).select(keep.map(col): _*)
    df.write.mode("overwrite").parquet(tmp)
    val rewritten = spark.read.parquet(tmp)
    rewritten.write.mode("overwrite").parquet(table)
  }

  // ---- tokenizer family ----

  test("tokenizer store: dropped model column, emptied meta, truncated " +
      "ranks, and invalid unigram log-probs all refuse loudly") {
    // BPE: dropped 'right' column
    val d1 = tempDir("graft-fuzz-bpe").toString
    Training.storeBpeMerges(Training.bpeTrain(docs, merges = 4), d1)
    dropColumn(s"$d1/model.parquet", Seq("rank", "left"))
    assert(loud(Training.loadBpeMerges(spark, d1)).contains("right"))

    // BPE: non-contiguous ranks (a truncated/partial store)
    val d2 = tempDir("graft-fuzz-bpe2").toString
    Training.storeBpeMerges(Training.bpeTrain(docs, merges = 4), d2)
    val gapped = spark.read.parquet(s"$d2/model.parquet")
      .filter(col("rank") =!= 2)
    val tmp = tempDir("graft-fuzz-bpe2rw").toString
    gapped.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp)
      .write.mode("overwrite").parquet(s"$d2/model.parquet")
    assert(loud(Training.loadBpeMerges(spark, d2)).contains("contiguous"))

    // meta emptied: no family row survives
    val d3 = tempDir("graft-fuzz-meta").toString
    Training.storeBpeMerges(Training.bpeTrain(docs, merges = 4), d3)
    Seq.empty[(String, String)].toDF("key", "value")
      .write.mode("overwrite").parquet(s"$d3/meta.parquet")
    val e3 = intercept[RuntimeException](Training.loadBpeMerges(spark, d3))
    assert(e3.getMessage.contains("family"))

    // unigram: NaN log-prob poisons every Viterbi walk — refuse
    val d4 = tempDir("graft-fuzz-uni").toString
    Training.storeTokenizer(
      Seq(("ab", -1.5), ("c", Double.NaN)).toDF("piece", "log_prob"),
      d4, "unigram")
    assert(loud(Training.loadUnigramModel(spark, d4)).contains("log_prob"))

    // wordpiece: empty vocab refuses
    val d5 = tempDir("graft-fuzz-wp").toString
    Training.storeTokenizer(
      Seq.empty[(Int, String)].toDF("ord", "piece"), d5, "wordpiece")
    assert(loud(Training.loadWordpieceVocab(spark, d5)).contains("empty"))
  }

  // ---- index families ----

  test("dedup index: dropped bucket column and a two-row meta refuse loudly") {
    val d = tempDir("graft-fuzz-dix").toString
    DedupIndex.build(docs.filter(col("doc_id") < 20), d)
    dropColumn(s"$d/buckets.parquet", Seq("doc_id", "band"))
    assert(loud(DedupIndex.load(spark, d)).contains("key"))

    val d2 = tempDir("graft-fuzz-dix2").toString
    DedupIndex.build(docs.filter(col("doc_id") < 20), d2)
    Seq((12, 4, 3, "fnv"), (12, 4, 3, "fnv")).toDF("k", "b", "r", "family")
      .write.mode("overwrite").parquet(s"$d2/meta.parquet")
    assert(loud(DedupIndex.load(spark, d2)).contains("exactly one row"))
  }

  test("retrieval index: unreadable postings dir refuses loudly") {
    val d = tempDir("graft-fuzz-rix").toString
    RetrievalIndex.build(docs.filter(col("doc_id") < 20), d)
    // wipe the postings table wholesale (a partial copy)
    val p = new java.io.File(s"$d/postings.parquet")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p)
    assert(loud(RetrievalIndex.load(spark, d)).contains("unreadable"))
  }

  test("hash index: dropped key column refuses loudly") {
    val d = tempDir("graft-fuzz-hix").toString
    HashIndex.build(
      docs.filter(col("doc_id") < 20)
        .select(col("doc_id"), xxhash64(col("text")).as("hash")), d)
    dropColumn(s"$d/buckets.parquet", Seq("doc_id", "hash", "blk"))
    assert(loud(HashIndex.load(spark, d)).contains("key"))
  }

  test("decontam index: missing meta column refuses loudly") {
    val d = tempDir("graft-fuzz-cix").toString
    DecontamIndex.build(docs.filter(col("doc_id") < 20), d)
    Seq(3).toDF("n")
      .write.mode("overwrite").parquet(s"$d/meta.parquet")
    assert(loud(DecontamIndex.load(spark, d)).contains("nBuckets"))
  }

  test("ann index: missing codebook row and dropped index column refuse loudly") {
    val emb = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 64)
    val d = tempDir("graft-fuzz-aix").toString
    AnnIndex.build(emb, d)
    // drop the codebook row from the model table
    val centOnly = spark.read.parquet(s"$d/model.parquet")
      .filter(col("kind") === "centroids")
    val tmp = tempDir("graft-fuzz-aixrw").toString
    centOnly.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp)
      .write.mode("overwrite").parquet(s"$d/model.parquet")
    assert(loud(AnnIndex.load(spark, d)).contains("codebook"))

    val d2 = tempDir("graft-fuzz-aix2").toString
    AnnIndex.build(emb, d2)
    val noCodes = spark.read.parquet(s"$d2/index.parquet")
      .select(col("vec_id"), col("list_id"))
    val tmp2 = tempDir("graft-fuzz-aix2rw").toString
    noCodes.write.mode("overwrite").parquet(tmp2)
    rmDir(s"$d2/index.parquet")
    spark.read.parquet(tmp2)
      .write.mode("overwrite").parquet(s"$d2/index.parquet")
    assert(loud(AnnIndex.load(spark, d2)).contains("codes"))
  }

  // ---- crawl-loop state dirs (r18 VERDICT #6 → r19: the loop loads
  // cdx/corpus/manifest across restarts — a truncated or
  // column-dropped state table must refuse loudly, not serve a partial
  // ledger or re-admit every fetch as novel) ----

  test("crawl-loop state: column-dropped cdx, manifest, and corpus " +
      "tables refuse loudly") {
    import graft.operators.{CorpusPipeline, CrawlLoop}
    val opts = CorpusPipeline.Opts(lineGate = false)
    def fetch(url: String): org.apache.spark.sql.DataFrame =
      Seq((url, "2025-01-01T00:00:00Z",
        ("<html><body><p>guarded loop state fixture page with clearly " +
          "enough words to survive the document floor here" +
          "</p></body></html>").getBytes("UTF-8")))
        .toDF("url", "warc_date", "body")
    def seeded(): CrawlLoop.State = {
      val st = CrawlLoop.freshState()
      CrawlLoop.step(fetch("https://example.com/seed"), st, opts,
        ixBuckets = 8)
      st
    }

    // cdx loses its digest column → the next step's revisit screen
    // refuses instead of archiving every re-fetch as novel
    val st1 = seeded()
    dropColumn(st1.cdxDir, Seq("urlkey", "ts", "url", "mime", "status"))
    assert(loud(CrawlLoop.step(fetch("https://example.com/p2"), st1, opts,
      ixBuckets = 8)).contains("digest"))

    // manifest loses batch_ord → the ledger append refuses instead of
    // silently restarting batch numbering
    val st2 = seeded()
    dropColumn(st2.manifestDir, Seq("stage_idx", "stage", "rows", "secs"))
    assert(loud(CrawlLoop.step(fetch("https://example.com/p3"), st2, opts,
      ixBuckets = 8)).contains("batch_ord"))

    // corpus loses doc_id → forget refuses instead of rewriting the
    // corpus into garbage
    val st3 = seeded()
    dropColumn(st3.corpusDir,
      spark.read.parquet(st3.corpusDir).columns.filterNot(_ == "doc_id").toSeq)
    assert(loud(CrawlLoop.forget(Seq(1L).toDF("doc_id"), st3))
      .contains("doc_id"))
  }

  private def rmDir(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path))
  }
}
