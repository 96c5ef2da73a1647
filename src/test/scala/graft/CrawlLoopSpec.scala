package graft

import org.apache.spark.sql.functions._
import graft.operators.{CrawlLoop, CorpusPipeline, DecontamIndex, RetrievalIndex}

/** The composed continuous-crawl loop (c08): exact stage counts over a
  * hand-built three-batch crawl, cross-batch catches (a re-fetch of a
  * batch-2 admission flagged url_dup by the GROWN capture index, a
  * near-edit of a batch-2 doc flagged near_corpus by the GROWN dedup
  * index), all three stored index families visibly growing between
  * batches (retrieval probe + decontamination screen), budget-starved
  * trap hosts, and batch parity with the streamed (foreachBatch) form.
  */
class CrawlLoopSpec extends SparkSuite {
  import spark.implicits._

  private def doc(seed: String, changes: Map[Int, String] = Map.empty): String =
    (0 until 40).map(i => changes.getOrElse(i, s"$seed$i")).mkString(" ")

  private def html(text: String, linkHost: Int): String =
    s"""<html><body><p>$text</p><a href="https://h$linkHost.example.com/x">go</a></body></html>"""

  private val tA = doc("a"); private val tB = doc("b")
  private val tC = doc("c"); private val tD = doc("d")
  private val tG = doc("g")

  // batch 1 (seed): two cross-linked hosts
  private val pageA = ("https://h0.example.com/doc/a", html(tA, 1))
  private val pageB = ("https://h1.example.com/doc/b", html(tB, 0))
  private val pageC = ("https://h0.example.com/doc/c", html(tC, 1))

  // batch 2: refetch A (revisit + url_dup), mirror of B's exact bytes on
  // a new url (content_dup), novel D, near-edit of A (near_corpus),
  // whitespace-variant copy of C (novel digest, exact_corpus text)
  private val pageD = ("https://h1.example.com/doc/d", html(tD, 0))
  private val mirrorB = ("https://h0.example.com/mirror/b", html(tB, 0))
  private val editA = ("https://h0.example.com/v2/a",
    html(doc("a", Map(5 -> "y5", 17 -> "y17", 30 -> "y30")), 1))
  private val copyC = ("https://h1.example.com/copy/c", html(tC + "  ", 0))

  // batch 3: refetch D (url_dup via the GROWN cdx), near-edit of D
  // (near_corpus via the GROWN dedup index), fresh G, 3 trap urls on an
  // unbudgeted host (default budget 1 → one fetched, stub text gated)
  private val editD = ("https://h1.example.com/v2/d",
    html(doc("d", Map(2 -> "z2", 11 -> "z11", 33 -> "z33")), 0))
  private val pageG = ("https://h0.example.com/doc/g", html(tG, 1))
  private def trapUrl(i: Int) = s"https://trap.example.net/gen/$i"
  private val trapHtml = "<html><body><p>generated trap page stub</p></body></html>"

  private def fetchesOf(rows: Seq[(String, String)], date: String) =
    rows.toDF("url", "html")
      .withColumn("warc_date", lit(date))
      .withColumn("body", col("html").cast("binary"))
      .select(col("url"), col("warc_date"), col("body"))

  private def expectedSegs(urls: Seq[String]): Long =
    urls.map(u => math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(u), 16)).distinct.size.toLong

  private val opts = CorpusPipeline.Opts(lineGate = false)

  private def counts(report: org.apache.spark.sql.DataFrame): Map[String, Long] =
    report.collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  private val batch1 = Seq(pageA, pageB, pageC)
  private val batch2 = Seq(pageD, mirrorB, editA, copyC,
    (pageA._1, pageA._2)) // identical refetch of A
  private val batch3sel = Seq(pageG, editD, (pageD._1, pageD._2),
    (trapUrl(0), trapHtml)) // post-frontier selection

  private def runBatches(st: CrawlLoop.State): Seq[Map[String, Long]] = Seq(
    counts(CrawlLoop.step(fetchesOf(batch1, "2025-01-01T00:00:00Z"), st, opts, ixBuckets = 8)),
    counts(CrawlLoop.step(fetchesOf(batch2, "2025-01-02T00:00:00Z"), st, opts, ixBuckets = 8)),
    counts(CrawlLoop.step(fetchesOf(batch3sel, "2025-01-03T00:00:00Z"), st, opts, ixBuckets = 8)))

  test("three-batch loop: exact stage counts and cross-batch catches") {
    val st = CrawlLoop.freshState()

    val r1 = counts(CrawlLoop.step(
      fetchesOf(batch1, "2025-01-01T00:00:00Z"), st, opts, ixBuckets = 8))
    assert(r1 == Map(
      "fetched" -> 3L, "segments" -> expectedSegs(batch1.map(_._1)),
      "cdx_novel" -> 3L, "cdx_url_dup" -> 0L, "cdx_content_dup" -> 0L,
      "media_images" -> 0L, "media_near_dup" -> 0L, "media_kept" -> 0L,
      "media_audio" -> 0L, "media_audio_dup" -> 0L, "media_audio_kept" -> 0L,
      "media_video" -> 0L, "media_video_dup" -> 0L, "media_video_kept" -> 0L,
      "records" -> 3L, "html_pages" -> 3L, "http_ok" -> 3L,
      "admitted" -> 3L, "url_dedup" -> 3L,
      "extract" -> 3L, "gate_scrub" -> 3L, "exact_dedup" -> 3L,
      "near_dedup" -> 3L, "substring_dedup" -> 3L,
      "corpus_kept" -> 3L, "corpus_exact_dup" -> 0L,
      "corpus_near_dup" -> 0L, "corpus_total" -> 3L), r1)

    // the retrieval index grew with batch 1; D's vocabulary is absent
    val ixBefore = RetrievalIndex.load(spark, st.retrievalDir)
    assert(RetrievalIndex.probe(ixBefore, Seq("a0").toDF("term"))
      .collect().nonEmpty)
    assert(RetrievalIndex.probe(ixBefore, Seq("d0").toDF("term"))
      .collect().isEmpty)
    // the decontamination census: an eval 8-gram from A flags, D not yet
    val evalA = Seq(100L -> tA.split(" ").take(8).mkString(" "))
      .toDF("doc_id", "text")
    val evalD = Seq(101L -> tD.split(" ").take(8).mkString(" "))
      .toDF("doc_id", "text")
    val dcBefore = DecontamIndex.load(spark, st.decontamDir)
    assert(DecontamIndex.screen(dcBefore, evalA)
      .head().getAs[Long]("n_hit") == 1L)
    assert(DecontamIndex.screen(dcBefore, evalD)
      .head().getAs[Long]("n_hit") == 0L)

    // budget leg: the symmetric 2-host graph splits the mass exactly —
    // 5e11 each, budget = 1 + floor(5e11·8/1e12) = 5 per host
    val pages1 = batch1.map(p => (p._1, p._2)).toDF("url", "html")
    val b = CrawlLoop.budgets(pages1, scale = 8L, iters = 2)
    assert(b.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("h0.example.com" -> 5L, "h1.example.com" -> 5L))
    // batch 2: 3 candidates on h0, 2 on h1 — all within budget
    val cand2 = batch2.map(_._1).toDF("url")
    assert(CrawlLoop.frontierSelect(cand2, b).count() == 5L)

    val r2 = counts(CrawlLoop.step(
      fetchesOf(batch2, "2025-01-02T00:00:00Z"), st, opts, ixBuckets = 8))
    assert(r2 == Map(
      "fetched" -> 5L, "segments" -> expectedSegs(batch2.map(_._1)),
      // D + editA + copyC novel; refetch-A url_dup; mirror-B content_dup
      "cdx_novel" -> 3L, "cdx_url_dup" -> 1L, "cdx_content_dup" -> 1L,
      "media_images" -> 0L, "media_near_dup" -> 0L, "media_kept" -> 0L,
      "media_audio" -> 0L, "media_audio_dup" -> 0L, "media_audio_kept" -> 0L,
      "media_video" -> 0L, "media_video_dup" -> 0L, "media_video_kept" -> 0L,
      // 3 full responses + 2 revisit records; revisits carry no page
      "records" -> 5L, "html_pages" -> 3L, "http_ok" -> 3L,
      "admitted" -> 3L, "url_dedup" -> 3L,
      "extract" -> 3L, "gate_scrub" -> 3L, "exact_dedup" -> 3L,
      "near_dedup" -> 3L, "substring_dedup" -> 3L,
      // D kept; copyC exact_corpus (whitespace normalizes away);
      // editA near_corpus (3 of 40 words edited, J≈0.62 ≥ τ)
      "corpus_kept" -> 1L, "corpus_exact_dup" -> 1L,
      "corpus_near_dup" -> 1L, "corpus_total" -> 4L), r2)

    // all three indexes visibly grew with D between batches
    val ixAfter = RetrievalIndex.load(spark, st.retrievalDir)
    assert(RetrievalIndex.probe(ixAfter, Seq("d0").toDF("term"))
      .collect().nonEmpty)
    assert(DecontamIndex.screen(DecontamIndex.load(spark, st.decontamDir),
      evalD).head().getAs[Long]("n_hit") == 1L)

    // batch 3 frontier: linked hosts budget 5, trap host defaults to 1
    val manualBudget = Seq(("h0.example.com", 5L), ("h1.example.com", 5L))
      .toDF("host", "budget")
    val cand3 = (Seq(pageG._1, editD._1, pageD._1) ++
      (0 until 3).map(trapUrl)).toDF("url")
    val sel3 = CrawlLoop.frontierSelect(cand3, manualBudget)
      .collect().map(_.getString(0)).toSet
    assert(sel3 == Set(pageG._1, editD._1, pageD._1, trapUrl(0)), sel3)

    val r3 = counts(CrawlLoop.step(
      fetchesOf(batch3sel, "2025-01-03T00:00:00Z"), st, opts, ixBuckets = 8))
    assert(r3 == Map(
      "fetched" -> 4L, "segments" -> expectedSegs(batch3sel.map(_._1)),
      // refetch-D caught by the GROWN capture index across the batch
      // boundary; editD + G + the trap page are novel digests
      "cdx_novel" -> 3L, "cdx_url_dup" -> 1L, "cdx_content_dup" -> 0L,
      "media_images" -> 0L, "media_near_dup" -> 0L, "media_kept" -> 0L,
      "media_audio" -> 0L, "media_audio_dup" -> 0L, "media_audio_kept" -> 0L,
      "media_video" -> 0L, "media_video_dup" -> 0L, "media_video_kept" -> 0L,
      "records" -> 4L, "html_pages" -> 3L, "http_ok" -> 3L,
      "admitted" -> 3L, "url_dedup" -> 3L, "extract" -> 3L,
      // the trap stub (4 words) dies at the word floor
      "gate_scrub" -> 2L, "exact_dedup" -> 2L, "near_dedup" -> 2L,
      "substring_dedup" -> 2L,
      // editD near_corpus via the dedup index GROWN with batch 2's D
      "corpus_kept" -> 1L, "corpus_exact_dup" -> 0L,
      "corpus_near_dup" -> 1L, "corpus_total" -> 5L), r3)

    // the capture index holds exactly the admitted novel captures
    assert(spark.read.parquet(st.cdxDir).count() == 9L)

    // takedown across EVERY artifact: forget D — retrieval stops
    // matching, decontamination stops flagging, corpus and CDX rows
    // leave physically
    val dId = Seq(pageD._1).toDF("url")
      .select(xxhash64(graft.operators.Curate.canonicalUrl(col("url"))))
      .head().getLong(0)
    CrawlLoop.forget(Seq(dId).toDF("doc_id"), st)
    assert(RetrievalIndex.probe(
      RetrievalIndex.load(spark, st.retrievalDir),
      Seq("d0").toDF("term")).collect().isEmpty)
    assert(DecontamIndex.screen(DecontamIndex.load(spark, st.decontamDir),
      evalD).head().getAs[Long]("n_hit") == 0L)
    assert(spark.read.parquet(st.corpusDir).count() == 4L)
    assert(spark.read.parquet(st.cdxDir).count() == 8L)
    // re-admission after takedown: the SAME url re-fetches as novel
    // (its purged capture no longer url_dup's it) and every index
    // serves it again — tombstones were vacuumed, not left masking
    val r4 = counts(CrawlLoop.step(
      fetchesOf(Seq(pageD), "2025-01-04T00:00:00Z"), st, opts,
      ixBuckets = 8))
    assert(r4("cdx_novel") == 1L && r4("cdx_url_dup") == 0L &&
      r4("corpus_kept") == 1L && r4("corpus_total") == 5L, r4)
    assert(RetrievalIndex.probe(
      RetrievalIndex.load(spark, st.retrievalDir),
      Seq("d0").toDF("term")).collect().nonEmpty)
  }

  test("streamed loop: foreachBatch parity with the batch form") {
    val batchReports = runBatches(CrawlLoop.freshState())

    val inDir = java.nio.file.Files
      .createTempDirectory("graft_loop_stream").toFile
    def stage(rows: Seq[(String, String)], date: String, name: String,
        mtime: Long): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_loop_stage").toFile
      fetchesOf(rows, date).coalesce(1)
        .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(inDir, name)
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(mtime) // file source orders by mtime
    }
    stage(batch1, "2025-01-01T00:00:00Z", "b1.parquet", 1000000L)
    stage(batch2, "2025-01-02T00:00:00Z", "b2.parquet", 2000000L)
    stage(batch3sel, "2025-01-03T00:00:00Z", "b3.parquet", 3000000L)

    val st = CrawlLoop.freshState()
    val streamed = scala.collection.mutable.ArrayBuffer[Map[String, Long]]()
    val stream = spark.readStream
      .schema(fetchesOf(batch1, "x").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir.getAbsolutePath)
    val q = stream.writeStream.foreachBatch {
      (df: org.apache.spark.sql.DataFrame, _: Long) =>
        streamed += counts(CrawlLoop.step(df, st, opts, ixBuckets = 8))
        ()
    }.start()
    try q.processAllAvailable() finally q.stop()

    assert(streamed.toSeq == batchReports)
  }

  // ---- media branch ----
  // Two-level tile images make every hash bit PROVABLE: 64×64 of 8×8
  // tiles, tile t = 200 ("high") if t ∈ highs else 50 — with 1 ≤ |highs|
  // ≤ 63 the aHash bit vector IS the highs indicator (200·64·64 >
  // total ⟺ nHigh < 64, and 50·64·64 > total is never true), so the
  // hamming distance between two plants is exactly |highs Δ highs'|.
  private def tilePx(highs: Set[Int]): Array[Int] =
    Array.tabulate(64 * 64) { i =>
      val bx = (i % 64) / 8; val by = (i / 64) / 8
      if (highs(by * 8 + bx)) 200 else 50
    }
  private def pngOf(highs: Set[Int]): Array[Byte] =
    graft.kernel.Png.encode(graft.kernel.Png.Image(64, 64, 1, 8, tilePx(highs)))
  private def gifOf(highs: Set[Int]): Array[Byte] =
    graft.kernel.Gif.encode(graft.kernel.Gif.Image(64, 64, 1, tilePx(highs)))

  private def mediaFetches(rows: Seq[(String, Array[Byte], String)],
      date: String) =
    rows.toDF("url", "body", "content_type")
      .withColumn("warc_date", lit(date))
      .select(col("url"), col("warc_date"), col("body"), col("content_type"))

  test("media branch: re-encodes and near-edits caught by the GROWN " +
      "HashIndex; byte dups never reach it; takedown re-admits") {
    val st = CrawlLoop.freshState()
    val hX = (0 to 4).toSet // imgX: bits 0-4
    val hY = Set(40, 41, 42, 50, 51, 52, 60) // disjoint from hX (ham 12)
    val urlX = "https://h0.example.com/img/x.png"

    // batch 1: one page (the curation chain needs ≥0 pages; include one
    // so the text leg exercises too) + two unique images
    val r1 = counts(CrawlLoop.step(
      fetchesOf(Seq(pageA), "2025-01-01T00:00:00Z")
        .withColumn("content_type", lit("text/html; charset=utf-8"))
        .unionByName(mediaFetches(Seq(
          (urlX, pngOf(hX), "image/png"),
          ("https://h1.example.com/img/y.png", pngOf(hY), "image/png")),
          "2025-01-01T00:00:00Z")),
      st, opts, ixBuckets = 8))
    assert(r1("media_images") == 2L && r1("media_near_dup") == 0L &&
      r1("media_kept") == 2L, r1)

    // batch 2: gifX = X's exact pixels re-encoded as GIF on a new url
    // (novel byte digest — only the hash probe can catch it, ham 0);
    // pngX1 = one-tile edit of X (ham 1); refetchX = identical bytes at
    // the SAME url (cdx url_dup — excluded before the media stage);
    // mirrorX = identical bytes at a NEW url (content_dup — excluded);
    // imgZ = unique (ham ≥ 13 to everything stored)
    val hX1 = hX + 9
    val hZ = Set(20, 21, 22, 30, 31, 32, 33, 34)
    val r2 = counts(CrawlLoop.step(
      fetchesOf(Seq(pageD), "2025-01-02T00:00:00Z")
        .withColumn("content_type", lit("text/html; charset=utf-8"))
        .unionByName(mediaFetches(Seq(
          ("https://h1.example.com/img2/x.gif", gifOf(hX), "image/gif"),
          ("https://h0.example.com/img/x1.png", pngOf(hX1), "image/png"),
          (urlX, pngOf(hX), "image/png"),
          ("https://h2.example.com/mirror/x.png", pngOf(hX), "image/png"),
          ("https://h3.example.com/img/z.png", pngOf(hZ), "image/png")),
          "2025-01-02T00:00:00Z")),
      st, opts, ixBuckets = 8))
    assert(r2("cdx_novel") == 4L && r2("cdx_url_dup") == 1L &&
      r2("cdx_content_dup") == 1L, r2)
    assert(r2("media_images") == 3L && r2("media_near_dup") == 2L &&
      r2("media_kept") == 1L, r2)

    // the stored index holds exactly the three admitted originals
    val ix = graft.operators.HashIndex.load(spark, st.hashDir)
    assert(ix.hashes.count() == 3L)

    // takedown: forget imgX — its fingerprint leaves physically, so the
    // SAME pixels on a fresh url are re-admitted as novel media
    val xId = Seq(urlX).toDF("url")
      .select(xxhash64(graft.operators.Curate.canonicalUrl(col("url"))))
      .head().getLong(0)
    CrawlLoop.forget(Seq(xId).toDF("doc_id"), st)
    assert(graft.operators.HashIndex.load(spark, st.hashDir)
      .hashes.count() == 2L)
    // the re-post uses X's PNG bytes: that digest left the CDX with the
    // takedown (the GIF re-encode's digest is still captured — a
    // re-fetch of IT would be content_dup, which is correct: only the
    // forgotten capture was purged)
    val r3 = counts(CrawlLoop.step(
      fetchesOf(Seq(pageG), "2025-01-03T00:00:00Z")
        .withColumn("content_type", lit("text/html; charset=utf-8"))
        .unionByName(mediaFetches(Seq(
          ("https://h4.example.com/img3/x.png", pngOf(hX), "image/png")),
          "2025-01-03T00:00:00Z")),
      st, opts, ixBuckets = 8))
    assert(r3("media_images") == 1L && r3("media_near_dup") == 0L &&
      r3("media_kept") == 1L, r3)
  }

  // deterministic mono WAV; `gain` scales every sample — the
  // energy-delta fingerprint is amplitude-invariant by construction
  // (integer scaling preserves every strict > between segment energies),
  // so a gain-scaled re-post arrives with a NOVEL byte digest but the
  // SAME fingerprint: only the audio hash index can catch it
  private def wavOf(seed: Long, gain: Int): Array[Byte] = {
    val samples = Array.tabulate(200) { i =>
      var z = seed * 1000L + i + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (((z >>> 40) % 100L).toInt - 50) * gain
    }
    graft.kernel.Wav.encode(graft.kernel.Wav.Audio(8000, 1, 16, samples))
  }

  test("media audio leg: gain-scaled re-posts caught by the GROWN audio " +
      "index; undecodable containers skip; takedown re-admits") {
    val st = CrawlLoop.freshState()
    val urlX = "https://h0.example.com/au/x.wav"
    val r1 = counts(CrawlLoop.step(
      fetchesOf(Seq(pageA), "2025-01-01T00:00:00Z")
        .withColumn("content_type", lit("text/html; charset=utf-8"))
        .unionByName(mediaFetches(Seq(
          (urlX, wavOf(1L, 1), "audio/wav"),
          ("https://h1.example.com/au/y.wav", wavOf(2L, 1), "audio/wav")),
          "2025-01-01T00:00:00Z")),
      st, opts, ixBuckets = 8))
    assert(r1("media_audio") == 2L && r1("media_audio_dup") == 0L &&
      r1("media_audio_kept") == 2L, r1)

    // batch 2: gain-doubled X on a new url (novel digest, SAME
    // fingerprint → caught by the GROWN index); a WAV→FLAC re-encode
    // of X (novel bytes, DIFFERENT container — FLAC decodes losslessly
    // to X's exact PCM, so it collapses onto X's fingerprint within
    // the batch and the pair dies on one index probe); byte-identical
    // X at a new url (content_dup — never reaches the audio stage);
    // unrelated wavZ (kept); an MP3 under an audio content type
    // (admitted novel but NOT fingerprintable — skips the leg, never
    // fails the batch)
    val r2 = counts(CrawlLoop.step(
      fetchesOf(Seq(pageD), "2025-01-02T00:00:00Z")
        .withColumn("content_type", lit("text/html; charset=utf-8"))
        .unionByName(mediaFetches(Seq(
          ("https://h1.example.com/au/x2.wav", wavOf(1L, 2), "audio/wav"),
          ("https://h5.example.com/au/x.flac",
            graft.kernel.Flac.encode(
              graft.kernel.Wav.decode(wavOf(1L, 1)), blockSize = 64),
            "audio/flac"),
          ("https://h2.example.com/mirror/x.wav", wavOf(1L, 1), "audio/wav"),
          ("https://h3.example.com/au/z.wav", wavOf(3L, 1), "audio/wav"),
          ("https://h4.example.com/au/m.mp3",
            graft.kernel.Mp3.encodeHeader(10, 128, 44100), "audio/mpeg")),
          "2025-01-02T00:00:00Z")),
      st, opts, ixBuckets = 8))
    assert(r2("cdx_content_dup") == 1L, r2)
    assert(r2("media_audio") == 3L && r2("media_audio_dup") == 1L &&
      r2("media_audio_kept") == 1L, r2)

    // stored audio index: X, Y, Z
    assert(graft.operators.HashIndex.load(spark, st.audioHashDir)
      .hashes.count() == 3L)

    // takedown: forget X — a gain-4 re-post on a fresh url is
    // re-admitted (its fingerprint no longer matches anything stored)
    val xId = Seq(urlX).toDF("url")
      .select(xxhash64(graft.operators.Curate.canonicalUrl(col("url"))))
      .head().getLong(0)
    CrawlLoop.forget(Seq(xId).toDF("doc_id"), st)
    assert(graft.operators.HashIndex.load(spark, st.audioHashDir)
      .hashes.count() == 2L)
    val r3 = counts(CrawlLoop.step(
      fetchesOf(Seq(pageG), "2025-01-03T00:00:00Z")
        .withColumn("content_type", lit("text/html; charset=utf-8"))
        .unionByName(mediaFetches(Seq(
          ("https://h0.example.com/au/x4.wav", wavOf(1L, 4), "audio/wav")),
          "2025-01-03T00:00:00Z")),
      st, opts, ixBuckets = 8))
    assert(r3("media_audio") == 1L && r3("media_audio_dup") == 0L &&
      r3("media_audio_kept") == 1L, r3)
  }

  test("per-batch eval decontamination: a crawled page sharing an " +
      "8-gram with the eval reference never reaches the corpus or the " +
      "indexes, in any batch") {
    val st = CrawlLoop.freshState()
    val evalRef = Seq(900L -> tB).toDF("doc_id", "text")
    val r1 = counts(CrawlLoop.step(
      fetchesOf(batch1, "2025-01-01T00:00:00Z"), st, opts,
      evalRef = Some(evalRef), ixBuckets = 8))
    // A and C curate through; B dies at the decontamination gate
    assert(r1("gate_scrub") == 3L && r1("decontaminate") == 2L &&
      r1("corpus_kept") == 2L && r1("corpus_total") == 2L, r1)
    // B's vocabulary reached NO stored index
    assert(RetrievalIndex.probe(RetrievalIndex.load(spark, st.retrievalDir),
      Seq("b0").toDF("term")).collect().isEmpty)
    assert(DecontamIndex.screen(DecontamIndex.load(spark, st.decontamDir),
      Seq(101L -> tB.split(" ").take(8).mkString(" ")).toDF("doc_id", "text"))
      .head().getAs[Long]("n_hit") == 0L)
    // a batch-2 re-post of B's text on a new URL dies the same way: the
    // screen runs per batch, every batch — and a batch whose survivors
    // all die must still step cleanly (the grows see an empty frame)
    val r2 = counts(CrawlLoop.step(
      fetchesOf(Seq(("https://h3.example.com/repost/b", html(tB, 2))),
        "2025-01-02T00:00:00Z"), st, opts,
      evalRef = Some(evalRef), ixBuckets = 8))
    assert(r2("cdx_novel") == 1L && r2("decontaminate") == 0L &&
      r2("corpus_kept") == 0L && r2("corpus_total") == 2L, r2)
    assert(RetrievalIndex.probe(RetrievalIndex.load(spark, st.retrievalDir),
      Seq("b0").toDF("term")).collect().isEmpty)
  }

  // two-level temporal-spatial Y4M: 8×8 Cmono, 4 frames (tGrid=4 →
  // bucket t = frame t), sGrid=4 → 2×2-px cells; cell c of frame t =
  // 20·gain if (t·16+c) ∈ highs else 5·gain — with ≤15 highs per bucket
  // the cube bit vector IS the highs indicator (20g·4·16 > 4g·(15·nH+80)
  // ⟺ nH < 16; the 5g side never fires), so the hamming distance
  // between two plants is exactly |highs Δ highs'|, and gain scaling
  // preserves every bit while changing every payload byte
  private def y4mOf(highs: Set[Int], gain: Int): Array[Byte] = {
    val frames = Vector.tabulate(4) { t =>
      Array.tabulate[Byte](64) { i =>
        val c = ((i / 8) / 2) * 4 + (i % 8) / 2
        (if (highs(t * 16 + c)) 20 * gain else 5 * gain).toByte
      }
    }
    graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(8, 8, "Cmono", frames))
  }

  test("media video leg: gain-scaled re-encodes caught by the GROWN " +
      "video index; compressed containers skip; takedown re-admits") {
    val st = CrawlLoop.freshState()
    val urlX = "https://h0.example.com/vid/x.y4m"
    val hX = Set(0, 1, 2)
    val hY = Set(16, 17, 33) // hamming 6 from X — a verified non-dup
    val r1 = counts(CrawlLoop.step(
      fetchesOf(Seq(pageA), "2025-01-01T00:00:00Z")
        .withColumn("content_type", lit("text/html; charset=utf-8"))
        .unionByName(mediaFetches(Seq(
          (urlX, y4mOf(hX, 1), "video/x-yuv4mpeg"),
          ("https://h1.example.com/vid/y.y4m", y4mOf(hY, 1),
            "video/x-yuv4mpeg")),
          "2025-01-01T00:00:00Z")),
      st, opts, ixBuckets = 8))
    assert(r1("media_video") == 2L && r1("media_video_dup") == 0L &&
      r1("media_video_kept") == 2L, r1)

    // batch 2: gain-doubled X on a new url (novel byte digest, SAME
    // cube → caught by the GROWN index); byte-identical X at a new url
    // (content_dup — never reaches the video stage); unique Z; a
    // compressed MP4 container under a video content type (admitted
    // novel but NOT decodable — skips the leg, never fails the batch)
    val hZ = Set(5, 21, 37, 53)
    val r2 = counts(CrawlLoop.step(
      fetchesOf(Seq(pageD), "2025-01-02T00:00:00Z")
        .withColumn("content_type", lit("text/html; charset=utf-8"))
        .unionByName(mediaFetches(Seq(
          ("https://h1.example.com/vid/x2.y4m", y4mOf(hX, 2),
            "video/x-yuv4mpeg"),
          ("https://h2.example.com/mirror/x.y4m", y4mOf(hX, 1),
            "video/x-yuv4mpeg"),
          ("https://h3.example.com/vid/z.y4m", y4mOf(hZ, 1),
            "video/x-yuv4mpeg"),
          ("https://h4.example.com/vid/m.mp4",
            Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("US-ASCII"),
            "video/mp4")),
          "2025-01-02T00:00:00Z")),
      st, opts, ixBuckets = 8))
    assert(r2("cdx_content_dup") == 1L, r2)
    assert(r2("media_video") == 2L && r2("media_video_dup") == 1L &&
      r2("media_video_kept") == 1L, r2)

    // stored video index: X, Y, Z
    assert(graft.operators.HashIndex.load(spark, st.videoHashDir)
      .hashes.count() == 3L)

    // takedown: forget X — a gain-3 re-post on a fresh url is
    // re-admitted (its cube no longer matches anything stored)
    val xId = Seq(urlX).toDF("url")
      .select(xxhash64(graft.operators.Curate.canonicalUrl(col("url"))))
      .head().getLong(0)
    CrawlLoop.forget(Seq(xId).toDF("doc_id"), st)
    assert(graft.operators.HashIndex.load(spark, st.videoHashDir)
      .hashes.count() == 2L)
    val r3 = counts(CrawlLoop.step(
      fetchesOf(Seq(pageG), "2025-01-03T00:00:00Z")
        .withColumn("content_type", lit("text/html; charset=utf-8"))
        .unionByName(mediaFetches(Seq(
          ("https://h0.example.com/vid/x3.y4m", y4mOf(hX, 3),
            "video/x-yuv4mpeg")),
          "2025-01-03T00:00:00Z")),
      st, opts, ixBuckets = 8))
    assert(r3("media_video") == 1L && r3("media_video_dup") == 0L &&
      r3("media_video_kept") == 1L, r3)
  }

  test("run manifest: the per-batch ledger accumulates across step " +
      "invocations and serves history without re-running") {
    val st = CrawlLoop.freshState()
    val reports = runBatches(st)
    val led = spark.read.parquet(st.manifestDir)
    // every batch's returned report is IN the ledger, verbatim
    val ledMaps = (0 until 3).map { k =>
      led.filter(col("batch_ord") === k)
        .filter(!col("stage").startsWith("ix_"))
        .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("rows"))
        .toMap
    }
    assert(ledMaps == reports)
    // "what did batch 1 admit" answered from the ledger alone
    assert(led.filter(col("batch_ord") === 1 && col("stage") === "corpus_kept")
      .head().getAs[Long]("rows") == 1L)
    // index row counts ride along per batch and grow monotonically
    val rIx = (0 until 3).map(k => led
      .filter(col("batch_ord") === k && col("stage") === "ix_retrieval_docs")
      .head().getAs[Long]("rows"))
    assert(rIx == Seq(3L, 4L, 5L), rIx)
    val dIx = (0 until 3).map(k => led
      .filter(col("batch_ord") === k && col("stage") === "ix_dedup_docs")
      .head().getAs[Long]("rows"))
    assert(dIx == Seq(3L, 4L, 5L), dIx)
  }

  test("footerRows: local paths count footers, non-local schemes fail " +
      "loudly instead of silently summing 0") {
    // the walk is java.nio — an hdfs:/s3a: state dir would return 0 and
    // the manifest would record zero row counts without any error
    val e = intercept[IllegalArgumentException](
      CrawlLoop.footerRows("s3a://bucket/state/corpus"))
    assert(e.getMessage.contains("non-local"))
    val e2 = intercept[IllegalArgumentException](
      CrawlLoop.footerRows("hdfs://nn:8020/state/corpus"))
    assert(e2.getMessage.contains("non-local"))
    // file: and bare paths still walk (missing dir -> 0, not an error)
    assert(CrawlLoop.footerRows("/tmp/graft-footer-does-not-exist") == 0L)
    assert(CrawlLoop.footerRows("file:/tmp/graft-footer-does-not-exist") == 0L)
  }

  test("c12 registered takedown: physical purge across every artifact, " +
      "control pair still dies, forgotten pair re-admitted") {
    // ride the EXACT registered query (the r16 VERDICT ask): its plants
    // are sf-independent, so the spec asserts absolute counts
    val out = SparkEntry.queries("c12_crawl_takedown")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[String]("phase"), r.getAs[Long]("batch_ord"),
        r.getAs[String]("stage"), r.getAs[Long]("rows")))
    def snap(phase: String): Map[String, Long] =
      out.filter(_._1 == phase).map(t => t._3 -> t._4).toMap
    val pre = snap("pre_forget"); val post = snap("post_forget")
    val fin = snap("post_readmit")
    // forget() physically removed ONE page and ONE wav from every store
    for (a <- Seq("ix_dedup_docs", "ix_audio_hash_sigs", "corpus_docs")) {
      assert(pre(a) == 2L && post(a) == 1L && fin(a) == 2L,
        s"$a: pre=${pre(a)} post=${post(a)} fin=${fin(a)}")
    }
    // the CDX loses exactly the two purged capture rows (urlkey-addressed)
    assert(pre("cdx_rows") - post("cdx_rows") == 2L, (pre, post))
    // batch 1 (pre-forget): every re-post dies on the grown indexes
    def batch(k: Long): Map[String, Long] =
      out.filter(t => t._1 == "loop" && t._2 == k).map(t => t._3 -> t._4).toMap
    val b1 = batch(1L)
    assert(b1("corpus_exact_dup") == 2L && b1("corpus_kept") == 0L, b1)
    assert(b1("media_audio_dup") == 2L && b1("media_audio_kept") == 0L, b1)
    // batch 2 (post-forget): the forgotten pair is re-admitted, the
    // control pair still dies — takedown does not leak into controls
    val b2 = batch(2L)
    assert(b2("corpus_kept") == 1L && b2("corpus_exact_dup") == 1L, b2)
    assert(b2("media_audio_kept") == 1L && b2("media_audio_dup") == 1L, b2)
  }

  test("c15 md5-family loop twin: cached manifest equals a fresh live " +
      "two-step run and the cross-batch plants land") {
    val reg = SparkEntry.queries("c15_crawl_loop_md5")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSeq
    // two batches, the full 34-stage ledger each
    assert(reg.map(_._1).distinct == Seq(0L, 1L), reg.map(_._1).distinct)
    assert(reg.size == 68, reg.size)
    def b(k: Long): Map[String, Long] =
      reg.filter(_._1 == k).map(t => t._3 -> t._4).toMap
    val b0 = b(0L); val b1 = b(1L)
    // batch 0 seeds clean; batch 1's planted cross-batch events land:
    // re-fetches die at cdx (url_dup), mirrors at content_dup, and the
    // grown md5 dedup index catches exact + near re-posts
    assert(b0("cdx_url_dup") == 0L && b0("corpus_kept") > 0L, b0)
    assert(b1("cdx_url_dup") > 0L && b1("cdx_content_dup") > 0L, b1)
    assert(b1("corpus_exact_dup") > 0L && b1("corpus_near_dup") > 0L, b1)
    assert(b1("corpus_total") ==
      b0("corpus_kept") + b1("corpus_kept"), (b0, b1))
    // cached ≡ live: re-run the EXACT registered fixture fresh
    val live = tempDir("graft-c15-live").toString
    CrawlLoop.md5FamilyLoop(spark, sf0001, s"$live/state")
    val liveRows = spark.read.parquet(s"$live/state/manifest.parquet")
      .select(col("batch_ord"), col("stage_idx"), col("stage"), col("rows"))
      .orderBy(col("batch_ord"), col("stage_idx"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(liveRows == reg, "IxScratch-cached c15 manifest diverged from live")
  }
}
