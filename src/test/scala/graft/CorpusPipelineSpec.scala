package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusPipeline

/** The end-to-end curation composition: one synthetic corpus carrying a
  * witness for every stage — HTML chrome + PII, an exact duplicate, a
  * shared boilerplate run, a near-duplicate pair, an eval-contaminated
  * doc, and a too-short doc — must come out with exactly the right
  * survivors, the right edits, and a monotone stage report.
  */
class CorpusPipelineSpec extends SparkSuite {
  import spark.implicits._

  private val run8 = "alpha beta gamma delta epsilon zeta eta theta"

  // 40 unique tokens; the near-dup twin changes one token (J ≈ 0.85 on
  // 3-gram shingles). The pair DOES share >= 8-token runs — which is
  // exactly why near-dup dedup runs before substring dedup: the twin
  // drops whole, and the survivor's runs become unique before the
  // substring census ever counts them
  private val base = (0 until 39).map(i => s"b$i").mkString(" ") + " b39."
  private val twin = (0 until 39).map(i =>
    if (i == 20) "x20" else s"b$i").mkString(" ") + " b39."

  private def corpus = Seq(
    (1L, "<p>please reach me at someone@example.com " +
      "for all further document questions today.</p>"),
    (2L, "this exact document text appears twice in the corpus verbatim."),
    (3L, "this exact document text appears twice in the corpus verbatim."),
    (4L, s"intro four before $run8 tail forty one two three."),
    (5L, s"other five leading $run8 ending sixty seven eight nine."),
    (6L, base),
    (7L, twin),
    (8L, "unique carrier words around g1 g2 g3 g4 g5 g6 g7 g8 closing words here."),
    (9L, "tiny doc.")).toDF("doc_id", "html")

  private def evalRef = Seq(
    (100L, "benchmark prompt g1 g2 g3 g4 g5 g6 g7 g8 answer choice")
  ).toDF("doc_id", "text")

  test("curate: every stage drops or edits exactly its witness") {
    val (out, report) = CorpusPipeline.curate(corpus, Some(evalRef))
    val rows = out.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // 3 = exact dup (min id 2 survives), 7 = near dup (min id 6
    // survives), 8 = contaminated, 9 = under the word floor
    assert(rows.keySet == Set(1L, 2L, 4L, 5L, 6L))
    // HTML chrome gone, PII scrubbed
    assert(!rows(1L).contains("<p>") && rows(1L).contains("[EMAIL]")
      && !rows(1L).contains("@"), rows(1L))
    // the shared 8-token run is cut from BOTH carriers, tails survive
    assert(!rows(4L).contains("alpha") && rows(4L).contains("intro"), rows(4L))
    assert(!rows(5L).contains("theta") && rows(5L).contains("ending"), rows(5L))
    // the near-dup survivor keeps its full text (no substring cut fired)
    assert(rows(6L) == base, rows(6L))

    // the stage report is in run order and monotone non-increasing
    val st = report.orderBy("stage_idx").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(st.map(_._1) == Seq("extract", "gate_scrub", "exact_dedup",
      "near_dedup", "substring_dedup", "decontaminate"))
    assert(st.map(_._2).sliding(2).forall(w => w(0) >= w(1)), st)
    assert(st.head._2 == 9L && st.last._2 == 5L, st)
  }

  test("curate without an eval reference skips only decontamination") {
    val (out, report) = CorpusPipeline.curate(corpus, None)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 4L, 5L, 6L, 8L))
    assert(!report.collect().map(_.getString(1)).contains("decontaminate"))
  }

  // The driver's synthetic documents table is word soup with no terminal
  // punctuation: with the web-crawl C4 line gate ON, the gate wipes the
  // corpus (that invariant is pinned here); with lineGate = false — the
  // registered c01 configuration — the chain must leave survivors, so
  // the per-stage report actually gates something on the driver.
  test("driver-shaped corpus: lineGate off leaves survivors, on wipes it") {
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "window", "spark", "order",
      "data", "column", "join", "small", "line", "customer", "query", "big",
      "the", "a", "sort", "group", "stream", "filter", "vector")
    val docs = (0L until 60L).map { i =>
      val rnd = new scala.util.Random(i * 2654435761L + 11L)
      (i, (0 until 30).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")

    val (out, report) = CorpusPipeline.curate(
      docs.filter(col("doc_id") % 7 =!= 0),
      evalRef = Some(docs.filter(col("doc_id") % 7 === 0)),
      opts = CorpusPipeline.Opts(lineGate = false))
    val st = report.orderBy("stage_idx").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(out.count() > 0, st)
    assert(st.map(_._2).sliding(2).forall(w => w(0) >= w(1)), st)

    val (wiped, _) = CorpusPipeline.curate(docs, None)
    assert(wiped.count() == 0L)
  }

  test("c13 md5-family composition: cached report equals a fresh live " +
      "run, stage counts are sane, and the family knob only changes " +
      "the near-dup stage's hash family") {
    val reg = SparkEntry.queries("c13_corpus_curate_md5")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(reg.map(_._2) == Seq("extract", "gate_scrub", "exact_dedup",
      "near_dedup", "substring_dedup", "decontaminate"))
    // monotone: every stage can only drop rows after extract
    reg.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3, s"stage ${b._2} grew: $a -> $b")
    }
    assert(reg.last._3 > 0, "chain left no survivors")
    // cached ≡ live: re-run the EXACT registered configuration fresh
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("source"))
    val (_, live) = CorpusPipeline.curate(
      docs.filter(col("doc_id") % 97 =!= 0),
      evalRef = Some(docs.filter(col("doc_id") % 97 === 0)),
      opts = CorpusPipeline.Opts(lineGate = false, hashGrams = false,
        md5Family = true))
    val liveRows = live.orderBy(col("stage_idx"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(liveRows == reg, "IxScratch-cached c13 report diverged from live")
  }

  test("c14 md5-family web composition: cached report equals a fresh " +
      "live run and the stage list covers every crawl + curate leg") {
    val reg = SparkEntry.queries("c14_crawl_curate_md5")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(reg.map(_._2) == Seq("records", "html_pages", "http_ok",
      "url_dedup", "extract", "gate_scrub", "exact_dedup", "near_dedup",
      "substring_dedup", "decontaminate"))
    // every stage can only drop rows (records ⊇ html ⊇ ok ⊇ url-dedup
    // survivors; extract is the identity count; curation only drops)
    reg.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3, s"stage ${b._2} grew: $a -> $b")
    }
    assert(reg.last._3 > 0, "web chain left no survivors")
    // cached ≡ live: re-run the EXACT registered configuration fresh
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val segments = CorpusPipeline.syntheticSegments(
      docs.filter(col("doc_id") % 97 =!= 0).as[(Long, String)])
    val (_, live) = CorpusPipeline.crawlCurate(segments,
      evalRef = Some(docs.filter(col("doc_id") % 97 === 0)),
      opts = CorpusPipeline.Opts(lineGate = false, hashGrams = false,
        md5Family = true))
    val liveRows = live.orderBy(col("stage_idx"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(liveRows == reg, "IxScratch-cached c14 report diverged from live")
  }

  test("crawlCurate: every crawl stage drops exactly its witness") {
    import graft.kernel.Warc
    def resp(url: String, status: Int, mime: String, body: String) =
      (Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> url,
        "WARC-Date" -> "2025-01-01T00:00:00Z",
        "WARC-Record-ID" -> s"<urn:uuid:$url>",
        "Content-Type" -> "application/http;msgtype=response"),
        Warc.renderHttpResponse(status, s"$mime; charset=utf-8",
          body.getBytes("UTF-8")))
    def page(body: String) = s"<html><body><p>$body</p></body></html>"
    val seg1 = Warc.writeGz(Seq(
      resp("https://example.com/gone", 404, "text/html", page("gone away.")),
      resp("https://example.com/img", 200, "image/png", "binarybytes"),
      resp("https://example.com/page", 200, "text/html",
        page("the very same page fetched twice from variant urls.")),
      resp("https://WWW.Example.com:443/page?utm_source=z", 200, "text/html",
        page("the very same page fetched twice from variant urls.")),
      resp("https://example.com/e1", 200, "text/html",
        page("this exact page text appears under two different urls entirely."))))
    val seg2 = Warc.writeGz(Seq(
      resp("https://example.com/e2", 200, "text/html",
        page("this exact page text appears under two different urls entirely.")),
      resp("https://example.com/n1", 200, "text/html", page(base)),
      resp("https://example.com/n2", 200, "text/html", page(twin)),
      resp("https://example.com/s", 200, "text/html", page("tiny doc.")),
      // the surviving witness arrives the way real origins serve pages:
      // ISO-8859-1 bytes, gzip Content-Encoding, chunked framing — the
      // extraction chain must decode it to the SAME clean text a plain
      // UTF-8 page would yield (c02's transfer-decode witness)
      (Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://example.com/c",
        "WARC-Date" -> "2025-01-01T00:00:00Z",
        "WARC-Record-ID" -> "<urn:uuid:https://example.com/c>",
        "Content-Type" -> "application/http;msgtype=response"),
        Warc.renderHttpResponse(200, Seq(
          "Content-Type" -> "text/html; charset=iso-8859-1",
          "Content-Encoding" -> "gzip",
          "Transfer-Encoding" -> "chunked"),
          Warc.chunkBytes(Warc.gzipBytes(
            page("a perfectly ordinary café page with plenty of words.")
              .getBytes("ISO-8859-1")), 7)))))
    val segments = Seq(
      ("file:/crawl/seg-1.warc.gz", seg1),
      ("file:/crawl/seg-2.warc.gz", seg2)).toDF("path", "content")

    val (out, report) = CorpusPipeline.crawlCurate(segments)
    val keys = out.select(col("urlkey")).collect().map(_.getString(0)).toSet
    assert(keys.size == 4, keys)
    assert(keys.contains("https://example.com/page")) // url variants collapsed
    assert(keys.contains("https://example.com/c"))
    assert(keys.count(k => k == "https://example.com/e1" ||
      k == "https://example.com/e2") == 1, keys) // exact-dup survivor
    assert(keys.count(k => k == "https://example.com/n1" ||
      k == "https://example.com/n2") == 1, keys) // near-dup survivor
    // survivors carry clean extracted text and a stable urlkey-hash id
    val rows = out.select(col("urlkey"), col("doc_id"), col("text")).collect()
    rows.foreach { r =>
      assert(!r.getString(2).contains("<"), r.getString(2))
    }
    // the chunked+gzip+latin-1 witness decoded to the exact page text —
    // including the non-ASCII char only a correct charset walk recovers
    val cText = rows.find(_.getString(0) == "https://example.com/c")
      .get.getString(2)
    assert(cText == "a perfectly ordinary café page with plenty of words.",
      cText)

    val st = report.orderBy("stage_idx").collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(st.map(_._1) == Seq("records", "html_pages", "http_ok",
      "url_dedup", "extract", "gate_scrub", "exact_dedup", "near_dedup",
      "substring_dedup"))
    assert(st.map(_._2) == Seq(10L, 9L, 8L, 7L, 7L, 6L, 5L, 4L, 4L), st)
  }

  test("curate mainExtraction: nav/footer boilerplate gone from the corpus text") {
    val spark2 = spark
    import spark2.implicits._
    def page(body: String): String =
      "<html><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
        "<a href=\"/c\">Contact</a></nav><p>" + body +
        "</p><footer>Copyright <a href=\"/t\">terms</a> " +
        "<a href=\"/p\">privacy</a></footer></body></html>"
    val raw = Seq(
      (1L, page((1 to 45).map(i => s"alpha$i").mkString(" "))),
      (2L, page((1 to 45).map(i => s"beta$i").mkString(" ")))
    ).toDF("doc_id", "html")
    val opts = CorpusPipeline.Opts(lineGate = false)
    // tag-strip keeps the nav words in the text; main extraction drops
    // them while keeping every content word
    val (strip, _) = CorpusPipeline.curate(raw, None, opts)
    val stripText = strip.select("text").as[String].collect().mkString(" ")
    assert(stripText.contains("Home") && stripText.contains("Copyright"))
    val (main, _) = CorpusPipeline.curate(raw, None,
      opts.copy(mainExtraction = true))
    val mainText = main.select("text").as[String].collect()
    assert(mainText.length == 2)
    assert(mainText.forall(t => !t.contains("Home") && !t.contains("Copyright")))
    assert(mainText.exists(_.contains("alpha45")) &&
      mainText.exists(_.contains("beta45")))
  }
}
