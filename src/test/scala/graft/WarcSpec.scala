package graft

import graft.kernel.Warc
import graft.sources.WarcSource
import org.apache.spark.sql.functions._

/** [[graft.kernel.Warc]] + [[graft.sources.WarcSource]] gates.
  *
  * The central parse test is INDEPENDENT of the writer: a record is
  * hand-assembled as literal bytes from the ISO 28500 grammar. The
  * Content-Length discipline gets its own gate — a body that CONTAINS
  * record framing (`WARC/1.0`, double CRLF) must slice by length alone
  * and survive intact.
  */
class WarcSpec extends SparkSuite {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  test("hand-assembled record parses (grammar, not writer, under test)") {
    val raw = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://example.com/a\r\n" +
      "WARC-Date: 2025-03-04T05:06:07Z\r\n" +
      "WARC-Record-ID: <urn:uuid:1>\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      "Content-Length: 5\r\n" +
      "\r\n" +
      "hello\r\n\r\n").getBytes("ISO-8859-1")
    val recs = Warc.parseAll(raw)
    assert(recs.length == 1)
    assert(recs.head.warcType == "response")
    assert(recs.head.targetUri == "http://example.com/a")
    assert(recs.head.date == "2025-03-04T05:06:07Z")
    assert(new String(recs.head.content, Utf8) == "hello")
  }

  test("bodies containing record framing survive (Content-Length slicing)") {
    val tricky = "line1\r\n\r\nWARC/1.0\r\nContent-Length: 99\r\n\r\nline2"
    val bytes = Warc.write(Seq(
      (Seq("WARC-Type" -> "resource", "WARC-Record-ID" -> "<urn:uuid:t>"),
        tricky.getBytes(Utf8)),
      (Seq("WARC-Type" -> "metadata", "WARC-Record-ID" -> "<urn:uuid:u>"),
        "after".getBytes(Utf8))))
    val recs = Warc.parseAll(bytes)
    assert(recs.length == 2)
    assert(new String(recs(0).content, Utf8) == tricky)
    assert(new String(recs(1).content, Utf8) == "after")
  }

  test("member-per-record gzip round-trips through the concatenated walk") {
    val records = (0 until 5).map { i =>
      (Seq("WARC-Type" -> "resource", "WARC-Record-ID" -> s"<urn:uuid:$i>"),
        s"payload number $i with some content".getBytes(Utf8))
    }
    val gz = Warc.writeGz(records)
    assert(Warc.isGzip(gz))
    val recs = Warc.parseAll(gz)
    assert(recs.length == 5)
    for (i <- 0 until 5)
      assert(new String(recs(i).content, Utf8) ==
        s"payload number $i with some content")
    // plain framing parses identically
    assert(Warc.parseAll(Warc.write(records)).map(_.content.toSeq) ==
      recs.map(_.content.toSeq))
  }

  test("HTTP response split: status, content type, exact body bytes") {
    val body = "<html><body>x &amp; y\r\n\r\nmore</body></html>".getBytes(Utf8)
    val http = Warc.httpResponse(
      Warc.renderHttpResponse(404, "text/html; charset=utf-8", body))
    assert(http.status == 404)
    assert(http.contentType == "text/html; charset=utf-8")
    assert(http.body.toSeq == body.toSeq)
  }

  test("transfer decode: chunked framing, gzip/deflate codings, charset resolution") {
    // dechunk: hand-assembled frame with a chunk extension and trailer
    val chunked = ("4;ext=v\r\nWiki\r\n6\r\npedia \r\nD\r\nin\r\n\r\nchunks.\r\n" +
      "0\r\nTrailer: x\r\n\r\n").getBytes("ISO-8859-1")
    assert(new String(Warc.dechunk(chunked), Utf8) ==
      "Wikipedia in\r\n\r\nchunks.")
    // chunkBytes → dechunk round-trip at awkward sizes
    val payload = ("x" * 23).getBytes(Utf8)
    for (sz <- Seq(1, 7, 23, 100))
      assert(Warc.dechunk(Warc.chunkBytes(payload, sz)).toSeq == payload.toSeq)
    // malformed chunk framing is loud
    intercept[IllegalArgumentException](
      Warc.dechunk("zz\r\nabc\r\n0\r\n\r\n".getBytes("ISO-8859-1")))
    intercept[IllegalArgumentException](
      Warc.dechunk("5\r\nab".getBytes("ISO-8859-1")))

    val text = "résumé Straße €uro"
    def resp(headers: Seq[(String, String)], wire: Array[Byte]) =
      Warc.httpResponse(Warc.renderHttpResponse(200, headers, wire))
    // gzip Content-Encoding
    assert(Warc.decodeText(resp(
      Seq("Content-Type" -> "text/html; charset=utf-8",
        "Content-Encoding" -> "gzip"),
      Warc.gzipBytes(text.getBytes(Utf8)))) == text)
    // deflate: zlib-wrapped AND the real-world raw form both decode
    assert(Warc.decodeText(resp(
      Seq("Content-Type" -> "text/html; charset=utf-8",
        "Content-Encoding" -> "deflate"),
      Warc.zlibBytes(text.getBytes(Utf8)))) == text)
    val rawDeflater = new java.util.zip.Deflater(-1, true)
    rawDeflater.setInput(text.getBytes(Utf8)); rawDeflater.finish()
    val rawBuf = new Array[Byte](1 << 16)
    val rawLen = rawDeflater.deflate(rawBuf)
    rawDeflater.end()
    assert(Warc.decodeText(resp(
      Seq("Content-Type" -> "text/html; charset=utf-8",
        "Content-Encoding" -> "deflate"),
      java.util.Arrays.copyOf(rawBuf, rawLen))) == text)
    // chunked over gzip: framing comes off first, then the coding
    assert(Warc.decodeText(resp(
      Seq("Content-Type" -> "text/html; charset=utf-8",
        "Content-Encoding" -> "gzip", "Transfer-Encoding" -> "chunked"),
      Warc.chunkBytes(Warc.gzipBytes(text.getBytes(Utf8)), 5))) == text)
    // ISO-8859-1 via the Content-Type param: 0xE9 must come back as é
    assert(Warc.decodeText(resp(
      Seq("Content-Type" -> "text/html; charset=iso-8859-1"),
      "café".getBytes("ISO-8859-1"))) == "café")
    // windows-1252 via <meta> sniff only (bare text/html): € is 0x80
    val metaPage = "<html><head><meta charset=windows-1252></head>" +
      "<body>pay in € now</body></html>"
    assert(Warc.decodeText(resp(
      Seq("Content-Type" -> "text/html"),
      metaPage.getBytes("windows-1252"))) == metaPage)
    // unknown charset label falls back to UTF-8, malformed bytes → U+FFFD
    assert(Warc.decodeText(resp(
      Seq("Content-Type" -> "text/html; charset=no-such-charset"),
      Array[Byte]('o', 'k', 0xFF.toByte))) == "ok�")
    // unsupported content coding is loud, not garbage
    val e = intercept[IllegalArgumentException](Warc.decodedBody(resp(
      Seq("Content-Type" -> "text/html", "Content-Encoding" -> "br"),
      "x".getBytes(Utf8))))
    assert(e.getMessage.contains("br"))
  }

  test("revisit archiving: digest-matched fetches empty out, cdx indexes them by header digest") {
    import graft.sources.WarcSource
    val spark2 = spark
    import spark2.implicits._
    val fetches = Seq(
      ("https://a.com/new", "2025-03-01T00:00:00Z",
        "fresh content body".getBytes(Utf8)),
      ("https://a.com/again", "2025-03-01T00:00:00Z",
        "previously stored body".getBytes(Utf8))).toDF("url", "warc_date", "body")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    val knownDigest = sha.digest("previously stored body".getBytes(Utf8))
      .map("%02x".format(_)).mkString
    val stored = Seq((knownDigest, "https://b.com/original"))
      .toDF("digest", "url")
    val segments = WarcSource.archiveWithRevisits(fetches, stored, nSegs = 2)
    val recs = segments.as[(String, Array[Byte])].collect()
      .flatMap { case (_, bytes) => graft.kernel.Warc.parseAll(bytes) }
    assert(recs.length == 2)
    val rev = recs.find(_.warcType == "revisit").get
    assert(rev.targetUri == "https://a.com/again")
    assert(rev.content.isEmpty) // re-fetch costs headers, not bytes
    assert(rev.headers("warc-refers-to-target-uri") == "https://b.com/original")
    assert(rev.headers("warc-payload-digest") == s"sha-256:$knownDigest")
    val resp = recs.find(_.warcType == "response").get
    assert(new String(graft.kernel.Warc.httpResponse(resp.content).body, Utf8)
      == "fresh content body")
    // the CDX index sees BOTH captures: the revisit row resolves to the
    // ORIGINAL payload digest via the header, with the standard marker
    val cdx = WarcSource.cdxRows(segments)
      .select("url", "mime", "status", "digest").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getInt(2), r.getString(3)))
      .toMap
    assert(cdx("https://a.com/again") == (("warc/revisit", 0, knownDigest)))
    assert(cdx("https://a.com/new")._1 == "text/html")
    assert(cdx("https://a.com/new")._3 != knownDigest)
  }

  test("continuous-crawl revisit loop: batch 2 re-fetches archive empty against batch 1's index") {
    import graft.sources.WarcSource
    val spark2 = spark
    import spark2.implicits._
    def batchDf(rows: Seq[(String, String)]) =
      rows.map { case (url, body) =>
        (url, "2025-04-01T00:00:00Z", body.getBytes(Utf8)) }
        .toDF("url", "warc_date", "body")
    // batch 1: two novel pages — archives as full responses
    val arch1 = WarcSource.archiveWithRevisits(
      batchDf(Seq(("https://a.com/p1", "page one body"),
        ("https://a.com/p2", "page two body"))),
      Seq.empty[(String, String)].toDF("digest", "url"))
    val cdx1 = WarcSource.cdxRows(arch1)
    assert(cdx1.filter(col("mime") === "warc/revisit").count() == 0)
    // batch 2: one new page + one re-serve of p1's exact payload from a
    // DIFFERENT url — the index built from batch 1's own archive must
    // turn it into a revisit referencing p1
    val arch2 = WarcSource.archiveWithRevisits(
      batchDf(Seq(("https://b.com/mirror-of-p1", "page one body"),
        ("https://a.com/p3", "page three body"))),
      cdx1.select(col("digest"), col("url")))
    val recs2 = arch2.as[(String, Array[Byte])].collect()
      .flatMap { case (_, b) => graft.kernel.Warc.parseAll(b) }
    val rev = recs2.find(_.warcType == "revisit").get
    assert(rev.targetUri == "https://b.com/mirror-of-p1")
    assert(rev.headers("warc-refers-to-target-uri") == "https://a.com/p1")
    assert(rev.content.isEmpty)
    assert(recs2.count(_.warcType == "response") == 1)
    // and the batch-2 index keeps the chain queryable: the revisit row
    // resolves to p1's payload digest
    val d1 = cdx1.filter(col("url") === "https://a.com/p1")
      .select("digest").head().getString(0)
    val cdx2 = WarcSource.cdxRows(arch2)
    assert(cdx2.filter(col("mime") === "warc/revisit")
      .select("digest").head().getString(0) == d1)
  }

  test("c04 witness: robots→sitemap→freshness→cdxAdmit loop over never-captured/stale/fresh") {
    import graft.sources.Frontier
    val spark2 = spark
    import spark2.implicits._
    val ixDir = new java.io.File(tempDir("c04ix"), "ix").getAbsolutePath
    def segment(date: String, pages: (String, String)*): org.apache.spark.sql.DataFrame =
      Seq((s"file:/crawl/$date.warc.gz", Warc.writeGz(pages.map { case (u, body) =>
        (Seq(
          "WARC-Type" -> "response",
          "WARC-Target-URI" -> u,
          "WARC-Record-ID" -> s"<urn:uuid:$u-$date>",
          "WARC-Date" -> date,
          "Content-Type" -> "application/http;msgtype=response"),
          Warc.renderHttpResponse(200, Seq("Content-Type" -> "text/html"),
            body.getBytes(Utf8)))
      }))).toDF("path", "content")
    // batch 0 seeds the capture index: /stale and /fresh captured 02-05 12:00
    WarcSource.cdxAdmit(segment("2025-02-05T12:00:00Z",
      "https://a.com/stale" -> "<html>old stale body</html>",
      "https://a.com/fresh" -> "<html>fresh body</html>"), ixDir)
    // the re-crawl scheduler's chain: robots directives → sitemap parse →
    // freshness against the stored index
    val robots = Seq(("a.com",
      "Sitemap: https://a.com/sm.xml\nUser-agent: *\nDisallow: /tmp\n"))
      .toDF("host", "robots_txt")
    val directives = Frontier.robotsSitemaps(robots)
    assert(directives.select("sitemap_url").as[String].collect().toSeq ==
      Seq("https://a.com/sm.xml"))
    val xml = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>https://a.com/new</loc>" +
      "<lastmod>2025-02-05T10:00:00Z</lastmod></url>" +
      "<url><loc>https://a.com/stale</loc><lastmod>2025-02-06</lastmod></url>" +
      "<url><loc>https://a.com/fresh</loc>" +
      "<lastmod>2025-02-04T00:00:00Z</lastmod></url></urlset>"
    val seeds = Frontier.sitemapSeeds(
      directives.select(col("host")).withColumn("sitemap_xml", lit(xml)))
    def dueSet(): Set[String] = Frontier.recrawlDue(seeds,
        spark2.read.parquet(ixDir).select(col("url"), col("ts")))
      .filter(col("due")).select("url").as[String].collect().toSet
    // pass 1: never-captured due; stale (lastmod 02-06 > capture 02-05)
    // due; fresh (lastmod 02-04 < capture) not due
    assert(dueSet() == Set("https://a.com/new", "https://a.com/stale"))
    // fetch the due URLs, screen through the REAL admission step
    val verdicts = WarcSource.cdxAdmit(segment("2025-02-07T09:00:00Z",
      "https://a.com/new" -> "<html>new page body</html>",
      "https://a.com/stale" -> "<html>rewritten stale body</html>"), ixDir)
      .select(col("url"), col("verdict")).as[(String, String)].collect().toMap
    assert(verdicts("https://a.com/new") == "novel")
    assert(verdicts("https://a.com/stale") == "url_dup")
    // pass 2: the loop CLOSED — the admitted /new capture (02-07) now
    // out-dates its lastmod, so only /stale (url_dup, not re-admitted,
    // capture unchanged) stays due
    assert(dueSet() == Set("https://a.com/stale"))
  }

  test("htmlResponses: undecodable transfer coding skips in lenient mode, throws in strict") {
    import graft.sources.WarcSource
    val spark2 = spark
    import spark2.implicits._
    def respRec(uri: String, headers: Seq[(String, String)], body: Array[Byte]) =
      (Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Record-ID" -> s"<urn:uuid:$uri>",
        "WARC-Date" -> "2025-01-01T00:00:00Z",
        "Content-Type" -> "application/http;msgtype=response"),
        Warc.renderHttpResponse(200, headers, body))
    val gz = Warc.writeGz(Seq(
      respRec("http://ok.example.com/", Seq("Content-Type" -> "text/html"),
        "<html><body>fine page</body></html>".getBytes(Utf8)),
      // a coding this engine has no codec for — the record a real crawl
      // WILL contain and a crawl-scale extraction must survive
      respRec("http://br.example.com/", Seq("Content-Type" -> "text/html",
        "Content-Encoding" -> "br"), Array[Byte](1, 2, 3)),
      // a CORRUPT gzip body (valid magic, garbage stream) — GZIPInputStream
      // throws ZipException (an IOException, not IllegalArgumentException);
      // the lenient catch must cover it or one bad record kills the job
      respRec("http://corruptgz.example.com/", Seq("Content-Type" -> "text/html",
        "Content-Encoding" -> "gzip"),
        Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0, 99, 98, 97)),
      // a TRUNCATED but well-started gzip body → EOFException mid-inflate
      respRec("http://truncgz.example.com/", Seq("Content-Type" -> "text/html",
        "Content-Encoding" -> "gzip"),
        Warc.gzipBytes("<html><body>cut off mid-stream page</body></html>"
          .getBytes(Utf8)).dropRight(12)),
      respRec("http://ok2.example.com/", Seq("Content-Type" -> "text/html"),
        "<html><body>also fine</body></html>".getBytes(Utf8)),
      // a response record whose HTTP HEAD is garbage (no status line) —
      // head parsing must sit inside the lenient scope too
      (Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://badhead.example.com/",
        "WARC-Record-ID" -> "<urn:uuid:badhead>",
        "WARC-Date" -> "2025-01-01T00:00:00Z",
        "Content-Type" -> "application/http;msgtype=response"),
        "THIS IS NOT AN HTTP RESPONSE".getBytes(Utf8))))
    val segments = Seq(("file:/crawl/mix.warc.gz", gz)).toDF("path", "content")
    val recs = WarcSource.records(segments)
    val lenient = WarcSource.htmlResponses(recs)
      .select("url").collect().map(_.getString(0)).sorted.toSeq
    assert(lenient == Seq("http://ok.example.com/", "http://ok2.example.com/"))
    val e = intercept[org.apache.spark.SparkException](
      WarcSource.htmlResponses(recs, lenient = false).collect())
    assert(e.getMessage != null)
  }

  test("hostile inputs fail loudly") {
    // missing Content-Length
    val noLen = ("WARC/1.0\r\nWARC-Type: resource\r\n\r\nbody\r\n\r\n")
      .getBytes("ISO-8859-1")
    val e1 = intercept[IllegalArgumentException](Warc.parseAll(noLen))
    assert(e1.getMessage.contains("Content-Length"))
    // truncated content
    val short = ("WARC/1.0\r\nContent-Length: 50\r\n\r\nonly-a-few")
      .getBytes("ISO-8859-1")
    val e2 = intercept[IllegalArgumentException](Warc.parseAll(short))
    assert(e2.getMessage.contains("truncated"))
    // bad version line
    val bad = ("HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
      .getBytes("ISO-8859-1")
    val e3 = intercept[IllegalArgumentException](Warc.parseAll(bad))
    assert(e3.getMessage.contains("version"))
    // HTTP message with no header terminator
    intercept[IllegalArgumentException](
      Warc.httpResponse("HTTP/1.1 200 OK\r\npartial".getBytes(Utf8)))
  }

  test("streaming segment ingestion: landed archives parse on the stream, batch parity") {
    import graft.streaming.EventStream
    val dir = tempDir("graft_warc_stream")
    def response(uri: String, body: String) =
      (Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> "2025-01-01T00:00:00Z",
        "WARC-Record-ID" -> s"<urn:uuid:$uri>",
        "Content-Type" -> "application/http;msgtype=response"),
        Warc.renderHttpResponse(200, "text/html", body.getBytes(Utf8)))
    // two segments "landed by the fetcher", one file per micro-batch
    java.nio.file.Files.write(new java.io.File(dir, "s1.warc.gz").toPath,
      Warc.writeGz(Seq(
        response("http://example.com/a", "<html><body><p>alpha page</p></body></html>"),
        response("http://example.com/b", "<html><body><p>beta page</p></body></html>"))))
    java.nio.file.Files.write(new java.io.File(dir, "s2.warc.gz").toPath,
      Warc.writeGz(Seq(
        response("http://example.com/c", "<html><body><p>gamma page</p></body></html>"))))

    val stream = WarcSource.scanStream(spark, dir.getAbsolutePath,
      maxFilesPerTrigger = Some(1))
    val pages = WarcSource.htmlResponses(stream)
      .withColumn("text", graft.operators.Curate.htmlToText(col("html")))
      .select(col("url"), col("http_status"), col("text"))
    val q = EventStream.runToMemory(pages, "warc_pages")
    try {
      val got = spark.table("warc_pages").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sortBy(_._1)
      assert(got.toSeq == Seq(
        ("http://example.com/a", 200, "alpha page"),
        ("http://example.com/b", 200, "beta page"),
        ("http://example.com/c", 200, "gamma page")))
      // batch parity: the same directory through the batch scan
      val batch = WarcSource.htmlResponses(
          WarcSource.scan(spark, dir.getAbsolutePath))
        .withColumn("text", graft.operators.Curate.htmlToText(col("html")))
        .select(col("url"), col("http_status"), col("text"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .sortBy(_._1)
      assert(batch.toSeq == got.toSeq)
    } finally q.stop()
  }

  test("file scan + glob prune + html extraction feed the curation chain") {
    val dir = tempDir("graft_warc")
    def seg(name: String, records: Seq[(Seq[(String, String)], Array[Byte])]): Unit =
      java.nio.file.Files.write(
        new java.io.File(dir, name).toPath, Warc.writeGz(records))
    def response(uri: String, ct: String, body: String) =
      (Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> "2025-01-01T00:00:00Z",
        "WARC-Record-ID" -> s"<urn:uuid:$uri>",
        "Content-Type" -> "application/http;msgtype=response"),
        Warc.renderHttpResponse(200, ct, body.getBytes(Utf8)))
    seg("a.warc.gz", Seq(
      (Seq("WARC-Type" -> "warcinfo", "WARC-Record-ID" -> "<urn:uuid:i>",
        "Content-Type" -> "application/warc-fields"),
        "software: test\r\n".getBytes(Utf8)),
      response("http://example.com/1", "text/html",
        "<html><body><p>first page</p></body></html>"),
      response("http://example.com/img", "image/png", "notapage")))
    seg("b.warc.gz", Seq(
      response("http://example.com/2", "text/html; charset=utf-8",
        "<html><body><h1>T</h1><p>second &amp; page</p></body></html>")))
    // a decoy the listing-time glob must prune (invalid bytes — reading
    // it would throw, so a pass proves the prune happened at listing)
    java.nio.file.Files.write(
      new java.io.File(dir, "notes.txt").toPath, "not a warc".getBytes(Utf8))

    val records = WarcSource.scan(spark, dir.getAbsolutePath)
    assert(records.count() == 4) // 1 warcinfo + 3 responses
    val pages = WarcSource.htmlResponses(records)
      .withColumn("text", graft.operators.Curate.htmlToText(col("html")))
      .select(col("url"), col("http_status"), col("text"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(_._1)
    assert(pages.toSeq == Seq(
      ("http://example.com/1", 200, "first page"),
      ("http://example.com/2", 200, "T\nsecond & page")))
  }

  // ---- CDX / record-offset gates (w02) ----

  private def sampleRecords(n: Int) = (0 until n).map { i =>
    (Seq("WARC-Type" -> "resource", "WARC-Record-ID" -> s"<urn:uuid:$i>"),
      s"payload number $i with some content".getBytes(Utf8))
  }

  test("parseLocated: spans tile the archive and every slice re-parses (gzip + plain)") {
    for (bytes <- Seq(Warc.writeGz(sampleRecords(5)), Warc.write(sampleRecords(5)))) {
      val located = Warc.parseLocated(bytes)
      assert(located.length == 5)
      // spans tile: offset 0, contiguous, summing to the file length
      assert(located.head.offset == 0L)
      located.sliding(2).foreach { case Seq(a, b) =>
        assert(a.offset + a.length == b.offset, s"gap after ${a.offset}") }
      assert(located.last.offset + located.last.length == bytes.length)
      // THE random-access contract: the slice alone re-parses to the record
      located.foreach { loc =>
        val slice = java.util.Arrays.copyOfRange(bytes,
          loc.offset.toInt, (loc.offset + loc.length).toInt)
        val back = Warc.parseAll(slice)
        assert(back.length == 1)
        assert(back.head.headers == loc.record.headers)
        assert(back.head.content.toSeq == loc.record.content.toSeq)
      }
    }
  }

  test("gzip member grammar: FNAME/FCOMMENT/FEXTRA/FHCRC headers parse; corruption is loud") {
    val one = Warc.writeGz(sampleRecords(1))
    val deflateAndTrailer = java.util.Arrays.copyOfRange(one, 10, one.length)
    def member(flg: Int, fields: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, flg.toByte,
        0, 0, 0, 0, 0, 0))
      out.write(fields)
      out.write(deflateAndTrailer)
      out.toByteArray
    }
    // FNAME (8), FCOMMENT (16): zero-terminated strings
    assert(Warc.parseAll(member(8, ("seg.warc".getBytes("ISO-8859-1") :+ 0.toByte)))
      .length == 1)
    assert(Warc.parseAll(member(16, ("a comment".getBytes("ISO-8859-1") :+ 0.toByte)))
      .length == 1)
    // FEXTRA (4): little-endian length + payload
    assert(Warc.parseAll(member(4, Array[Byte](3, 0, 9, 9, 9))).length == 1)
    // FHCRC (2): CRC16 of the header bytes
    val hdr = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 2, 0, 0, 0, 0, 0, 0)
    val crc = new java.util.zip.CRC32(); crc.update(hdr)
    val c = crc.getValue
    assert(Warc.parseAll(member(2,
      Array[Byte]((c & 0xff).toByte, ((c >> 8) & 0xff).toByte))).length == 1)
    // stacked members with fancy headers still walk
    val stacked = member(8, ("x".getBytes("ISO-8859-1") :+ 0.toByte)) ++ one
    assert(Warc.parseLocated(stacked).map(_.offset).toSeq ==
      Seq(0L, (one.length + 2).toLong))
    // corrupted CRC32 trailer: loud, not silent garbage
    val bad = one.clone(); bad(one.length - 6) = (bad(one.length - 6) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](Warc.parseAll(bad))
    assert(e.getMessage.contains("CRC32"))
    // truncated member: loud
    assertThrows[IllegalArgumentException](
      Warc.parseAll(java.util.Arrays.copyOfRange(one, 0, one.length - 4)))
  }

  test("cdx stream + sorted write: stream/batch parity, global key order across shards") {
    import graft.streaming.EventStream
    val dir = tempDir("graft_cdx_stream")
    def response(uri: String, date: String, body: String) =
      (Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> date,
        "WARC-Record-ID" -> s"<urn:uuid:$uri>",
        "Content-Type" -> "application/http;msgtype=response"),
        Warc.renderHttpResponse(200, "text/html", body.getBytes(Utf8)))
    // three segments landing with interleaved key ranges, so the sorted
    // write has real re-ordering to do
    for ((name, urls) <- Seq(
        ("s1.warc.gz", Seq("http://site-c.com/1", "http://site-a.com/9")),
        ("s2.warc.gz", Seq("http://site-b.com/5", "http://site-d.com/2")),
        ("s3.warc.gz", Seq("http://site-a.com/1", "http://site-c.com/7"))))
      java.nio.file.Files.write(new java.io.File(dir, name).toPath,
        Warc.writeGz(urls.zipWithIndex.map { case (u, i) =>
          response(u, s"2025-02-0${i + 1}T00:00:00Z", s"page at $u") }))

    val q = EventStream.runToMemory(
      WarcSource.cdxStream(spark, dir.getAbsolutePath,
        maxFilesPerTrigger = Some(1)), "cdx_stream")
    try {
      val streamed = spark.table("cdx_stream")
        .select("urlkey", "ts", "digest").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
      val batch = WarcSource.cdxIndex(spark, dir.getAbsolutePath)
        .select("urlkey", "ts", "digest").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
      assert(streamed.length == 6)
      assert(streamed.toSeq == batch.toSeq, "stream/batch parity")
    } finally q.stop()

    // sorted serving layout: shard files carry disjoint ascending key
    // ranges and each file is internally sorted — global order without
    // any single-task sort
    val out = tempDir("graft_cdx_out").getAbsolutePath
    WarcSource.cdxWrite(
      WarcSource.cdxIndex(spark, dir.getAbsolutePath), out, nShards = 3)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length > 1, "want several shards to prove global order")
    val perFile = files.map { f =>
      spark.read.parquet(f).select("urlkey", "ts").collect()
        .map(r => (r.getString(0), r.getString(1)))
    }.filter(_.nonEmpty)
    perFile.foreach { rows =>
      assert(rows.sameElements(rows.sorted), "shard not internally sorted")
    }
    val all = perFile.flatten
    assert(all.length == 6)
    // concatenating shards in SOME file order yields the global order —
    // ranges must be disjoint, so sorting files by their min key works
    val byMin = perFile.sortBy(_.head)
    assert(byMin.flatten.sameElements(all.sorted), "shard ranges overlap")
  }

  test("continuous-crawl admission loop: verdicts against the GROWN index, batch order honored") {
    val spark2 = spark
    import spark2.implicits._
    def response(uri: String, body: String) =
      (Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> "2025-01-01T00:00:00Z",
        "WARC-Record-ID" -> s"<urn:uuid:$uri>",
        "Content-Type" -> "application/http;msgtype=response"),
        Warc.renderHttpResponse(200, "text/html", body.getBytes(Utf8)))
    val segDir = tempDir("graft_cdx_admit_in")
    def stage(name: String, mtime: Long,
        pages: Seq[(String, String)]): Unit = {
      val f = new java.io.File(segDir, name)
      java.nio.file.Files.write(f.toPath,
        Warc.writeGz(pages.map { case (u, b) => response(u, b) }))
      f.setLastModified(mtime) // the file source orders by mtime
    }
    stage("b1.warc.gz", 1000000L, Seq(
      ("https://a.com/u1", "body A"), ("https://a.com/u2", "body B")))
    stage("b2.warc.gz", 2000000L, Seq(
      ("https://a.com/u1", "body A CHANGED"), // url known from b1
      ("https://a.com/u3", "body B"),         // content known from b1
      ("https://a.com/u4", "body D")))        // novel
    stage("b3.warc.gz", 3000000L, Seq(
      ("https://a.com/u4", "body D2"),        // url admitted in b2!
      ("https://a.com/u5", "body E")))        // novel

    val ixDir = new java.io.File(tempDir("graft_cdx_admit_ix"), "ix")
      .getAbsolutePath
    val verdicts = scala.collection.mutable.Map.empty[String, String]
    val q = WarcSource.segmentStream(spark, segDir.getAbsolutePath,
        maxFilesPerTrigger = Some(1))
      .writeStream.foreachBatch {
        (df: org.apache.spark.sql.DataFrame, _: Long) =>
          verdicts ++= WarcSource.cdxAdmit(df, ixDir).collect()
            .map(r => r.getString(1) -> r.getString(3))
          ()
      }.start()
    try q.processAllAvailable() finally q.stop()

    // the map keeps each url's LAST verdict: u1 was novel in batch 1,
    // then url_dup on the batch-2 re-fetch; u4's batch-3 re-fetch is
    // caught against the index GROWN in batch 2
    assert(verdicts == Map(
      "https://a.com/u1" -> "url_dup",
      "https://a.com/u2" -> "novel",
      "https://a.com/u3" -> "content_dup",
      "https://a.com/u4" -> "url_dup",
      "https://a.com/u5" -> "novel"))
    // and the admitted set is exactly the novel captures
    val index = spark.read.parquet(ixDir)
      .select("urlkey").collect().map(_.getString(0)).sorted.toSeq
    assert(index == Seq("https://a.com/u1", "https://a.com/u2",
      "https://a.com/u4", "https://a.com/u5"))
  }

  test("cdxDedup: url precedence over content; distinct-key probes; novel passes") {
    val spark2 = spark
    import spark2.implicits._
    val stored = Seq(
      ("https://a.com/p", "https://a.com/p", "dA"),
      ("https://a.com/q", "https://a.com/q", "dB"),
      // duplicate historic captures of one key must not explode the probe
      ("https://a.com/q", "https://a.com/q", "dB"))
      .toDF("urlkey", "url", "digest")
    val batch = Seq(
      ("https://a.com/p", "https://a.com/p", "dA"), // both known → url_dup
      ("https://a.com/new1", "https://a.com/new1", "dB"), // digest only
      ("https://a.com/new2", "https://a.com/new2", "dZ")) // neither
      .toDF("urlkey", "url", "digest")
    val got = WarcSource.cdxDedup(batch, stored)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got == Map(
      "https://a.com/p" -> "url_dup",
      "https://a.com/new1" -> "content_dup",
      "https://a.com/new2" -> "novel"))
    // batch row count preserved (the distinct-key probes cannot fan out)
    assert(WarcSource.cdxDedup(batch, stored).count() == 3L)
  }

  test("cdx rows: fields, pointer fetch, and planted normalization") {
    val spark2 = spark
    import spark2.implicits._
    def response(uri: String, date: String, status: Int, ct: String,
        body: String) =
      (Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> date,
        "WARC-Record-ID" -> s"<urn:uuid:$uri>",
        "Content-Type" -> "application/http;msgtype=response"),
        Warc.renderHttpResponse(status, ct, body.getBytes(Utf8)))
    val gz = Warc.writeGz(Seq(
      (Seq("WARC-Type" -> "warcinfo", "WARC-Record-ID" -> "<urn:uuid:i>",
        "Content-Type" -> "application/warc-fields"),
        "software: test\r\n".getBytes(Utf8)),
      response("https://WWW.Example.com:443/a?utm_source=x&k=1",
        "2025-06-07T08:09:10Z", 200, "text/html; charset=utf-8", "page a"),
      response("http://example.com/b", "2025-06-07T08:09:11Z", 404,
        "text/plain", "gone")))
    val rows = WarcSource.cdxRows(
        Seq(("file:/crawl/seg-0.warc.gz", gz)).toDF("path", "content"))
      .orderBy(col("ts")).collect()
    assert(rows.length == 2) // the warcinfo record is not a capture
    val a = rows(0)
    assert(a.getString(0) == "https://example.com/a?k=1") // urlkey normalized
    assert(a.getString(1) == "20250607080910")
    assert(a.getString(3) == "text/html") // parameters stripped
    assert(a.getInt(4) == 200)
    assert(a.getString(6) == "seg-0.warc.gz")
    assert(rows(1).getInt(4) == 404)
    // the pointer FETCHES: slice the archive at (offset, length), parse,
    // and the body digest matches the indexed digest — the full
    // random-access loop an index server runs
    rows.foreach { r =>
      val slice = java.util.Arrays.copyOfRange(gz,
        r.getLong(7).toInt, (r.getLong(7) + r.getLong(8)).toInt)
      val rec = Warc.parseAll(slice).head
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      val digest = sha.digest(Warc.httpResponse(rec.content).body)
        .map("%02x".format(_)).mkString
      assert(digest == r.getString(5), s"pointer fetch at ${r.getLong(7)}")
    }
  }
}
