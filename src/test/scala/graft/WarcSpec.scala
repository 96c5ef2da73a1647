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
}
