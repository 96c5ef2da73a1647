package graft.kernel

/** WARC (Web ARChive, ISO 28500 — the public Common Crawl container)
  * record codec — no archive library.
  *
  * A WARC file is a sequence of records, each a `WARC/1.x` version
  * line, named header fields, an empty line, exactly `Content-Length`
  * bytes of content block, and a two-CRLF separator. Crawl archives
  * ship as `.warc.gz` with ONE GZIP MEMBER PER RECORD concatenated —
  * that layout is what makes per-record random access possible for
  * index servers, and `java.util.zip.GZIPInputStream` walks the
  * concatenated members natively.
  *
  * Parsing is byte-exact: header lines decode as ISO-8859-1 (the spec's
  * octet-transparent reading — URIs are ASCII, and a stray high byte
  * must not throw), the content block is sliced by `Content-Length`
  * alone (never by scanning for separators — bodies routinely contain
  * `WARC/1.0`), and malformed framing fails loudly with an offset. The
  * `response` record's content block is an HTTP/1.x message;
  * [[httpResponse]] splits status line, headers, and body.
  *
  * The writer exists for fixtures and round-trip gates (and is a
  * correct archiver: it computes `Content-Length` from the payload it
  * writes), with both plain and member-per-record gzip framing.
  */
object Warc {

  /** One parsed record. `headers` preserves every field (first-wins on
    * duplicates); the common ones are surfaced as typed accessors. */
  final case class Record(headers: Map[String, String], content: Array[Byte]) {
    private def h(name: String): String =
      headers.getOrElse(name.toLowerCase, "")
    def warcType: String = h("warc-type")
    def targetUri: String = h("warc-target-uri")
    def date: String = h("warc-date")
    def recordId: String = h("warc-record-id")
    def contentType: String = h("content-type")
  }

  /** An HTTP response split out of a `response` record's content block. */
  final case class HttpResponse(status: Int, contentType: String,
      body: Array[Byte])

  /** A record plus its archive location: the byte span `[offset,
    * offset + length)` of the enclosing unit — the GZIP MEMBER for
    * `.warc.gz`, the record's own bytes for plain WARC. Slicing the
    * file at that span and re-parsing yields the record back: the
    * random-access contract a CDX index serves. */
  final case class Located(record: Record, offset: Long, length: Long)

  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Parse a WARC file (plain or gzipped — sniffed) into records. */
  def parseAll(bytes: Array[Byte]): Seq[Record] =
    parseLocated(bytes).map(_.record)

  /** [[parseAll]] with archive offsets — the CDX indexing primitive.
    * Gzipped input walks the concatenated members by the RFC 1952
    * grammar (header flags, raw deflate, CRC32 + ISIZE trailer — both
    * VERIFIED, a crawl archive is untrusted input), so each record
    * carries its member's compressed span; plain input carries record
    * byte spans. */
  def parseLocated(bytes: Array[Byte]): Seq[Located] = {
    if (!isGzip(bytes)) parsePlainLocated(bytes)
    else {
      val out = Seq.newBuilder[Located]
      var off = 0
      while (off < bytes.length) {
        val (plain, end) = gzipMember(bytes, off)
        // the crawl layout is one record per member; a member holding
        // several (spec-legal) locates them all at the member span
        parsePlainLocated(plain).foreach(l =>
          out += Located(l.record, off.toLong, (end - off).toLong))
        off = end
      }
      out.result()
    }
  }

  /** Inflate ONE gzip member starting at `start`; returns (decompressed
    * bytes, offset just past the member's trailer). RFC 1952: fixed
    * 10-byte header, optional FEXTRA/FNAME/FCOMMENT/FHCRC fields, raw
    * deflate stream, 4-byte CRC32 + 4-byte ISIZE trailer. */
  private def gzipMember(b: Array[Byte], start: Int): (Array[Byte], Int) = {
    require(start + 10 <= b.length, s"member at $start: truncated gzip header")
    require((b(start) & 0xff) == 0x1f && (b(start + 1) & 0xff) == 0x8b,
      s"member at $start: bad gzip magic")
    require((b(start + 2) & 0xff) == 8,
      s"member at $start: unsupported compression method ${b(start + 2) & 0xff}")
    val flg = b(start + 3) & 0xff
    var p = start + 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte little-endian length + payload
      require(p + 2 <= b.length, s"member at $start: truncated FEXTRA")
      p += 2 + ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
    }
    if ((flg & 8) != 0) { // FNAME: zero-terminated
      while (p < b.length && b(p) != 0) p += 1
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
      while (p < b.length && b(p) != 0) p += 1
      p += 1
    }
    if ((flg & 2) != 0) p += 2 // FHCRC
    require(p <= b.length, s"member at $start: truncated gzip header fields")
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b, p, b.length - p)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        require(n > 0 || !(inf.needsInput() || inf.needsDictionary()),
          s"member at $start: truncated or invalid deflate stream")
        out.write(buf, 0, n)
      }
      val trailerAt = p + (b.length - p) - inf.getRemaining
      require(trailerAt + 8 <= b.length, s"member at $start: truncated gzip trailer")
      def le32(o: Int): Long =
        (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
          ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      val plain = out.toByteArray
      val crc = new java.util.zip.CRC32()
      crc.update(plain)
      require(crc.getValue == le32(trailerAt),
        s"member at $start: CRC32 mismatch")
      require((plain.length & 0xffffffffL) == le32(trailerAt + 4),
        s"member at $start: ISIZE mismatch")
      (plain, trailerAt + 8)
    } finally inf.end()
  }

  private def parsePlainLocated(bytes: Array[Byte]): Seq[Located] = {
    val out = Seq.newBuilder[Located]
    var off = 0
    // tolerate trailing CRLFs at EOF (the final record's separator)
    def atEnd(o: Int): Boolean = {
      var i = o
      while (i < bytes.length &&
        (bytes(i) == '\r' || bytes(i) == '\n')) i += 1
      i == bytes.length
    }
    while (!atEnd(off)) {
      val recStart = off
      val headerEnd = indexOfDoubleCrlf(bytes, off)
      require(headerEnd >= 0, s"record at $off: unterminated header block")
      val header = new String(bytes, off, headerEnd - off, "ISO-8859-1")
      val lines = header.split("\r\n")
      require(lines.nonEmpty && lines(0).startsWith("WARC/"),
        s"record at $off: bad version line '${lines.headOption.getOrElse("")}'")
      var headers = Map.empty[String, String]
      var i = 1
      while (i < lines.length) {
        val line = lines(i)
        val colon = line.indexOf(':')
        require(colon > 0, s"record at $off: bad header line '$line'")
        val k = line.substring(0, colon).trim.toLowerCase
        val v = line.substring(colon + 1).trim
        if (!headers.contains(k)) headers += k -> v
        i += 1
      }
      val len = headers.getOrElse("content-length",
        throw new IllegalArgumentException(
          s"record at $off: missing Content-Length")).toLong
      require(len >= 0 && len <= Int.MaxValue, s"record at $off: bad length $len")
      val contentStart = headerEnd + 4
      require(contentStart + len <= bytes.length,
        s"record at $off: truncated content (need $len bytes)")
      val content = java.util.Arrays.copyOfRange(
        bytes, contentStart, contentStart + len.toInt)
      off = contentStart + len.toInt
      // consume the record separator (two CRLFs) when present
      var crlf = 0
      while (crlf < 2 && off + 1 < bytes.length &&
          bytes(off) == '\r' && bytes(off + 1) == '\n') {
        off += 2; crlf += 1
      }
      out += Located(Record(headers, content), recStart.toLong,
        (off - recStart).toLong)
    }
    out.result()
  }

  private def indexOfDoubleCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Split a `response` record's content block (an HTTP/1.x message)
    * into status, Content-Type, and body bytes. */
  def httpResponse(content: Array[Byte]): HttpResponse = {
    val headerEnd = indexOfDoubleCrlf(content, 0)
    require(headerEnd >= 0, "HTTP message: unterminated header block")
    val header = new String(content, 0, headerEnd, "ISO-8859-1")
    val lines = header.split("\r\n")
    require(lines.nonEmpty && lines(0).startsWith("HTTP/"),
      s"bad HTTP status line '${lines.headOption.getOrElse("")}'")
    val parts = lines(0).split(" ")
    require(parts.length >= 2, s"bad HTTP status line '${lines(0)}'")
    val status = parts(1).toInt
    val ct = lines.iterator.drop(1)
      .map(l => (l, l.indexOf(':')))
      .collectFirst { case (l, c) if c > 0 &&
          l.substring(0, c).trim.equalsIgnoreCase("content-type") =>
        l.substring(c + 1).trim }
      .getOrElse("")
    HttpResponse(status, ct,
      java.util.Arrays.copyOfRange(content, headerEnd + 4, content.length))
  }

  // writer -----------------------------------------------------------------

  /** Serialize records (ordered header fields + content). Content-Length
    * is computed here, never trusted from the caller. */
  def write(records: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((headers, content) <- records)
      out.write(renderRecord(headers, content))
    out.toByteArray
  }

  /** Serialize with one gzip member per record — the crawl-archive
    * layout ([[parseAll]] walks the concatenated members). */
  def writeGz(records: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((headers, content) <- records) {
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(renderRecord(headers, content))
      gz.finish()
      gz.close() // releases the Deflater; closing the byte sink is a no-op
    }
    out.toByteArray
  }

  private def renderRecord(headers: Seq[(String, String)],
      content: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    for ((k, v) <- headers if !k.equalsIgnoreCase("content-length"))
      sb.append(k).append(": ").append(v).append("\r\n")
    sb.append("Content-Length: ").append(content.length).append("\r\n\r\n")
    val out = new java.io.ByteArrayOutputStream()
    out.write(sb.toString.getBytes("ISO-8859-1"))
    out.write(content)
    out.write("\r\n\r\n".getBytes("ISO-8859-1"))
    out.toByteArray
  }

  /** Render an HTTP/1.1 response message (fixture side of
    * [[httpResponse]]). */
  def renderHttpResponse(status: Int, contentType: String,
      body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.getBytes("ISO-8859-1"))
    out.write(body)
    out.toByteArray
  }
}
