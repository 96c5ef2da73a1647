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

  /** An HTTP response split out of a `response` record's content block.
    * `body` is the message body AS CAPTURED ON THE WIRE — still chunked
    * and/or content-coded if the origin served it that way; [[decodedBody]]
    * / [[decodeText]] undo the transfer layers. `headers` carries every
    * response header (lowercased names, first-wins). */
  final case class HttpResponse(status: Int, contentType: String,
      body: Array[Byte], headers: Map[String, String] = Map.empty) {
    def header(name: String): String = headers.getOrElse(name.toLowerCase, "")
  }

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
    val hs = lines.iterator.drop(1)
      .map(l => (l, l.indexOf(':')))
      .collect { case (l, c) if c > 0 =>
        l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim }
      .toSeq
    val headers = hs.foldLeft(Map.empty[String, String]) { case (m, (k, v)) =>
      if (m.contains(k)) m else m + (k -> v) // first-wins, like Record
    }
    HttpResponse(status, headers.getOrElse("content-type", ""),
      java.util.Arrays.copyOfRange(content, headerEnd + 4, content.length),
      headers)
  }

  // HTTP transfer decoding --------------------------------------------------
  //
  // Real crawl archives capture the response body AS SERVED: routinely
  // `Transfer-Encoding: chunked` (RFC 9112 §7.1), `Content-Encoding:
  // gzip`/`deflate` (RFC 9110 §8.4), and charsets other than UTF-8.
  // Feeding such records straight into a UTF-8 decode produces silent
  // mojibake in the curation chain — the r11 VERDICT's top real-input
  // hole. Decoding order mirrors the wire: chunked framing comes OFF
  // first (it is applied last), then the content coding, then charset.

  /** The body with transfer layers undone: de-chunked if
    * `Transfer-Encoding: chunked`, then gunzipped/inflated per
    * `Content-Encoding`. Unknown content codings (br, zstd — no JVM
    * codec in this engine) fail LOUDLY rather than pass garbage
    * downstream. */
  def decodedBody(http: HttpResponse): Array[Byte] = {
    var b = http.body
    if (http.header("transfer-encoding").toLowerCase.contains("chunked"))
      b = dechunk(b)
    http.header("content-encoding").trim.toLowerCase match {
      case "" | "identity" => b
      case "gzip" | "x-gzip" => gunzip(b)
      case "deflate" => inflateAuto(b)
      case other => throw new IllegalArgumentException(
        s"unsupported Content-Encoding '$other'")
    }
  }

  /** The response body as TEXT: transfer layers undone, charset resolved
    * from the `Content-Type` charset parameter with a `<meta charset>` /
    * `<meta http-equiv>` sniff of the first 1024 decoded bytes as
    * fallback (the WHATWG order, bounded), UTF-8 default. Malformed or
    * unmappable byte sequences decode to U+FFFD — a crawl must never
    * die on one broken page's encoding. */
  def decodeText(http: HttpResponse): String = {
    val bytes = decodedBody(http)
    val cs = charsetOf(http.contentType, bytes)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  private val CharsetParam =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*\"?'?([A-Za-z0-9._:-]+)")

  /** Charset from the Content-Type parameter, else a bounded `<meta>`
    * sniff, else UTF-8; unknown/unsupported names fall back to UTF-8
    * (real crawls carry typo'd charset labels constantly). */
  def charsetOf(contentType: String, body: Array[Byte]): java.nio.charset.Charset = {
    def find(s: String): Option[String] = {
      val m = CharsetParam.matcher(s)
      if (m.find()) Some(m.group(1)) else None
    }
    val name = find(contentType).orElse {
      // the sniff window decodes as ISO-8859-1: single-byte total, so a
      // binary prefix can't throw, and ASCII markup reads through
      val head = new String(body, 0, math.min(body.length, 1024), "ISO-8859-1")
      find(head)
    }
    name.flatMap { n =>
      try Some(java.nio.charset.Charset.forName(n))
      catch { case _: Exception => None }
    }.getOrElse(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Undo `Transfer-Encoding: chunked` (RFC 9112 §7.1): hex size line
    * (chunk extensions after `;` ignored), that many bytes, CRLF,
    * repeat; a zero-size chunk ends the body (trailer fields after it
    * are framing, not body — skipped). Malformed framing fails loudly
    * with an offset. */
  def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    def crlfFrom(from: Int): Int = {
      var j = from
      while (j + 1 < b.length) {
        if (b(j) == '\r' && b(j + 1) == '\n') return j
        j += 1
      }
      -1
    }
    while (true) {
      val eol = crlfFrom(i)
      require(eol >= 0, s"chunked body: unterminated size line at $i")
      val line = new String(b, i, eol - i, "ISO-8859-1")
      val sizeStr = line.split(";", 2)(0).trim
      val size =
        try java.lang.Long.parseLong(sizeStr, 16)
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"chunked body: bad chunk size '$sizeStr' at $i") }
      require(size >= 0 && size <= Int.MaxValue,
        s"chunked body: chunk size $size out of range at $i")
      i = eol + 2
      if (size == 0) return out.toByteArray
      require(i + size + 2 <= b.length, s"chunked body: truncated chunk at $i")
      out.write(b, i, size.toInt)
      i += size.toInt
      require(b(i) == '\r' && b(i + 1) == '\n',
        s"chunked body: missing chunk CRLF at $i")
      i += 2
    }
    out.toByteArray // unreachable
  }

  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    try in.readAllBytes() finally in.close()
  }

  /** `deflate` content coding: RFC-correct is zlib-wrapped (RFC 1950),
    * but a long tail of real servers send RAW deflate — try zlib first,
    * fall back to raw on a wrapper error (the standard lenient walk). */
  private def inflateAuto(b: Array[Byte]): Array[Byte] =
    try inflateWith(b, nowrap = false)
    catch { case _: java.util.zip.ZipException |
                 _: java.util.zip.DataFormatException =>
      inflateWith(b, nowrap = true) }

  private def inflateWith(b: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val inf = new java.util.zip.Inflater(nowrap)
    try {
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) {
          require(!inf.needsInput() && !inf.needsDictionary(),
            "deflate body: truncated stream")
        } else out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  // fixture-side encoders (round-trip gates encode with these, decode
  // through the real path above)
  def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(b); gz.finish(); gz.close()
    out.toByteArray
  }

  def zlibBytes(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Chunk-frame a body (fixture side of [[dechunk]]); one chunk carries
    * a chunk extension so the parser's `;` split is exercised. */
  def chunkBytes(b: Array[Byte], chunkSize: Int): Array[Byte] = {
    require(chunkSize >= 1, s"chunkSize $chunkSize")
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var first = true
    while (i < b.length) {
      val n = math.min(chunkSize, b.length - i)
      val ext = if (first) ";graft=1" else ""
      out.write(s"${n.toHexString}$ext\r\n".getBytes("ISO-8859-1"))
      out.write(b, i, n)
      out.write("\r\n".getBytes("ISO-8859-1"))
      i += n
      first = false
    }
    out.write("0\r\n\r\n".getBytes("ISO-8859-1"))
    out.toByteArray
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
      body: Array[Byte]): Array[Byte] =
    renderHttpResponse(status, Seq("Content-Type" -> contentType), body)

  /** [[renderHttpResponse]] with explicit headers — the fixture side of
    * the transfer-decoding gates: `body` is the ON-WIRE body (already
    * chunk-framed / content-coded by the caller), so Content-Length is
    * its literal length and is omitted when Transfer-Encoding is
    * chunked (RFC 9112 §6.2). */
  def renderHttpResponse(status: Int, headers: Seq[(String, String)],
      body: Array[Byte]): Array[Byte] = {
    val chunked = headers.exists { case (k, v) =>
      k.equalsIgnoreCase("transfer-encoding") &&
        v.toLowerCase.contains("chunked") }
    val sb = new StringBuilder(s"HTTP/1.1 $status OK\r\n")
    for ((k, v) <- headers if !k.equalsIgnoreCase("content-length"))
      sb.append(k).append(": ").append(v).append("\r\n")
    if (!chunked)
      sb.append("Content-Length: ").append(body.length).append("\r\n")
    sb.append("\r\n")
    val out = new java.io.ByteArrayOutputStream()
    out.write(sb.toString.getBytes("ISO-8859-1"))
    out.write(body)
    out.toByteArray
  }
}
