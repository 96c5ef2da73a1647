package graft.kernel

/** Ogg container metadata (RFC 3533 page structure) with Opus
  * (RFC 7845 `OpusHead`) and Vorbis (`\x01vorbis`) identification
  * headers — the header walk only, per the engine's lossy-codec rule:
  * CELT/MDCT payload decode is out of a pure-JVM build's scope, but
  * everything a training-data filter needs (codec, channels, rates,
  * exact duration) lives in uncompressed page headers:
  *   - every page: capture pattern `OggS`, version 0, header-type
  *     flags, 64-bit granule position, serial, sequence, CRC, lacing
  *   - page CRCs are VERIFIED (the Ogg CRC-32: poly 0x04c11db7,
  *     unreflected, zero init/xor, CRC field zeroed) — a torn page is
  *     loud, not a silently-wrong duration
  *   - duration comes from the LAST page's granule position: Opus
  *     granules are 48 kHz sample counts with `preSkip` subtracted
  *     (RFC 7845 §4), Vorbis granules count at the stream's own rate
  */
object Ogg {

  /** codec: "opus" | "vorbis"; sampleRate: the ID header's rate
    * (Opus: original input rate; granule math is always 48 kHz);
    * durationMs floored — exact integer arithmetic; title/artist from
    * the Vorbis-comment header (`OpusTags` / `\x03vorbis` — RFC 7845
    * §5.2 and the Vorbis I spec share the structure), "" when absent —
    * the declared metadata an audio-corpus curation keys on. */
  final case class Meta(codec: String, channels: Int, sampleRate: Int,
      durationMs: Long, pages: Int, title: String = "", artist: String = "")

  def isOgg(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'g' &&
      bytes(2) == 'g' && bytes(3) == 'S'

  // Ogg CRC-32: unreflected, poly 0x04c11db7, init 0, no final xor
  private val CrcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var j = 0
    while (j < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      j += 1
    }
    r
  }

  private[graft] def crc(bytes: Array[Byte], from: Int, len: Int,
      zeroAt: Int = -1): Int = {
    var c = 0
    var i = 0
    while (i < len) {
      val b = if (zeroAt >= 0 && i >= zeroAt && i < zeroAt + 4) 0
        else bytes(from + i) & 0xff
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ b) & 0xff)
      i += 1
    }
    c
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], o: Int): Long =
    le32(b, o) | (le32(b, o + 4) << 32)

  /** Parse a Vorbis-comment block (vendor string, then `count` UPPER
    * KEY=value entries, UTF-8): returns (title, artist). Shared by
    * OpusTags and the Vorbis comment header; lengths are validated
    * against the packet bound so hostile declared sizes are loud. */
  private[kernel] def vorbisComments(b: Array[Byte], from: Int,
      to: Int): (String, String) = {
    require(from + 4 <= to, "ogg: comment header truncated at vendor length")
    val vlen = le32(b, from)
    require(vlen >= 0 && from + 4 + vlen + 4 <= to,
      s"ogg: vendor length $vlen overruns the comment packet")
    var o = from + 4 + vlen.toInt
    val count = le32(b, o)
    require(count >= 0 && count <= (to - o) / 4,
      s"ogg: comment count $count overruns the packet")
    o += 4
    var title = ""; var artist = ""
    var i = 0L
    while (i < count) {
      require(o + 4 <= to, "ogg: comment entry truncated at length")
      val len = le32(b, o)
      require(len >= 0 && o + 4 + len <= to,
        s"ogg: comment length $len overruns the packet")
      val s = new String(b, o + 4, len.toInt, "UTF-8")
      val eq = s.indexOf('=')
      if (eq > 0) {
        // field names are case-insensitive (Vorbis I §5.2)
        val key = s.substring(0, eq).toUpperCase(java.util.Locale.ROOT)
        val v = s.substring(eq + 1)
        if (key == "TITLE") title = v
        else if (key == "ARTIST") artist = v
      }
      o += 4 + len.toInt
      i += 1
    }
    (title, artist)
  }

  def metadata(bytes: Array[Byte]): Meta = {
    require(isOgg(bytes), "not an Ogg stream: no OggS capture pattern")
    var off = 0
    var pages = 0
    var lastGranule = -1L
    var codec = ""
    var channels = 0
    var sampleRate = 0
    var preSkip = 0
    var title = ""
    var artist = ""
    // comment-header packet accumulator: the packet starts on page 1 but
    // may CONTINUE onto later pages (all-255 lacing — routine for real
    // files with embedded cover art in METADATA_BLOCK_PICTURE); parsing
    // only page 1's slice would be a truncated bound and a false
    // "overruns the packet" rejection of a valid stream
    var tagBuf: java.io.ByteArrayOutputStream = null
    def parseCommentPacket(pkt: Array[Byte]): Unit = {
      if (codec == "opus" && pkt.length >= 8 &&
          new String(pkt, 0, 8, "ISO-8859-1") == "OpusTags") {
        val t = vorbisComments(pkt, 8, pkt.length)
        title = t._1; artist = t._2
      } else if (codec == "vorbis" && pkt.length >= 7 &&
          (pkt(0) & 0xff) == 3 &&
          new String(pkt, 1, 6, "ISO-8859-1") == "vorbis") {
        val t = vorbisComments(pkt, 7, pkt.length)
        title = t._1; artist = t._2
      }
    }
    while (off + 27 <= bytes.length) {
      require(bytes(off) == 'O' && bytes(off + 1) == 'g' &&
        bytes(off + 2) == 'g' && bytes(off + 3) == 'S',
        s"ogg: lost page sync at $off")
      require(bytes(off + 4) == 0, s"ogg: version ${bytes(off + 4)}")
      val granule = le64(bytes, off + 6)
      val nSegs = bytes(off + 26) & 0xff
      require(off + 27 + nSegs <= bytes.length, "ogg: lacing table truncated")
      var bodyLen = 0
      var s = 0
      while (s < nSegs) { bodyLen += bytes(off + 27 + s) & 0xff; s += 1 }
      val pageLen = 27 + nSegs + bodyLen
      require(off + pageLen <= bytes.length, s"ogg: page at $off truncated")
      val stored = le32(bytes, off + 22).toInt
      val computed = crc(bytes, off, pageLen, zeroAt = 22)
      require(stored == computed,
        f"ogg: page CRC mismatch at $off (stored 0x$stored%08x, computed 0x$computed%08x)")
      val body = off + 27 + nSegs
      if (pages == 0) {
        // the first page's first packet is the identification header
        if (bodyLen >= 19 &&
            new String(bytes, body, 8, "ISO-8859-1") == "OpusHead") {
          codec = "opus"
          channels = bytes(body + 9) & 0xff
          preSkip = le16(bytes, body + 10)
          sampleRate = le32(bytes, body + 12).toInt
        } else if (bodyLen >= 30 && (bytes(body) & 0xff) == 1 &&
            new String(bytes, body + 1, 6, "ISO-8859-1") == "vorbis") {
          codec = "vorbis"
          channels = bytes(body + 11) & 0xff
          sampleRate = le32(bytes, body + 12).toInt
        } else throw new IllegalArgumentException(
          "ogg: first packet is neither OpusHead nor a Vorbis id header")
        require(channels >= 1, s"ogg: $channels channels")
        require(sampleRate >= 1, s"ogg: sample rate $sampleRate")
      }
      if ((pages == 1 && nSegs > 0) || tagBuf != null) {
        // the second page opens the comment header when present —
        // OpusTags (RFC 7845 §5) or the \x03vorbis comment header; its
        // FIRST packet ends at the first lacing value < 255. An
        // all-255 lacing run means the packet continues on the next
        // page (continuation bit 0x01): accumulate the slices and parse
        // only once the packet closes.
        if (pages > 1) require((bytes(off + 5) & 0x01) != 0,
          s"ogg: comment packet left open but page at $off is not a continuation")
        var p0 = 0
        var s2 = 0
        var open = true
        while (s2 < nSegs && open) {
          val l = bytes(off + 27 + s2) & 0xff
          p0 += l
          if (l < 255) open = false
          s2 += 1
        }
        if (open) {
          if (tagBuf == null) tagBuf = new java.io.ByteArrayOutputStream()
          tagBuf.write(bytes, body, p0)
        } else if (tagBuf != null) {
          tagBuf.write(bytes, body, p0)
          parseCommentPacket(tagBuf.toByteArray)
          tagBuf = null
        } else {
          parseCommentPacket(java.util.Arrays.copyOfRange(bytes, body, body + p0))
        }
      }
      if (granule != -1L) lastGranule = granule
      pages += 1
      off += pageLen
    }
    require(off == bytes.length, s"ogg: trailing garbage after $off")
    require(pages >= 1 && codec.nonEmpty, "ogg: no pages")
    val durationMs =
      if (lastGranule < 0) 0L
      else if (codec == "opus")
        math.max(0L, lastGranule - preSkip) * 1000L / 48000L
      else lastGranule * 1000L / sampleRate
    Meta(codec, channels, sampleRate, durationMs, pages, title, artist)
  }

  // --- fixture encoder ----------------------------------------------------

  private def page(headerType: Int, granule: Long, serial: Int, seq: Int,
      body: Array[Byte], open: Boolean = false): Array[Byte] = {
    require(body.length < 255 * 255, "fixture page too large")
    // open = the page's packet does NOT end here (all-255 lacing, no
    // terminating value — RFC 3533 §5); the next page must carry the
    // continuation flag
    if (open) require(body.length > 0 && body.length % 255 == 0,
      "fixture: an open page body must be a positive multiple of 255")
    val nSegs = if (open) body.length / 255 else body.length / 255 + 1
    val out = new Array[Byte](27 + nSegs + body.length)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(5) = headerType.toByte
    var g = granule
    var i = 0
    while (i < 8) { out(6 + i) = (g & 0xff).toByte; g >>>= 8; i += 1 }
    var v = serial
    i = 0
    while (i < 4) { out(14 + i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
    v = seq
    i = 0
    while (i < 4) { out(18 + i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
    out(26) = nSegs.toByte
    i = 0
    while (i < nSegs - 1) { out(27 + i) = 255.toByte; i += 1 }
    out(27 + nSegs - 1) = if (open) 255.toByte else (body.length % 255).toByte
    System.arraycopy(body, 0, out, 27 + nSegs, body.length)
    val c = crc(out, 0, out.length, zeroAt = 22)
    out(22) = (c & 0xff).toByte; out(23) = ((c >> 8) & 0xff).toByte
    out(24) = ((c >> 16) & 0xff).toByte; out(25) = ((c >> 24) & 0xff).toByte
    out
  }

  /** A Vorbis-comment block body: vendor string + TITLE/ARTIST entries
    * (entries with empty values are omitted — real taggers skip absent
    * fields). */
  private[kernel] def commentBlock(title: String, artist: String,
      extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val vendor = "graft-fixture".getBytes("UTF-8")
    le(vendor.length); out.write(vendor, 0, vendor.length)
    val entries = (Seq("TITLE" -> title, "ARTIST" -> artist)
      .filter(_._2.nonEmpty) ++ extra)
      .map { case (k, v) => (k + "=" + v).getBytes("UTF-8") }
    le(entries.length)
    entries.foreach { e => le(e.length); out.write(e, 0, e.length) }
    out.toByteArray
  }

  /** Structurally valid Ogg Opus header stream: id page, an `OpusTags`
    * comment page when title/artist given (RFC 7845 §5 layout), and a
    * final data page carrying `granule` (48 kHz samples incl. preSkip)
    * with an empty packet body. */
  def encodeOpusHeader(channels: Int, preSkip: Int, inputRate: Int,
      granule: Long, title: String = "", artist: String = ""): Array[Byte] = {
    val head = new Array[Byte](19)
    "OpusHead".getBytes("ISO-8859-1").copyToArray(head)
    head(8) = 1 // version
    head(9) = channels.toByte
    head(10) = (preSkip & 0xff).toByte; head(11) = ((preSkip >> 8) & 0xff).toByte
    var r = inputRate
    var i = 0
    while (i < 4) { head(12 + i) = (r & 0xff).toByte; r >>>= 8; i += 1 }
    if (title.isEmpty && artist.isEmpty)
      page(0x02, -1L, 1, 0, head) ++
        page(0x04, granule, 1, 1, Array[Byte](0))
    else {
      val tags = "OpusTags".getBytes("ISO-8859-1") ++
        commentBlock(title, artist)
      page(0x02, -1L, 1, 0, head) ++
        page(0x00, -1L, 1, 1, tags) ++
        page(0x04, granule, 1, 2, Array[Byte](0))
    }
  }

  /** Like [[encodeOpusHeader]] but the comment packet SPANS pages: a
    * METADATA_BLOCK_PICTURE-style filler entry of `padBytes` pushes the
    * OpusTags packet past one page, the first comment page ends in an
    * all-255 lacing run (packet open), and a continuation page (header
    * type 0x01) carries the remainder — the shape real files with
    * embedded cover art produce (RFC 3533 §5 / RFC 7845 §5). */
  def encodeOpusHeaderSpanningTags(channels: Int, preSkip: Int,
      inputRate: Int, granule: Long, title: String, artist: String,
      padBytes: Int = 600): Array[Byte] = {
    val head = new Array[Byte](19)
    "OpusHead".getBytes("ISO-8859-1").copyToArray(head)
    head(8) = 1
    head(9) = channels.toByte
    head(10) = (preSkip & 0xff).toByte; head(11) = ((preSkip >> 8) & 0xff).toByte
    var r = inputRate
    var i = 0
    while (i < 4) { head(12 + i) = (r & 0xff).toByte; r >>>= 8; i += 1 }
    val tags = "OpusTags".getBytes("ISO-8859-1") ++
      commentBlock(title, artist,
        Seq("METADATA_BLOCK_PICTURE" -> ("A" * padBytes)))
    // the cut is the largest multiple of 255 that still leaves a
    // non-empty remainder for the continuation page
    val cut = (tags.length - 1) / 255 * 255
    require(cut >= 255, s"fixture: padded packet (${tags.length}) too small to span")
    page(0x02, -1L, 1, 0, head) ++
      page(0x00, -1L, 1, 1, tags.slice(0, cut), open = true) ++
      page(0x01, -1L, 1, 2, tags.slice(cut, tags.length)) ++
      page(0x04, granule, 1, 3, Array[Byte](0))
  }

  /** Structurally valid Ogg Vorbis header stream: id page, a
    * `\x03vorbis` comment page when title/artist given, and a final
    * data page at `granule` (samples at `rate`). */
  def encodeVorbisHeader(channels: Int, rate: Int,
      granule: Long, title: String = "", artist: String = ""): Array[Byte] = {
    val head = new Array[Byte](30)
    head(0) = 1
    "vorbis".getBytes("ISO-8859-1").copyToArray(head, 1)
    head(11) = channels.toByte
    var r = rate
    var i = 0
    while (i < 4) { head(12 + i) = (r & 0xff).toByte; r >>>= 8; i += 1 }
    head(28) = 0x01 // blocksizes (log2 6|6) — structural filler
    head(29) = 0x01 // framing bit
    if (title.isEmpty && artist.isEmpty)
      page(0x02, 0L, 2, 0, head) ++
        page(0x04, granule, 2, 1, Array[Byte](0))
    else {
      val tags = Array[Byte](3) ++ "vorbis".getBytes("ISO-8859-1") ++
        commentBlock(title, artist) ++ Array[Byte](1) // framing bit
      page(0x02, 0L, 2, 0, head) ++
        page(0x00, 0L, 2, 1, tags) ++
        page(0x04, granule, 2, 2, Array[Byte](0))
    }
  }
}
