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
    * durationMs floored — exact integer arithmetic. */
  final case class Meta(codec: String, channels: Int, sampleRate: Int,
      durationMs: Long, pages: Int)

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

  private[kernel] def crc(bytes: Array[Byte], from: Int, len: Int,
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

  def metadata(bytes: Array[Byte]): Meta = {
    require(isOgg(bytes), "not an Ogg stream: no OggS capture pattern")
    var off = 0
    var pages = 0
    var lastGranule = -1L
    var codec = ""
    var channels = 0
    var sampleRate = 0
    var preSkip = 0
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
    Meta(codec, channels, sampleRate, durationMs, pages)
  }

  // --- fixture encoder ----------------------------------------------------

  private def page(headerType: Int, granule: Long, serial: Int, seq: Int,
      body: Array[Byte]): Array[Byte] = {
    require(body.length < 255 * 255, "fixture page too large")
    val nSegs = body.length / 255 + 1
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
    out(27 + nSegs - 1) = (body.length % 255).toByte
    System.arraycopy(body, 0, out, 27 + nSegs, body.length)
    val c = crc(out, 0, out.length, zeroAt = 22)
    out(22) = (c & 0xff).toByte; out(23) = ((c >> 8) & 0xff).toByte
    out(24) = ((c >> 16) & 0xff).toByte; out(25) = ((c >> 24) & 0xff).toByte
    out
  }

  /** Structurally valid Ogg Opus header stream: id page + a final
    * data page carrying `granule` (48 kHz samples incl. preSkip) with
    * an empty packet body. */
  def encodeOpusHeader(channels: Int, preSkip: Int, inputRate: Int,
      granule: Long): Array[Byte] = {
    val head = new Array[Byte](19)
    "OpusHead".getBytes("ISO-8859-1").copyToArray(head)
    head(8) = 1 // version
    head(9) = channels.toByte
    head(10) = (preSkip & 0xff).toByte; head(11) = ((preSkip >> 8) & 0xff).toByte
    var r = inputRate
    var i = 0
    while (i < 4) { head(12 + i) = (r & 0xff).toByte; r >>>= 8; i += 1 }
    page(0x02, -1L, 1, 0, head) ++
      page(0x04, granule, 1, 1, Array[Byte](0))
  }

  /** Structurally valid Ogg Vorbis header stream: id page + final data
    * page at `granule` (samples at `rate`). */
  def encodeVorbisHeader(channels: Int, rate: Int,
      granule: Long): Array[Byte] = {
    val head = new Array[Byte](30)
    head(0) = 1
    "vorbis".getBytes("ISO-8859-1").copyToArray(head, 1)
    head(11) = channels.toByte
    var r = rate
    var i = 0
    while (i < 4) { head(12 + i) = (r & 0xff).toByte; r >>>= 8; i += 1 }
    head(28) = 0x01 // blocksizes (log2 6|6) — structural filler
    head(29) = 0x01 // framing bit
    page(0x02, 0L, 2, 0, head) ++
      page(0x04, granule, 2, 1, Array[Byte](0))
  }
}
