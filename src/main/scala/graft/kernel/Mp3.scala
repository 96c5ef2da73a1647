package graft.kernel

/** MP3 (MPEG-1/2 audio Layer III) container metadata — frame-header
  * walk from the public header tables (ISO/IEC 11172-3 §2.4.1.3 /
  * 13818-3): each frame opens with a 32-bit header — 11-bit syncword,
  * version, layer, bitrate index, sample-rate index, padding — and the
  * frame length follows arithmetically, so the whole file structure is
  * readable without touching a single Huffman-coded audio bit (the
  * VP8-lossy/MP4 rule: payload decode is out of scope, structural
  * metadata is free). An ID3v2 tag at the file start is skipped by its
  * syncsafe length; ID3v1 (128-byte 'TAG' trailer) is tolerated.
  *
  * Duration is EXACT integer arithmetic: every Layer III frame carries
  * 1152 samples (MPEG-1) or 576 (MPEG-2/2.5), so
  * durationMs = floor(frames · samplesPerFrame · 1000 / sampleRate) —
  * engine-exact, and honest for VBR too (it counts real frames, not a
  * first-frame bitrate guess).
  */
object Mp3 {

  /** version: "1"/"2"/"2.5"; sampleRate in Hz; bitrateKbps of the
    * FIRST frame (VBR files vary per frame — `vbr` says whether any
    * later frame disagrees); frames = physical frame count; channels
    * from the first frame's channel-mode bits (mono → 1, every stereo
    * flavor → 2); title/artist from ID3v2 TIT2/TPE1 text frames (all
    * four v2.4 encodings), falling back to the ID3v1 trailer fields —
    * the metadata an audio-corpus curation keys on (dedup by declared
    * title, language routing); "" when untagged. */
  final case class Meta(version: String, sampleRate: Int,
      bitrateKbps: Int, vbr: Boolean, frames: Int, durationMs: Long,
      channels: Int = 0, title: String = "", artist: String = "")

  // bitrate tables, kbps: [version][layerIII index 1..14]
  private val BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val SampleRateV1 = Array(44100, 48000, 32000)
  private val SampleRateV2 = Array(22050, 24000, 16000)
  private val SampleRateV25 = Array(11025, 12000, 8000)

  def isMp3(bytes: Array[Byte]): Boolean =
    hasId3v2(bytes) || (bytes.length >= 4 && isFrameSync(bytes, 0))

  private def hasId3v2(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3'

  private def isFrameSync(b: Array[Byte], o: Int): Boolean =
    o + 4 <= b.length && (b(o) & 0xff) == 0xff && (b(o + 1) & 0xe0) == 0xe0

  /** Decode one ID3v2 text-frame payload: leading encoding byte per
    * the v2.4 spec (0 = ISO-8859-1, 1 = UTF-16 with BOM, 2 = UTF-16BE,
    * 3 = UTF-8), value terminated at the first NUL of the encoding. */
  private def textPayload(b: Array[Byte], from: Int, len: Int): String = {
    require(len >= 1, "mp3: empty ID3v2 text frame")
    val enc = b(from) & 0xff
    val s = enc match {
      case 0 => new String(b, from + 1, len - 1, "ISO-8859-1")
      case 1 => new String(b, from + 1, len - 1, "UTF-16") // BOM-led
      case 2 => new String(b, from + 1, len - 1, "UTF-16BE")
      case 3 => new String(b, from + 1, len - 1, "UTF-8")
      case e => throw new IllegalArgumentException(
        s"mp3: ID3v2 text encoding $e")
    }
    val nul = s.indexOf('\u0000')
    if (nul >= 0) s.substring(0, nul) else s
  }

  /** Walk the ID3v2.3/v2.4 frames in [from, to); returns (title,
    * artist) from TIT2/TPE1 (v2.2's 3-byte-id frames walk through
    * [[id3v22Text]] instead). A 0x00 where a frame id should start is
    * the padding area (spec §3.3): stop. */
  private def id3v2Text(b: Array[Byte], from: Int, to: Int,
      v4: Boolean): (String, String) = {
    var title = ""; var artist = ""
    var o = from
    var stop = false
    while (!stop && o + 10 <= to) {
      if (b(o) == 0) stop = true // padding
      else {
        val id = new String(b, o, 4, "ISO-8859-1")
        val size =
          if (v4) ((b(o + 4) & 0x7f) << 21) | ((b(o + 5) & 0x7f) << 14) |
            ((b(o + 6) & 0x7f) << 7) | (b(o + 7) & 0x7f)
          else ((b(o + 4) & 0xff) << 24) | ((b(o + 5) & 0xff) << 16) |
            ((b(o + 6) & 0xff) << 8) | (b(o + 7) & 0xff)
        require(size >= 0 && o + 10 + size <= to,
          s"mp3: ID3v2 frame '$id' size $size overruns the tag")
        // frame FORMAT flags (second flag byte): compression, encryption,
        // grouping, per-frame unsynchronisation, data-length indicator —
        // any of them changes the payload layout, so decoding it as
        // encoding-byte + text would be silently wrong (v2.3 §3.3.1 /
        // v2.4 §4.1.2). Skip the text of such frames, mirroring the
        // tag-level unsynchronisation opt-out in metadata(); the
        // structure walk is unaffected (size is still authoritative).
        val fmtFlags = b(o + 9) & 0xff
        val plain = if (v4) (fmtFlags & 0x4f) == 0 else (fmtFlags & 0xe0) == 0
        id match {
          case "TIT2" if plain => title = textPayload(b, o + 10, size)
          case "TPE1" if plain => artist = textPayload(b, o + 10, size)
          case _ => ()
        }
        o += 10 + size
      }
    }
    (title, artist)
  }

  /** Walk the ID3v2.2 frames in [from, to): 3-byte ids, 3-byte PLAIN
    * big-endian sizes, 6-byte headers, no per-frame flags (ID3v2.2 spec
    * §3.2) — TT2/TP1 are the title/artist text frames old MP3s in real
    * crawls still carry. Only encodings 0 (ISO-8859-1) and 1 (UCS-2,
    * BOM-led) exist in v2.2; anything else is a malformed tag and
    * raises. Padding stop as in the v2.3/v2.4 walk. */
  private def id3v22Text(b: Array[Byte], from: Int,
      to: Int): (String, String) = {
    var title = ""; var artist = ""
    var o = from
    var stop = false
    while (!stop && o + 6 <= to) {
      if (b(o) == 0) stop = true // padding
      else {
        val id = new String(b, o, 3, "ISO-8859-1")
        val size = ((b(o + 3) & 0xff) << 16) | ((b(o + 4) & 0xff) << 8) |
          (b(o + 5) & 0xff)
        require(size >= 1 && o + 6 + size <= to,
          s"mp3: ID3v2.2 frame '$id' size $size overruns the tag")
        def text(): String = {
          val enc = b(o + 6) & 0xff
          require(enc <= 1, s"mp3: ID3v2.2 text encoding $enc")
          textPayload(b, o + 6, size)
        }
        id match {
          case "TT2" => title = text()
          case "TP1" => artist = text()
          case _ => ()
        }
        o += 6 + size
      }
    }
    (title, artist)
  }

  /** ID3v1 fixed field: 30 ISO-8859-1 bytes, NUL- or space-padded. */
  private def id3v1Field(b: Array[Byte], from: Int): String = {
    var len = 30
    while (len > 0 && (b(from + len - 1) == 0 || b(from + len - 1) == ' '))
      len -= 1
    new String(b, from, len, "ISO-8859-1")
  }

  def metadata(bytes: Array[Byte]): Meta = {
    var off = 0
    var title = ""
    var artist = ""
    if (hasId3v2(bytes)) {
      // syncsafe 28-bit tag length at bytes 6..9, header itself is 10;
      // the v2.4 footer flag (0x10) adds a 10-byte footer EXCLUDED from
      // the syncsafe size — skipping only 10+len on such a file lands
      // frame sync on the '3DI' footer
      val len = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      val footer = if ((bytes(5) & 0x10) != 0) 10 else 0
      off = 10 + len + footer
      require(off <= bytes.length, s"mp3: ID3v2 length $len overruns the file")
      val major = bytes(3) & 0xff
      // Unsynchronised tags (flag 0x80) store 0xFF,0x00 escape pairs —
      // decoding text without reversing them would be silently WRONG,
      // so tag text is skipped (structure walk is unaffected: the
      // syncsafe tag length is still authoritative). The extended
      // header (flag 0x40) shifts the first frame: v2.4 sizes are
      // syncsafe and INCLUDE the header itself, v2.3 sizes are plain
      // and EXCLUDE their own 4 size bytes (spec §3.2 of each).
      if ((major == 3 || major == 4) && (bytes(5) & 0x80) == 0) {
        var start = 10
        if ((bytes(5) & 0x40) != 0) {
          require(start + 4 <= 10 + len, "mp3: extended header truncated")
          val ext =
            if (major == 4) ((bytes(10) & 0x7f) << 21) |
              ((bytes(11) & 0x7f) << 14) | ((bytes(12) & 0x7f) << 7) |
              (bytes(13) & 0x7f)
            else (((bytes(10) & 0xff) << 24) | ((bytes(11) & 0xff) << 16) |
              ((bytes(12) & 0xff) << 8) | (bytes(13) & 0xff)) + 4
          require(ext >= 4 && ext <= len,
            s"mp3: extended header size $ext overruns the tag")
          start = 10 + ext
        }
        val t = id3v2Text(bytes, start, 10 + len, v4 = major == 4)
        title = t._1; artist = t._2
      } else if (major == 2 && (bytes(5) & 0xc0) == 0) {
        // v2.2: flag 0x80 is unsynchronisation (same skip reasoning as
        // above), 0x40 is WHOLE-TAG compression with no defined scheme
        // (spec §3.1 — "the tag should be ignored"); no extended header
        // exists, so frames start right after the 10-byte header
        val t = id3v22Text(bytes, 10, 10 + len)
        title = t._1; artist = t._2
      }
    }
    val limit = // tolerate an ID3v1 trailer
      if (bytes.length >= 128 && bytes(bytes.length - 128) == 'T' &&
          bytes(bytes.length - 127) == 'A' && bytes(bytes.length - 126) == 'G') {
        // v1 fields fill in only where v2 said nothing — the standard
        // player precedence (v2 wins; v1 is the 1995-era fallback)
        val base = bytes.length - 128
        if (title.isEmpty) title = id3v1Field(bytes, base + 3)
        if (artist.isEmpty) artist = id3v1Field(bytes, base + 33)
        base
      } else bytes.length
    var version = ""
    var sampleRate = 0
    var bitrate0 = 0
    var vbr = false
    var frames = 0
    var samplesPerFrame = 0
    var channels = 0
    while (off + 4 <= limit) {
      require(isFrameSync(bytes, off),
        f"mp3: lost frame sync at $off (0x${bytes(off) & 0xff}%02x)")
      val h1 = bytes(off + 1) & 0xff
      val h2 = bytes(off + 2) & 0xff
      val verBits = (h1 >> 3) & 3
      val layerBits = (h1 >> 1) & 3
      require(layerBits == 1, "mp3: not Layer III")
      require(verBits != 1, "mp3: reserved MPEG version")
      val brIdx = (h2 >> 4) & 0xf
      val srIdx = (h2 >> 2) & 3
      val padding = (h2 >> 1) & 1
      require(brIdx != 0 && brIdx != 15,
        s"mp3: free-format/bad bitrate index $brIdx")
      require(srIdx != 3, "mp3: reserved sample-rate index")
      val (ver, sr, br, spf) = verBits match {
        case 3 => ("1", SampleRateV1(srIdx), BitrateV1L3(brIdx), 1152)
        case 2 => ("2", SampleRateV2(srIdx), BitrateV2L3(brIdx), 576)
        case _ => ("2.5", SampleRateV25(srIdx), BitrateV2L3(brIdx), 576)
      }
      if (frames == 0) {
        version = ver; sampleRate = sr; bitrate0 = br; samplesPerFrame = spf
        channels = if (((bytes(off + 3) >> 6) & 3) == 3) 1 else 2
      } else {
        require(ver == version && sr == sampleRate,
          "mp3: version/sample-rate changes mid-stream")
        if (br != bitrate0) vbr = true
      }
      val frameLen = spf / 8 * br * 1000 / sr + padding
      require(frameLen > 4, s"mp3: degenerate frame length $frameLen")
      require(off + frameLen <= limit,
        s"mp3: frame at $off (len $frameLen) truncated")
      frames += 1
      off += frameLen
    }
    require(frames > 0, "mp3: no audio frames")
    Meta(version, sampleRate, bitrate0, vbr, frames,
      frames.toLong * samplesPerFrame * 1000L / sampleRate, channels,
      title, artist)
  }

  // --- fixture encoder ----------------------------------------------------

  /** Build a structurally valid CBR MPEG-1 Layer III stream: `frames`
    * frames of the given bitrate/sample-rate with zeroed payloads —
    * [[metadata]] walks it; there is nothing to audio-decode (the
    * header-fixture pattern). */
  /** Build a real ID3v2.3 or v2.4 tag carrying TIT2/TPE1 text frames
    * (encoding `enc`: 0 ISO-8859-1, 1 UTF-16 BOM, 2 UTF-16BE, 3 UTF-8)
    * plus `padding` zero bytes — the planted-tag fixture for
    * [[metadata]]'s text extraction. */
  def encodeId3v2(title: String, artist: String, major: Int = 3,
      enc: Int = 0, padding: Int = 0): Array[Byte] = {
    require(major == 2 || major == 3 || major == 4,
      s"ID3v2.$major not buildable here")
    require(enc >= 0 && enc <= (if (major == 2) 1 else 3),
      s"encoding $enc for ID3v2.$major")
    def encode(s: String): Array[Byte] = enc match {
      case 0 => s.getBytes("ISO-8859-1")
      case 1 => Array(0xfe.toByte, 0xff.toByte) ++ s.getBytes("UTF-16BE")
      case 2 => s.getBytes("UTF-16BE")
      case _ => s.getBytes("UTF-8")
    }
    def frame(id: String, text: String): Array[Byte] = {
      val payload = Array(enc.toByte) ++ encode(text)
      val n = payload.length
      if (major == 2)
        // v2.2: 3-byte id, 3-byte plain size, NO flag bytes
        id.getBytes("ISO-8859-1") ++ Array(((n >> 16) & 0xff).toByte,
          ((n >> 8) & 0xff).toByte, (n & 0xff).toByte) ++ payload
      else {
        val size =
          if (major == 4) Array(((n >> 21) & 0x7f).toByte,
            ((n >> 14) & 0x7f).toByte, ((n >> 7) & 0x7f).toByte,
            (n & 0x7f).toByte)
          else Array(((n >> 24) & 0xff).toByte, ((n >> 16) & 0xff).toByte,
            ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
        id.getBytes("ISO-8859-1") ++ size ++ Array[Byte](0, 0) ++ payload
      }
    }
    val (tFrame, aFrame) =
      if (major == 2) ("TT2", "TP1") else ("TIT2", "TPE1")
    val body = (if (title.nonEmpty) frame(tFrame, title)
      else Array.empty[Byte]) ++
      (if (artist.nonEmpty) frame(aFrame, artist) else Array.empty[Byte]) ++
      new Array[Byte](padding)
    val n = body.length
    Array[Byte]('I', 'D', '3', major.toByte, 0, 0,
      ((n >> 21) & 0x7f).toByte, ((n >> 14) & 0x7f).toByte,
      ((n >> 7) & 0x7f).toByte, (n & 0x7f).toByte) ++ body
  }

  /** Append an ID3v1 trailer (title/artist fields, rest zeroed). */
  def appendId3v1(stream: Array[Byte], title: String,
      artist: String): Array[Byte] = {
    require(title.length <= 30 && artist.length <= 30, "ID3v1 field > 30")
    val tag = new Array[Byte](128)
    tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
    title.getBytes("ISO-8859-1").copyToArray(tag, 3)
    artist.getBytes("ISO-8859-1").copyToArray(tag, 33)
    stream ++ tag
  }

  def encodeHeader(frames: Int, bitrateKbps: Int, sampleRate: Int,
      id3v2Bytes: Int = 0, id3: Array[Byte] = null): Array[Byte] = {
    val brIdx = BitrateV1L3.indexOf(bitrateKbps)
    val srIdx = SampleRateV1.indexOf(sampleRate)
    require(brIdx >= 1, s"unsupported MPEG-1 L3 bitrate $bitrateKbps")
    require(srIdx >= 0, s"unsupported MPEG-1 sample rate $sampleRate")
    require(frames >= 1, "at least one frame")
    val frameLen = 1152 / 8 * bitrateKbps * 1000 / sampleRate // no padding
    val out = new java.io.ByteArrayOutputStream()
    if (id3 != null) out.write(id3, 0, id3.length)
    else if (id3v2Bytes > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0) // version 2.3, no flags
      out.write((id3v2Bytes >> 21) & 0x7f); out.write((id3v2Bytes >> 14) & 0x7f)
      out.write((id3v2Bytes >> 7) & 0x7f); out.write(id3v2Bytes & 0x7f)
      out.write(new Array[Byte](id3v2Bytes))
    }
    val frame = new Array[Byte](frameLen)
    frame(0) = 0xff.toByte
    frame(1) = 0xfb.toByte // MPEG-1 (11), Layer III (01), no CRC (1)
    frame(2) = ((brIdx << 4) | (srIdx << 2)).toByte // no padding, private 0
    frame(3) = 0xc0.toByte // mono, no mode ext, no copyright/original
    (0 until frames).foreach(_ => out.write(frame))
    out.toByteArray
  }
}
