package graft.kernel

/** Pure-JVM FLAC codec built from the public FLAC format spec
  * (RFC 9639): the `fLaC` marker + STREAMINFO metadata walk
  * ([[metadata]] — exact duration with no frame decode), and since
  * round 17 the FULL frame decode ([[decodeAudio]]) — frame-header
  * grammar (CRC-8-gated), constant/verbatim/fixed/LPC subframes,
  * rice and rice2 partitioned residuals with escape partitions,
  * wasted bits, left/side / right/side / mid/side stereo
  * decorrelation, CRC-16 frame footers, and the STREAMINFO MD5
  * checked against the decoded samples when present. FLAC is
  * LOSSLESS, so unlike the MP3/Ogg/MP4 lossy-container header-only
  * rule its samples are exactly recoverable — which makes compressed
  * crawl audio fingerprintable (the CrawlLoop audio leg's use case).
  *
  * [[encode]] writes a real subset encoder for fixtures and
  * round-trip gates: per-block best-of fixed predictors (orders 0–4)
  * with exhaustive rice-parameter search and escape fallback,
  * constant/verbatim selection, optional stereo decorrelation modes,
  * and a computed STREAMINFO MD5 — decode(encode(x)) == x bit for
  * bit. */
object Flac {

  /** title/artist from a VORBIS_COMMENT metadata block (type 4 — FLAC
    * embeds the Vorbis comment structure verbatim, LE lengths despite
    * FLAC's otherwise big-endian fields), "" when untagged. */
  final case class Meta(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, durationMs: Long,
      title: String = "", artist: String = "")

  def isFlac(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C'

  def metadata(bytes: Array[Byte]): Meta = {
    require(isFlac(bytes), "not a FLAC stream: no fLaC marker")
    require(bytes.length >= 8, "flac: truncated before block header")
    val btype = bytes(4) & 0x7f
    require(btype == 0, s"flac: first metadata block type $btype, spec requires STREAMINFO")
    val len = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    require(len == 34, s"flac: STREAMINFO length $len, spec requires 34")
    require(bytes.length >= 8 + 34, "flac: STREAMINFO truncated")
    val p = 8
    val sampleRate = ((bytes(p + 10) & 0xff) << 12) |
      ((bytes(p + 11) & 0xff) << 4) | ((bytes(p + 12) & 0xff) >> 4)
    val channels = ((bytes(p + 12) >> 1) & 0x7) + 1
    val bps = (((bytes(p + 12) & 1) << 4) | ((bytes(p + 13) & 0xff) >> 4)) + 1
    val total = ((bytes(p + 13) & 0x0fL) << 32) |
      ((bytes(p + 14) & 0xffL) << 24) | ((bytes(p + 15) & 0xffL) << 16) |
      ((bytes(p + 16) & 0xffL) << 8) | (bytes(p + 17) & 0xffL)
    require(sampleRate >= 1, s"flac: sample rate $sampleRate")
    // walk the remaining metadata blocks for VORBIS_COMMENT (type 4);
    // every block is bounds-checked against the file (hostile declared
    // lengths are loud, the kernel-wide untrusted-input rule)
    var title = ""; var artist = ""
    var last = (bytes(4) & 0x80) != 0
    var off = 8 + 34
    while (!last) {
      require(off + 4 <= bytes.length, "flac: truncated metadata block header")
      val hdr = bytes(off) & 0xff
      last = (hdr & 0x80) != 0
      val btype2 = hdr & 0x7f
      require(btype2 != 0, "flac: duplicate STREAMINFO block")
      val blen = ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      require(off + 4 + blen <= bytes.length,
        s"flac: metadata block (type $btype2) length $blen overruns the file")
      if (btype2 == 4) {
        val t = Ogg.vorbisComments(bytes, off + 4, off + 4 + blen)
        title = t._1; artist = t._2
      }
      off += 4 + blen
    }
    Meta(sampleRate, channels, bps, total, total * 1000L / sampleRate,
      title, artist)
  }

  // ------------------------------------------------------------------
  // Frame decode (RFC 9639 §9) — the lossless half of the kernel.
  // ------------------------------------------------------------------

  /** Byte offset of the first audio frame: the metadata-block walk
    * [[metadata]] performs, returned as a position. */
  private def framesOffset(bytes: Array[Byte]): Int = {
    var last = (bytes(4) & 0x80) != 0
    var off = 8 + 34
    while (!last) {
      require(off + 4 <= bytes.length, "flac: truncated metadata block header")
      last = (bytes(off) & 0x80) != 0
      val blen = ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      require(off + 4 + blen <= bytes.length, "flac: metadata block overrun")
      off += 4 + blen
    }
    off
  }

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0, MSB-first — frame
    * headers (RFC 9639 §9.1). */
  private[kernel] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0, MSB-first — whole
    * frames (RFC 9639 §9.3). */
  private[kernel] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** MSB-first bit reader over a byte range. Bounds are loud (the
    * kernel-wide untrusted-input rule). */
  private final class BitReader(b: Array[Byte], var bytePos: Int, end: Int) {
    var bitPos = 0 // 0..7 within the current byte
    def readBit(): Int = {
      require(bytePos < end, "flac: bitstream truncated")
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }
    /** n ≤ 57 bits, unsigned, MSB first. */
    def readBits(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | readBit(); k += 1 }
      v
    }
    /** n-bit two's-complement signed. */
    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** Unary: count 0-bits up to the terminating 1 (libFLAC's
      * write_unary_unsigned form). Budgeted: a hostile all-zero tail
      * must not spin to the end of a 100 MB payload silently. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        require(q <= (1 << 24), "flac: unary run exceeds budget")
      }
      q
    }
    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  /** Generalized-UTF-8 coded number (frame/sample number, §9.1.5):
    * 1–7 bytes, 7 to 36 payload bits. */
  private def readCodedNumber(r: BitReader): Long = {
    val first = r.readBits(8).toInt
    if ((first & 0x80) == 0) return first.toLong
    var ones = 0
    while (ones < 8 && ((first << ones) & 0x80) != 0) ones += 1
    require(ones >= 2 && ones <= 7, s"flac: bad coded-number prefix $first")
    var v: Long = if (ones == 7) 0L else (first & (0x7f >> ones)).toLong
    var k = 1
    while (k < ones) {
      val c = r.readBits(8).toInt
      require((c & 0xc0) == 0x80, "flac: bad coded-number continuation")
      v = (v << 6) | (c & 0x3f)
      k += 1
    }
    v
  }

  /** Framework-wide FLAC decode budget (interleaved samples): rows
    * hold whole decoded streams on-heap and FLAC frames legally expand
    * ~4096× (a 16-byte CONSTANT frame is 65536 samples), so the bound
    * is on OUTPUT, enforced per frame. */
  private val MaxInterleaved = 1L << 26

  private val BlockSizes = Array(-1, 192, 576, 1152, 2304, 4608, -8, -16,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  private val SampleRates = Array(0, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000, -1, -2, -3, -4)
  private val BitDepths = Array(0, 8, 12, -1, 16, 20, 24, 32)

  /** Rice/rice2 partitioned residual (§9.2.7) into `res[order..n)`. */
  private def readResidual(r: BitReader, n: Int, order: Int,
      res: Array[Long]): Unit = {
    val method = r.readBits(2).toInt
    require(method <= 1, s"flac: reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val pOrder = r.readBits(4).toInt
    val parts = 1 << pOrder
    require(n % parts == 0, s"flac: block $n not divisible into $parts partitions")
    val per = n / parts
    // RFC 9639 §9.2.7: blockSize >> partitionOrder must exceed the
    // predictor order — per == order would make the first partition
    // zero-sample, which conformant decoders reject
    require(per > order, "flac: first partition underflow")
    var idx = order
    var p = 0
    while (p < parts) {
      val count = if (p == 0) per - order else per
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < count) { res(idx) = if (raw == 0) 0L else r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val u = (q << param) | r.readBits(param)
          res(idx) = (u >>> 1) ^ -(u & 1L) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  /** One subframe (§9.2) of `n` samples at `bps` bits into a fresh
    * array (wasted-bit shift applied). */
  private def readSubframe(r: BitReader, n: Int, bps: Int): Array[Long] = {
    require(r.readBit() == 0, "flac: subframe header pad bit set")
    val t = r.readBits(6).toInt
    var wasted = 0
    if (r.readBit() == 1) wasted = r.readUnary() + 1
    val sbps = bps - wasted
    require(sbps >= 1, s"flac: wasted bits $wasted >= bit depth $bps")
    val out = new Array[Long](n)
    if (t == 0) { // CONSTANT
      val v = r.readSigned(sbps)
      java.util.Arrays.fill(out, v)
    } else if (t == 1) { // VERBATIM
      var i = 0
      while (i < n) { out(i) = r.readSigned(sbps); i += 1 }
    } else if ((t & 0x38) == 0x08 && (t & 0x07) <= 4) { // FIXED 001xxx
      val order = t & 0x07
      require(order <= n, s"flac: fixed order $order > block $n")
      var i = 0
      while (i < order) { out(i) = r.readSigned(sbps); i += 1 }
      readResidual(r, n, order, out)
      // reconstruct through the fixed-predictor recurrences (§9.2.5)
      i = order
      order match {
        case 0 =>
        case 1 => while (i < n) { out(i) += out(i - 1); i += 1 }
        case 2 => while (i < n) { out(i) += 2 * out(i - 1) - out(i - 2); i += 1 }
        case 3 => while (i < n) {
          out(i) += 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3); i += 1 }
        case 4 => while (i < n) {
          out(i) += 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) - out(i - 4)
          i += 1 }
      }
    } else if ((t & 0x20) != 0) { // LPC 1xxxxx, order = xxxxx+1
      val order = (t & 0x1f) + 1
      require(order <= n, s"flac: lpc order $order > block $n")
      var i = 0
      while (i < order) { out(i) = r.readSigned(sbps); i += 1 }
      val precM1 = r.readBits(4).toInt
      require(precM1 != 15, "flac: invalid lpc coefficient precision")
      val prec = precM1 + 1
      val shift = r.readSigned(5).toInt
      require(shift >= 0, s"flac: negative lpc shift $shift")
      val coefs = new Array[Long](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(prec); i += 1 }
      readResidual(r, n, order, out)
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
        out(i) += acc >> shift
        i += 1
      }
    } else throw new IllegalArgumentException(s"flac: reserved subframe type $t")
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  /** Decode the full audio stream: every frame, every subframe, stereo
    * decorrelation undone, CRC-8/CRC-16 verified per frame, sample
    * count checked against STREAMINFO, and the STREAMINFO MD5 (when
    * nonzero) verified against the decoded samples — the same
    * [[Wav.Audio]] shape WAV decodes to, channel-interleaved signed
    * ints. */
  def decodeAudio(bytes: Array[Byte]): Wav.Audio = {
    val meta = metadata(bytes)
    require(meta.bitsPerSample <= 32, s"flac: bps ${meta.bitsPerSample}")
    // hard decode budget, interleaved-sample count (~11 min of 48 kHz
    // stereo): rows hold whole decoded streams on-heap, and FLAC is a
    // compressed format — a ~16-byte CONSTANT frame legally expands to
    // 65536 samples, so the budget must bind the OUTPUT, and it is
    // ENFORCED in-loop too: a hostile stream declaring
    // total_samples = 0 ("unknown", spec-legal) must not decode
    // unboundedly off tiny repeated frames (the kernel-wide
    // untrusted-input budget rule)
    val maxInterleaved = MaxInterleaved
    require(meta.totalSamples * meta.channels <= maxInterleaved,
      s"flac: ${meta.totalSamples} samples exceed the decode budget")
    val out = new java.util.ArrayList[Array[Int]]() // per-frame interleaved
    var total = 0L
    var off = framesOffset(bytes)
    while (off < bytes.length &&
        (meta.totalSamples == 0 || total < meta.totalSamples)) {
      val frameStart = off
      val r = new BitReader(bytes, off, bytes.length)
      val sync = r.readBits(14).toInt
      require(sync == 0x3ffe, f"flac: bad frame sync $sync%x at $frameStart")
      require(r.readBit() == 0, "flac: reserved frame-header bit set")
      r.readBit() // blocking strategy (0 fixed / 1 variable)
      val bsCode = r.readBits(4).toInt
      require(bsCode != 0, "flac: reserved block size code 0")
      val srCode = r.readBits(4).toInt
      require(srCode != 15, "flac: invalid sample rate code 15")
      val chanCode = r.readBits(4).toInt
      require(chanCode <= 10, s"flac: reserved channel assignment $chanCode")
      val bdCode = r.readBits(3).toInt
      require(BitDepths(bdCode) >= 0, s"flac: reserved bit depth code $bdCode")
      require(r.readBit() == 0, "flac: reserved frame-header bit set")
      readCodedNumber(r)
      val blockSize = BlockSizes(bsCode) match {
        case -8 => r.readBits(8).toInt + 1
        case -16 => r.readBits(16).toInt + 1
        case v => v
      }
      // explicit frame sample rates must agree with STREAMINFO — the
      // returned Wav.Audio advertises meta.sampleRate, so a divergent
      // frame would silently mislabel the decoded PCM
      srCode match {
        case 12 =>
          val khz = r.readBits(8)
          require(khz * 1000 == meta.sampleRate.toLong,
            s"flac: frame sample rate ${khz * 1000} != stream ${meta.sampleRate}")
        case 13 =>
          val hz = r.readBits(16)
          require(hz == meta.sampleRate.toLong,
            s"flac: frame sample rate $hz != stream ${meta.sampleRate}")
        case 14 =>
          val hz10 = r.readBits(16)
          require(hz10 * 10 == meta.sampleRate.toLong,
            s"flac: frame sample rate ${hz10 * 10} != stream ${meta.sampleRate}")
        case 0 => () // from STREAMINFO
        case c =>
          require(SampleRates(c) == meta.sampleRate,
            s"flac: frame sample rate ${SampleRates(c)} != stream ${meta.sampleRate}")
      }
      require(r.bitPos == 0, "flac: frame header not byte-aligned")
      val hdrCrc = r.readBits(8).toInt
      require(hdrCrc == crc8(bytes, frameStart, r.bytePos - 1),
        "flac: frame header CRC-8 mismatch")
      // a frame-level depth differing from STREAMINFO would decode at
      // the frame depth while the returned Audio advertises the stream
      // depth — samples could exceed the advertised range undetected
      // when the STREAMINFO MD5 is absent
      require(BitDepths(bdCode) == 0 ||
          BitDepths(bdCode) == meta.bitsPerSample,
        s"flac: frame bit depth ${BitDepths(bdCode)} != stream ${meta.bitsPerSample}")
      val bps = if (BitDepths(bdCode) == 0) meta.bitsPerSample
                else BitDepths(bdCode)
      val channels = if (chanCode <= 7) chanCode + 1 else 2
      require(channels == meta.channels,
        s"flac: frame channels $channels != stream ${meta.channels}")
      val chans = new Array[Array[Long]](channels)
      var c = 0
      while (c < channels) {
        // the decorrelated side channel carries one extra bit (§9.2.1)
        val extra = chanCode match {
          case 8 => if (c == 1) 1 else 0 // left/side
          case 9 => if (c == 0) 1 else 0 // right/side
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        chans(c) = readSubframe(r, blockSize, bps + extra)
        c += 1
      }
      r.alignToByte()
      val bodyEnd = r.bytePos
      val fCrc = r.readBits(16).toInt
      require(fCrc == crc16(bytes, frameStart, bodyEnd),
        "flac: frame CRC-16 mismatch")
      // undo stereo decorrelation (§4.2): exact integer inverses
      chanCode match {
        case 8 => // left/side: right = left - side
          var i = 0
          while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
        case 9 => // right/side (side first): left = side + right
          var i = 0
          while (i < blockSize) {
            val side = chans(0)(i)
            chans(0)(i) = side + chans(1)(i)
            i += 1
          }
        case 10 => // mid/side
          var i = 0
          while (i < blockSize) {
            var mid = chans(0)(i)
            val side = chans(1)(i)
            mid = (mid << 1) | (side & 1L)
            chans(0)(i) = (mid + side) >> 1
            chans(1)(i) = (mid - side) >> 1
            i += 1
          }
        case _ => ()
      }
      total += blockSize
      require(total * channels <= maxInterleaved,
        s"flac: decoded stream exceeds the ${maxInterleaved} interleaved-sample budget")
      val inter = new Array[Int](blockSize * channels)
      var i = 0
      while (i < blockSize) {
        c = 0
        while (c < channels) {
          val v = chans(c)(i)
          require(v >= Int.MinValue && v <= Int.MaxValue,
            "flac: decoded sample outside 32-bit range")
          inter(i * channels + c) = v.toInt
          c += 1
        }
        i += 1
      }
      out.add(inter)
      off = r.bytePos
    }
    require(meta.totalSamples == 0 || total == meta.totalSamples,
      s"flac: decoded $total samples, STREAMINFO says ${meta.totalSamples}")
    val samples = new Array[Int](out.stream().mapToInt(_.length).sum())
    var pos = 0
    out.forEach { a =>
      System.arraycopy(a, 0, samples, pos, a.length)
      pos += a.length
    }
    // STREAMINFO MD5 is over the original interleaved little-endian
    // sample bytes; all-zero means unset (§8.2). Byte-aligned depths
    // only — sub-byte packings are out of scope for the check.
    if (meta.bitsPerSample % 8 == 0 && bytes.slice(8 + 18, 8 + 34).exists(_ != 0)) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val bn = meta.bitsPerSample / 8
      val buf = new Array[Byte](samples.length * bn)
      var i = 0
      while (i < samples.length) {
        var k = 0
        while (k < bn) { buf(i * bn + k) = ((samples(i) >> (8 * k)) & 0xff).toByte; k += 1 }
        i += 1
      }
      val got = md.digest(buf)
      require(java.util.Arrays.equals(got,
          java.util.Arrays.copyOfRange(bytes, 8 + 18, 8 + 34)),
        "flac: STREAMINFO MD5 mismatch — stream does not decode to its own checksum")
    }
    Wav.Audio(meta.sampleRate, meta.channels, meta.bitsPerSample, samples)
  }

  // ------------------------------------------------------------------
  // Encode (fixtures + round-trip gates): fixed predictors with
  // exhaustive rice-parameter search, escape fallback, constant /
  // verbatim selection, optional stereo decorrelation.
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { writeBit(((v >> k) & 1L).toInt); k -= 1 }
    }
    def writeUnary(q: Long): Unit = {
      var i = 0L
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def alignToByte(): Unit = while (nBits != 0) writeBit(0)
    def toBytes: Array[Byte] = { require(nBits == 0, "unaligned"); out.toByteArray }
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Exact best rice parameter (0..14) or escape for a residual slice:
    * (cost in bits, param, rawBits-if-escape). */
  private def bestRice(res: Array[Long], from: Int,
      until: Int): (Long, Int, Int) = {
    var best = Long.MaxValue
    var bestP = 0
    var p = 0
    while (p <= 14) {
      var cost = 0L
      var i = from
      while (i < until && cost < best) {
        cost += (zigzag(res(i)) >>> p) + 1 + p
        i += 1
      }
      if (cost < best) { best = cost; bestP = p }
      p += 1
    }
    // raw signed bits needed to hold every residual (escape partition)
    var raw = 1
    var j = from
    while (j < until) {
      val v = res(j)
      while (v < -(1L << (raw - 1)) || v >= (1L << (raw - 1))) raw += 1
      j += 1
    }
    val escCost = 5L + (until - from).toLong * raw
    if (escCost < best) (escCost, -1, raw) else (best, bestP, 0)
  }

  private def writeResidual(w: BitWriter, res: Array[Long], order: Int,
      n: Int): Unit = {
    w.writeBits(0, 2) // rice method 0 (4-bit params)
    w.writeBits(0, 4) // partition order 0 (one partition)
    val (_, p, raw) = bestRice(res, order, n)
    if (p < 0) {
      w.writeBits(15, 4) // escape
      w.writeBits(raw, 5)
      var i = order
      while (i < n) { w.writeBits(res(i) & ((1L << raw) - 1), raw); i += 1 }
    } else {
      w.writeBits(p, 4)
      var i = order
      while (i < n) {
        val u = zigzag(res(i))
        w.writeUnary(u >>> p)
        w.writeBits(u & ((1L << p) - 1), p)
        i += 1
      }
    }
  }

  /** Write one channel's best subframe (constant / fixed 0–4 + rice /
    * verbatim fallback) for `samples[0..n)` at `bps` bits. */
  private def writeSubframe(w: BitWriter, samples: Array[Long], n: Int,
      bps: Int): Unit = {
    w.writeBit(0)
    var allSame = true
    var i = 1
    while (i < n && allSame) { allSame = samples(i) == samples(0); i += 1 }
    if (allSame) {
      w.writeBits(0, 6); w.writeBit(0) // CONSTANT, no wasted bits
      w.writeBits(samples(0) & ((1L << bps) - 1), bps)
      return
    }
    // best fixed order by exact rice cost
    var bestOrder = 0
    var bestCost = Long.MaxValue
    var bestRes: Array[Long] = null
    var order = 0
    while (order <= math.min(4, n - 1)) {
      val res = new Array[Long](n)
      System.arraycopy(samples, 0, res, 0, n)
      var o = 0
      while (o < order) { // iterated first differences = fixed predictors
        var j = n - 1
        while (j > o) { res(j) = res(j) - res(j - 1); j -= 1 }
        o += 1
      }
      val (c, _, _) = bestRice(res, order, n)
      val cost = order.toLong * bps + 6 + c
      if (cost < bestCost) { bestCost = cost; bestOrder = order; bestRes = res }
      order += 1
    }
    if (bestCost >= n.toLong * bps) {
      w.writeBits(1, 6); w.writeBit(0) // VERBATIM
      var j = 0
      while (j < n) { w.writeBits(samples(j) & ((1L << bps) - 1), bps); j += 1 }
    } else {
      w.writeBits(0x08 | bestOrder, 6); w.writeBit(0) // FIXED
      var j = 0
      while (j < bestOrder) { w.writeBits(samples(j) & ((1L << bps) - 1), bps); j += 1 }
      writeResidual(w, bestRes, bestOrder, n)
    }
  }

  private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) { w.writeBits(v, 8); return }
    var nBytes = 2
    while (nBytes < 7 && v >= (1L << (5 * nBytes + 1))) nBytes += 1
    val payloadHead = 7 - nBytes // payload bits in the prefix byte
    w.writeBits(((1L << nBytes) - 1) << 1, nBytes + 1) // n ones, one zero
    if (payloadHead > 0) w.writeBits(v >>> (6 * (nBytes - 1)), payloadHead)
    var k = nBytes - 2
    while (k >= 0) {
      w.writeBits(2, 2)
      w.writeBits((v >>> (6 * k)) & 0x3f, 6)
      k -= 1
    }
  }

  /** Encode PCM as a real FLAC stream. `stereo` (2-channel input
    * only): "independent", "left_side", "right_side", or "mid_side".
    * STREAMINFO carries the true MD5, so [[decodeAudio]]'s integrity
    * check is live on every fixture. */
  def encode(audio: Wav.Audio, blockSize: Int = 4096,
      stereo: String = "independent"): Array[Byte] = {
    val ch = audio.channels
    val bps = audio.bitsPerSample
    require(bps == 8 || bps == 16, s"flac encode: bps $bps (8/16 PCM)")
    require(ch >= 1 && ch <= 8, s"flac encode: channels $ch")
    require(blockSize >= 16 && blockSize <= 32768, s"flac encode: block $blockSize")
    require(audio.samples.length % ch == 0, "flac encode: ragged interleave")
    require(audio.samples.length <= MaxInterleaved,
      s"flac encode: ${audio.samples.length} samples exceed the decode budget")
    val decorr = stereo match {
      case "independent" => 0
      case "left_side" => 8
      case "right_side" => 9
      case "mid_side" => 10
      case other => throw new IllegalArgumentException(s"flac encode: stereo '$other'")
    }
    require(decorr == 0 || ch == 2, "flac encode: stereo modes need 2 channels")
    val nFrames = audio.samples.length / ch
    val out = new java.io.ByteArrayOutputStream()
    // STREAMINFO with the real MD5 of the interleaved LE sample bytes
    val header = encodeHeader(audio.sampleRate, ch, bps, nFrames)
    val md = java.security.MessageDigest.getInstance("MD5")
    val bn = bps / 8
    val pcm = new Array[Byte](audio.samples.length * bn)
    var i = 0
    while (i < audio.samples.length) {
      var k = 0
      while (k < bn) { pcm(i * bn + k) = ((audio.samples(i) >> (8 * k)) & 0xff).toByte; k += 1 }
      i += 1
    }
    val digest = md.digest(pcm)
    System.arraycopy(digest, 0, header, 8 + 18, 16)
    // min/max block size fields (bytes 0-3 of STREAMINFO)
    header(8) = ((blockSize >> 8) & 0xff).toByte
    header(9) = (blockSize & 0xff).toByte
    header(10) = header(8); header(11) = header(9)
    out.write(header)
    val srCode = SampleRates.indexOf(audio.sampleRate) match {
      case -1 =>
        if (audio.sampleRate < 65536) 13
        else if (audio.sampleRate % 10 == 0 && audio.sampleRate / 10 < 65536) 14
        else 0
      case c => c
    }
    val bdCode = BitDepths.indexOf(bps)
    var frameNo = 0L
    var pos = 0
    while (pos < nFrames) {
      val n = math.min(blockSize, nFrames - pos)
      val bsCode = BlockSizes.indexOf(n) match {
        case -1 | 6 | 7 => if (n <= 256) 6 else 7
        case c => c
      }
      val chans = new Array[Array[Long]](ch)
      var c = 0
      while (c < ch) {
        val a = new Array[Long](n)
        var j = 0
        while (j < n) { a(j) = audio.samples((pos + j) * ch + c); j += 1 }
        chans(c) = a
        c += 1
      }
      var chBps = Array.fill(ch)(bps)
      if (decorr != 0) {
        val l = chans(0); val rch = chans(1)
        decorr match {
          case 8 =>
            val side = Array.tabulate(n)(j => l(j) - rch(j))
            chans(1) = side; chBps = Array(bps, bps + 1)
          case 9 =>
            val side = Array.tabulate(n)(j => l(j) - rch(j))
            chans(0) = side; chans(1) = rch; chBps = Array(bps + 1, bps)
          case 10 =>
            val mid = Array.tabulate(n)(j => (l(j) + rch(j)) >> 1)
            val side = Array.tabulate(n)(j => l(j) - rch(j))
            chans(0) = mid; chans(1) = side; chBps = Array(bps, bps + 1)
        }
      }
      val w = new BitWriter
      w.writeBits(0x3ffe, 14)
      w.writeBit(0); w.writeBit(0) // reserved, fixed blocking
      w.writeBits(bsCode, 4)
      w.writeBits(srCode, 4)
      w.writeBits(if (decorr != 0) decorr else ch - 1, 4)
      w.writeBits(bdCode, 3)
      w.writeBit(0)
      writeCodedNumber(w, frameNo)
      if (bsCode == 6) w.writeBits(n - 1, 8)
      else if (bsCode == 7) w.writeBits(n - 1, 16)
      if (srCode == 12) w.writeBits(audio.sampleRate / 1000, 8)
      else if (srCode == 13) w.writeBits(audio.sampleRate, 16)
      else if (srCode == 14) w.writeBits(audio.sampleRate / 10, 16)
      val hdr = w.toBytes
      w.writeBits(crc8(hdr, 0, hdr.length), 8)
      c = 0
      while (c < ch) { writeSubframe(w, chans(c), n, chBps(c)); c += 1 }
      w.alignToByte()
      val body = w.toBytes // header + crc8 + subframes, byte-aligned
      val fCrc = crc16(body, 0, body.length)
      out.write(body, 0, body.length)
      out.write((fCrc >> 8) & 0xff)
      out.write(fCrc & 0xff)
      frameNo += 1
      pos += n
    }
    out.toByteArray
  }

  /** Structurally valid fLaC + STREAMINFO fixture (zeroed MD5 and
    * block/frame-size fields; no audio frames); title/artist append a
    * real VORBIS_COMMENT block after STREAMINFO. */
  def encodeHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, title: String = "",
      artist: String = ""): Array[Byte] = {
    require(sampleRate >= 1 && sampleRate < (1 << 20), s"rate $sampleRate")
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"bps $bitsPerSample")
    require(totalSamples >= 0 && totalSamples < (1L << 36), s"samples $totalSamples")
    val out = new Array[Byte](8 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last block, type 0
    out(7) = 34
    val p = 8
    out(p + 10) = ((sampleRate >> 12) & 0xff).toByte
    out(p + 11) = ((sampleRate >> 4) & 0xff).toByte
    out(p + 12) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bitsPerSample - 1) >> 4) & 1)).toByte
    out(p + 13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf)).toInt.toByte
    out(p + 14) = ((totalSamples >> 24) & 0xff).toByte
    out(p + 15) = ((totalSamples >> 16) & 0xff).toByte
    out(p + 16) = ((totalSamples >> 8) & 0xff).toByte
    out(p + 17) = (totalSamples & 0xff).toByte
    if (title.isEmpty && artist.isEmpty) out
    else {
      out(4) = 0 // STREAMINFO no longer the last block
      val body = Ogg.commentBlock(title, artist)
      val hdr = Array((0x80 | 4).toByte, // last block, type 4
        ((body.length >> 16) & 0xff).toByte,
        ((body.length >> 8) & 0xff).toByte, (body.length & 0xff).toByte)
      out ++ hdr ++ body
    }
  }
}
