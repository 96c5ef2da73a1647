package graft.kernel

/** WebP lossless (VP8L) codec, from the public specs — no image
  * library: the RIFF container (WebP Container Specification) and the
  * WebP Lossless Bitstream Specification. WebP is now a double-digit
  * share of crawled images; without it the cross-container perceptual
  * dedup (m16) is blind to the format browsers re-encode into most.
  *
  * Decode covers the full VP8L feature surface: LSB-first bit
  * unpacking, simple and code-length-coded prefix (Huffman) codes, the
  * LZ77 backward-reference layer with the 120-entry 2D distance map,
  * the color cache, meta prefix-code partitioning, and all four
  * transforms (predictor with its 14 modes, cross-channel color
  * transform, subtract-green, color indexing with sub-byte pixel
  * bundling) applied inverse-in-reverse-read-order. Lossy VP8 is
  * rejected loudly behind the same seam MP4/MP3 use — DCT decoding is
  * out of scope; VP8L is the complete lossless half.
  *
  * The encoder is the fixture side: literal-only (no LZ77, no
  * transforms), real per-channel Huffman codes emitted through the
  * code-length code — every encoded image decodes back bit-exactly
  * (lossless), which is the m19/GIF round-trip gate shape. Decode paths
  * the encoder never emits (backrefs, cache, every transform) are
  * gated by hand-assembled bitstreams in WebpSpec.
  *
  * Untrusted-input discipline (the Png/Jpeg lesson): header dimensions
  * are validated against a sample budget BEFORE allocation, bit reads
  * past the payload fail loudly, prefix codes must be complete
  * (Kraft-exact) unless single-symbol, and backward references must
  * stay inside decoded territory.
  */
object Webp {

  /** Decoded raster: row-major, channel-interleaved 0..255 samples,
    * 3 (RGB) or 4 (RGBA) channels — the Gif/Jpeg image shape. */
  final case class Image(width: Int, height: Int, channels: Int,
      samples: Array[Int])

  val DefaultMaxSamples: Long = 1L << 28

  def isWebp(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P'

  // --- container ----------------------------------------------------------

  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** The VP8L chunk payload: either a bare VP8L file or a VP8X extended
    * container holding one. Lossy (`VP8 `) payloads reject loudly. */
  private def vp8lPayload(bytes: Array[Byte]): (Int, Int) = {
    require(isWebp(bytes), "not a WebP: bad RIFF/WEBP signature")
    var off = 12
    while (off + 8 <= bytes.length) {
      val tag = new String(bytes, off, 4, "ISO-8859-1")
      val size = le32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"WebP: chunk '$tag' size $size overruns the file")
      if (tag == "VP8L") return (off + 8, (off + 8 + size).toInt)
      require(tag != "VP8 ",
        "lossy WebP (VP8 DCT payload) is not supported — only lossless VP8L")
      off += 8 + size.toInt + (size.toInt & 1) // chunks are even-padded
    }
    throw new IllegalArgumentException("WebP: no VP8L chunk found")
  }

  // --- bit reader (LSB-first, the VP8L order) -----------------------------

  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bitPos = 0
    def bit(): Int = {
      require(pos < end, "VP8L: bitstream truncated")
      val v = (b(pos) >> bitPos) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      v
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
    /** Next 8 bits in stream order WITHOUT consuming, zero-padded past
      * the payload end — the prefix-decode lookup key ([[HuffTree]]). */
    def peek8(): Int = {
      val cur = if (pos < end) (b(pos) & 0xff) >>> bitPos else 0
      val nxt = if (pos + 1 < end) (b(pos + 1) & 0xff) << (8 - bitPos) else 0
      (cur | nxt) & 0xff
    }
    /** Consume `n` already-peeked bits (bounds-checked like [[bit]]). */
    def skip(n: Int): Unit = {
      var i = 0
      while (i < n) {
        require(pos < end, "VP8L: bitstream truncated")
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; pos += 1 }
        i += 1
      }
    }
  }

  // --- prefix codes -------------------------------------------------------

  /** Canonical prefix code from code lengths (the DEFLATE assignment:
    * codes ordered by (length, symbol), read MSB-first bit by bit).
    * Single-used-symbol codes decode with zero bits (spec special
    * case); otherwise the lengths must form a COMPLETE code.
    * `pair` overrides the canonical assignment for SIMPLE 2-symbol
    * codes, whose bit 0 goes to the first TRANSMITTED symbol — with
    * out-of-order symbols the canonical assignment would flip them. */
  private final class HuffTree(lengths: Array[Int],
      pair: Option[(Int, Int)] = None) {
    def read(br: BitReader): Int = pair match {
      case Some((s0, s1)) => if (br.bit() == 0) s0 else s1
      case None => readTree(br)
    }
    private var usedCount = 0
    private var onlySymbol = -1
    private var maxLen = 0
    lengths.indices.foreach { s =>
      val l = lengths(s)
      require(l >= 0 && l <= MaxCodeLength, s"VP8L: code length $l")
      if (l > 0) { usedCount += 1; onlySymbol = s; if (l > maxLen) maxLen = l }
    }
    require(usedCount >= 1, "VP8L: prefix code with no symbols")
    val single: Int = if (usedCount == 1) onlySymbol else -1
    // binary tree in arrays: node 0 = root; child < 0 encodes ~symbol
    private val left = new Array[Int](2 * usedCount)
    private val right = new Array[Int](2 * usedCount)
    private var nNodes = 1
    // 8-bit stream-order lookup: entry = (len << 16) | symbol for codes
    // ≤ 8 bits (the overwhelming majority of decoded symbols); −1 falls
    // back to the bit-by-bit tree walk — one peek replaces up to 8
    // branchy reads on the per-pixel hot path
    private var lut: Array[Int] = null
    if (single < 0 && pair.isEmpty) {
      lut = Array.fill(256)(-1)
      var kraft = 0L
      val codes = canonicalCodes(lengths)
      lengths.indices.foreach { s =>
        val l = lengths(s)
        if (l > 0 && l <= 8) {
          // stream order: the code's MSB is transmitted first → LUT bit 0
          var streamIdx = 0
          var i = 0
          while (i < l) {
            streamIdx |= ((codes(s) >> (l - 1 - i)) & 1) << i
            i += 1
          }
          var suffix = 0
          while (suffix < (1 << (8 - l))) {
            lut(streamIdx | (suffix << l)) = (l << 16) | s
            suffix += 1
          }
        }
      }
      lengths.indices.foreach { s =>
        val l = lengths(s)
        if (l > 0) {
          kraft += 1L << (MaxCodeLength - l)
          var node = 0
          var i = l - 1
          while (i > 0) {
            val bitv = (codes(s) >> i) & 1
            val next = if (bitv == 0) left(node) else right(node)
            val n2 = if (next == 0) {
              val fresh = nNodes; nNodes += 1
              require(fresh < left.length, "VP8L: corrupt prefix code")
              if (bitv == 0) left(node) = fresh else right(node) = fresh
              fresh
            } else {
              require(next > 0, "VP8L: prefix code collision")
              next
            }
            node = n2
            i -= 1
          }
          val bitv = codes(s) & 1
          val slot = if (bitv == 0) left(node) else right(node)
          require(slot == 0, "VP8L: prefix code collision")
          if (bitv == 0) left(node) = ~s else right(node) = ~s
        }
      }
      require(kraft == (1L << MaxCodeLength),
        s"VP8L: incomplete/oversubscribed prefix code (kraft $kraft)")
    }
    private def readTree(br: BitReader): Int = {
      if (single >= 0) return single
      val e = lut(br.peek8())
      if (e >= 0) { br.skip(e >>> 16); return e & 0xffff }
      var node = 0
      while (true) {
        val next = if (br.bit() == 0) left(node) else right(node)
        if (next < 0) return ~next
        require(next > 0, "VP8L: invalid prefix code path")
        node = next
      }
      -1 // unreachable
    }
  }

  private val MaxCodeLength = 15

  /** DEFLATE-style canonical code values for a length table. */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val blCount = new Array[Int](MaxCodeLength + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](MaxCodeLength + 2)
    var code = 0
    var l = 1
    while (l <= MaxCodeLength) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    lengths.map { len =>
      if (len == 0) 0
      else { val c = nextCode(len); nextCode(len) += 1; c }
    }
  }

  /** kCodeLengthCodeOrder — the fixed transmission order of the
    * code-length code's own lengths (spec §"Decoding the code lengths"). */
  private val CodeLengthOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or code-length-coded). */
  private def readHuffmanCode(alphabetSize: Int, br: BitReader): HuffTree = {
    val lengths = new Array[Int](alphabetSize)
    if (br.bit() == 1) {
      // simple: 1 or 2 symbols
      val numSymbols = br.bit() + 1
      val isFirst8 = br.bit()
      val sym0 = br.bits(if (isFirst8 == 1) 8 else 1)
      require(sym0 < alphabetSize, s"VP8L: simple-code symbol $sym0 out of range")
      lengths(sym0) = 1
      if (numSymbols == 2) {
        val sym1 = br.bits(8)
        require(sym1 < alphabetSize && sym1 != sym0,
          s"VP8L: simple-code symbol $sym1 invalid")
        lengths(sym1) = 1
        new HuffTree(lengths, pair = Some((sym0, sym1)))
      } else new HuffTree(lengths)
    } else {
      val numCodeLengths = 4 + br.bits(4)
      require(numCodeLengths <= CodeLengthOrder.length,
        s"VP8L: $numCodeLengths code-length codes")
      val clLengths = new Array[Int](CodeLengthOrder.length)
      var i = 0
      while (i < numCodeLengths) {
        clLengths(CodeLengthOrder(i)) = br.bits(3)
        i += 1
      }
      val clTree = new HuffTree(clLengths)
      var maxSymbol =
        if (br.bit() == 1) {
          val lengthNBits = 2 + 2 * br.bits(3)
          2 + br.bits(lengthNBits)
        } else alphabetSize
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clTree.read(br)
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repeat, value) = cl match {
            case 16 => (3 + br.bits(2), prevLen)
            case 17 => (3 + br.bits(3), 0)
            case 18 => (11 + br.bits(7), 0)
            case other => throw new IllegalArgumentException(
              s"VP8L: code-length symbol $other")
          }
          require(symbol + repeat <= alphabetSize,
            "VP8L: code-length repeat overruns the alphabet")
          var r = 0
          while (r < repeat) { lengths(symbol) = value; symbol += 1; r += 1 }
        }
      }
      new HuffTree(lengths)
    }
  }

  // --- LZ77 layer ---------------------------------------------------------

  /** Length/distance prefix decoding (spec: 24 prefix codes covering
    * 1..2^12+ via extra bits). */
  private def prefixDecode(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + br.bits(extraBits) + 1
    }

  /** The 120-entry 2D distance map: codes 1..120 address near pixels as
    * (xoffset, yoffset) pairs; codes beyond 120 are linear distances
    * minus 120. The table is GENERATED, not transcribed (the zigzag
    * rule): all (dx, dy) with dy 0..7 / dx −7..8 (row 0 forward-only),
    * sorted by squared distance, then |dx|, positive dx first — which
    * reproduces the published table exactly (WebpSpec pins the opening
    * run and checkpoint entries). */
  private[graft] val DistanceMap: Array[(Int, Int)] = {
    val all = for {
      dy <- 0 to 7
      dx <- -7 to 8
      if !(dy == 0 && dx <= 0)
    } yield (dx, dy)
    val sorted = all.sortBy { case (dx, dy) =>
      (dx * dx + dy * dy, math.abs(dx), if (dx < 0) 1 else 0) }
    require(sorted.length == 120, s"distance map ${sorted.length} entries")
    sorted.toArray
  }

  private def planeCodeToDistance(code: Int, xsize: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistanceMap(code - 1)
      val d = dy * xsize + dx
      if (d < 1) 1 else d
    }

  // --- transforms ---------------------------------------------------------

  private def subsampleSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  private final case class Transform(ttype: Int, widthAtRead: Int,
      sizeBits: Int, data: Array[Int], dataWidth: Int)

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2 without unpacking: SWAR average
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel modular add
    val alphaGreen = ((a & 0xff00ff00) >>> 8) + ((b & 0xff00ff00) >>> 8)
    val redBlue = (a & 0x00ff00ff) + (b & 0x00ff00ff)
    ((alphaGreen & 0x00ff00ff) << 8) | (redBlue & 0x00ff00ff)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(sh: Int): Int = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
      ((tl >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    def ch(sh: Int): Int = {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      clamp255(a + (a - b) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  /** Spec pseudocode Select(L, T, TL): Manhattan distance of each
    * neighbor to the component-wise estimate L+T−TL; strictly closer
    * left wins, ties go to top. */
  private def select(l: Int, t: Int, tl: Int): Int = {
    var pL = 0
    var pT = 0
    var sh = 0
    while (sh < 32) {
      val lc = (l >>> sh) & 0xff
      val tc = (t >>> sh) & 0xff
      val tlc = (tl >>> sh) & 0xff
      val p = lc + tc - tlc
      pL += math.abs(p - lc)
      pT += math.abs(p - tc)
      sh += 8
    }
    if (pL < pT) l else t
  }

  private[graft] def predict(mode: Int, l: Int, t: Int, tr: Int, tl: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(l, t, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(l, t, tl)
      case other =>
        throw new IllegalArgumentException(s"VP8L: predictor mode $other")
    }

  private def inversePredictor(pix: Array[Int], w: Int, h: Int,
      tr: Transform): Unit = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) pix(i - 1) // first row: left (mode 1)
          else if (x == 0) pix(i - w) // first column: top (mode 2)
          else {
            val mode = (tr.data((y >> tr.sizeBits) * tr.dataWidth +
              (x >> tr.sizeBits)) >>> 8) & 0xff
            // top-right of the last column wraps to the current row's
            // first pixel (i − w + 1) — the libwebp memory-order quirk
            // the format is defined against
            predict(mode, pix(i - 1), pix(i - w), pix(i - w + 1), pix(i - w - 1))
          }
        pix(i) = addPixels(pix(i), pred)
        x += 1
      }
      y += 1
    }
  }

  private def colorTransformDelta(pred: Int, c: Int): Int =
    (pred.toByte.toInt * c.toByte.toInt) >> 5

  private def inverseColorTransform(pix: Array[Int], w: Int, h: Int,
      tr: Transform): Unit = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val cte = tr.data((y >> tr.sizeBits) * tr.dataWidth + (x >> tr.sizeBits))
        val gToR = cte & 0xff
        val gToB = (cte >>> 8) & 0xff
        val rToB = (cte >>> 16) & 0xff
        val p = pix(i)
        val g = (p >>> 8) & 0xff
        var r = (p >>> 16) & 0xff
        var b = p & 0xff
        r = (r + colorTransformDelta(gToR, g)) & 0xff
        b = (b + colorTransformDelta(gToB, g) + colorTransformDelta(rToB, r)) & 0xff
        pix(i) = (p & 0xff00ff00) | (r << 16) | b
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(pix: Array[Int]): Unit = {
    var i = 0
    while (i < pix.length) {
      val p = pix(i)
      val g = (p >>> 8) & 0xff
      val r = (((p >>> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      pix(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Color-indexing width reduction: sub-byte palette indices bundle
    * into the green channel. */
  private def indexWidthBits(paletteSize: Int): Int =
    if (paletteSize <= 2) 3
    else if (paletteSize <= 4) 2
    else if (paletteSize <= 16) 1
    else 0

  private def inverseColorIndexing(pix: Array[Int], fullW: Int, h: Int,
      tr: Transform): Array[Int] = {
    val palette = tr.data
    val widthBits = tr.sizeBits
    if (widthBits == 0) {
      var i = 0
      while (i < pix.length) {
        val idx = (pix(i) >>> 8) & 0xff
        pix(i) = if (idx < palette.length) palette(idx) else 0
        i += 1
      }
      pix
    } else {
      val packedW = tr.dataWidth
      val bitsPerPixel = 8 >> widthBits
      val mask = (1 << bitsPerPixel) - 1
      val perPacked = 1 << widthBits
      val out = new Array[Int](fullW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < fullW) {
          val packed = pix(y * packedW + (x >> widthBits))
          val shift = (x & (perPacked - 1)) * bitsPerPixel
          val idx = (((packed >>> 8) & 0xff) >>> shift) & mask
          out(y * fullW + x) = if (idx < palette.length) palette(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }

  // --- image stream decoding ----------------------------------------------

  private val TPredictor = 0
  private val TColor = 1
  private val TSubtractGreen = 2
  private val TColorIndexing = 3

  private def decodeImageStream(xsize: Int, ysize: Int, level0: Boolean,
      br: BitReader, maxSamples: Long): Array[Int] = {
    require(xsize >= 1 && ysize >= 1 &&
      xsize.toLong * ysize <= maxSamples,
      s"VP8L: image ${xsize}x$ysize exceeds the sample budget")
    var w = xsize
    val transforms = scala.collection.mutable.ArrayBuffer[Transform]()
    if (level0) {
      val seen = new Array[Boolean](4)
      while (br.bit() == 1) {
        val ttype = br.bits(2)
        require(!seen(ttype), s"VP8L: transform $ttype appears twice")
        seen(ttype) = true
        ttype match {
          case TPredictor | TColor =>
            val sizeBits = br.bits(3) + 2
            val tw = subsampleSize(w, sizeBits)
            val th = subsampleSize(ysize, sizeBits)
            val data = decodeImageStream(tw, th, level0 = false, br, maxSamples)
            transforms += Transform(ttype, w, sizeBits, data, tw)
          case TSubtractGreen =>
            transforms += Transform(ttype, w, 0, Array.empty, 0)
          case TColorIndexing =>
            val paletteSize = br.bits(8) + 1
            val deltas = decodeImageStream(paletteSize, 1, level0 = false,
              br, maxSamples)
            // palette entries are component-wise deltas off the previous
            val palette = new Array[Int](paletteSize)
            var prev = 0
            var i = 0
            while (i < paletteSize) {
              prev = addPixels(prev, deltas(i))
              palette(i) = prev
              i += 1
            }
            val widthBits = indexWidthBits(paletteSize)
            val packedW = subsampleSize(w, widthBits)
            transforms += Transform(TColorIndexing, w, widthBits, palette, packedW)
            w = packedW
        }
      }
    }
    // color cache (every image stream may carry one)
    val cacheBits =
      if (br.bit() == 1) {
        val cb = br.bits(4)
        require(cb >= 1 && cb <= 11, s"VP8L: color cache bits $cb")
        cb
      } else 0
    // meta prefix codes (level 0 only)
    var metaBits = 0
    var metaW = 0
    var meta: Array[Int] = null
    var numGroups = 1
    if (level0 && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      metaW = subsampleSize(w, metaBits)
      val mh = subsampleSize(ysize, metaBits)
      val mp = decodeImageStream(metaW, mh, level0 = false, br, maxSamples)
      meta = mp.map(p => ((p >>> 8) & 0xffff))
      numGroups = meta.max + 1
      require(numGroups <= 65536, s"VP8L: $numGroups prefix groups")
    }
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val greenAlphabet = 256 + 24 + cacheSize
    val groups = Array.fill(numGroups)(Array(
      readHuffmanCode(greenAlphabet, br),
      readHuffmanCode(256, br),
      readHuffmanCode(256, br),
      readHuffmanCode(256, br),
      readHuffmanCode(40, br)))

    val n = w * ysize
    val pix = new Array[Int](n)
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    def cacheInsert(p: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
    var pos = 0
    var x = 0
    var y = 0
    var group = groups(0)
    var lastMetaX = -1
    while (pos < n) {
      if (meta != null && (x >> metaBits) != lastMetaX) {
        lastMetaX = x >> metaBits
        group = groups(meta((y >> metaBits) * metaW + lastMetaX))
      }
      val g = group(0).read(br)
      if (g < 256) {
        val r = group(1).read(br)
        val b = group(2).read(br)
        val a = group(3).read(br)
        val p = (a << 24) | (r << 16) | (g << 8) | b
        pix(pos) = p
        cacheInsert(p)
        pos += 1
        x += 1
        if (x == w) { x = 0; y += 1; lastMetaX = -1 }
      } else if (g < 280) {
        val length = prefixDecode(g - 256, br)
        val distCode = prefixDecode(group(4).read(br), br)
        val dist = planeCodeToDistance(distCode, w)
        require(dist <= pos, s"VP8L: backward reference $dist before start")
        require(pos + length <= n, "VP8L: backward reference overruns image")
        var k = 0
        while (k < length) {
          val p = pix(pos - dist)
          pix(pos) = p
          cacheInsert(p)
          pos += 1
          k += 1
        }
        x = pos % w
        y = pos / w
        lastMetaX = -1
      } else {
        require(cache != null, "VP8L: cache symbol without a color cache")
        val idx = g - 280
        require(idx < cacheSize, s"VP8L: cache index $idx")
        val p = cache(idx)
        pix(pos) = p
        pos += 1
        x += 1
        if (x == w) { x = 0; y += 1; lastMetaX = -1 }
      }
    }
    // inverse transforms, reverse read order
    var result = pix
    var curW = w
    transforms.reverseIterator.foreach { tr =>
      tr.ttype match {
        case TColorIndexing =>
          result = inverseColorIndexing(result, tr.widthAtRead, ysize, tr)
          curW = tr.widthAtRead
        case TSubtractGreen => inverseSubtractGreen(result)
        case TPredictor => inversePredictor(result, curW, ysize, tr)
        case TColor => inverseColorTransform(result, curW, ysize, tr)
      }
    }
    result
  }

  // --- header-only metadata ----------------------------------------------

  /** Container-level metadata: codec flavor + dimensions, NO pixel
    * decode. `flavor` is `"lossless"` (VP8L) or `"lossy"` (VP8). This
    * is the piece that keeps the metadata table (m25) total over real
    * crawls: lossy VP8 is the DOMINANT WebP flavor in the wild, and
    * while its DCT payload is out of a pure-JVM codec's scope, its
    * keyframe header — frame tag, start code, 14-bit dimensions — is
    * UNCOMPRESSED (RFC 6386 §9.1) and free to read. */
  final case class Meta(flavor: String, width: Int, height: Int,
      hasAlpha: Boolean = false, animated: Boolean = false, frames: Int = 0)

  def metadata(bytes: Array[Byte]): Meta = {
    require(isWebp(bytes), "not a WebP: bad RIFF/WEBP signature")
    // VP8X extended container first: flags + 24-bit canvas dims, then
    // feature chunks (ALPH/ANIM/ANMF/codec). Canvas dims are the
    // DISPLAY truth; for animations the flavor comes from the first
    // frame's codec chunk inside its ANMF wrapper.
    if (bytes.length >= 30 &&
        new String(bytes, 12, 4, "ISO-8859-1") == "VP8X") {
      val size = le32(bytes, 16)
      require(size == 10, s"VP8X: chunk size $size, spec requires 10")
      val flags = bytes(20) & 0xff
      val alpha = (flags & 0x10) != 0
      val anim = (flags & 0x02) != 0
      def u24(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16)
      val w = u24(24) + 1
      val h = u24(27) + 1
      var off = 30
      var frames = 0
      var flavor = ""
      while (off + 8 <= bytes.length) {
        val tag = new String(bytes, off, 4, "ISO-8859-1")
        val size2 = le32(bytes, off + 4)
        require(size2 >= 0 && off + 8 + size2 <= bytes.length,
          s"WebP: chunk '$tag' size $size2 overruns the file")
        tag match {
          case "ANMF" =>
            frames += 1
            // 16-byte frame header, then the frame's own SUBCHUNKS — an
            // optional ALPH precedes the bitstream chunk in real
            // alpha-carrying animations, so WALK them rather than
            // peeking at the first tag only
            if (flavor.isEmpty && size2 >= 24) {
              var so = off + 8 + 16
              val sEnd = off + 8 + size2.toInt
              while (flavor.isEmpty && so + 8 <= sEnd) {
                val sub = new String(bytes, so, 4, "ISO-8859-1")
                val sSize = le32(bytes, so + 4)
                require(sSize >= 0 && so + 8 + sSize <= sEnd,
                  s"WebP: ANMF subchunk '$sub' size $sSize overruns the frame")
                if (sub == "VP8L") flavor = "lossless"
                else if (sub == "VP8 ") flavor = "lossy"
                so += 8 + sSize.toInt + (sSize.toInt & 1)
              }
            }
          case "VP8L" => if (flavor.isEmpty) flavor = "lossless"
          case "VP8 " => if (flavor.isEmpty) flavor = "lossy"
          case _ => // ALPH/ICCP/EXIF/XMP/ANIM — metadata chunks
        }
        off += 8 + size2.toInt + (size2.toInt & 1)
      }
      require(flavor.nonEmpty, "VP8X: no VP8L or VP8 codec chunk found")
      require(!anim || frames > 0, "VP8X: animation flag but no ANMF frames")
      return Meta(flavor, w, h, hasAlpha = alpha, animated = anim,
        frames = if (anim) frames else 0)
    }
    var off = 12
    while (off + 8 <= bytes.length) {
      val tag = new String(bytes, off, 4, "ISO-8859-1")
      val size = le32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"WebP: chunk '$tag' size $size overruns the file")
      val p = off + 8
      if (tag == "VP8L") {
        // 1-byte signature, then 14+14 bit dims (LSB-first)
        require(size >= 5, "VP8L: header truncated")
        require((bytes(p) & 0xff) == 0x2f, "VP8L: bad signature byte")
        val br = new BitReader(bytes, p + 1, p + 5)
        val w = br.bits(14) + 1
        val h = br.bits(14) + 1
        return Meta("lossless", w, h, hasAlpha = br.bit() == 1)
      }
      if (tag == "VP8 ") {
        // RFC 6386 §9.1: 3-byte frame tag (bit 0: 0 = key frame — the
        // only frame a standalone file can open with), 3-byte start
        // code 9D 01 2A, then 16-bit LE width/height (14 bits each,
        // top 2 bits are the rescale hint)
        require(size >= 10, "VP8: frame header truncated")
        val frameTag = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
          ((bytes(p + 2) & 0xff) << 16)
        require((frameTag & 1) == 0, "VP8: first frame is not a key frame")
        require((bytes(p + 3) & 0xff) == 0x9d && (bytes(p + 4) & 0xff) == 0x01 &&
          (bytes(p + 5) & 0xff) == 0x2a, "VP8: bad keyframe start code")
        val w = ((bytes(p + 6) & 0xff) | ((bytes(p + 7) & 0xff) << 8)) & 0x3fff
        val h = ((bytes(p + 8) & 0xff) | ((bytes(p + 9) & 0xff) << 8)) & 0x3fff
        require(w > 0 && h > 0, s"VP8: degenerate dimensions ${w}x$h")
        return Meta("lossy", w, h)
      }
      off += 8 + size.toInt + (size.toInt & 1)
    }
    throw new IllegalArgumentException("WebP: no VP8L or VP8 chunk found")
  }

  /** Fixture builder: a structurally valid lossy-WebP file — RIFF
    * container + `VP8 ` chunk whose keyframe header carries `w`×`h` —
    * with an empty coefficient payload. [[metadata]] reads it;
    * [[decode]] rejects it loudly (DCT decode is out of scope), which
    * is exactly the metadata-only vs decodable split the media seam
    * reports. */
  def encodeLossyHeader(w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && w <= 0x3fff && h >= 1 && h <= 0x3fff,
      s"VP8 dims ${w}x$h out of 14-bit range")
    val payload = new Array[Byte](10)
    // frame tag: key frame (bit0=0), version 0, show_frame (bit4),
    // first_part_size 0
    payload(0) = 0x10
    payload(1) = 0
    payload(2) = 0
    payload(3) = 0x9d.toByte; payload(4) = 0x01; payload(5) = 0x2a
    payload(6) = (w & 0xff).toByte; payload(7) = ((w >> 8) & 0x3f).toByte
    payload(8) = (h & 0xff).toByte; payload(9) = ((h >> 8) & 0x3f).toByte
    val buf = new java.io.ByteArrayOutputStream()
    def le(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    buf.write("RIFF".getBytes("ISO-8859-1"))
    buf.write(le(4 + 8 + payload.length)) // WEBP + chunk header + payload
    buf.write("WEBP".getBytes("ISO-8859-1"))
    buf.write("VP8 ".getBytes("ISO-8859-1"))
    buf.write(le(payload.length))
    buf.write(payload)
    buf.toByteArray
  }

  // --- public decode ------------------------------------------------------

  def decode(bytes: Array[Byte], maxSamples: Long = DefaultMaxSamples): Image = {
    val (start, end) = vp8lPayload(bytes)
    val br = new BitReader(bytes, start, end)
    require(br.bits(8) == 0x2f, "VP8L: bad signature byte")
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    val alphaUsed = br.bit() == 1
    val version = br.bits(3)
    require(version == 0, s"VP8L: version $version")
    val channels = if (alphaUsed) 4 else 3
    require(w.toLong * h * channels <= maxSamples,
      s"VP8L: ${w}x$h x$channels exceeds the sample budget")
    val argb = decodeImageStream(w, h, level0 = true, br, maxSamples)
    val samples = new Array[Int](w * h * channels)
    var i = 0
    while (i < w * h) {
      val p = argb(i)
      samples(i * channels) = (p >>> 16) & 0xff
      samples(i * channels + 1) = (p >>> 8) & 0xff
      samples(i * channels + 2) = p & 0xff
      if (channels == 4) samples(i * channels + 3) = (p >>> 24) & 0xff
      i += 1
    }
    Image(w, h, channels, samples)
  }

  // --- encoder (fixture side) ---------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBits(value: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((value >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    /** A prefix CODE's bits go MSB-first (tree-walk order) into the
      * LSB-first stream. */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { out.write(cur); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** Depth-limited Huffman lengths from frequencies: array-based
    * parent-pointer Huffman (O(m log m), no per-merge allocation — the
    * encoder runs this four times per image), frequency halving until
    * the tree fits the depth bound. Deterministic: ties break on node
    * index. */
  private def huffmanLengths(freqs: Array[Long], maxDepth: Int): Array[Int] = {
    val n = freqs.length
    var f = freqs.clone()
    var attempt = 0
    while (attempt < 64) {
      val lengths = new Array[Int](n)
      val used = (0 until n).filter(f(_) > 0).toArray
      if (used.length == 0) return lengths
      if (used.length == 1) { lengths(used(0)) = 1; return lengths }
      val m = used.length
      val weight = new Array[Long](2 * m - 1)
      val parent = new Array[Int](2 * m - 1)
      java.util.Arrays.fill(parent, -1)
      var i = 0
      while (i < m) { weight(i) = f(used(i)); i += 1 }
      val pq = new java.util.PriorityQueue[Integer](m,
        (a: Integer, b: Integer) => {
          val c = java.lang.Long.compare(weight(a), weight(b))
          if (c != 0) c else Integer.compare(a, b)
        })
      i = 0
      while (i < m) { pq.add(i); i += 1 }
      var next = m
      while (pq.size > 1) {
        val a = pq.poll()
        val b = pq.poll()
        weight(next) = weight(a) + weight(b)
        parent(a) = next
        parent(b) = next
        pq.add(next)
        next += 1
      }
      var maxD = 0
      i = 0
      while (i < m) {
        var d = 0
        var j = i
        while (parent(j) >= 0) { d += 1; j = parent(j) }
        lengths(used(i)) = math.max(d, 1)
        if (d > maxD) maxD = d
        i += 1
      }
      if (maxD <= maxDepth) return lengths
      f = f.map(v => if (v > 0) (v + 1) / 2 else 0)
      attempt += 1
    }
    throw new IllegalStateException("huffmanLengths failed to converge")
  }

  /** Write one prefix code: simple form for ≤2 used symbols (first must
    * fit 8 bits), else the code-length-coded normal form. */
  private def writeHuffmanCode(lengths: Array[Int], bw: BitWriter): Unit = {
    val used = lengths.indices.filter(lengths(_) > 0)
    require(used.nonEmpty, "writeHuffmanCode: empty code")
    if (used.length <= 2 && used.forall(_ < 256)) {
      bw.writeBits(1, 1) // simple
      bw.writeBits(used.length - 1, 1)
      if (used.length == 1) {
        val s = used.head
        if (s <= 1) { bw.writeBits(0, 1); bw.writeBits(s, 1) }
        else { bw.writeBits(1, 1); bw.writeBits(s, 8) }
      } else {
        bw.writeBits(1, 1) // first symbol in 8 bits
        bw.writeBits(used(0), 8)
        bw.writeBits(used(1), 8)
      }
      return
    }
    bw.writeBits(0, 1) // normal
    // run-length the length sequence into code-length symbols
    val stream = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]() // (sym, extra, extraBits)
    var i = 0
    while (i < lengths.length) {
      val v = lengths(i)
      var run = 1
      while (i + run < lengths.length && lengths(i + run) == v) run += 1
      if (v == 0) {
        var left = run
        while (left >= 11) {
          val take = math.min(left, 138)
          stream += ((18, take - 11, 7)); left -= take
        }
        if (left >= 3) { stream += ((17, left - 3, 3)); left = 0 }
        while (left > 0) { stream += ((0, 0, 0)); left -= 1 }
      } else {
        // first occurrence literal, then 16-repeats (requires prev == v)
        stream += ((v, 0, 0))
        var left = run - 1
        while (left >= 3) {
          val take = math.min(left, 6)
          stream += ((16, take - 3, 2)); left -= take
        }
        while (left > 0) { stream += ((v, 0, 0)); left -= 1 }
      }
      i += run
    }
    val clFreq = new Array[Long](19)
    stream.foreach { case (s, _, _) => clFreq(s) += 1 }
    val clLengths = huffmanLengths(clFreq, 7)
    // transmit lengths for a prefix of the fixed order covering all used
    val lastUsed = CodeLengthOrder.lastIndexWhere(s => clLengths(s) > 0)
    val numCodeLengths = math.max(4, lastUsed + 1)
    bw.writeBits(numCodeLengths - 4, 4)
    var k = 0
    while (k < numCodeLengths) {
      bw.writeBits(clLengths(CodeLengthOrder(k)), 3)
      k += 1
    }
    bw.writeBits(0, 1) // no max_symbol shortcut
    val clCodes = canonicalCodes(clLengths)
    val clSingle = clLengths.count(_ > 0) == 1
    stream.foreach { case (s, extra, extraBits) =>
      if (!clSingle) bw.writeCode(clCodes(s), clLengths(s))
      if (extraBits > 0) bw.writeBits(extra, extraBits)
    }
  }

  /** Lossless VP8L encode — literal-only (no transforms, no LZ77, no
    * cache), per-channel Huffman codes. Any 3/4-channel 0..255 image
    * round-trips bit-exactly through [[decode]]. */
  def encode(img: Image): Array[Byte] = {
    require(img.channels == 3 || img.channels == 4,
      s"VP8L encode: ${img.channels} channels")
    require(img.width >= 1 && img.width <= 16384 &&
      img.height >= 1 && img.height <= 16384,
      s"VP8L encode: ${img.width}x${img.height}")
    require(img.samples.length == img.width * img.height * img.channels,
      "VP8L encode: sample count mismatch")
    img.samples.foreach(s => require(s >= 0 && s <= 255,
      s"VP8L encode: sample $s out of range"))
    val n = img.width * img.height
    val hasAlpha = img.channels == 4
    val argb = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = img.samples(i * img.channels)
      val g = img.samples(i * img.channels + 1)
      val b = img.samples(i * img.channels + 2)
      val a = if (hasAlpha) img.samples(i * img.channels + 3) else 255
      argb(i) = (a << 24) | (r << 16) | (g << 8) | b
      i += 1
    }
    val bw = new BitWriter
    bw.writeBits(0x2f, 8)
    bw.writeBits(img.width - 1, 14)
    bw.writeBits(img.height - 1, 14)
    bw.writeBits(if (hasAlpha) 1 else 0, 1)
    bw.writeBits(0, 3) // version
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta prefix codes
    val gFreq = new Array[Long](256 + 24)
    val rFreq = new Array[Long](256)
    val bFreq = new Array[Long](256)
    val aFreq = new Array[Long](256)
    argb.foreach { p =>
      gFreq((p >>> 8) & 0xff) += 1
      rFreq((p >>> 16) & 0xff) += 1
      bFreq(p & 0xff) += 1
      aFreq((p >>> 24) & 0xff) += 1
    }
    val gLen = huffmanLengths(gFreq, MaxCodeLength)
    val rLen = huffmanLengths(rFreq, MaxCodeLength)
    val bLen = huffmanLengths(bFreq, MaxCodeLength)
    val aLen = huffmanLengths(aFreq, MaxCodeLength)
    writeHuffmanCode(gLen, bw)
    writeHuffmanCode(rLen, bw)
    writeHuffmanCode(bLen, bw)
    writeHuffmanCode(aLen, bw)
    // distance code: 1-symbol simple (never read — no backrefs emitted)
    writeHuffmanCode({ val d = new Array[Int](40); d(0) = 1; d }, bw)
    val gCodes = canonicalCodes(gLen)
    val rCodes = canonicalCodes(rLen)
    val bCodes = canonicalCodes(bLen)
    val aCodes = canonicalCodes(aLen)
    def singleOf(lens: Array[Int]): Boolean = lens.count(_ > 0) == 1
    val gS = singleOf(gLen); val rS = singleOf(rLen)
    val bS = singleOf(bLen); val aS = singleOf(aLen)
    argb.foreach { p =>
      val g = (p >>> 8) & 0xff
      val r = (p >>> 16) & 0xff
      val b = p & 0xff
      val a = (p >>> 24) & 0xff
      if (!gS) bw.writeCode(gCodes(g), gLen(g))
      if (!rS) bw.writeCode(rCodes(r), rLen(r))
      if (!bS) bw.writeCode(bCodes(b), bLen(b))
      if (!aS) bw.writeCode(aCodes(a), aLen(a))
    }
    val payload = bw.toBytes
    // RIFF container
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val chunkLen = payload.length
    val padded = chunkLen + (chunkLen & 1)
    tag("RIFF"); w32(4 + 8 + padded); tag("WEBP")
    tag("VP8L"); w32(chunkLen)
    out.write(payload)
    if ((chunkLen & 1) == 1) out.write(0)
    out.toByteArray
  }
}
