package graft.kernel

/** GIF codec (GIF87a/GIF89a), implemented from the public specification
  * (CompuServe GSA89a / W3C note) — no image library.
  *
  * Decode: full block grammar (logical screen descriptor, global and
  * local color tables, extension blocks, image descriptors, trailer),
  * variable-width LZW with deferred-clear dictionaries, interlaced row
  * ordering, and animation COMPOSITING: frames render onto the logical
  * screen at their (left, top) rects honoring transparency and the
  * none / keep / restore-to-background disposal methods
  * (restore-to-previous is rejected loudly — a decoder for untrusted
  * corpus bytes fails visibly on what it does not implement, the same
  * contract as [[Png]]/[[Jpeg]]). Header dimensions are budget-checked
  * in Long arithmetic BEFORE any allocation (the Png lesson: a crafted
  * 2³⁰×2³⁰ screen must raise a message, not overflow into a negative
  * allocation or an executor OOM).
  *
  * Encode: GIF is LOSSLESS — palette indices compress exactly — so the
  * encoder demands an EXACT palette: images with more than 256 distinct
  * colors are rejected (a production writer would quantize; a lossy
  * step hidden inside a lossless container would silently break the
  * round-trip gates every oracle here rides). Single images or full
  * animations, optional interlacing and per-frame local color tables
  * (so the decoder's interlace and LCT paths are exercised by
  * round-trip, not only by hand-built fixtures).
  *
  * Because the codec is lossless end-to-end, encode→decode round-trips
  * are bit-exact for ANY image — the oracle gates need no constant-tile
  * exactness theorem (the [[Jpeg]] trick); every pixel formula is
  * directly recomputable by another engine.
  */
object Gif {

  /** Decoded raster: row-major, channel-interleaved, 0..255 per sample.
    * Decode always expands the palette to RGB (`channels` = 3). Encode
    * accepts 1 channel (gray — palette entries r=g=b) or 3 (RGB). */
  final case class Image(width: Int, height: Int, channels: Int,
      samples: Array[Int])

  /** Decoded animation: per-frame COMPOSITED logical-screen canvases
    * (what a viewer displays after each frame, not the raw sub-rects),
    * RGB, row-major. */
  final case class Animation(width: Int, height: Int,
      frames: Seq[Array[Int]])

  /** Decoded-sample budget (see [[Png.DefaultMaxSamples]]): total RGB
    * samples across ALL composited frames. */
  val DefaultMaxSamples: Long = 1L << 28

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** Header-only (width, height) from the logical screen descriptor —
    * the canvas every frame composites onto. */
  def headerDims(bytes: Array[Byte]): (Int, Int) = {
    require(isGif(bytes), "not a GIF: bad signature")
    require(bytes.length >= 13, "truncated logical screen descriptor")
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val w = u16(6); val h = u16(8)
    require(w > 0 && h > 0, s"GIF: degenerate dimensions ${w}x$h")
    (w, h)
  }

  /** First composited frame (for still images, the image itself). */
  def decode(bytes: Array[Byte],
      maxSamples: Long = DefaultMaxSamples): Image = {
    val anim = decodeFrames(bytes, maxSamples)
    Image(anim.width, anim.height, 3, anim.frames.head)
  }

  /** All composited frames. */
  def decodeFrames(bytes: Array[Byte],
      maxSamples: Long = DefaultMaxSamples): Animation = {
    require(isGif(bytes), "not a GIF: bad signature")
    require(bytes.length >= 13, "truncated logical screen descriptor")
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val width = u16(6)
    val height = u16(8)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height * 3 <= maxSamples,
      s"decoded size ${width}x$height exceeds sample budget $maxSamples")
    val packed = bytes(10) & 0xff
    val bg = bytes(11) & 0xff
    var off = 13
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        val t = readColorTable(bytes, off, n); off += 3 * n; t
      } else null

    // logical screen canvas, packed 0xRRGGBB; background = GCT[bg] when
    // a global table exists (spec semantics; viewers often treat it as
    // transparent, but features need a concrete value — documented)
    val bgColor = if (gct != null && bg < gct.length) gct(bg) else 0
    val canvas = new Array[Int](width * height)
    java.util.Arrays.fill(canvas, bgColor)

    val frames = Seq.newBuilder[Array[Int]]
    var nFrames = 0
    // graphic control state for the NEXT image
    var disposal = 0
    var transIdx = -1
    var sawTrailer = false
    while (!sawTrailer) {
      require(off < bytes.length, "truncated stream (no trailer)")
      (bytes(off) & 0xff) match {
        case 0x3b => sawTrailer = true
        case 0x21 => // extension: label + sub-blocks
          require(off + 2 <= bytes.length, "truncated extension")
          val label = bytes(off + 1) & 0xff
          off += 2
          if (label == 0xf9) { // graphic control
            require(off + 6 <= bytes.length && (bytes(off) & 0xff) == 4,
              "bad graphic control block")
            val p = bytes(off + 1) & 0xff
            disposal = (p >> 2) & 7
            transIdx = if ((p & 1) != 0) bytes(off + 4) & 0xff else -1
            off += 5 // block size byte + 4 data bytes
          }
          off = skipSubBlocks(bytes, off)
        case 0x2c => // image descriptor
          require(off + 10 <= bytes.length, "truncated image descriptor")
          val left = u16(off + 1); val top = u16(off + 3)
          val iw = u16(off + 5); val ih = u16(off + 7)
          val ip = bytes(off + 9) & 0xff
          off += 10
          require(iw > 0 && ih > 0, s"bad image dimensions ${iw}x$ih")
          require(left + iw <= width && top + ih <= height,
            s"image rect ${iw}x$ih@($left,$top) outside ${width}x$height screen")
          val lct: Array[Int] =
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              val t = readColorTable(bytes, off, n); off += 3 * n; t
            } else null
          val interlaced = (ip & 0x40) != 0
          val table = if (lct != null) lct else gct
          require(table != null, "image with no color table (global or local)")
          require(nFrames.toLong * width * height * 3 <= maxSamples,
            s"animation exceeds sample budget $maxSamples at frame $nFrames")
          require(disposal <= 2,
            s"disposal method $disposal unsupported (restore-to-previous)")

          require(off < bytes.length, "missing LZW minimum code size")
          val minCode = bytes(off) & 0xff
          require(minCode >= 2 && minCode <= 8, s"bad LZW min code size $minCode")
          off += 1
          val (data, next) = concatSubBlocks(bytes, off)
          off = next
          val indices = lzwDecode(data, minCode, iw * ih)

          // render the sub-rect onto the canvas (transparency skips)
          var y = 0
          val rowOrder = if (interlaced) interlaceRows(ih) else null
          while (y < ih) {
            val sy = if (interlaced) rowOrder(y) else y
            var x = 0
            while (x < iw) {
              val idx = indices(y * iw + x)
              if (idx != transIdx) {
                require(idx < table.length,
                  s"palette index $idx outside ${table.length}-entry table")
                canvas((top + sy) * width + left + x) = table(idx)
              }
              x += 1
            }
            y += 1
          }
          // snapshot the composited frame as RGB samples
          val frame = new Array[Int](width * height * 3)
          var i = 0
          while (i < canvas.length) {
            val c = canvas(i)
            frame(3 * i) = (c >> 16) & 0xff
            frame(3 * i + 1) = (c >> 8) & 0xff
            frame(3 * i + 2) = c & 0xff
            i += 1
          }
          frames += frame
          nFrames += 1
          // disposal prepares the canvas for the NEXT frame
          if (disposal == 2) {
            var ry = 0
            while (ry < ih) {
              var rx = 0
              while (rx < iw) {
                canvas((top + ry) * width + left + rx) = bgColor
                rx += 1
              }
              ry += 1
            }
          }
          disposal = 0; transIdx = -1
        case other => throw new IllegalArgumentException(
          f"unknown block 0x$other%02x at $off")
      }
    }
    require(nFrames > 0, "no image data before trailer")
    Animation(width, height, frames.result())
  }

  private def readColorTable(b: Array[Byte], off: Int, n: Int): Array[Int] = {
    require(off + 3 * n <= b.length, "truncated color table")
    Array.tabulate(n) { i =>
      ((b(off + 3 * i) & 0xff) << 16) | ((b(off + 3 * i + 1) & 0xff) << 8) |
        (b(off + 3 * i + 2) & 0xff)
    }
  }

  private def skipSubBlocks(b: Array[Byte], start: Int): Int = {
    var off = start
    while ({
      require(off < b.length, "truncated sub-blocks")
      val n = b(off) & 0xff
      off += 1 + n
      n != 0
    }) ()
    off
  }

  private def concatSubBlocks(b: Array[Byte], start: Int): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var off = start
    while ({
      require(off < b.length, "truncated sub-blocks")
      val n = b(off) & 0xff
      require(off + 1 + n <= b.length, "truncated sub-block data")
      out.write(b, off + 1, n)
      off += 1 + n
      n != 0
    }) ()
    (out.toByteArray, off)
  }

  /** Interlace row order (spec appendix E): pass 1 rows 0,8,16…, pass 2
    * rows 4,12…, pass 3 rows 2,6…, pass 4 rows 1,3… — returns the
    * screen row for each STORED row position. */
  private def interlaceRows(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var i = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) { out(i) = y; i += 1; y += step }
    }
    out
  }

  // LZW --------------------------------------------------------------------

  /** GIF variable-width LZW decode → `n` palette indices. Codes are
    * LSB-first; width starts at minCode+1, grows when the next free slot
    * reaches 2^width (max 12); a full dictionary stays usable until the
    * encoder sends a clear ("deferred clear", spec appendix F). */
  private def lzwDecode(data: Array[Byte], minCode: Int, n: Int): Array[Int] = {
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = end + 1
    var codeSize = minCode + 1
    val out = new Array[Int](n)
    var outPos = 0
    var bitPos = 0
    var prev = -1
    val stack = new Array[Int](4096)

    def readCode(): Int = {
      if ((bitPos + codeSize + 7) / 8 > data.length) return end // truncated → stop
      var v = 0
      var i = 0
      while (i < codeSize) {
        val byteI = (bitPos + i) >> 3
        if (((data(byteI) >> ((bitPos + i) & 7)) & 1) != 0) v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }

    var done = false
    while (!done && outPos < n) {
      val code = readCode()
      if (code == clear) {
        next = end + 1; codeSize = minCode + 1; prev = -1
      } else if (code == end) {
        done = true
      } else {
        // code == next is the KwKwK case: the encoder referenced the
        // entry it was defining, whose string is string(prev)+first(prev)
        require(code < next || (code == next && prev >= 0),
          s"LZW code $code outside dictionary (next=$next)")
        val kwk = code == next
        var sp = 0
        var c = if (kwk) prev else code
        while (c >= clear + 2) {
          stack(sp) = suffix(c); sp += 1
          c = prefix(c)
        }
        stack(sp) = c; sp += 1
        val first = stack(sp - 1) // first symbol of the expansion
        require(outPos + sp + (if (kwk) 1 else 0) <= n,
          s"LZW output overruns ${n}-pixel image")
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (kwk) { out(outPos) = first; outPos += 1 }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          // width grows when the free slot reaches the current limit
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    require(outPos == n, s"LZW stream produced $outPos of $n pixels")
    out
  }

  /** GIF variable-width LZW encode of palette indices. Starts with a
    * clear code (standard practice), resets the dictionary via clear
    * when it fills. */
  private def lzwEncode(indices: Array[Int], minCode: Int,
      out: java.io.ByteArrayOutputStream): Unit = {
    val clear = 1 << minCode
    val end = clear + 1
    var next = end + 1
    var codeSize = minCode + 1
    val dict = new java.util.HashMap[Int, Int]() // (prefix << 12 | char) → code

    var bitBuf = 0L
    var bitCnt = 0
    val bytes = new java.io.ByteArrayOutputStream()
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        bytes.write((bitBuf & 0xff).toInt)
        bitBuf >>= 8; bitCnt -= 8
      }
      // width grows when the free slot has reached the current limit —
      // checked after EVERY write and before this step's define (the
      // classic compress ordering): the decoder's defines lag one code
      // behind the encoder's, and this placement makes both sides derive
      // the same width for every code, including the trailing end code
      if (next >= (1 << codeSize) && codeSize < 12) codeSize += 1
    }

    emit(clear)
    var prev = -1
    var i = 0
    while (i < indices.length) {
      val ch = indices(i)
      if (prev < 0) prev = ch
      else {
        val key = (prev << 12) | ch
        val hit = dict.getOrDefault(key, -1)
        if (hit >= 0) prev = hit
        else {
          emit(prev)
          if (next < 4096) {
            dict.put(key, next)
            next += 1
          } else {
            emit(clear)
            dict.clear(); next = end + 1; codeSize = minCode + 1
          }
          prev = ch
        }
      }
      i += 1
    }
    if (prev >= 0) emit(prev)
    emit(end)
    if (bitCnt > 0) bytes.write((bitBuf & 0xff).toInt)

    // wrap in ≤255-byte sub-blocks
    val raw = bytes.toByteArray
    var o = 0
    while (o < raw.length) {
      val len = math.min(255, raw.length - o)
      out.write(len)
      out.write(raw, o, len)
      o += len
    }
    out.write(0) // block terminator
  }

  // encode -----------------------------------------------------------------

  /** Lossless single-image encode. `img.channels` 1 (gray) or 3 (RGB);
    * requires ≤256 distinct colors (exact palette — see object doc).
    * `interlaced` writes interlace row order (decoder-path coverage). */
  def encode(img: Image, interlaced: Boolean = false): Array[Byte] =
    encodeAnimation(img.width, img.height, Seq(img.samples), img.channels,
      interlaced = interlaced)

  /** Lossless animation encode: every frame is a full logical-screen
    * raster, disposal "none" (each frame simply replaces the last —
    * matching the composited-canvas contract of [[decodeFrames]]).
    * `localTables` stores each frame's palette as a local color table
    * (no global one) instead of one shared global table. */
  def encodeAnimation(width: Int, height: Int, frames: Seq[Array[Int]],
      channels: Int = 3, interlaced: Boolean = false,
      localTables: Boolean = false): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels")
    require(frames.nonEmpty, "no frames")
    frames.foreach(f => require(f.length == width * height * channels,
      s"frame length ${f.length} != ${width}x$height x$channels"))

    def colorOf(f: Array[Int], p: Int): Int =
      if (channels == 1) { val v = f(p) & 0xff; (v << 16) | (v << 8) | v }
      else ((f(3 * p) & 0xff) << 16) | ((f(3 * p + 1) & 0xff) << 8) |
        (f(3 * p + 2) & 0xff)

    def paletteOf(fs: Seq[Array[Int]]): (Array[Int], java.util.HashMap[Integer, Integer]) = {
      val map = new java.util.HashMap[Integer, Integer]()
      val colors = Seq.newBuilder[Int]
      for (f <- fs; p <- 0 until width * height) {
        val c = colorOf(f, p)
        if (!map.containsKey(c)) {
          require(map.size < 256,
            "more than 256 distinct colors — exact-palette encoder (quantize first)")
          map.put(c, map.size); colors += c
        }
      }
      (colors.result().toArray, map)
    }

    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)

    def tableBits(n: Int): Int = { // palette size exponent-1, ≥ 1
      var bits = 1
      while ((2 << bits) < n) bits += 1
      bits
    }
    def writeTable(pal: Array[Int], bits: Int): Unit = {
      var i = 0
      while (i < (2 << bits)) {
        val c = if (i < pal.length) pal(i) else 0
        out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
        i += 1
      }
    }

    val global = if (localTables) null else paletteOf(frames)
    if (global != null) {
      val bits = tableBits(global._1.length)
      out.write(0x80 | bits) // GCT present, size
      out.write(0) // background index
      out.write(0) // aspect
      writeTable(global._1, bits)
    } else {
      out.write(0); out.write(0); out.write(0) // no GCT
    }

    for (f <- frames) {
      val (pal, map) = if (global != null) global else paletteOf(Seq(f))
      val bits = tableBits(pal.length)
      out.write(0x2c) // image descriptor
      u16(0); u16(0); u16(width); u16(height)
      val flags = (if (global == null) 0x80 | bits else 0) |
        (if (interlaced) 0x40 else 0)
      out.write(flags)
      if (global == null) writeTable(pal, bits)

      val rowOrder = if (interlaced) interlaceRows(height) else null
      val indices = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val sy = if (interlaced) rowOrder(y) else y
        var x = 0
        while (x < width) {
          indices(y * width + x) = map.get(colorOf(f, sy * width + x))
          x += 1
        }
        y += 1
      }
      val minCode = math.max(2, bits + 1)
      out.write(minCode)
      lzwEncode(indices, minCode, out)
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
