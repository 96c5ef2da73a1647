package graft.kernel

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec (decode + 8-bit encode), built from the public PNG
  * specification (RFC 2083 / W3C PNG second edition) the same way
  * [[Hdf5]]/[[Tiff]] are built from their public specs — no image
  * library, just `java.util.zip` for the zlib stream.
  *
  * Decode supports the full static surface: bit depths 1/2/4/8/16,
  * color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+α), 6 (RGBA),
  * all five per-row filters, multi-IDAT streams, chunk CRC
  * verification, and both interlace methods (progressive Adam7 streams
  * deinterlace to the identical pixels as their sequential twins —
  * filters apply within each of the seven pass sub-images, spec §8.2).
  * Dimensions are untrusted input: decode validates the header-implied
  * sample count against a configurable budget before allocating.
  *
  * Reference behavior anchor: the reference pipeline's per-asset raster
  * statistics over decoded pixels (cloud-optimized-data-pipelines
  * lambdas/build-stac/utils/stac.py:33-48); here the decoded samples
  * feed [[graft.operators.Multimodal]]'s feature kernel instead.
  */
object Png {

  /** Decoded raster: `samples` is row-major, channel-interleaved, one
    * Int per sample — 0..255 for depths ≤ 8 (sub-8-bit grayscale scales
    * by 255/(2^d−1), so 1-bit white is 255, not 1 — the spec's
    * max-intensity mapping; without it the same picture at depth 1 vs 8
    * would feature wildly differently), 0..65535 for depth 16. Palette
    * images expand to RGB. `bitDepth` reports the SOURCE depth. */
  final case class Image(width: Int, height: Int, channels: Int,
      bitDepth: Int, samples: Array[Int])

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == Signature(i))

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Decoded-sample budget: a corpus decoder sees untrusted headers, so
    * dimensions are validated against this cap BEFORE any allocation —
    * a crafted 2³⁰×2³⁰ IHDR must fail with a message, not an Int
    * overflow into NegativeArraySizeException or an executor OOM. The
    * default (2²⁸ samples ≈ a 256-megapixel gray or 89-megapixel RGB
    * image → ≤ 1 GiB of Int samples) is far above real crawl media;
    * callers with bigger legitimate rasters pass their own bound. */
  val DefaultMaxSamples: Long = 1L << 28

  /** Adam7 pass geometry (spec §8.2): xStart, yStart, xStep, yStep. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Header-only (width, height) from IHDR — which the spec requires
    * to be the FIRST chunk, so this is a fixed-offset read. */
  def headerDims(bytes: Array[Byte]): (Int, Int) = {
    require(isPng(bytes), "not a PNG: bad signature")
    require(bytes.length >= 24, "PNG: truncated before IHDR")
    require(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
      bytes(15) == 'R', "PNG: first chunk is not IHDR")
    val w = be32(bytes, 16); val h = be32(bytes, 20)
    require(w > 0 && h > 0, s"PNG: degenerate dimensions ${w}x$h")
    (w, h)
  }

  def decode(bytes: Array[Byte], maxSamples: Long = DefaultMaxSamples): Image = {
    require(isPng(bytes), "not a PNG: bad signature")
    var off = 8
    var width, height, bitDepth, colorType, interlace = -1
    var palette: Array[Int] = null // packed 0xRRGGBB
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && off + 8 <= bytes.length) {
      val len = be32(bytes, off)
      val ctype = new String(bytes, off + 4, 4, "US-ASCII")
      require(len >= 0 && off + 12 + len <= bytes.length,
        s"truncated chunk $ctype at $off")
      val crc = new CRC32()
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == be32(bytes, off + 8 + len),
        s"CRC mismatch in chunk $ctype")
      val d = off + 8
      ctype match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          width = be32(bytes, d); height = be32(bytes, d + 4)
          bitDepth = bytes(d + 8) & 0xff; colorType = bytes(d + 9) & 0xff
          require((bytes(d + 10) & 0xff) == 0, "unknown compression method")
          require((bytes(d + 11) & 0xff) == 0, "unknown filter method")
          interlace = bytes(d + 12) & 0xff
          require(interlace == 0 || interlace == 1,
            s"unknown interlace method $interlace")
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
        case "PLTE" =>
          require(len % 3 == 0, s"PLTE length $len")
          palette = Array.tabulate(len / 3) { i =>
            ((bytes(d + 3 * i) & 0xff) << 16) |
              ((bytes(d + 3 * i + 1) & 0xff) << 8) |
              (bytes(d + 3 * i + 2) & 0xff)
          }
        case "IDAT" => idat.write(bytes, d, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunk — metadata, not pixels
      }
      off += 12 + len
    }
    require(width > 0, "missing IHDR")
    require(sawEnd, "missing IEND")
    val rawChannels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case t => throw new IllegalArgumentException(s"bad color type $t")
    }
    val okDepth = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)
      case 3 => Set(1, 2, 4, 8)
      case _ => Set(8, 16)
    }
    require(okDepth(bitDepth), s"bit depth $bitDepth invalid for color type $colorType")
    if (colorType == 3) require(palette != null, "palette image missing PLTE")

    // header-derived sizes in LONG, validated against the sample budget
    // BEFORE any allocation (untrusted input: a crafted huge IHDR must
    // fail loudly here, not overflow an Int array size or OOM the task)
    val outChannels = if (colorType == 3) 3 else rawChannels
    val bitsPerPixel = rawChannels * bitDepth
    val totalSamples = width.toLong * height.toLong * outChannels
    require(totalSamples <= maxSamples,
      s"${width}x$height x$outChannels = $totalSamples samples exceeds " +
        s"the $maxSamples-sample decode budget (corrupt or hostile header?)")

    // pass geometry: one full-image pass, or the seven Adam7 sub-images
    // (spec §8.2; passes with zero pixels contribute NO bytes, not even
    // filter bytes)
    val passes: Array[(Int, Int, Int, Int, Int, Int)] =
      (if (interlace == 0) Array((0, 0, 1, 1))
       else Adam7.map(p => (p._1, p._2, p._3, p._4)))
        .map { case (xs, ys, xStep, yStep) =>
          val wp = if (width > xs) (width - xs + xStep - 1) / xStep else 0
          val hp = if (height > ys) (height - ys + yStep - 1) / yStep else 0
          (xs, ys, xStep, yStep, wp, hp)
        }
        .filter { case (_, _, _, _, wp, hp) => wp > 0 && hp > 0 }
    def rowBytesOf(w: Int): Int = ((w.toLong * bitsPerPixel + 7) / 8).toInt
    val expectedL = passes.map { case (_, _, _, _, wp, hp) =>
      (rowBytesOf(wp) + 1).toLong * hp
    }.sum
    require(expectedL <= Int.MaxValue - 8,
      s"filtered stream of $expectedL bytes exceeds a JVM array")
    val expected = expectedL.toInt

    // inflate the concatenated IDAT zlib stream
    val raw = new Array[Byte](expected)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    var stalled = false
    while (got < expected && !inf.finished() && !stalled) {
      val n = inf.inflate(raw, got, expected - got)
      // n == 0 with the stream unfinished means the input ran dry —
      // stop instead of spinning; the final length require reports it
      stalled = n == 0 && !inf.finished()
      got += n
    }
    inf.end()
    require(got == expected, s"IDAT inflated to $got bytes, expected $expected")

    val samples = new Array[Int](totalSamples.toInt)
    var rawBase = 0
    passes.foreach { case (xs, ys, xStep, yStep, wp, hp) =>
      val bytesPerRow = rowBytesOf(wp)

      // undo per-row filters (spec §6: None/Sub/Up/Average/Paeth) within
      // this pass's sub-image — filters never reach across passes. `bpp`
      // is the per-pixel byte distance for the `a`/`c` neighbors — at
      // least 1 even for sub-byte depths.
      val bpp = math.max(1, bitsPerPixel / 8)
      val img = new Array[Byte](bytesPerRow * hp)
      var y = 0
      while (y < hp) {
        val ft = raw(rawBase + y * (bytesPerRow + 1)) & 0xff
        val src = rawBase + y * (bytesPerRow + 1) + 1
        val dst = y * bytesPerRow
        val prev = dst - bytesPerRow
        var x = 0
        while (x < bytesPerRow) {
          val rx = raw(src + x) & 0xff
          val a = if (x >= bpp) img(dst + x - bpp) & 0xff else 0
          val b = if (y > 0) img(prev + x) & 0xff else 0
          val c = if (y > 0 && x >= bpp) img(prev + x - bpp) & 0xff else 0
          val v = ft match {
            case 0 => rx
            case 1 => rx + a
            case 2 => rx + b
            case 3 => rx + (a + b) / 2
            case 4 => // Paeth predictor, exactly as specified
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              rx + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case other => throw new IllegalArgumentException(s"bad filter $other on row $y")
          }
          img(dst + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      rawBase += (bytesPerRow + 1) * hp

      // unpack this pass's bytes to samples, scattered to the pass's
      // strided pixel positions in the full image; expand palette to RGB
      y = 0
      while (y < hp) {
        val row = y * bytesPerRow
        var x = 0
        while (x < wp) {
          var si = ((ys + y.toLong * yStep) * width +
            (xs + x.toLong * xStep)).toInt * outChannels
          if (colorType == 3) {
            val idx = bitDepth match {
              case 8 => img(row + x) & 0xff
              case d => // 1/2/4-bit indices packed big-endian within the byte
                val bitOff = x * d
                (img(row + bitOff / 8) >> (8 - d - bitOff % 8)) & ((1 << d) - 1)
            }
            require(idx < palette.length, s"palette index $idx out of range")
            val rgb = palette(idx)
            samples(si) = (rgb >> 16) & 0xff
            samples(si + 1) = (rgb >> 8) & 0xff
            samples(si + 2) = rgb & 0xff
          } else {
            var ch = 0
            while (ch < rawChannels) {
              samples(si) = bitDepth match {
                case 16 =>
                  val o = row + (x * rawChannels + ch) * 2
                  ((img(o) & 0xff) << 8) | (img(o + 1) & 0xff)
                case 8 => img(row + x * rawChannels + ch) & 0xff
                case d => // gray 1/2/4-bit, scaled to full 0..255 range
                  val bitOff = x * d
                  val raw = (img(row + bitOff / 8) >> (8 - d - bitOff % 8)) &
                    ((1 << d) - 1)
                  raw * 255 / ((1 << d) - 1)
              }
              si += 1
              ch += 1
            }
          }
          x += 1
        }
        y += 1
      }
    }
    Image(width, height, outChannels, if (colorType == 3) 8 else bitDepth, samples)
  }

  /** Encode an 8-bit image (1=gray, 2=gray+α, 3=RGB, 4=RGBA channels),
    * filter None on every row. Compressed bytes are deterministic for a
    * given JVM; consumers must compare DECODED pixels, never the stream. */
  def encode(img: Image): Array[Byte] = {
    require(img.bitDepth == 8, s"encoder is 8-bit only, got ${img.bitDepth}")
    val colorType = img.channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case n => throw new IllegalArgumentException(s"bad channel count $n")
    }
    require(img.samples.length == img.width * img.height * img.channels,
      "sample count does not match dimensions")
    val bytesPerRow = img.width * img.channels
    val filtered = new Array[Byte]((bytesPerRow + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val dst = y * (bytesPerRow + 1)
      filtered(dst) = 0 // filter None
      var x = 0
      while (x < bytesPerRow) {
        filtered(dst + 1 + x) = (img.samples(y * bytesPerRow + x) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new Deflater(Deflater.DEFAULT_COMPRESSION)
    def_.setInput(filtered)
    def_.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) zout.write(buf, 0, def_.deflate(buf))
    def_.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb)
      out.write(data)
      val crc = new CRC32()
      crc.update(tb); crc.update(data)
      val c = crc.getValue.toInt
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (img.width >>> 24).toByte; ihdr(1) = (img.width >>> 16).toByte
    ihdr(2) = (img.width >>> 8).toByte; ihdr(3) = img.width.toByte
    ihdr(4) = (img.height >>> 24).toByte; ihdr(5) = (img.height >>> 16).toByte
    ihdr(6) = (img.height >>> 8).toByte; ihdr(7) = img.height.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // compression 0, filter 0, interlace 0 already zero-initialized
    chunk("IHDR", ihdr)
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
