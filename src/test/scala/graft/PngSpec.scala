package graft

import java.util.zip.{CRC32, Deflater}

import graft.kernel.Png
import graft.operators.Multimodal

/** [[graft.kernel.Png]] codec gates. The decode tests are INDEPENDENT of
  * the encoder: fixture PNGs are hand-assembled from the spec grammar
  * (chunk layout, per-row filter bytes hand-computed on paper), with only
  * `java.util.zip.Deflater` — the opposite direction from the decoder's
  * Inflater — compressing the hand-built filtered scanlines. Expected
  * pixels are written out literally, not derived by code under test.
  * Also gates the perceptual-hash family built on the decoder (m08/m09):
  * hand-computed block sums, re-encode collision, constructed hamming.
  */
class PngSpec extends SparkSuite {

  /** Assemble a PNG from hand-built FILTERED scanlines (filter byte +
    * row bytes, exactly what sits inside the zlib stream). */
  private def mkPng(width: Int, height: Int, bitDepth: Int, colorType: Int,
      filtered: Array[Byte], plte: Array[Byte] = null,
      interlace: Int = 0): Array[Byte] = {
    val deflater = new Deflater()
    deflater.setInput(filtered)
    deflater.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(t: String, d: Array[Byte]): Unit = {
      out.write(Array((d.length >>> 24).toByte, (d.length >>> 16).toByte,
        (d.length >>> 8).toByte, d.length.toByte))
      val tb = t.getBytes("US-ASCII")
      out.write(tb); out.write(d)
      val crc = new CRC32(); crc.update(tb); crc.update(d)
      val c = crc.getValue.toInt
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte))
    }
    chunk("IHDR", Array(
      (width >>> 24).toByte, (width >>> 16).toByte, (width >>> 8).toByte, width.toByte,
      (height >>> 24).toByte, (height >>> 16).toByte, (height >>> 8).toByte, height.toByte,
      bitDepth.toByte, colorType.toByte, 0, 0, interlace.toByte))
    if (plte != null) chunk("PLTE", plte)
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("gray 8-bit decode undoes Sub/Up/Average/Paeth filters (hand-computed)") {
    // 3×4 grayscale; target pixels per row:
    //   row0: 10  20  30   — filter 1 (Sub):     10, 10, 10
    //   row1: 15  25  35   — filter 2 (Up):       5,  5,  5
    //   row2: 100 110 120  — filter 3 (Average): 93, 48, 48
    //   row3: 50  60  70   — filter 4 (Paeth):  206, 10, 10
    // (filtered bytes worked out by hand from the spec's filter formulas)
    val filtered = Array[Int](
      1, 10, 10, 10,
      2, 5, 5, 5,
      3, 93, 48, 48,
      4, 206, 10, 10).map(_.toByte)
    val img = Png.decode(mkPng(3, 4, 8, 0, filtered))
    assert(img.width == 3 && img.height == 4 && img.channels == 1 && img.bitDepth == 8)
    assert(img.samples.toSeq == Seq(10, 20, 30, 15, 25, 35, 100, 110, 120, 50, 60, 70))
  }

  test("RGB decode: Sub/Up use the 3-byte pixel stride, not 1") {
    // 2×2 RGB; target pixels:
    //   row0: (1,2,3) (10,20,30)   — Sub:  1,2,3, 9,18,27
    //   row1: (5,5,5) (6,7,8)      — Up:   4,3,2, 252,243,234 (mod 256)
    val filtered = Array[Int](
      1, 1, 2, 3, 9, 18, 27,
      2, 4, 3, 2, 252, 243, 234).map(_.toByte)
    val img = Png.decode(mkPng(2, 2, 8, 2, filtered))
    assert(img.channels == 3)
    assert(img.samples.toSeq == Seq(1, 2, 3, 10, 20, 30, 5, 5, 5, 6, 7, 8))
  }

  test("4-bit palette image expands indices to RGB through PLTE") {
    // 3×2, palette [red, green, blue]; indices row0: 0,1,2  row1: 2,1,0.
    // 4-bit packing big-endian within each byte: row0 = 0x01 0x20,
    // row1 = 0x21 0x00; filter 0 on both rows.
    val plte = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255).map(_.toByte)
    val filtered = Array[Int](0, 0x01, 0x20, 0, 0x21, 0x00).map(_.toByte)
    val img = Png.decode(mkPng(3, 2, 4, 3, filtered, plte))
    assert(img.channels == 3 && img.bitDepth == 8)
    assert(img.samples.toSeq == Seq(
      255, 0, 0, 0, 255, 0, 0, 0, 255,
      0, 0, 255, 0, 255, 0, 255, 0, 0))
  }

  test("sub-8-bit grayscale scales to the full 0..255 range") {
    // 1-bit 8×1: bits 1011 0010 → 255,0,255,255,0,0,255,0
    val g1 = Png.decode(mkPng(8, 1, 1, 0, Array[Int](0, 0xb2).map(_.toByte)))
    assert(g1.bitDepth == 1)
    assert(g1.samples.toSeq == Seq(255, 0, 255, 255, 0, 0, 255, 0))
    // 2-bit 4×1: values 0,1,2,3 packed 0b00011011 → 0, 85, 170, 255
    val g2 = Png.decode(mkPng(4, 1, 2, 0, Array[Int](0, 0x1b).map(_.toByte)))
    assert(g2.samples.toSeq == Seq(0, 85, 170, 255))
  }

  test("16-bit gray decode keeps full sample range (big-endian pairs)") {
    val filtered = Array[Int](
      0, 1, 0, 2, 0, // 256, 512
      0, 3, 232, 255, 255 // 1000, 65535
    ).map(_.toByte)
    val img = Png.decode(mkPng(2, 2, 16, 0, filtered))
    assert(img.bitDepth == 16)
    assert(img.samples.toSeq == Seq(256, 512, 1000, 65535))
  }

  test("encode → decode round-trips gray, RGB and RGBA bit-exactly") {
    for (ch <- Seq(1, 3, 4)) {
      val w = 9; val h = 5
      val px = Array.tabulate(w * h * ch)(i => (i * 37 + 11) % 256)
      val img = Png.Image(w, h, ch, 8, px)
      val back = Png.decode(Png.encode(img))
      assert(back.width == w && back.height == h && back.channels == ch)
      assert(back.samples.toSeq == px.toSeq, s"round-trip drift at channels=$ch")
    }
  }

  test("malformed inputs fail loudly, never misdecode") {
    // not a PNG
    assertThrows[IllegalArgumentException](Png.decode("JFIF....".getBytes))
    // unknown interlace method (0 and 1 are the only spec values)
    val badInter = mkPng(1, 1, 8, 0, Array[Byte](0, 7), interlace = 2)
    val e1 = intercept[IllegalArgumentException](Png.decode(badInter))
    assert(e1.getMessage.contains("interlace"))
    // corrupted chunk body → CRC mismatch
    val ok = mkPng(1, 1, 8, 0, Array[Byte](0, 7))
    val bad = ok.clone()
    bad(20) = (bad(20) ^ 0x01).toByte // inside IHDR data
    val e2 = intercept[IllegalArgumentException](Png.decode(bad))
    assert(e2.getMessage.contains("CRC"))
    // truncated IDAT: drop the last chunks entirely
    val cut = java.util.Arrays.copyOf(ok, 40)
    assertThrows[IllegalArgumentException](Png.decode(cut))
  }

  /** Adam7 pass geometry duplicated from the spec (NOT from the code
    * under test): xStart, yStart, xStep, yStep per pass. */
  private val adam7 =
    Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Build the interlaced filtered stream for an 8-bit image: per spec
    * each non-empty pass contributes its own scanlines (filter byte +
    * pass-row bytes). `subOnPass` rows use filter 1 (Sub, encoded
    * test-side from the spec formula) to prove filters stay inside a
    * pass sub-image. */
  private def interlacedFiltered(w: Int, h: Int, ch: Int,
      pix: (Int, Int, Int) => Int, subOnPass: Set[Int] = Set()): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    adam7.zipWithIndex.foreach { case ((xs, ys, dx, dy), pi) =>
      val cols = xs until w by dx
      val rows = ys until h by dy
      if (cols.nonEmpty && rows.nonEmpty) rows.foreach { y =>
        val rowVals = cols.flatMap(x => (0 until ch).map(c => pix(x, y, c)))
        if (subOnPass(pi)) {
          out.write(1)
          rowVals.zipWithIndex.foreach { case (v, i) =>
            val a = if (i >= ch) rowVals(i - ch) else 0
            out.write((v - a) & 0xff)
          }
        } else {
          out.write(0)
          rowVals.foreach(v => out.write(v & 0xff))
        }
      }
    }
    out.toByteArray
  }

  test("Adam7 interlaced gray decodes bit-exact to its sequential twin") {
    val w = 8; val h = 8
    def pix(x: Int, y: Int, c: Int) = (x * 7 + y * 5 + 3) % 256
    val seqFiltered = (0 until h).flatMap(y =>
      0 +: (0 until w).map(x => pix(x, y, 0))).map(_.toByte).toArray
    val straight = Png.decode(mkPng(w, h, 8, 0, seqFiltered))
    // pass 7 rows use Sub filtering — per-pass neighbors, not full-image
    val inter = Png.decode(mkPng(w, h, 8, 0,
      interlacedFiltered(w, h, 1, pix, subOnPass = Set(6)), interlace = 1))
    assert(inter.width == w && inter.height == h && inter.channels == 1)
    assert(inter.samples.toSeq == straight.samples.toSeq)
    assert(straight.samples.toSeq ==
      (for (y <- 0 until h; x <- 0 until w) yield pix(x, y, 0)))
  }

  test("Adam7 ragged RGB (5x6): partial and empty passes land correctly") {
    // width 5 / height 6 leaves pass 2 empty (xStart 4 < 5 keeps it,
    // but e.g. 3-wide would drop it) and every pass ragged — the shape
    // that breaks ceil arithmetic if any off-by-one exists
    val w = 5; val h = 6
    def pix(x: Int, y: Int, c: Int) = (x * 11 + y * 17 + c * 29 + 1) % 256
    val seqFiltered = (0 until h).flatMap(y =>
      0 +: (0 until w).flatMap(x => (0 until 3).map(c => pix(x, y, c))))
      .map(_.toByte).toArray
    val straight = Png.decode(mkPng(w, h, 8, 2, seqFiltered))
    val inter = Png.decode(mkPng(w, h, 8, 2,
      interlacedFiltered(w, h, 3, pix), interlace = 1))
    assert(inter.samples.toSeq == straight.samples.toSeq)
  }

  test("hostile IHDR dimensions are rejected before any allocation") {
    // 2^30 × 2^30 would overflow Int sample math into a negative array
    // size or an OOM — the sample budget must reject it first
    val huge = mkPng(1 << 30, 1 << 30, 8, 0, Array[Byte](0, 7))
    val e = intercept[IllegalArgumentException](Png.decode(huge))
    assert(e.getMessage.contains("budget"))
    // a legitimate image decodes under a caller-supplied tighter budget
    // only if it fits
    val ok = mkPng(2, 2, 8, 0, Array[Int](0, 1, 2, 0, 3, 4).map(_.toByte))
    assert(Png.decode(ok, maxSamples = 4).samples.toSeq == Seq(1, 2, 3, 4))
    val e2 = intercept[IllegalArgumentException](Png.decode(ok, maxSamples = 3))
    assert(e2.getMessage.contains("budget"))
  }

  test("PngDecoder.decode: channel mean excludes alpha") {
    // 2×1 RGBA: (10,20,30,255) (40,50,60,0) → mean over the 6 color
    // samples = 210/6 = 35.0; alpha bytes must not contribute
    val px = Array(10, 20, 30, 255, 40, 50, 60, 0)
    val bytes = Png.encode(Png.Image(2, 1, 4, 8, px))
    val (w, h, mean) = new Multimodal.PngDecoder().decode(bytes)
    assert(w == 2 && h == 1)
    assert(mean == 35.0)
  }

  test("PngDecoder.resize: 2×2 box average, hand-computed, output is a real PNG") {
    // 4×2 gray → 2×1; blocks {10,20,30,40}→25 and {100,101,102,103}→101
    val px = Array(10, 20, 100, 101, 30, 40, 102, 103)
    val bytes = Png.encode(Png.Image(4, 2, 1, 8, px))
    val (rw, rh, thumb) = new Multimodal.PngDecoder().resize(bytes)
    assert(rw == 2 && rh == 1)
    val timg = Png.decode(thumb)
    assert(timg.width == 2 && timg.height == 1 && timg.channels == 1)
    assert(timg.samples.toSeq == Seq(25, 101))
  }

  test("PngDecoder.resize: odd dimensions keep the partial edge blocks") {
    // 3×3 gray → 2×2; blocks: {0,1,3,4}→2, col2 {2,5}→3, row2 {6,7}→6, corner {8}→8
    val px = Array(0, 1, 2, 3, 4, 5, 6, 7, 8)
    val (rw, rh, thumb) = new Multimodal.PngDecoder()
      .resize(Png.encode(Png.Image(3, 3, 1, 8, px)))
    assert(rw == 2 && rh == 2)
    assert(Png.decode(thumb).samples.toSeq == Seq(2, 3, 6, 8))
  }

  test("PngDecoder.blockSums: hand-computed integer block sums") {
    // 4×2 gray, grid 2: blocks are 2×1 — sums 0+10, 20+30, 40+50, 60+70
    val px = Array(0, 10, 20, 30, 40, 50, 60, 70)
    val (w, h, sums) = new Multimodal.PngDecoder()
      .blockSums(Png.encode(Png.Image(4, 2, 1, 8, px)), 2)
    assert(w == 4 && h == 2)
    assert(sums.toSeq == Seq(10L, 50L, 90L, 130L))
  }

  test("perceptual hash is pixel-derived: gray and RGB(v,v,v) re-encodes collide") {
    // the same picture stored two ways — single-channel gray and
    // truecolor with r=g=b — has different PNG bytes but identical hash
    // bits (luminance sums scale uniformly by 3; the bit rule is
    // scale-free). Byte-level dedup sees two files; the hash sees one.
    val spark2 = spark
    import spark2.implicits._
    val px = Array.tabulate(64)(i => (i * 4) % 256)
    val gray = Png.encode(Png.Image(8, 8, 1, 8, px))
    val rgb = Png.encode(Png.Image(8, 8, 3, 8,
      Array.tabulate(192)(i => px(i / 3))))
    assert(!gray.sameElements(rgb))
    val media = Seq((1L, "image", gray), (2L, "image", rgb))
      .toDF("doc_id", "media_type", "payload")
    val hashes = Multimodal.imageHashesWith(media,
        classOf[Multimodal.PngDecoder].getName)
      .select("doc_id", "img_hash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L), "re-encode changed the perceptual hash")
  }

  test("imageNearDups: identical pair at hamming 0, one-block edit at 1, inverse unpaired") {
    val spark2 = spark
    import spark2.implicits._
    // 8×8 at grid 8: every pixel is its own block, so bits are exactly
    // the bright pixels — hamming distances are constructed, not hoped
    val checker = Array.tabulate(64)(i => if ((i % 8 + i / 8) % 2 == 0) 200 else 0)
    val oneFlip = checker.clone(); oneFlip(1) = 200 // pixel (1,0): 0 → 200
    val inverse = checker.map(v => 200 - v)
    val media = Seq(
      (1L, "image", Png.encode(Png.Image(8, 8, 1, 8, checker))),
      (2L, "image", Png.encode(Png.Image(8, 8, 1, 8, checker))), // re-encode
      (3L, "image", Png.encode(Png.Image(8, 8, 1, 8, oneFlip))),
      (4L, "image", Png.encode(Png.Image(8, 8, 1, 8, inverse))))
      .toDF("doc_id", "media_type", "payload")
    val pairs = Multimodal.imageNearDupsWith(media,
        classOf[Multimodal.PngDecoder].getName, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs == Map((1L, 2L) -> 0, (1L, 3L) -> 1, (2L, 3L) -> 1),
      s"got $pairs")
  }

  test("committed golden PNG decodes to its analytic gradient (m07 shape, doc_id=42)") {
    val in = getClass.getResourceAsStream("/golden/png_gradient_42.png")
    assert(in != null, "missing golden fixture png_gradient_42.png — " +
      "regenerate with graft.GoldenPngDump (a regen is a codec semantic change)")
    val bytes = try {
      val b = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { b.write(buf, 0, n); n = in.read(buf) }
      b.toByteArray
    } finally in.close()
    val img = Png.decode(bytes)
    // doc_id=42 under the m07 generator: w = 8+42%13 = 11, h = 8+42%7 = 8,
    // pixel(x,y) = (x + 3y + 42) % 256
    assert(img.width == 11 && img.height == 8 && img.channels == 1)
    for (y <- 0 until 8; x <- 0 until 11)
      assert(img.samples(y * 11 + x) == (x + 3 * y + 42) % 256,
        s"pixel drift at ($x,$y)")
  }
}

/** One-off regenerator for the golden PNG fixture:
  * `sbt "Test/runMain graft.GoldenPngDump <dir>"`. Review before
  * committing — a regeneration is a SEMANTIC CHANGE to the codec. */
object GoldenPngDump {
  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args.headOption.getOrElse("/tmp/golden"))
    outDir.mkdirs()
    val id = 42L
    val w = (8 + id % 13).toInt; val h = (8 + id % 7).toInt
    val px = Array.tabulate(w * h)(i => ((i % w + 3L * (i / w) + id) % 256).toInt)
    val f = new java.io.File(outDir, "png_gradient_42.png")
    java.nio.file.Files.write(f.toPath,
      Png.encode(Png.Image(w, h, 1, 8, px)))
    println(s"wrote ${f.getAbsolutePath}")
  }
}
