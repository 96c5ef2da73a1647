package graft

import graft.kernel.Jpeg

/** [[graft.kernel.Jpeg]] codec gates.
  *
  * The central decode test is INDEPENDENT of the encoder: a minimal
  * baseline JPEG is hand-assembled from the spec grammar — marker
  * segments byte by byte, a one-symbol Huffman table, and the
  * entropy-coded scan bits computed on paper — with the expected pixels
  * written out literally. Everything the encoder emits is additionally
  * pinned by the exactness theorem the oracle gates rely on: a constant
  * 8×8 tile's DCT is DC-only, so with all-ones quantization the
  * round-trip is bit-exact (gray AND 4:2:0 color), while arbitrary
  * images round-trip within a small DCT-rounding tolerance.
  */
class JpegSpec extends SparkSuite {

  test("zigzag order matches the canonical T.81 scan") {
    // first diagonal walk and final corner, transcribed from the spec
    assert(Jpeg.Zigzag.take(10).toSeq ==
      Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(Jpeg.Zigzag.takeRight(6).toSeq == Seq(61, 54, 47, 55, 62, 63))
    assert(Jpeg.Zigzag.sorted.toSeq == (0 until 64))       // a permutation
  }

  /** Hand-assembled minimal baseline JPEG: 8×8 grayscale, all-ones
    * quant, single-symbol Huffman tables, one DC-only block.
    *
    * Tables: DC has ONE code, '0' (length 1) → symbol 5 (category 5);
    * AC has ONE code, '0' (length 1) → symbol 0x00 (EOB).
    * Scan bits for constant pixel 130: level-shifted value 2, DC
    * coefficient 8·2 = 16, quantized 16 (q=1). diff = 16, category 5,
    * magnitude bits 10000. Stream = '0' (DC sym) + '10000' + '0' (EOB)
    * = 0100000, padded with 1 → 0b01000001 = 0x41. */
  private def handJpeg(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def m(x: Int): Unit = { out.write(0xff); out.write(x) }
    def seg(x: Int, payload: Seq[Int]): Unit = {
      m(x)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(b => out.write(b & 0xff))
    }
    m(0xd8)                                        // SOI
    seg(0xdb, 0 +: Seq.fill(64)(1))                // DQT id0, all ones
    seg(0xc0, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))   // SOF0 8x8, 1 comp 1x1 q0
    seg(0xc4, (0x00 +: (Seq(1) ++ Seq.fill(15)(0))) ++ Seq(5))    // DC0: '0'→5
    seg(0xc4, (0x10 +: (Seq(1) ++ Seq.fill(15)(0))) ++ Seq(0x00)) // AC0: '0'→EOB
    seg(0xda, Seq(1, 1, 0x00, 0, 63, 0))           // SOS
    out.write(0x41)                                // hand-computed scan byte
    m(0xd9)                                        // EOI
    out.toByteArray
  }

  test("hand-assembled DC-only fixture decodes to its literal pixels") {
    val img = Jpeg.decode(handJpeg())
    assert(img.width == 8 && img.height == 8 && img.channels == 1)
    assert(img.samples.toSeq == Seq.fill(64)(130))
  }

  /** Constant-8×8-tile image: tile (bx,by) holds value v(bx,by). */
  private def tiled(w: Int, h: Int)(v: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      v(x / 8, y / 8) & 0xff
    }

  test("gray constant-tile round-trip is bit-exact (incl. ragged dims)") {
    for ((w, h) <- Seq((8, 8), (16, 24), (24, 8), (20, 12), (9, 17))) {
      val px = tiled(w, h)((bx, by) => (bx * 31 + by * 17 + 5) % 256)
      val bytes = Jpeg.encode(Jpeg.Image(w, h, 1, px))
      val dec = Jpeg.decode(bytes)
      assert(dec.width == w && dec.height == h && dec.channels == 1)
      assert(dec.samples.toSeq == px.toSeq, s"drift at ${w}x$h")
    }
  }

  test("4:2:0 color with gray-valued 16-aligned tiles round-trips bit-exact") {
    // gray-valued pixels (R=G=B) make chroma exactly 128 and luma exactly
    // the gray value, so subsample + upsample + color convert are all
    // exact; tiles are 16×16 (one full MCU) so every Y block is constant
    val w = 48; val h = 32
    val gray = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 16; val by = (i / w) / 16
      (bx * 53 + by * 29 + 11) % 256
    }
    val rgb = new Array[Int](w * h * 3)
    gray.indices.foreach { i =>
      rgb(3 * i) = gray(i); rgb(3 * i + 1) = gray(i); rgb(3 * i + 2) = gray(i)
    }
    val dec = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, 3, rgb), subsample420 = true))
    assert(dec.width == w && dec.height == h && dec.channels == 3)
    assert(dec.samples.toSeq == rgb.toSeq)
  }

  test("4:4:4 color round-trip within DCT+colorspace tolerance") {
    val w = 24; val h = 16
    val rgb = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val c = i % 3
      ((p % w) * 11 + (p / w) * 7 + c * 85 + 13) % 256
    }
    val dec = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, 3, rgb)))
    assert(dec.width == w && dec.height == h && dec.channels == 3)
    val maxErr = rgb.indices.map(i => math.abs(dec.samples(i) - rgb(i))).max
    // all-ones quant: error comes only from FDCT rounding and the
    // YCbCr round trip (±1 each, a few interacting terms)
    assert(maxErr <= 4, s"max per-sample error $maxErr")
  }

  test("4:2:0 on non-constant chroma stays within subsampling tolerance") {
    // smooth chroma: 2×2 box average then replication loses at most the
    // within-quad spread plus DCT rounding
    val w = 32; val h = 32
    val rgb = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val c = i % 3
      val x = p % w; val y = p / w
      (64 + x * 2 + y + c * 16) % 256
    }
    val dec = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, 3, rgb), subsample420 = true))
    val maxErr = rgb.indices.map(i => math.abs(dec.samples(i) - rgb(i))).max
    assert(maxErr <= 16, s"max per-sample error $maxErr")
  }

  test("gray gradient round-trip within DCT rounding tolerance; quantized is lossier") {
    val w = 40; val h = 24
    val px = Array.tabulate(w * h)(i => ((i % w) * 5 + (i / w) * 3) % 256)
    val exact = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, 1, px)))
    val maxErr = px.indices.map(i => math.abs(exact.samples(i) - px(i))).max
    assert(maxErr <= 2, s"flat-quant max error $maxErr")
    // a coarse quant table still decodes (lossy but sane)
    val coarse = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, 1, px),
      quant = Array.fill(64)(16)))
    val coarseErr = px.indices.map(i => math.abs(coarse.samples(i) - px(i))).max
    assert(coarseErr <= 64 && coarseErr > 0, s"coarse-quant max error $coarseErr")
  }

  test("restart markers: interval-coded stream decodes identically") {
    val w = 48; val h = 16 // 12 MCUs at 4:4:4 gray
    val px = Array.tabulate(w * h)(i => ((i % w) * 7 + (i / w) * 13 + 3) % 256)
    val plain = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, 1, px)))
    for (ri <- Seq(1, 2, 5)) {
      val bytes = Jpeg.encode(Jpeg.Image(w, h, 1, px), restartInterval = ri)
      // the stream really contains RST markers
      val hasRst = bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
      assert(hasRst, s"no RST marker at interval $ri")
      assert(Jpeg.decode(bytes).samples.toSeq == plain.samples.toSeq,
        s"restart interval $ri drifts")
    }
  }

  test("byte stuffing survives 0xFF-producing entropy bytes") {
    // many distinct extreme blocks make 0xFF entropy bytes likely; the
    // encoder must stuff and the decoder must unstuff transparently
    val w = 64; val h = 64
    val px = tiled(w, h)((bx, by) => if ((bx + by) % 2 == 0) 255 else 0)
    val bytes = Jpeg.encode(Jpeg.Image(w, h, 1, px))
    assert(Jpeg.decode(bytes).samples.toSeq == px.toSeq)
  }

  test("progressive encode decodes to IDENTICAL pixels as baseline (gray)") {
    // the strongest refinement gate: both encoders quantize to the SAME
    // coefficients and every progressive band refines down to Al=0, so
    // any slip in the successive-approximation bit protocol (correction
    // bit order, EOB runs, ZRL-vs-EOB folding) changes a coefficient
    // and breaks pixel equality on a busy image
    val w = 41; val h = 23 // ragged: padding blocks + partial MCUs
    val px = Array.tabulate(w * h)(i =>
      ((i % w) * 37 + (i / w) * 11 + (i % 7) * 53) % 256)
    val prog = Jpeg.encodeProgressive(Jpeg.Image(w, h, 1, px))
    val base = Jpeg.encode(Jpeg.Image(w, h, 1, px))
    // really progressive: SOF2 frame, many scans
    val sof2 = prog.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)
    val scans = prog.sliding(2).count(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda)
    assert(sof2 && scans == 6, s"sof2=$sof2 scans=$scans") // DC×2 + AC bands×2 + AC refine×2
    val dp = Jpeg.decode(prog); val db = Jpeg.decode(base)
    assert(dp.width == w && dp.height == h && dp.channels == 1)
    assert(dp.samples.toSeq == db.samples.toSeq)
  }

  test("progressive encode decodes to IDENTICAL pixels as baseline (4:2:0 color)") {
    val w = 40; val h = 24
    val rgb = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val c = i % 3
      ((p % w) * 13 + (p / w) * 29 + c * 71 + 5) % 256
    }
    for (sub <- Seq(false, true)) {
      val dp = Jpeg.decode(Jpeg.encodeProgressive(Jpeg.Image(w, h, 3, rgb), sub))
      val db = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, 3, rgb), sub))
      assert(dp.samples.toSeq == db.samples.toSeq, s"subsample420=$sub drifts")
    }
  }

  test("progressive constant-tile gray round-trip is bit-exact (m17 shape)") {
    for ((w, h) <- Seq((16, 16), (24, 40), (9, 17))) {
      val px = tiled(w, h)((bx, by) => (bx * 29 + by * 13 + 7) % 256)
      val dec = Jpeg.decode(Jpeg.encodeProgressive(Jpeg.Image(w, h, 1, px)))
      assert(dec.samples.toSeq == px.toSeq, s"drift at ${w}x$h")
    }
  }

  test("coarse-quant progressive still matches coarse-quant baseline") {
    // nonzero AC sparsity changes which refinement paths (EOB runs,
    // long zero runs, ZRL folding) actually execute — a coarse table
    // exercises the sparse shapes the flat table cannot
    val w = 48; val h = 32
    val px = Array.tabulate(w * h)(i =>
      ((i % w) * 3 + (i / w) * 5 + (i % 13) * 31) % 256)
    val q = Array.fill(64)(24)
    val dp = Jpeg.decode(Jpeg.encodeProgressive(Jpeg.Image(w, h, 1, px), quant = q))
    val db = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, 1, px), quant = q))
    assert(dp.samples.toSeq == db.samples.toSeq)
  }

  test("EXIF orientation: all eight tags normalize to hand-computed display layouts") {
    // 16×16 of four constant tiles  A B / C D  — constant tiles survive
    // the codec bit-exactly, so the display grid pins the remap alone
    val (a, b, c, d) = (40, 90, 140, 190)
    val stored = Array.tabulate(256) { i =>
      val bx = (i % 16) / 8; val by = (i / 16) / 8
      (bx, by) match { case (0, 0) => a; case (1, 0) => b
                       case (0, 1) => c; case _ => d }
    }
    // expected display tile grids, worked out on paper from the EXIF
    // tag semantics (row0/col0 of the STORED image in the scene)
    val expect = Map(
      1 -> Seq(a, b, c, d), 2 -> Seq(b, a, d, c), 3 -> Seq(d, c, b, a),
      4 -> Seq(c, d, a, b), 5 -> Seq(a, c, b, d), 6 -> Seq(c, a, d, b),
      7 -> Seq(d, b, c, a), 8 -> Seq(b, d, a, c))
    for (o <- 1 to 8) {
      val img = Jpeg.decode(Jpeg.encode(Jpeg.Image(16, 16, 1, stored),
        orientation = o))
      assert(img.width == 16 && img.height == 16)
      val grid = Seq((4, 4), (12, 4), (4, 12), (12, 12))
        .map { case (x, y) => img.samples(y * 16 + x) }
      assert(grid == expect(o), s"orientation $o: got $grid")
      // the whole tile is constant, not just the probe pixel
      for (y <- 0 until 16; x <- 0 until 16) {
        val e = expect(o)((y / 8) * 2 + x / 8)
        assert(img.samples(y * 16 + x) == e, s"o=$o drift at ($x,$y)")
      }
    }
  }

  test("EXIF orientation 6 swaps dimensions and matches an independent rotation") {
    val w = 16; val h = 8
    val px = tiled(w, h)((bx, by) => (bx * 61 + by * 47 + 9) % 256)
    val plain = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, 1, px)))
    val rot = Jpeg.decode(Jpeg.encode(Jpeg.Image(w, h, 1, px), orientation = 6))
    assert(rot.width == h && rot.height == w)
    // rotate the plain decode 90° CW here, independently of the codec
    for (y <- 0 until w; x <- 0 until h)
      assert(rot.samples(y * h + x) == plain.samples((h - 1 - x) * w + y),
        s"rotation drift at ($x,$y)")
  }

  test("orientation metadata collapses in the perceptual hash (the dedup story)") {
    import graft.operators.Multimodal
    // the same PICTURE twice: stored upright with tag 1, and stored
    // rotated 90° CCW with tag 6 (so display-normalization rotates it
    // back) — a decoder that ignored EXIF would hash them differently
    val (a, b, c, d) = (30, 80, 130, 230)
    def quad(vals: Seq[Int]): Array[Int] = Array.tabulate(256) { i =>
      vals(((i / 16) / 8) * 2 + (i % 16) / 8)
    }
    val upright = Jpeg.encode(Jpeg.Image(16, 16, 1, quad(Seq(a, b, c, d))))
    val ccwStored = Jpeg.encode(
      Jpeg.Image(16, 16, 1, quad(Seq(b, d, a, c))), orientation = 6)
    val dec = new Multimodal.JpegDecoder
    val (_, _, s1) = dec.blockSums(upright, 8)
    val (_, _, s2) = dec.blockSums(ccwStored, 8)
    assert(s1.toSeq == s2.toSeq)
  }

  test("malformed EXIF degrades to orientation 1 without failing the decode") {
    val px = tiled(16, 16)((bx, by) => (bx * 3 + by * 7 + 100) % 256)
    val tagged = Jpeg.encode(Jpeg.Image(16, 16, 1, px), orientation = 3)
    // corrupt the TIFF byte-order mark inside APP1 ("II" → "ZZ")
    val app1 = tagged.indices.find(i =>
      (tagged(i) & 0xff) == 0xff && (tagged(i + 1) & 0xff) == 0xe1).get
    val corrupt = tagged.clone()
    corrupt(app1 + 10) = 'Z'.toByte; corrupt(app1 + 11) = 'Z'.toByte
    val img = Jpeg.decode(corrupt)
    assert(img.samples.toSeq == px.toSeq) // metadata ignored, pixels intact
    // and the intact tag really rotates (the corruption test is not vacuous)
    assert(Jpeg.decode(tagged).samples.toSeq != px.toSeq)
  }

  test("hostile and unsupported inputs fail loudly") {
    // lossless (SOF3) — still rejected now that SOF2 decodes
    val prog = handJpeg()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc3.toByte
    val e1 = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e1.getMessage.contains("non-baseline"))

    // oversized header must fail BEFORE allocating
    val huge = handJpeg()
    val s2 = huge.indices.find(i =>
      (huge(i) & 0xff) == 0xff && (huge(i + 1) & 0xff) == 0xc0).get
    huge(s2 + 5) = 0x7f; huge(s2 + 6) = 0xff.toByte // height 32767
    huge(s2 + 7) = 0x7f; huge(s2 + 8) = 0xff.toByte // width 32767
    val e2 = intercept[IllegalArgumentException](
      Jpeg.decode(huge, maxSamples = 1L << 20))
    assert(e2.getMessage.contains("budget"))

    // truncation mid-scan
    val trunc = Jpeg.encode(Jpeg.Image(16, 16, 1,
      Array.tabulate(256)(i => i % 256)))
    intercept[IllegalArgumentException](
      Jpeg.decode(trunc.take(trunc.length - 20)))

    // not a JPEG at all
    intercept[IllegalArgumentException](Jpeg.decode(Array[Byte](1, 2, 3)))
  }

  test("cross-container near-dups: PNG and JPEG of the same pixels collapse (m16 semantics)") {
    import spark.implicits._
    import graft.kernel.Png
    import graft.operators.Multimodal
    val w = 64; val h = 64
    // checkerboard of 8×8 tiles: each hash cell is one tile, bits are
    // exactly the 255-tiles; brightening ONE 0-tile flips exactly one
    // bit (the mean stays between 0 and 255)
    def tileAt(i: Int): (Int, Int) = (((i % w) / 8), ((i / w) / 8))
    val base = Array.tabulate(w * h) { i =>
      val (bx, by) = tileAt(i); if ((bx + by) % 2 == 0) 255 else 0
    }
    val edit = Array.tabulate(w * h) { i =>
      val (bx, by) = tileAt(i)
      if ((bx + by) % 2 == 0 || (bx == 1 && by == 0)) 255 else 0
    }
    val inverse = base.map(255 - _)
    val media = Seq(
      (1L, "image", Png.encode(Png.Image(w, h, 1, 8, base))),
      (2L, "image", Jpeg.encode(Jpeg.Image(w, h, 1, base))), // same pixels, other container
      (3L, "image", Jpeg.encode(Jpeg.Image(w, h, 1, edit))),
      (4L, "image", Png.encode(Png.Image(w, h, 1, 8, inverse))))
      .toDF("doc_id", "media_type", "payload")
    val pairs = Multimodal.imageNearDupsWith(media,
        classOf[Multimodal.ImageDecoder].getName, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs == Map((1L, 2L) -> 0, (1L, 3L) -> 1, (2L, 3L) -> 1),
      s"got $pairs")
  }

  test("committed golden JPEG decodes to its analytic tiles (m14 shape, doc_id=42)") {
    val in = getClass.getResourceAsStream("/golden/jpeg_tiles_42.jpg")
    assert(in != null, "missing golden fixture jpeg_tiles_42.jpg — " +
      "regenerate with graft.GoldenJpegDump (a regen is a codec semantic change)")
    val bytes = try {
      val b = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { b.write(buf, 0, n); n = in.read(buf) }
      b.toByteArray
    } finally in.close()
    val img = Jpeg.decode(bytes)
    // doc_id=42 under the m14 generator: w = 16·(1+42%2) = 16,
    // h = 16·(1+42%3) = 16, tile v(bx,by) = (bx·31 + by·17 + 42·7) % 256,
    // gray-valued 4:2:0 color
    assert(img.width == 16 && img.height == 16 && img.channels == 3)
    for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3) {
      val v = ((x / 8) * 31 + (y / 8) * 17 + 42 * 7) % 256
      assert(img.samples((y * 16 + x) * 3 + c) == v, s"pixel drift at ($x,$y,$c)")
    }
  }
}

/** One-off regenerator for the golden JPEG fixture:
  * `sbt "Test/runMain graft.GoldenJpegDump <dir>"`. Review before
  * committing — a regeneration is a SEMANTIC CHANGE to the codec. */
object GoldenJpegDump {
  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args.headOption.getOrElse("/tmp/golden"))
    outDir.mkdirs()
    val id = 42L
    val w = (16 * (1 + id % 2)).toInt; val h = (16 * (1 + id % 3)).toInt
    val rgb = new Array[Int](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (((x / 8) * 31 + (y / 8) * 17 + id * 7) % 256).toInt
      val o = (y * w + x) * 3
      rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
    }
    val f = new java.io.File(outDir, "jpeg_tiles_42.jpg")
    java.nio.file.Files.write(f.toPath,
      Jpeg.encode(Jpeg.Image(w, h, 3, rgb), subsample420 = true))
    println(s"wrote ${f.getAbsolutePath}")
  }
}
