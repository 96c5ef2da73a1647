package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Webp

/** VP8L gates. The encoder is literal-only, so round-trips alone would
  * never touch backrefs, the cache, or the transforms — those decode
  * paths are driven by HAND-ASSEMBLED bitstreams (the JpegSpec DC-
  * fixture discipline: bits computed on paper, decode independent of
  * the encoder), with expected pixels hand-computed from the spec
  * arithmetic. */
class WebpSpec extends AnyFunSuite {

  /** Independent LSB-first writer for hand fixtures (deliberately NOT
    * Webp's internal one). */
  private final class W {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def b(value: Int, bits: Int): W = {
      var i = 0
      while (i < bits) {
        cur |= ((value >> i) & 1) << n
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i += 1
      }
      this
    }
    /** prefix-code bits, MSB-first (tree-walk order). */
    def code(bitsStr: String): W = { bitsStr.foreach(c => b(c - '0', 1)); this }
    def riff: Array[Byte] = {
      if (n > 0) { out.write(cur); cur = 0; n = 0 }
      val payload = out.toByteArray
      val o2 = new java.io.ByteArrayOutputStream()
      def w32(v: Int): Unit = { o2.write(v & 0xff); o2.write((v >> 8) & 0xff)
        o2.write((v >> 16) & 0xff); o2.write((v >> 24) & 0xff) }
      def t(s: String): Unit = o2.write(s.getBytes("ISO-8859-1"))
      val padded = payload.length + (payload.length & 1)
      t("RIFF"); w32(4 + 8 + padded); t("WEBP"); t("VP8L"); w32(payload.length)
      o2.write(payload)
      if ((payload.length & 1) == 1) o2.write(0)
      o2.toByteArray
    }
    def header(wd: Int, ht: Int, alpha: Int): W =
      b(0x2f, 8).b(wd - 1, 14).b(ht - 1, 14).b(alpha, 1).b(0, 3)
    def simple1(sym: Int): W =
      if (sym <= 1) b(1, 1).b(0, 1).b(0, 1).b(sym, 1)
      else b(1, 1).b(0, 1).b(1, 1).b(sym, 8)
    def simple2(s0: Int, s1: Int): W =
      b(1, 1).b(1, 1).b(1, 1).b(s0, 8).b(s1, 8)
  }

  private def rgb(img: Webp.Image): Seq[(Int, Int, Int)] =
    (0 until img.width * img.height).map { i =>
      (img.samples(i * img.channels), img.samples(i * img.channels + 1),
        img.samples(i * img.channels + 2))
    }

  test("round-trip: gradients, constants, ragged dims, RGB and RGBA, bit-exact") {
    for ((w, h, ch) <- Seq((1, 1, 3), (7, 3, 3), (16, 16, 4), (33, 7, 4),
        (64, 64, 3), (5, 31, 4))) {
      val samples = Array.tabulate(w * h * ch) { i =>
        val px = i / ch; val c = i % ch
        val x = px % w; val y = px / w
        c match {
          case 0 => (x * 255 / math.max(w - 1, 1))
          case 1 => (y * 255 / math.max(h - 1, 1))
          case 2 => (x * 7 + y * 13) % 256
          case _ => 255 - (x % 256)
        }
      }
      val img = Webp.Image(w, h, ch, samples)
      val back = Webp.decode(Webp.encode(img))
      assert(back.width == w && back.height == h && back.channels == ch)
      assert(back.samples.toSeq == samples.toSeq, s"${w}x$h ch=$ch")
    }
    // constant image → single-symbol codes everywhere
    val const = Webp.Image(9, 9, 3, Array.fill(9 * 9 * 3)(77))
    assert(Webp.decode(Webp.encode(const)).samples.forall(_ == 77))
    // LCG noise — worst case for the code-length coder
    var seed = 42L
    val noise = Array.fill(24 * 17 * 4) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) & 0xff).toInt
    }
    val nImg = Webp.Image(24, 17, 4, noise)
    assert(Webp.decode(Webp.encode(nImg)).samples.toSeq == noise.toSeq)
  }

  test("distance map: generated table matches the published spec table") {
    val m = Webp.DistanceMap
    assert(m.length == 120 && m.distinct.length == 120)
    // the published table's opening run (spec: distance mapping section)
    assert(m.take(16).toSeq == Seq(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3)))
    // checkpoints deeper in (1-based plane codes 35-40, 97-104, 117-120)
    assert(m.slice(34, 40).toSeq == Seq(
      (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)))
    assert(m.slice(96, 104).toSeq == Seq(
      (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6)))
    assert(m.slice(116, 120).toSeq == Seq((7, 7), (-7, 7), (8, 6), (8, 7)))
  }

  test("hand fixture: simple codes, out-of-order 2-symbol pair, literal pixels") {
    // 2x2 [red, green, green, red]; red code transmits 255 BEFORE 0 —
    // bit 0 must select 255 (transmission order, NOT canonical order)
    val w = new W().header(2, 2, 0)
      .b(0, 1) // no transforms
      .b(0, 1) // no cache
      .b(0, 1) // no meta
      .simple2(0, 255)   // green: bit0→0, bit1→255
      .simple2(255, 0)   // red:   bit0→255, bit1→0
      .simple1(0)        // blue
      .simple1(255)      // alpha
      .simple1(0)        // distance
      // px0 red: g=0 ('0'), r=255 ('0'); px1 green: g=255('1'), r=0('1')
      .code("0").code("0")
      .code("1").code("1")
      .code("1").code("1")
      .code("0").code("0")
    val img = Webp.decode(w.riff)
    assert(img.width == 2 && img.height == 2 && img.channels == 3)
    assert(rgb(img) == Seq((255, 0, 0), (0, 255, 0), (0, 255, 0), (255, 0, 0)))
  }

  test("hand fixture: code-length-coded greens, LZ77 backref through the plane-code map") {
    // 4x1: [A, backref(len 2, dist 1 via plane code 2), B]
    // green lengths: sym10→1 ('0'), sym20→2 ('10'), sym257→2 ('11')
    val w = new W().header(4, 1, 0)
      .b(0, 1).b(0, 1).b(0, 1)
      // green: normal code. cl lengths: 17→2, 18→1, 1→3, 2→3
      .b(0, 1)        // not simple
      .b(1, 4)        // num_code_lengths 5
      .b(2, 3).b(1, 3).b(0, 3).b(3, 3).b(3, 3) // order 17,18,0,1,2
      .b(0, 1)        // no max_symbol
      // cl canonical: 18='0', 17='10', 1='110', 2='111'
      .code("10").b(7, 3)    // 17: 10 zeros
      .code("110")           // len 1 at sym 10
      .code("10").b(6, 3)    // 17: 9 zeros
      .code("111")           // len 2 at sym 20
      .code("0").b(127, 7)   // 18: 138 zeros
      .code("0").b(87, 7)    // 18: 98 zeros
      .code("111")           // len 2 at sym 257
      .code("0").b(11, 7)    // 18: 22 trailing zeros
      .simple1(0)            // red
      .simple1(0)            // blue
      .simple1(255)          // alpha
      .simple1(1)            // distance: always prefix code 1 → dist_code 2
      // green canonical: sym10='0', sym20='10', sym257='11'
      .code("0")             // px0 literal A (g=10)
      .code("11")            // backref: length prefix 1 → 2, dist via code 2
      .code("10")            // px3 literal B (g=20)
    val img = Webp.decode(w.riff)
    assert(img.width == 4 && img.height == 1)
    assert(rgb(img) == Seq((0, 10, 0), (0, 10, 0), (0, 10, 0), (0, 20, 0)))
  }

  test("hand fixture: color cache hits return the cached pixels") {
    val A = 0xff000100 // g=1
    val B = 0xff000200 // g=2
    def cacheIdx(p: Int) = (0x1e35a7bd * p) >>> 31
    assert(cacheIdx(A) != cacheIdx(B), "fixture needs distinct cache slots")
    val symA = 280 + cacheIdx(A)
    val symB = 280 + cacheIdx(B)
    // greens used: 1, 2, symA, symB — all length 2; canonical by symbol:
    val codes = Seq(1, 2, math.min(symA, symB), math.max(symA, symB))
      .zip(Seq("00", "01", "10", "11")).toMap
    val w = new W().header(2, 2, 0)
      .b(0, 1)          // no transforms
      .b(1, 1).b(1, 4)  // cache, 1 bit
      .b(0, 1)          // no meta
      // green normal code over 282 symbols: lengths 2 at {1,2,280,281}
      .b(0, 1)
      .b(1, 4)          // num_code_lengths 5
      // cl lengths: 17→0, 18→2, 0→2, 1→0, 2→1
      .b(0, 3).b(2, 3).b(2, 3).b(0, 3).b(1, 3)
      .b(0, 1)
      // cl canonical: 2='0', 0='10', 18='11'
      .code("10")           // pos0: 0
      .code("0").code("0")  // pos1, pos2: len 2
      .code("11").b(127, 7) // 138 zeros
      .code("11").b(127, 7) // 138 zeros (276 total)
      .code("10")           // one more zero (277)
      .code("0").code("0")  // pos280, pos281: len 2
      .simple1(0).simple1(0).simple1(255).simple1(0)
      .code(codes(1)).code(codes(2))       // literals A, B
      .code(codes(symA)).code(codes(symB)) // cache hits A, B
    val img = Webp.decode(w.riff)
    assert(rgb(img) == Seq((0, 1, 0), (0, 2, 0), (0, 1, 0), (0, 2, 0)))
  }

  test("hand fixture: subtract-green inverse") {
    // stored (r'=10, g=200, b'=250) → out (210, 200, 194)
    val w = new W().header(2, 1, 0)
      .b(1, 1).b(2, 2) // transform: subtract green
      .b(0, 1)         // no more transforms
      .b(0, 1).b(0, 1) // cache, meta
      .simple1(200).simple1(10).simple1(250).simple1(255).simple1(0)
    val img = Webp.decode(w.riff)
    assert(rgb(img) == Seq((210, 200, 194), (210, 200, 194)))
  }

  test("hand fixture: predictor transform with mode-11 select, hand-computed") {
    // 2x2, one 4x4 block, mode 11; residuals chosen so Select must pick
    // LEFT (pL=22 < pT=43 — worked on paper from the spec pseudocode)
    val w = new W().header(2, 2, 0)
      .b(1, 1).b(0, 2)  // predictor transform
      .b(2, 3)          // size_bits = 2+2 → 16x16 blocks → 1x1 image
      // predictor sub-image (not level0): cache 0, then 5 codes, mode 11
      .b(0, 1)
      .simple1(11).simple1(0).simple1(0).simple1(0).simple1(0)
      .b(0, 1)          // no more transforms
      .b(0, 1).b(0, 1)  // cache, meta
      // residual channels are 2-valued → simple pair codes
      // greens: px0=50 then 10,10,10 ; reds: 100 then 8,8,8
      // blues: 25, 4, 25, 4 ; alpha: 0 everywhere (mod-256 add)
      .simple2(10, 50)  // bit0→10, bit1→50
      .simple2(8, 100)
      .simple2(4, 25)
      .simple1(0)
      .simple1(0)
      // px0: g=50('1') r=100('1') b=25('1')
      .code("1").code("1").code("1")
      // px1 (y=0 → pred=left): g=10 r=8 b=4
      .code("0").code("0").code("0")
      // px2 (x=0 → pred=top): g=10 r=8 b=25
      .code("0").code("0").code("1")
      // px3 (mode 11): g=10 r=8 b=4
      .code("0").code("0").code("0")
    val img = Webp.decode(w.riff)
    assert(rgb(img) == Seq(
      (100, 50, 25), (108, 60, 29), (108, 60, 50), (116, 70, 54)))
  }

  test("hand fixture: color transform inverse with signed multipliers") {
    // CTE: green_to_red=2 (blue ch), green_to_blue=3 (green ch),
    // red_to_blue=4 (red ch); two stored pixels worked on paper
    val w = new W().header(2, 1, 0)
      .b(1, 1).b(1, 2)  // color transform
      .b(2, 3)          // size_bits 4 → 1x1 transform image
      .b(0, 1)          // sub-image: no cache
      .simple1(3).simple1(4).simple1(2).simple1(0).simple1(0)
      .b(0, 1)          // no more transforms
      .b(0, 1).b(0, 1)
      .simple2(64, 200)   // greens
      .simple2(100, 10)   // stored reds
      .simple2(50, 100)   // stored blues
      .simple1(255).simple1(0)
      .code("0").code("0").code("0")  // px0: g=64 r'=100 b'=50
      .code("1").code("1").code("1")  // px1: g=200 r'=10 b'=100
    val img = Webp.decode(w.riff)
    assert(rgb(img) == Seq((104, 64, 69), (6, 200, 94)))
  }

  test("hand fixture: color indexing with 2-bit pixel bundling") {
    // palette [P0,P1,P2] via deltas; 5x1 indices [0,1,2,1,0] packed
    // into ceil(5/4)=2 green bytes: 100 and 0
    val w = new W().header(5, 1, 0)
      .b(1, 1).b(3, 2)  // color indexing
      .b(2, 8)          // palette size 3
      // palette image stream (3x1, deltas): no cache, simple pair codes
      .b(0, 1)
      .simple2(5, 20)    // delta greens: D0=20, D1=5, D2=5
      .simple2(5, 10)    // delta reds: 10, 5, 5
      .simple2(5, 30)    // delta blues: 30, 5, 5
      .simple2(0, 255)   // delta alphas: 255, 0, 0
      .simple1(0)
      .code("1").code("1").code("1").code("1")  // D0 = (255,10,20,30)
      .code("0").code("0").code("0").code("0")  // D1 = (0,5,5,5)
      .code("0").code("0").code("0").code("0")  // D2 = (0,5,5,5)
      .b(0, 1)          // no more transforms
      .b(0, 1).b(0, 1)  // cache, meta
      .simple2(0, 100)  // packed greens: bit0→0, bit1→100
      .simple1(0).simple1(0).simple1(0).simple1(0)
      .code("1")        // packed px0: g=100 → indices 0,1,2,1
      .code("0")        // packed px1: g=0 → index 0
    val img = Webp.decode(w.riff)
    assert(rgb(img) == Seq(
      (10, 20, 30), (15, 25, 35), (20, 30, 40), (15, 25, 35), (10, 20, 30)))
  }

  test("hand fixture: meta prefix codes partition the image into per-block groups") {
    // 8x1 image, meta block size 4 (size_bits code 0 → 2+0... spec: 2 +
    // ReadBits(3), here bits=0 → metaBits 2 → 4-px blocks): meta image
    // 2x1 selects group 0 for x 0-3 and group 1 for x 4-7; each group's
    // green code is single-symbol (0 bits per pixel), so the pixel
    // values come ENTIRELY from group selection
    val w = new W().header(8, 1, 0)
      .b(0, 1)          // no transforms
      .b(0, 1)          // no cache
      .b(1, 1).b(0, 3)  // meta prefix codes, size_bits = 2
      // meta sub-image 2x1 (level0=false): no cache; green simple pair
      // 0/1, others single; pixels: group 0 then group 1
      .b(0, 1)
      .b(1, 1).b(1, 1).b(1, 1).b(0, 8).b(1, 8) // green simple2(0, 1)
      .simple1(0).simple1(0).simple1(0).simple1(0)
      .code("0").code("1")
      // group 0: green always 100; group 1: green always 200
      .simple1(100).simple1(0).simple1(0).simple1(255).simple1(0)
      .simple1(200).simple1(0).simple1(0).simple1(255).simple1(0)
    val img = Webp.decode(w.riff)
    assert(img.width == 8 && img.height == 1)
    assert(rgb(img) == Seq.fill(4)((0, 100, 0)) ++ Seq.fill(4)((0, 200, 0)))
  }

  test("predictor kernel: clamp add/subtract full and half, averages (spec arithmetic)") {
    def px(a: Int, r: Int, g: Int, b: Int) = (a << 24) | (r << 16) | (g << 8) | b
    // mode 12 full clamp: L+T−TL per channel, clamped at both ends
    assert(Webp.predict(12, px(255, 250, 10, 100), px(255, 20, 5, 200), 0,
      px(255, 10, 12, 250)) == px(255, 255, 3, 50))
    // mode 13 half: ave = (L+T)/2; clamp(ave + (ave−TL)/2)
    // r: ave=(250+20)/2=135, 135+(135−10)/2=135+62=197
    // g: ave=7, 7+(7−12)/2 = 7+(−5)/2 = 7−2 = 5  (C-style trunc toward 0)
    // b: ave=150, 150+(150−250)/2 = 150−50 = 100
    assert(Webp.predict(13, px(255, 250, 10, 100), px(255, 20, 5, 200), 0,
      px(255, 10, 12, 250)) == px(255, 197, 5, 100))
    // mode 7 average
    assert(Webp.predict(7, px(255, 11, 20, 31), px(255, 20, 30, 40), 0, 0) ==
      px(255, 15, 25, 35))
    // mode 0 black, modes 1-4 pass-throughs (args: l, t, tr, tl)
    assert(Webp.predict(0, 1, 2, 3, 4) == 0xff000000)
    assert(Webp.predict(1, 7, 8, 9, 10) == 7)
    assert(Webp.predict(2, 7, 8, 9, 10) == 8)
    assert(Webp.predict(3, 7, 8, 9, 10) == 9)
    assert(Webp.predict(4, 7, 8, 9, 10) == 10)
  }

  test("cross-container collapse: identical pixels as PNG and WebP share block sums") {
    // the m16 contract: pixels, not container bytes, decide duplication
    val w = 64; val h = 64
    val px = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      ((bx * 57 + by * 131 + 23) % 256)
    }
    val png = graft.kernel.Png.encode(graft.kernel.Png.Image(w, h, 1, 8, px))
    val webp = Webp.encode(Webp.Image(w, h, 3, px.flatMap(v => Array(v, v, v))))
    val dec = new graft.operators.Multimodal.ImageDecoder
    val (pw, ph, pSums) = dec.blockSums(png, 8)
    val (ww, wh, wSums) = dec.blockSums(webp, 8)
    assert((pw, ph) == (ww, wh))
    // WebP's RGB expansion scales every sum by exactly 3 — the ratio
    // that the perceptual hash's ratio-form bits are invariant to
    assert(wSums.toSeq == pSums.map(_ * 3).toSeq)
    // RGBA WebP: alpha excluded, sums identical to RGB
    val rgba = Webp.encode(Webp.Image(w, h, 4,
      px.flatMap(v => Array(v, v, v, 200))))
    assert(dec.blockSums(rgba, 8)._3.toSeq == wSums.toSeq)
  }

  test("hostile inputs fail loudly") {
    // truncated stream
    val good = Webp.encode(Webp.Image(4, 4, 3, Array.fill(48)(99)))
    intercept[IllegalArgumentException](
      Webp.decode(java.util.Arrays.copyOf(good, good.length - 2)))
    // lossy VP8 payload
    val lossy = new java.io.ByteArrayOutputStream()
    lossy.write("RIFF".getBytes("ISO-8859-1"))
    lossy.write(Array[Byte](12, 0, 0, 0))
    lossy.write("WEBPVP8 ".getBytes("ISO-8859-1"))
    lossy.write(Array[Byte](4, 0, 0, 0, 1, 2, 3, 4))
    val e = intercept[IllegalArgumentException](Webp.decode(lossy.toByteArray))
    assert(e.getMessage.contains("lossless"))
    // not a webp at all
    intercept[IllegalArgumentException](Webp.decode("JUNKJUNKJUNKJUNK".getBytes))
    // backward reference before image start
    val bad = new W().header(2, 1, 0)
      .b(0, 1).b(0, 1).b(0, 1)
      // green normal code with sym 257 (len code) and sym 10
      .b(0, 1).b(1, 4)
      .b(2, 3).b(1, 3).b(0, 3).b(3, 3).b(3, 3)
      .b(0, 1)
      .code("10").b(7, 3).code("110")
      .code("10").b(6, 3).code("111")
      .code("0").b(127, 7).code("0").b(87, 7).code("111")
      .code("0").b(11, 7)
      .simple1(0).simple1(0).simple1(255).simple1(1)
      .code("11") // FIRST symbol is a backref — nothing decoded yet
    intercept[IllegalArgumentException](Webp.decode(bad.riff))
    // sample budget: a crafted 16384x16384 header must fail BEFORE allocation
    val huge = new W().header(16384, 16384, 1).b(0, 1).b(0, 1).b(0, 1)
    val e2 = intercept[IllegalArgumentException](Webp.decode(huge.riff))
    assert(e2.getMessage.contains("budget"))
  }

  test("metadata: header-only dims for lossless AND lossy; decode still rejects lossy") {
    // lossless: metadata matches the encoded dims without pixel decode
    val ll = Webp.encode(Webp.Image(13, 7, 3,
      Array.tabulate(13 * 7 * 3)(i => (i * 5) % 256)))
    assert(Webp.metadata(ll) == Webp.Meta("lossless", 13, 7))
    // lossy: the RFC 6386 §9.1 keyframe header parses — dims with NO
    // DCT work — while pixel decode refuses loudly
    val lossy = Webp.encodeLossyHeader(640, 480)
    assert(Webp.metadata(lossy) == Webp.Meta("lossy", 640, 480))
    val e = intercept[IllegalArgumentException](Webp.decode(lossy))
    assert(e.getMessage.contains("lossy"))
    // 14-bit boundary dims survive the LE packing
    assert(Webp.metadata(Webp.encodeLossyHeader(16383, 1)) ==
      Webp.Meta("lossy", 16383, 1))
    // corrupt start code fails loudly
    val bad = Webp.encodeLossyHeader(8, 8)
    bad(20 + 3) = 0 // clobber the 0x9d start-code byte inside the payload
    intercept[IllegalArgumentException](Webp.metadata(bad))
    // interframe-first (frame tag bit 0 set) is not a standalone file
    val inter = Webp.encodeLossyHeader(8, 8)
    inter(20) = (inter(20) | 1).toByte
    intercept[IllegalArgumentException](Webp.metadata(inter))
  }

  test("metadata: VP8X extended container — canvas dims, alpha/animation flags, ANMF frames") {
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    def u24(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] =
      tag.getBytes("ISO-8859-1") ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def riff(chunks: Array[Byte]*): Array[Byte] = {
      val body = chunks.flatten.toArray
      "RIFF".getBytes("ISO-8859-1") ++ le32(4 + body.length) ++
        "WEBP".getBytes("ISO-8859-1") ++ body
    }
    def vp8x(flags: Int, w: Int, h: Int): Array[Byte] =
      chunk("VP8X", Array[Byte](flags.toByte, 0, 0, 0) ++ u24(w - 1) ++ u24(h - 1))
    // a real VP8L chunk (header + payload) lifted out of the encoder's
    // bare file: everything past the 12-byte RIFF/WEBP preamble
    val bare = Webp.encode(Webp.Image(6, 2, 3, Array.tabulate(36)(_ % 256)))
    val vp8lChunk = bare.drop(12)

    // still VP8X-wrapped lossless with the alpha flag: canvas dims are
    // the display truth, and the wrapped payload still pixel-decodes
    val still = riff(vp8x(0x10, 6, 2), vp8lChunk)
    assert(Webp.metadata(still) ==
      Webp.Meta("lossless", 6, 2, hasAlpha = true))
    assert(Webp.decode(still).width == 6)
    import graft.operators.Multimodal.ImageDecoder
    assert(ImageDecoder.sniff(still).decodable)

    // animated: ANIM params + two ANMF-wrapped frames — frame count and
    // first-frame flavor in the metadata, pixel decode refuses loudly
    val anim = chunk("ANIM", Array.fill[Byte](6)(0))
    def anmf(frame: Array[Byte]): Array[Byte] =
      chunk("ANMF", Array.fill[Byte](16)(0) ++ frame)
    val animated = riff(vp8x(0x02, 6, 2), anim, anmf(vp8lChunk), anmf(vp8lChunk))
    assert(Webp.metadata(animated) ==
      Webp.Meta("lossless", 6, 2, hasAlpha = false, animated = true, frames = 2))
    assert(!ImageDecoder.sniff(animated).decodable)
    intercept[IllegalArgumentException](Webp.decode(animated))

    // VP8X wrapping a lossy frame keeps the lossy verdict
    val lossyChunk = Webp.encodeLossyHeader(320, 200).drop(12)
    assert(Webp.metadata(riff(vp8x(0, 320, 200), lossyChunk)) ==
      Webp.Meta("lossy", 320, 200))

    // the standard sticker shape: per-frame ALPH subchunk BEFORE the
    // bitstream chunk — the flavor walk must not stop at the first tag
    val alph = chunk("ALPH", Array[Byte](0, 1, 2))
    val alphaAnim = riff(vp8x(0x12, 6, 2), anim,
      anmf(alph ++ lossyChunk), anmf(alph ++ lossyChunk))
    assert(Webp.metadata(alphaAnim) ==
      Webp.Meta("lossy", 6, 2, hasAlpha = true, animated = true, frames = 2))

    // malformed: wrong VP8X size, and a codec-less container, both loud
    intercept[IllegalArgumentException](
      Webp.metadata(riff(chunk("VP8X", Array.fill[Byte](9)(0)))))
    intercept[IllegalArgumentException](
      Webp.metadata(riff(vp8x(0, 6, 2))))
  }

  test("ImageDecoder.sniff: metadata-only vs decodable split across containers") {
    import graft.operators.Multimodal.ImageDecoder
    import graft.operators.Multimodal.ImageDecoder.ImageInfo
    val png = graft.kernel.Png.encode(graft.kernel.Png.Image(5, 4, 1, 8,
      Array.tabulate(20)(_ % 256)))
    assert(ImageDecoder.sniff(png) == ImageInfo("png", "", true, 5, 4))
    // EXIF orientation 6 (90° CW): stored 16x8 must sniff as DISPLAY 8x16
    val jpg = graft.kernel.Jpeg.encode(graft.kernel.Jpeg.Image(16, 8, 1,
      Array.tabulate(128)(_ % 256)), orientation = 6)
    assert(ImageDecoder.sniff(jpg) == ImageInfo("jpeg", "", true, 8, 16))
    val gif = graft.kernel.Gif.encode(graft.kernel.Gif.Image(9, 3, 1,
      Array.tabulate(27)(_ % 200)))
    assert(ImageDecoder.sniff(gif) == ImageInfo("gif", "", true, 9, 3))
    val vp8l = Webp.encode(Webp.Image(6, 2, 3, Array.tabulate(36)(_ % 256)))
    assert(ImageDecoder.sniff(vp8l) == ImageInfo("webp", "lossless", true, 6, 2))
    val vp8 = Webp.encodeLossyHeader(320, 200)
    assert(ImageDecoder.sniff(vp8) == ImageInfo("webp", "lossy", false, 320, 200))
    intercept[IllegalArgumentException](ImageDecoder.sniff("nope".getBytes))
  }
}
