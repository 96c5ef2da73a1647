package graft

import graft.kernel.Gif

/** [[graft.kernel.Gif]] codec gates.
  *
  * The central decode test is INDEPENDENT of the encoder: a minimal GIF
  * is hand-assembled from the spec grammar — header, color table, image
  * descriptor, and the variable-width LZW scan bits computed on paper —
  * with the expected pixels written literally. GIF is lossless, so
  * every encoder path (interlace, local tables, animation, dictionary
  * resets) is additionally pinned by bit-exact round-trips.
  */
class GifSpec extends SparkSuite {

  /** Hand-assembled 4×1 GIF, 4-color global table, indices [0,1,2,1].
    *
    * LZW (minCode 2, clear 4, end 5, width starts 3): codes clear(4),
    * 0, 1, 2 go out 3-bit — emitting 2 the free slot has reached
    * 8 = 2³ (slots 6 and 7 defined), so the remaining codes 1, end(5)
    * are 4-bit. LSB-first bit stream 001 000 100 010 1000 1010 packs
    * to bytes 0x44 0x14 0x05 (worked out by hand). */
  private def handGif(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    Seq(4, 0, 1, 0, 0x81, 0, 0).foreach(out.write) // LSD: 4×1, GCT of 4
    Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 1, 2, 3).foreach(out.write)
    Seq(0x2c, 0, 0, 0, 0, 4, 0, 1, 0, 0).foreach(out.write) // descriptor
    out.write(2) // LZW min code size
    Seq(3, 0x44, 0x14, 0x05, 0).foreach(out.write) // one sub-block + term
    out.write(0x3b)
    out.toByteArray
  }

  test("hand-assembled fixture decodes to the pixels computed on paper") {
    val img = Gif.decode(handGif())
    assert(img.width == 4 && img.height == 1 && img.channels == 3)
    assert(img.samples.toSeq ==
      Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 40, 50, 60))
  }

  test("gray round-trip is bit-exact (lossless codec, ragged dims)") {
    val w = 23; val h = 11
    val px = Array.tabulate(w * h)(i => (i % w * 7 + i / w * 11 + 3) % 256)
    val img = Gif.decode(Gif.encode(Gif.Image(w, h, 1, px)))
    assert(img.width == w && img.height == h)
    // gray v expands to (v, v, v)
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(img.samples(3 * i + c) == px(i), s"drift at $i channel $c")
  }

  test("RGB round-trip is bit-exact") {
    val w = 13; val h = 9
    val px = Array.tabulate(w * h * 3) { s =>
      val p = s / 3
      (p % 16) * 16 + s % 3 // ≤ 256 distinct colors by construction
    }
    val img = Gif.decode(Gif.encode(Gif.Image(w, h, 3, px)))
    assert(img.samples.toSeq == px.toSeq)
  }

  test("interlaced encode decodes identically to non-interlaced") {
    val w = 17; val h = 13 // odd dims exercise every interlace pass tail
    val px = Array.tabulate(w * h)(i => (i * 31 + 5) % 256)
    val plain = Gif.decode(Gif.encode(Gif.Image(w, h, 1, px)))
    val inter = Gif.decode(Gif.encode(Gif.Image(w, h, 1, px), interlaced = true))
    assert(plain.samples.toSeq == inter.samples.toSeq)
  }

  test("single-color and KwKwK-inducing runs round-trip") {
    // all-same indices hit the KwKwK decode branch immediately
    val flat = Array.fill(64)(7)
    assert(Gif.decode(Gif.encode(Gif.Image(8, 8, 1, flat))).samples.toSeq ==
      flat.flatMap(v => Seq(v, v, v)).toSeq)
    val runs = Array.tabulate(400)(i => if (i % 50 < 40) 1 else i % 5)
    assert(Gif.decode(Gif.encode(Gif.Image(20, 20, 1, runs))).samples.toSeq ==
      runs.flatMap(v => Seq(v, v, v)).toSeq)
  }

  test("noisy 256-color image forces dictionary resets and still round-trips") {
    val w = 120; val h = 90 // > 4096 distinct strings → encoder clear path
    val px = Array.tabulate(w * h) { i =>
      (((i * 2654435761L) >> 8) & 0xff).toInt
    }
    val img = Gif.decode(Gif.encode(Gif.Image(w, h, 1, px)))
    for (i <- 0 until w * h)
      assert(img.samples(3 * i) == px(i), s"drift at $i")
  }

  test("animation round-trips frame-for-frame; local tables match global") {
    val w = 10; val h = 6
    val frames = Seq.tabulate(4)(f =>
      Array.tabulate(w * h)(i => (i * 3 + f * 17) % 256))
    for (local <- Seq(false, true)) {
      val anim = Gif.decodeFrames(
        Gif.encodeAnimation(w, h, frames, channels = 1, localTables = local))
      assert(anim.width == w && anim.height == h && anim.frames.size == 4)
      for ((f, k) <- frames.zipWithIndex)
        assert(anim.frames(k).toSeq == f.flatMap(v => Seq(v, v, v)).toSeq,
          s"frame $k local=$local")
    }
  }

  /** Hand-built 2×2 animation: transparency composites OVER the previous
    * frame, and restore-to-background disposal clears the rect after the
    * frame shows. Colors: 0=(9,9,9) 1=(50,50,50) 2=(99,99,99) 3=(200,200,200);
    * background index 0. */
  private def handAnim(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    Seq(2, 0, 2, 0, 0x81, 0, 0).foreach(out.write) // 2×2, GCT 4, bg 0
    Seq(9, 9, 9, 50, 50, 50, 99, 99, 99, 200, 200, 200).foreach(out.write)
    // frame 1: full rect, indices [0,1,2,3]: clear(4) 0 1 2 at 3 bits,
    // then the free slot hits 8 so 3 and end(5) go 4-bit →
    // 001 000 100 010 1100 1010 → bytes 0x44 0x34 0x05
    Seq(0x2c, 0, 0, 0, 0, 2, 0, 2, 0, 0, 2,
      3, 0x44, 0x34, 0x05, 0).foreach(out.write)
    // GCE: disposal keep (1), transparent index 3
    Seq(0x21, 0xf9, 4, (1 << 2) | 1, 0, 0, 3, 0).foreach(out.write)
    // frame 2: full rect, indices [3,3,0,3] — only (x0,y1) paints:
    // clear(4) 3 3 0 at 3 bits, then 3 and end(5) 4-bit →
    // 001 110 110 000 1100 1010 → 0xdc 0x30 0x05
    Seq(0x2c, 0, 0, 0, 0, 2, 0, 2, 0, 0, 2,
      3, 0xdc, 0x30, 0x05, 0).foreach(out.write)
    // GCE: disposal restore-to-background (2), no transparency
    Seq(0x21, 0xf9, 4, 2 << 2, 0, 0, 0, 0).foreach(out.write)
    // frame 3: 1×1 rect at (1,0), index 2: clear(4) 2 end(5) →
    // 001 010 101 → 0x54 0x01
    Seq(0x2c, 1, 0, 0, 0, 1, 0, 1, 0, 0, 2,
      2, 0x54, 0x01, 0).foreach(out.write)
    // frame 4: 1×1 rect at (0,0), index 1 — shows frame 3's rect was
    // restored to background after it displayed
    Seq(0x2c, 0, 0, 0, 0, 1, 0, 1, 0, 0, 2,
      2, 0x4c, 0x01, 0).foreach(out.write) // clear(4) 1 end(5): 001 100 101
    out.write(0x3b)
    out.toByteArray
  }

  test("transparency and restore-to-background compositing, worked by hand") {
    val anim = Gif.decodeFrames(handAnim())
    assert(anim.frames.size == 4)
    def rgb(vs: Int*): Seq[Int] = vs.flatMap(v => Seq(v, v, v))
    assert(anim.frames(0).toSeq == rgb(9, 50, 99, 200))
    // frame 2: transparent index 3 leaves previous pixels; index 0 paints
    assert(anim.frames(1).toSeq == rgb(9, 50, 9, 200))
    // frame 3: paints (1,0) over the kept canvas
    assert(anim.frames(2).toSeq == rgb(9, 99, 9, 200))
    // frame 4: frame 3's 1×1 rect was restored to background (9) first
    assert(anim.frames(3).toSeq == rgb(50, 9, 9, 200))
  }

  test("same picture in PNG, JPEG and GIF yields identical hash bits") {
    import graft.kernel.{Jpeg, Png}
    import graft.operators.Multimodal
    // constant 8×8 tiles survive the lossy JPEG bit-exactly; GIF decode
    // expands gray to RGB (3× every block sum), which the ratio-form
    // hash bits must be invariant to — that invariance is what lets the
    // cross-container near-dup query mix all three formats
    val w = 64; val h = 64
    val px = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      ((bx * 57L + by * 131L + 23L) % 256L).toInt
    }
    val dec = new Multimodal.ImageDecoder
    def bits(payload: Array[Byte]): Seq[Boolean] = {
      val (_, _, sums) = dec.blockSums(payload, 8)
      val total = sums.sum
      sums.toSeq.map(s => s * 64 > total)
    }
    val asPng = bits(Png.encode(Png.Image(w, h, 1, 8, px)))
    val asJpeg = bits(Jpeg.encode(Jpeg.Image(w, h, 1, px)))
    val asGif = bits(Gif.encode(Gif.Image(w, h, 1, px)))
    assert(asPng == asJpeg)
    assert(asPng == asGif)
  }

  test("hostile and unsupported inputs fail loudly") {
    intercept[IllegalArgumentException](Gif.decode("nope".getBytes))
    // crafted huge screen — rejected by the sample budget BEFORE allocation
    val huge = handGif()
    huge(6) = 0xff.toByte; huge(7) = 0xff.toByte
    huge(8) = 0xff.toByte; huge(9) = 0xff.toByte
    val e = intercept[IllegalArgumentException](Gif.decode(huge))
    assert(e.getMessage.contains("budget"))
    // >256 distinct colors — the exact-palette encoder refuses
    val many = Array.tabulate(24 * 24 * 3) { s =>
      val p = s / 3 // 576 distinct colors: (p%256, p/256, s%3)
      (s % 3) match { case 0 => p % 256; case 1 => p / 256; case _ => 0 }
    }
    val e2 = intercept[IllegalArgumentException](
      Gif.encode(Gif.Image(24, 24, 3, many)))
    assert(e2.getMessage.contains("256"))
    // restore-to-previous disposal — unimplemented, must be loud
    val anim = handAnim()
    // locate the first GCE and rewrite its disposal bits to 3
    val idx = {
      var i = 0; var found = -1
      while (found < 0 && i + 1 < anim.length) {
        if ((anim(i) & 0xff) == 0x21 && (anim(i + 1) & 0xff) == 0xf9) found = i
        i += 1
      }
      found
    }
    anim(idx + 3) = ((3 << 2) | 1).toByte
    val e3 = intercept[IllegalArgumentException](Gif.decodeFrames(anim))
    assert(e3.getMessage.contains("disposal"))
    // truncated stream
    intercept[IllegalArgumentException](
      Gif.decode(handGif().dropRight(3)))
  }
}
