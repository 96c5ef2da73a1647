package graft

import org.scalatest.funsuite.AnyFunSuite

/** Generative round-trip gates for every pure-JVM codec: the
  * hand-built fixtures in the per-codec specs pin exact grammar cases;
  * this suite drives seeded-random shapes and payloads through the
  * same kernels to catch the corners nobody hand-builds (odd
  * dimensions, extreme values, boundary lengths). Lossless paths must
  * round-trip bit-exactly; the lossy JPEG path must decode its own
  * encodes with correct geometry and bounded error. Deterministic
  * (splitmix-derived cases, no clock/global RNG); purely local — no
  * SparkSession.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def pick(seed: Long, k: Long, bound: Int): Int =
    ((mix(seed * 1000003L + k) >>> 13) % bound).toInt

  private val Cases = 40

  test("PNG: random dims/channels/content round-trip bit-exactly") {
    for (c <- 0 until Cases) {
      val seed = mix(c.toLong)
      val w = 1 + pick(seed, 1, 40); val h = 1 + pick(seed, 2, 40)
      val ch = 1 + pick(seed, 3, 4)
      val px = Array.tabulate(w * h * ch)(i => (mix(seed + i) & 0xff).toInt)
      val back = graft.kernel.Png.decode(
        graft.kernel.Png.encode(graft.kernel.Png.Image(w, h, ch, 8, px)))
      assert(back.width == w && back.height == h && back.channels == ch,
        s"case $c: ${w}x$h ch=$ch")
      assert(back.samples.sameElements(px), s"case $c: ${w}x$h ch=$ch")
    }
  }

  test("GIF: random dims/content round-trip exactly (any image, exact palette)") {
    for (c <- 0 until Cases) {
      val seed = mix(1000L + c)
      val w = 1 + pick(seed, 1, 30); val h = 1 + pick(seed, 2, 30)
      val ch = if (pick(seed, 3, 2) == 0) 1 else 3
      val colors = 1 + pick(seed, 4, 16)
      val palette = Array.tabulate(colors * ch)(i => (mix(seed - i) & 0xff).toInt)
      val px = Array.tabulate(w * h * ch) { i =>
        val p = pick(seed, 100 + i / ch, colors)
        palette(p * ch + i % ch)
      }
      val back = graft.kernel.Gif.decode(
        graft.kernel.Gif.encode(graft.kernel.Gif.Image(w, h, ch, px)))
      assert(back.width == w && back.height == h && back.channels == 3,
        s"case $c: ${w}x$h ch=$ch")
      // the composited canvas is RGB; gray sources widen 1 → 3
      for (i <- 0 until w * h; cc <- 0 until 3) {
        val want = if (ch == 3) px(i * 3 + cc) else px(i)
        assert(back.samples(i * 3 + cc) == want, s"case $c pixel $i ch $cc")
      }
    }
  }

  test("WebP: random dims/channels/content round-trip bit-exactly") {
    for (c <- 0 until Cases) {
      val seed = mix(7000L + c)
      val w = 1 + pick(seed, 1, 40); val h = 1 + pick(seed, 2, 40)
      val ch = if (pick(seed, 3, 2) == 0) 3 else 4
      val px = Array.tabulate(w * h * ch)(i => (mix(seed + i) & 0xff).toInt)
      val back = graft.kernel.Webp.decode(
        graft.kernel.Webp.encode(graft.kernel.Webp.Image(w, h, ch, px)))
      assert(back.width == w && back.height == h && back.channels == ch,
        s"case $c: ${w}x$h ch=$ch")
      assert(back.samples.sameElements(px), s"case $c: ${w}x$h ch=$ch")
    }
  }

  test("WAV: random rates/channels/samples round-trip bit-exactly") {
    // the encoder writes 16-bit PCM only (8-bit DECODE is gated by
    // WavSpec's hand-built RIFF bytes); fuzz the encoder's domain
    for (c <- 0 until Cases) {
      val seed = mix(2000L + c)
      val chn = 1 + pick(seed, 4, 2)
      val n = chn * (1 + pick(seed, 1, 250))
      val rate = Seq(8000, 16000, 44100)(pick(seed, 3, 3))
      val samples = Array.tabulate(n)(i => (mix(seed + i) % 32768L).toInt)
      val back = graft.kernel.Wav.decode(graft.kernel.Wav.encode(
        graft.kernel.Wav.Audio(rate, chn, 16, samples)))
      assert(back.sampleRate == rate && back.bitsPerSample == 16 &&
        back.channels == chn, s"case $c")
      assert(back.samples.sameElements(samples), s"case $c: n=$n ch=$chn")
    }
  }

  test("Y4M: random colorspace/dims/frames round-trip bit-exactly") {
    for (c <- 0 until Cases) {
      val seed = mix(3000L + c)
      // the encoder writes C420/Cmono (C422/C444 DECODE is gated by
      // Y4mSpec's hand-built streams); fuzz the encoder's domain
      val cs = Seq("C420", "Cmono")(pick(seed, 1, 2))
      val w = 2 * (1 + pick(seed, 2, 16)); val h = 2 * (1 + pick(seed, 3, 16))
      val nf = 1 + pick(seed, 4, 5)
      val fb = if (cs == "C420") w * h * 3 / 2 else w * h
      val frames = Vector.tabulate(nf)(f =>
        Array.tabulate[Byte](fb)(i => (mix(seed + f * 100003L + i) & 0xff).toByte))
      val back = graft.kernel.Y4m.decode(
        graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(w, h, cs, frames)))
      assert(back.width == w && back.height == h && back.colorspace == cs,
        s"case $c: $cs ${w}x$h")
      assert(back.frames.length == nf)
      for (f <- 0 until nf)
        assert(back.frames(f).sameElements(frames(f)), s"case $c frame $f")
    }
  }

  test("JPEG: random block-structured images decode with correct geometry and bounded error") {
    for (c <- 0 until Cases) {
      val seed = mix(4000L + c)
      val w = 1 + pick(seed, 1, 24); val h = 1 + pick(seed, 2, 24)
      val ch = if (pick(seed, 3, 2) == 0) 1 else 3
      // 8-aligned constant blocks: every coded unit is DC-only, so the
      // flat-quant round-trip error is a few rounding units at most —
      // for ANY random block values, not just the oracle's gray ones
      val px = Array.tabulate(w * h * ch) { i =>
        val x = (i / ch) % w; val y = (i / ch) / w
        (mix(seed + (x / 8) * 31L + (y / 8) * 17L + i % ch) & 0xff).toInt
      }
      val back = graft.kernel.Jpeg.decode(
        graft.kernel.Jpeg.encode(graft.kernel.Jpeg.Image(w, h, ch, px)))
      assert(back.width == w && back.height == h && back.channels == ch,
        s"case $c: ${w}x$h ch=$ch")
      val maxErr = px.indices.map(i => math.abs(px(i) - back.samples(i))).max
      assert(maxErr <= 8, s"case $c: max error $maxErr at ${w}x$h ch=$ch")
      // and the 4:2:0 path keeps geometry on odd dims too
      val back420 = graft.kernel.Jpeg.decode(
        graft.kernel.Jpeg.encode(graft.kernel.Jpeg.Image(w, h, ch, px),
          subsample420 = true))
      assert(back420.width == w && back420.height == h, s"case $c 4:2:0")
    }
  }

  test("WARC: random record batches round-trip through plain and gzip framing") {
    for (c <- 0 until Cases) {
      val seed = mix(5000L + c)
      val n = 1 + pick(seed, 1, 6)
      val gz = pick(seed, 2, 2) == 0
      val records = (0 until n).map { i =>
        val len = pick(seed, 10 + i, 1024)
        val body = Array.tabulate[Byte](len)(j =>
          (mix(seed + i * 7919L + j) & 0xff).toByte)
        (Seq("WARC-Type" -> "resource",
          "WARC-Record-ID" -> s"<urn:uuid:$i>"), body)
      }
      val bytes = if (gz) graft.kernel.Warc.writeGz(records)
        else graft.kernel.Warc.write(records)
      val back = graft.kernel.Warc.parseAll(bytes)
      assert(back.length == n, s"case $c")
      for (i <- 0 until n)
        assert(back(i).content.sameElements(records(i)._2), s"case $c record $i")
    }
  }

  test("audio tags: random title/artist round-trip through ID3v2/ID3v1/Vorbis/FLAC") {
    import graft.kernel.{Flac, Mp3, Ogg}
    // printable-ASCII + Latin-1 + BMP strings of random lengths; every
    // encoding and container must return the exact string
    def str(seed: Long, k: Long, maxLen: Int, wide: Boolean): String = {
      val len = pick(seed, k, maxLen + 1)
      new String(Array.tabulate(len) { i =>
        val r = mix(seed + k * 131 + i)
        if (wide) (0x100 + ((r >>> 7) % 0x700)).toInt.toChar // BMP, no NUL
        else (0x20 + ((r >>> 7) % 0x5f)).toInt.toChar // printable ASCII
      })
    }
    for (c <- 0 until Cases) {
      val seed = mix(9000L + c)
      val enc = pick(seed, 1, 4)
      val wide = enc != 0 // ISO-8859-1 frames can't carry BMP chars
      val title = str(seed, 2, 24, wide)
      val artist = str(seed, 3, 24, wide)
      val major = 3 + pick(seed, 4, 2)
      val m = Mp3.metadata(Mp3.encodeHeader(1 + pick(seed, 5, 5), 128, 44100,
        id3 = Mp3.encodeId3v2(title, artist, major, enc,
          padding = pick(seed, 6, 50))))
      assert(m.title == title && m.artist == artist,
        s"case $c id3v2.$major enc=$enc")
      // Vorbis comments are UTF-8: any BMP string survives opus+vorbis
      val mo = Ogg.metadata(Ogg.encodeOpusHeader(1, 0, 48000, 960L,
        title = title, artist = artist))
      assert(mo.title == title && mo.artist == artist, s"case $c opus")
      val mv = Ogg.metadata(Ogg.encodeVorbisHeader(1, 8000, 800L,
        title = title, artist = artist))
      assert(mv.title == title && mv.artist == artist, s"case $c vorbis")
      // comment packet spanning pages (cover-art-sized): accumulation
      // across the continuation page must reproduce the same tags
      val ms = Ogg.metadata(Ogg.encodeOpusHeaderSpanningTags(1, 0, 48000,
        960L, title = title, artist = artist,
        padBytes = 300 + pick(seed, 9, 600)))
      assert(ms.title == title && ms.artist == artist, s"case $c spanning")
      val mf = Flac.metadata(Flac.encodeHeader(8000, 1, 16, 0L,
        title = title, artist = artist))
      assert(mf.title == title && mf.artist == artist, s"case $c flac")
      // ID3v1 (ISO-8859-1, <=30 chars): ascii only, no trailing pad chars
      val t1 = str(seed, 7, 28, wide = false).replaceAll("[ ]+$", "")
      val a1 = str(seed, 8, 28, wide = false).replaceAll("[ ]+$", "")
      val m1 = Mp3.metadata(Mp3.appendId3v1(
        Mp3.encodeHeader(1, 128, 44100), t1, a1))
      assert(m1.title == t1 && m1.artist == a1, s"case $c id3v1")
    }
  }

  test("audio tag walks never hang or throw unexpected errors on random bytes") {
    import graft.kernel.{Flac, Mp3, Ogg}
    // the untrusted-input theorem for the new walks: arbitrary bytes
    // either parse or raise IllegalArgumentException — never an
    // ArrayIndexOutOfBounds, NegativeArraySize, OOM-shaped allocation,
    // or unbounded loop. Random mutations of VALID tagged streams hit
    // the deep branches plain random bytes never reach.
    for (c <- 0 until Cases * 4) {
      val seed = mix(17000L + c)
      val base = (c % 4) match {
        case 0 => Mp3.encodeHeader(2, 128, 44100,
          id3 = Mp3.encodeId3v2("Fuzz Title", "Fuzz Artist",
            3 + pick(seed, 1, 2), pick(seed, 2, 4)))
        case 1 => Ogg.encodeOpusHeader(1, 0, 48000, 960L,
          title = "Fuzz", artist = "Fz")
        case 2 => Ogg.encodeOpusHeaderSpanningTags(1, 0, 48000, 960L,
          title = "Fuzz", artist = "Fz", padBytes = 400)
        case _ => Flac.encodeHeader(8000, 1, 16, 0L, title = "Fuzz")
      }
      val bytes = base.clone()
      val flips = 1 + pick(seed, 3, 6)
      for (f <- 0 until flips) {
        val at = pick(seed, 10 + f, bytes.length)
        bytes(at) = (bytes(at) ^ (1 << pick(seed, 20 + f, 8))).toByte
      }
      try {
        (c % 4) match {
          case 0 => Mp3.metadata(bytes)
          case 1 | 2 => Ogg.metadata(bytes)
          case _ => Flac.metadata(bytes)
        }
      } catch {
        case _: IllegalArgumentException => () // loud rejection is correct
      }
    }
  }

  test("FLAC: random rates/channels/samples/stereo modes round-trip " +
      "bit-exactly through the frame codec") {
    for (c <- 0 until Cases) {
      val seed = mix(21000L + c)
      val chn = 1 + pick(seed, 4, 3)
      val n = chn * (1 + pick(seed, 1, 400))
      val rate = Seq(8000, 16000, 44100, 12345)(pick(seed, 3, 4))
      val bps = if (pick(seed, 5, 2) == 0) 8 else 16
      val lim = if (bps == 8) 128L else 32768L
      val samples = Array.tabulate(n)(i => (mix(seed + i) % lim).toInt)
      val stereo =
        if (chn != 2) "independent"
        else Seq("independent", "left_side", "right_side",
          "mid_side")(pick(seed, 6, 4))
      val block = Seq(16, 64, 192, 256)(pick(seed, 7, 4))
      val back = graft.kernel.Flac.decodeAudio(graft.kernel.Flac.encode(
        graft.kernel.Wav.Audio(rate, chn, bps, samples), block, stereo))
      assert(back.sampleRate == rate && back.channels == chn &&
        back.bitsPerSample == bps, s"case $c")
      assert(back.samples.sameElements(samples),
        s"case $c: n=$n ch=$chn bps=$bps stereo=$stereo block=$block")
    }
  }

  test("FLAC frame decode never hangs or throws unexpected errors on " +
      "mutated streams") {
    // decodeAudio is a CRAWL-path decoder (crawlAudioFingerprints):
    // the untrusted-input theorem applies to the full frame grammar,
    // not just the metadata walk — mutations of valid FRAME bytes hit
    // rice decoders, subframe headers, and CRC checks
    for (c <- 0 until Cases * 3) {
      val seed = mix(23000L + c)
      val n = 40 + pick(seed, 1, 200)
      val samples = Array.tabulate(n)(i => (mix(seed + i) % 4001L).toInt - 2000)
      val base = graft.kernel.Flac.encode(
        graft.kernel.Wav.Audio(8000, 1, 16, samples), blockSize = 64)
      val bytes = base.clone()
      val flips = 1 + pick(seed, 3, 8)
      for (f <- 0 until flips) {
        val at = pick(seed, 10 + f, bytes.length)
        bytes(at) = (bytes(at) ^ (1 << pick(seed, 20 + f, 8))).toByte
      }
      try {
        val a = graft.kernel.Flac.decodeAudio(bytes)
        // undetected-by-CRC mutations are possible only when the flip
        // lands in metadata we don't checksum; output stays bounded
        assert(a.samples.length * math.max(1, a.channels) <= (1 << 26))
      } catch {
        case _: IllegalArgumentException => () // loud rejection is correct
      }
    }
  }
}
