package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.Wav

/** [[graft.kernel.Wav]] codec gates — decode tested against hand-built
  * byte streams from the RIFF/WAVE grammar (headers written out
  * literally), independent of the encoder; plus bit-exact round-trips
  * and loud rejection of the forms the parser does not speak.
  */
class WavSpec extends AnyFunSuite {

  private def le16(v: Int): Seq[Byte] = Seq(v.toByte, (v >> 8).toByte)
  private def le32(v: Int): Seq[Byte] =
    Seq(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def ascii(s: String): Seq[Byte] = s.getBytes("US-ASCII").toSeq

  private def riff(chunks: Seq[Byte]): Array[Byte] =
    (ascii("RIFF") ++ le32(4 + chunks.length) ++ ascii("WAVE") ++ chunks).toArray

  private def fmtChunk(format: Int, channels: Int, rate: Int, bits: Int): Seq[Byte] =
    ascii("fmt ") ++ le32(16) ++ le16(format) ++ le16(channels) ++
      le32(rate) ++ le32(rate * channels * bits / 8) ++
      le16(channels * bits / 8) ++ le16(bits)

  test("hand-built 16-bit stereo PCM decodes to exact signed samples") {
    // frames: (L=-1, R=256), (L=-32768, R=32767) — little-endian pairs
    val data = ascii("data") ++ le32(8) ++
      Seq(0xff, 0xff, 0x00, 0x01, 0x00, 0x80, 0xff, 0x7f).map(_.toByte)
    val a = Wav.decode(riff(fmtChunk(1, 2, 44100, 16) ++ data))
    assert(a.sampleRate == 44100 && a.channels == 2 && a.bitsPerSample == 16)
    assert(a.samples.toSeq == Seq(-1, 256, -32768, 32767))
  }

  test("8-bit mono PCM rebases unsigned bytes; metadata chunks are skipped") {
    // a LIST metadata chunk with ODD length sits between fmt and data —
    // the chunk walk must honor the word-alignment pad byte
    val list = ascii("LIST") ++ le32(3) ++ Seq[Byte](1, 2, 3) ++ Seq[Byte](0)
    val data = ascii("data") ++ le32(3) ++ Seq(0, 128, 255).map(_.toByte)
    val a = Wav.decode(riff(fmtChunk(1, 1, 8000, 8) ++ list ++ data))
    assert(a.sampleRate == 8000 && a.channels == 1 && a.bitsPerSample == 8)
    assert(a.samples.toSeq == Seq(-128, 0, 127))
  }

  test("encode -> decode round-trips 16-bit PCM bit-exactly") {
    for (ch <- Seq(1, 2)) {
      val samples = Array.tabulate(6 * ch)(i => (i * 7919 - 20000) % 32768)
      val a = Wav.Audio(16000, ch, 16, samples)
      val back = Wav.decode(Wav.encode(a))
      assert(back.sampleRate == 16000 && back.channels == ch)
      assert(back.samples.toSeq == samples.toSeq, s"round-trip drift at ch=$ch")
    }
  }

  test("malformed inputs fail loudly, never misparse") {
    // not RIFF/WAVE
    assertThrows[IllegalArgumentException](Wav.decode("OggS....".getBytes))
    // float PCM (format 3) rejected, not misread as int16
    val data = ascii("data") ++ le32(4) ++ Seq[Byte](0, 0, 0, 0)
    val e = intercept[IllegalArgumentException](
      Wav.decode(riff(fmtChunk(3, 1, 8000, 16) ++ data)))
    assert(e.getMessage.contains("PCM"))
    // data length not a frame multiple
    val ragged = ascii("data") ++ le32(3) ++ Seq[Byte](0, 0, 0)
    assertThrows[IllegalArgumentException](
      Wav.decode(riff(fmtChunk(1, 2, 8000, 16) ++ ragged)))
    // truncated: header promises more data than exists
    val lying = ascii("data") ++ le32(100) ++ Seq[Byte](0, 0)
    assertThrows[IllegalArgumentException](
      Wav.decode(riff(fmtChunk(1, 1, 8000, 16) ++ lying)))
  }
}
