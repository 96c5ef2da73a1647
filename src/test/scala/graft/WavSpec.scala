package graft

import graft.kernel.Wav
import graft.operators.Multimodal

/** [[graft.kernel.Wav]] codec gates — decode tested against hand-built
  * byte streams from the RIFF/WAVE grammar (headers written out
  * literally), independent of the encoder; plus bit-exact round-trips
  * and loud rejection of the forms the parser does not speak. Also
  * gates the audio fingerprint family (m11/m12): hand-computed energy
  * deltas, amplitude invariance, constructed near-dup hamming.
  */
class WavSpec extends SparkSuite {

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

  test("audio fingerprint: hand-computed energy-delta bits") {
    val spark2 = spark
    import spark2.implicits._
    // 10 samples, 5 segments of 2: energies |s| sums = 3, 30, 7, 300, 1
    // → delta bits (e1>e0, e2>e1, e3>e2, e4>e3) = 1, 0, 1, 0 → byte 0b0101
    val samples = Array(1, -2, 10, -20, 3, 4, 100, -200, 1, 0)
    val media = Seq((1L, "audio", Wav.encode(Wav.Audio(8000, 1, 16, samples))))
      .toDF("doc_id", "media_type", "payload")
    val row = Multimodal.audioFingerprints(media, frames = 5).head()
    assert(row.getLong(1) == 10L)
    assert(row.getSeq[Int](2) == Seq(0x05))
  }

  test("audio fingerprint is amplitude-invariant: double volume, same bits") {
    val spark2 = spark
    import spark2.implicits._
    val base = Array.tabulate(650)(i => ((i * 53 + 17) % 3001) - 1500)
    val loud = base.map(_ * 2) // exact doubling — still int16 after *2? cap
    assert(loud.forall(s => s >= -32768 && s <= 32767))
    val media = Seq(
      (1L, "audio", Wav.encode(Wav.Audio(8000, 1, 16, base))),
      (2L, "audio", Wav.encode(Wav.Audio(8000, 1, 16, loud))))
      .toDF("doc_id", "media_type", "payload")
    val hashes = Multimodal.audioFingerprints(media)
      .select("doc_id", "audio_hash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L), "volume change moved the fingerprint")
  }

  test("audioNearDups: re-encode and volume copy pair up, distinct audio does not") {
    val spark2 = spark
    import spark2.implicits._
    val base = Array.tabulate(650)(i => ((i * 53 + 17) % 3001) - 1500)
    val half = base.map(_ / 2)
    val other = Array.tabulate(650)(i => ((i * 211 + 5) % 3801) - 1900)
    val media = Seq(
      (1L, "audio", Wav.encode(Wav.Audio(8000, 1, 16, base))),
      (2L, "audio", Wav.encode(Wav.Audio(8000, 1, 16, base))), // re-encode
      (3L, "audio", Wav.encode(Wav.Audio(8000, 1, 16, half))),
      (4L, "audio", Wav.encode(Wav.Audio(8000, 1, 16, other))))
      .toDF("doc_id", "media_type", "payload")
    val pairs = Multimodal.audioNearDups(media, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 2,
      s"half-volume copy not caught: $pairs")
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L),
      s"distinct audio paired: $pairs")
  }

  test("audioSegments: hand-computed runs, inclusive threshold, partial tail frame") {
    val spark2 = spark
    import spark2.implicits._
    // frameLen 4; 19 samples → four full frames and a 3-sample tail;
    // frame 3 sits EXACTLY on the threshold (mean 100, inclusive →
    // active), the tail scores 310 vs its own 3·100 floor
    val samples =
      Array.fill(4)(200) ++ Array.fill(4)(-200) ++ Array.fill(4)(0) ++
        Array.fill(4)(100) ++ Array(5, 5, 300)
    val media = Seq((3L, "audio",
      graft.kernel.Wav.encode(graft.kernel.Wav.Audio(8000, 1, 16, samples))))
      .toDF("doc_id", "media_type", "payload")
    val got = Multimodal.audioSegments(media, frameLen = 4, num = 100, den = 1)
      .orderBy("seg_idx").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))
    // frames: e = 800, 800, 0, 400, tail {5,5,300} → 310; active:
    // 0,1 (mean 200), 3 (exactly 100), 4 (310 ≥ 300)
    assert(got.toSeq == Seq(
      (0, 0, 1, 2, 1600L),
      (1, 3, 4, 2, 710L)))
    // an all-silent clip yields no rows, an all-active one exactly one
    val silent = Seq((4L, "audio", graft.kernel.Wav.encode(
      graft.kernel.Wav.Audio(8000, 1, 16, Array.fill(8)(1)))))
      .toDF("doc_id", "media_type", "payload")
    assert(Multimodal.audioSegments(silent, frameLen = 4).count() == 0L)
    val loud = Seq((5L, "audio", graft.kernel.Wav.encode(
      graft.kernel.Wav.Audio(8000, 1, 16, Array.fill(8)(500)))))
      .toDF("doc_id", "media_type", "payload")
    val one = Multimodal.audioSegments(loud, frameLen = 4).collect()
    assert(one.length == 1 && one.head.getInt(2) == 0 && one.head.getInt(3) == 1)
  }

  test("audioClips: each clip WAV decodes back to the exact active sample span") {
    val spark2 = spark
    import spark2.implicits._
    // same layout as the audioSegments gate: runs [0,1] and [3,4]
    val samples =
      Array.fill(4)(200) ++ Array.fill(4)(-200) ++ Array.fill(4)(0) ++
        Array.fill(4)(100) ++ Array(5, 5, 300)
    val media = Seq((3L, "audio",
      graft.kernel.Wav.encode(graft.kernel.Wav.Audio(8000, 1, 16, samples))))
      .toDF("doc_id", "media_type", "payload")
    val got = Multimodal.audioClips(media, frameLen = 4, num = 100, den = 1)
      .orderBy("seg_idx").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getAs[Array[Byte]](4)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq ==
      Seq((0, 0, 8), (1, 12, 7)))
    got.foreach { case (_, from, len, wav) =>
      val clip = graft.kernel.Wav.decode(wav)
      assert(clip.sampleRate == 8000 && clip.channels == 1)
      assert(clip.samples.sameElements(samples.slice(from, from + len)))
    }
    // stereo input is refused loudly (sample-index slicing would split
    // channel frames)
    val stereo = Seq((4L, "audio", graft.kernel.Wav.encode(
      graft.kernel.Wav.Audio(8000, 2, 16, Array.fill(8)(500)))))
      .toDF("doc_id", "media_type", "payload")
    val e = intercept[Exception](
      Multimodal.audioClips(stereo, frameLen = 4).collect())
    assert(e.getMessage.contains("mono") ||
      (e.getCause != null && e.getCause.getMessage.contains("mono")))
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
