package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.Mkv

/** Matroska/WebM EBML metadata kernel: fixture-encoder round-trips,
  * a HAND-ASSEMBLED bitstream (vint widths, unknown-size Segment,
  * float32 Duration, spec defaults — independent of the encoder, so a
  * shared encode/decode bug cannot hide), and hostile inputs. */
class MkvSpec extends AnyFunSuite {

  test("mkv: round-trip docType/duration/tracks through the EBML walk") {
    val bytes = Mkv.encodeHeader("webm", 1000000L, 754321.0, Seq(
      Mkv.Track("video", "V_VP9", 1920, 1080, 0, 0),
      Mkv.Track("audio", "A_OPUS", 0, 0, 6, 48000)))
    val m = Mkv.metadata(bytes)
    assert(m.docType == "webm")
    assert(m.timestampScaleNs == 1000000L)
    assert(m.durationMs == 754321L) // 1 ms scale → units ARE ms, exact
    assert(m.video.contains(Mkv.Track("video", "V_VP9", 1920, 1080, 0, 0)))
    assert(m.audio.contains(Mkv.Track("audio", "A_OPUS", 0, 0, 6, 48000)))
  }

  test("mkv: non-default TimestampScale scales the float duration; floor") {
    // scale 500,000 ns = 0.5 ms per unit; 1001 units → 500.5 ms → 500
    val m = Mkv.metadata(Mkv.encodeHeader("matroska", 500000L, 1001.0,
      Seq(Mkv.Track("audio", "A_VORBIS", 0, 0, 2, 44100))))
    assert(m.durationMs == 500L)
    assert(m.video.isEmpty && m.audio.nonEmpty)
  }

  test("mkv: live stream (no Duration element) reports the -1 sentinel") {
    val m = Mkv.metadata(Mkv.encodeHeader("webm", 1000000L, -1.0,
      Seq(Mkv.Track("video", "V_VP8", 640, 480, 0, 0))))
    assert(m.durationMs == -1L)
    assert(m.video.map(_.codecId).contains("V_VP8"))
  }

  // hand-assembled fixture: unknown-size Segment (the streamed-WebM
  // shape), 3-byte TimestampScale uint, FLOAT32 Duration (2500.0f =
  // 0x451C4000), 1-byte element ids (TrackEntry 0xAE), a trailing
  // Cluster the walk must skip by size, and a NUL-padded DocType
  private val handFixture: Array[Byte] = {
    val b = Seq.newBuilder[Int]
    // EBML header: DocType "webm\0\0" (NUL padding must strip)
    b ++= Seq(0x1A, 0x45, 0xDF, 0xA3, 0x89,
      0x42, 0x82, 0x86, 'w', 'e', 'b', 'm', 0x00, 0x00)
    // Segment, UNKNOWN size (1-byte all-ones vint)
    b ++= Seq(0x18, 0x53, 0x80, 0x67, 0xFF)
    // Info (14 bytes): TimestampScale 1,000,000 + Duration float32 2500.0
    b ++= Seq(0x15, 0x49, 0xA9, 0x66, 0x8E,
      0x2A, 0xD7, 0xB1, 0x83, 0x0F, 0x42, 0x40,
      0x44, 0x89, 0x84, 0x45, 0x1C, 0x40, 0x00)
    // Tracks: one video TrackEntry (type 1, V_VP8, 160x120)
    b ++= Seq(0x16, 0x54, 0xAE, 0x6B, 0x94,
      0xAE, 0x92,
      0x83, 0x81, 0x01,
      0x86, 0x85, 'V', '_', 'V', 'P', '8',
      0xE0, 0x86, 0xB0, 0x81, 0xA0, 0xBA, 0x81, 0x78)
    // Cluster with 3 junk payload bytes — skipped by size
    b ++= Seq(0x1F, 0x43, 0xB6, 0x75, 0x83, 0x00, 0x01, 0x02)
    b.result().map(_.toByte).toArray
  }

  test("mkv: hand-assembled bitstream — unknown-size Segment, float32 " +
    "Duration, NUL-trimmed DocType, Cluster skipped") {
    val m = Mkv.metadata(handFixture)
    assert(m.docType == "webm")
    assert(m.timestampScaleNs == 1000000L)
    assert(m.durationMs == 2500L)
    assert(m.tracks == Seq(Mkv.Track("video", "V_VP8", 160, 120, 0, 0)))
  }

  test("mkv: audio element with no children takes the spec defaults " +
    "(channels 1, rate 8000); non-minimal size vints parse") {
    val b = Seq.newBuilder[Int]
    b ++= Seq(0x1A, 0x45, 0xDF, 0xA3, 0x88,
      // DocType with a NON-MINIMAL 2-byte size vint (0x4004 → 4)
      0x42, 0x82, 0x40, 0x04, 'w', 'e', 'b', 'm')
    b ++= Seq(0x18, 0x53, 0x80, 0x67, 0x93,
      0x16, 0x54, 0xAE, 0x6B, 0x8E,
      0xAE, 0x8C,
      0x83, 0x81, 0x02, // TrackType audio
      0x86, 0x85, 'A', '_', 'F', 'O', 'O',
      0xE1, 0x80) // empty Audio element
    val m = Mkv.metadata(b.result().map(_.toByte).toArray)
    assert(m.audio.contains(Mkv.Track("audio", "A_FOO", 0, 0, 1, 8000)))
    assert(m.durationMs == -1L) // no Info at all → live sentinel
  }

  test("mkv: hostile inputs fail loudly") {
    // not EBML at all
    intercept[IllegalArgumentException](Mkv.metadata("RIFFxxxx".getBytes))
    // unknown-size element that is NOT Segment (Info with 0xFF size)
    val badInfo = handFixture.clone()
    badInfo(23) = 0xFF.toByte // Info's size byte → unknown
    intercept[IllegalArgumentException](Mkv.metadata(badInfo))
    // element size overruns its parent (DocType size 6 → 63, past the
    // EBML header's end)
    val overrun = handFixture.clone()
    overrun(7) = 0xBF.toByte
    intercept[IllegalArgumentException](Mkv.metadata(overrun))
    // vint lead byte 0x00 (width > 8)
    val zeroLead = handFixture.take(14) ++ Array[Byte](0x00, 0x00)
    intercept[IllegalArgumentException](Mkv.metadata(zeroLead))
    // element id wider than 4 bytes (lead 0x08 → width 5)
    val wideId = handFixture.take(14) ++
      Array[Byte](0x08, 0x01, 0x02, 0x03, 0x04, 0x80.toByte)
    intercept[IllegalArgumentException](Mkv.metadata(wideId))
    // TimestampScale 0 (empty uint payload = 0)
    val b = Seq.newBuilder[Int]
    b ++= Seq(0x1A, 0x45, 0xDF, 0xA3, 0x87,
      0x42, 0x82, 0x84, 'w', 'e', 'b', 'm')
    b ++= Seq(0x18, 0x53, 0x80, 0x67, 0x89,
      0x15, 0x49, 0xA9, 0x66, 0x84,
      0x2A, 0xD7, 0xB1, 0x80) // TimestampScale, EMPTY payload = 0
    intercept[IllegalArgumentException](
      Mkv.metadata(b.result().map(_.toByte).toArray))
    // float element of an illegal width (3 bytes)
    val fb = Seq.newBuilder[Int]
    fb ++= Seq(0x1A, 0x45, 0xDF, 0xA3, 0x87,
      0x42, 0x82, 0x84, 'w', 'e', 'b', 'm')
    fb ++= Seq(0x18, 0x53, 0x80, 0x67, 0x8B,
      0x15, 0x49, 0xA9, 0x66, 0x86,
      0x44, 0x89, 0x83, 0x01, 0x02, 0x03)
    intercept[IllegalArgumentException](
      Mkv.metadata(fb.result().map(_.toByte).toArray))
  }

  test("videoContainerMeta: MP4 and WebM route; unknown container loud") {
    import graft.operators.Multimodal.videoContainerMeta
    import graft.kernel.Mp4
    val mp4 = Mp4.encodeHeader("isom", 600, 1200, Seq(
      Mp4.Track("vide", "avc1", 320, 180), Mp4.Track("soun", "mp4a", 0, 0)))
    assert(videoContainerMeta(mp4) == (("mp4", "avc1", 320, 180, 2000L)))
    val webm = Mkv.encodeHeader("webm", 1000000L, 2000.0, Seq(
      Mkv.Track("video", "V_VP9", 640, 360, 0, 0)))
    assert(videoContainerMeta(webm) == (("webm", "V_VP9", 640, 360, 2000L)))
    val mkvAudio = Mkv.encodeHeader("matroska", 1000000L, 500.0, Seq(
      Mkv.Track("audio", "A_OPUS", 0, 0, 2, 48000)))
    assert(videoContainerMeta(mkvAudio) == (("matroska", "", 0, 0, 500L)))
    intercept[IllegalArgumentException](videoContainerMeta("nope".getBytes))
  }
}
