package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.{Mp3, Mp4}

/** MP4/MP3 header-metadata kernels (the lossy-container metadata rule:
  * payload decode is out of a pure-JVM engine's scope, structural
  * headers are free and must parse EXACTLY). Round-trips against the
  * fixture encoders plus hand-computed arithmetic and hostile inputs.
  */
class MediaMetaSpec extends AnyFunSuite {

  test("mp4: round-trip brand/duration/tracks through the box walk") {
    val bytes = Mp4.encodeHeader("mp42", timescale = 600, duration = 3661 * 600,
      Seq(Mp4.Track("vide", "avc1", 1920, 1080),
        Mp4.Track("soun", "mp4a", 0, 0)))
    val m = Mp4.metadata(bytes)
    assert(m.brand == "mp42")
    assert(m.durationMs == 3661000L) // 1h 1m 1s, exact
    assert(m.tracks.length == 2)
    assert(m.video.contains(Mp4.Track("vide", "avc1", 1920, 1080)))
    assert(m.audio.contains(Mp4.Track("soun", "mp4a", 0, 0)))
  }

  test("mp4: fractional duration floors; audio-only file has no video track") {
    // 1001 units at timescale 600 → 1668.33… ms → 1668
    val m = Mp4.metadata(Mp4.encodeHeader("isom", 600, 1001,
      Seq(Mp4.Track("soun", "mp4a", 0, 0))))
    assert(m.durationMs == 1668L)
    assert(m.video.isEmpty && m.audio.nonEmpty)
  }

  test("mp4: hostile inputs fail loudly") {
    // not an MP4 at all
    intercept[IllegalArgumentException](Mp4.metadata("RIFFxxxx".getBytes))
    // a box whose size overruns its parent
    val ok = Mp4.encodeHeader("isom", 600, 600,
      Seq(Mp4.Track("vide", "avc1", 16, 8)))
    val bad = ok.clone()
    // clobber the moov size field (first box after ftyp) to a huge value
    val moovOff = 8 + ((ok(0) & 0xff) << 24 | (ok(1) & 0xff) << 16 |
      (ok(2) & 0xff) << 8 | (ok(3) & 0xff)) - 8
    bad(moovOff) = 0x7f
    intercept[IllegalArgumentException](Mp4.metadata(bad))
    // ftyp alone (no moov) → loud, not a silent zero-duration answer
    val ftypOnly = ok.take((ok(3) & 0xff)) // ftyp box is first, small
    intercept[IllegalArgumentException](Mp4.metadata(ftypOnly))
  }

  test("avif: dims from meta/iprp/ipco/ispe; sniff metadata-only; decode loud") {
    val bytes = Mp4.encodeAvifHeader(1024, 768)
    assert(Mp4.isAvif(bytes) && !Mp4.isAvif(Mp4.encodeHeader("isom", 600, 600,
      Seq(Mp4.Track("soun", "mp4a", 0, 0)))))
    assert(Mp4.avifDims(bytes) == (1024, 768))
    import graft.operators.Multimodal.ImageDecoder
    assert(ImageDecoder.sniff(bytes) ==
      ImageDecoder.ImageInfo("avif", "av1", false, 1024, 768))
    val e = intercept[IllegalArgumentException](
      new graft.operators.Multimodal.ImageDecoder().decode(bytes))
    assert(e.getMessage.contains("AVIF"))
    // ispe-less file is loud, not zero-dims
    val noIspe = Mp4.encodeAvifHeader(8, 8).take(24) // ftyp only
    intercept[IllegalArgumentException](Mp4.avifDims(noIspe))
  }

  test("mp3: CBR frame walk — frames, rates, exact duration") {
    val bytes = Mp3.encodeHeader(frames = 38, bitrateKbps = 128,
      sampleRate = 44100)
    val m = Mp3.metadata(bytes)
    assert(m == Mp3.Meta("1", 44100, 128, vbr = false, frames = 38,
      durationMs = 38L * 1152 * 1000 / 44100))
    assert(m.durationMs == 992L) // hand: 43776000/44100 = 992.65… → 992
  }

  test("mp3: ID3v2 tag skips by syncsafe length; ID3v1 trailer tolerated") {
    val withTag = Mp3.encodeHeader(5, 192, 48000, id3v2Bytes = 321)
    assert(Mp3.metadata(withTag).frames == 5)
    val withV1 = withTag ++ ("TAG" + "x" * 125).getBytes("ISO-8859-1")
    assert(Mp3.metadata(withV1).frames == 5)
  }

  test("mp3: VBR detection — a mid-stream bitrate change flags vbr") {
    val a = Mp3.encodeHeader(3, 128, 44100)
    val b = Mp3.encodeHeader(2, 192, 44100)
    val m = Mp3.metadata(a ++ b)
    assert(m.vbr && m.frames == 5 && m.bitrateKbps == 128)
  }

  test("mp3: hostile inputs fail loudly") {
    // garbage: no sync
    intercept[IllegalArgumentException](Mp3.metadata("not audio".getBytes))
    // truncated final frame
    val t = Mp3.encodeHeader(2, 128, 44100).dropRight(10)
    intercept[IllegalArgumentException](Mp3.metadata(t))
    // Layer II header (layer bits 10) rejected
    val l2 = Mp3.encodeHeader(1, 128, 44100)
    l2(1) = 0xfd.toByte // version 1, layer II
    intercept[IllegalArgumentException](Mp3.metadata(l2))
    // ID3v2 length overrunning the file
    val badTag = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f)
    intercept[IllegalArgumentException](Mp3.metadata(badTag))
  }
}
