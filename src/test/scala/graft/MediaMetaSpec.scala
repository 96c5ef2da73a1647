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
    // largesize near 2^63: a sum-form bound check (`off + size <= to`)
    // wraps Long-negative and PASSES, then `end = off + size.toInt` can
    // land before `off` — an unbounded box-walk loop on hostile bytes.
    // The walk must use the subtraction form and reject loudly.
    val ftypLen = (ok(3) & 0xff)
    val huge = ok.take(ftypLen) ++ Array[Byte](
      0, 0, 0, 1, 'm', 'o', 'o', 'v', // size0=1 → 64-bit largesize
      0x7f.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0x00.toByte) ++
      Array.fill[Byte](32)(0)
    val eHuge = intercept[IllegalArgumentException](Mp4.metadata(huge))
    assert(eHuge.getMessage.contains("overruns"))
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

  test("ogg: opus/vorbis id headers, CRC-verified pages, exact granule durations") {
    import graft.kernel.Ogg
    // opus: granule counts 48 kHz samples INCLUDING preSkip (RFC 7845)
    val opus = Ogg.encodeOpusHeader(2, 312, 48000, 312L + 48000L * 3)
    assert(Ogg.metadata(opus) == Ogg.Meta("opus", 2, 48000, 3000L, 2))
    // vorbis: granule counts at the stream's own rate
    val vorb = Ogg.encodeVorbisHeader(1, 22050, 22050L * 7 / 2)
    assert(Ogg.metadata(vorb) == Ogg.Meta("vorbis", 1, 22050, 3500L, 2))
    // a flipped payload byte must fail the page CRC loudly
    val torn = opus.clone()
    torn(torn.length - 1) = (torn(torn.length - 1) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](Ogg.metadata(torn))
    assert(e.getMessage.contains("CRC"))
    // a first packet that is neither id header is loud (the clobber
    // also tears the CRC — either failure mode must raise)
    val notId = Ogg.encodeOpusHeader(1, 0, 48000, 0L)
    System.arraycopy("NotAHead".getBytes("ISO-8859-1"), 0, notId, 28, 8)
    intercept[IllegalArgumentException](Ogg.metadata(notId))
  }

  test("ogg: vorbis-comment title/artist — opus and vorbis, hostile lengths loud") {
    import graft.kernel.Ogg
    // OpusTags page between id and data; granule math unchanged
    val opus = Ogg.encodeOpusHeader(2, 312, 48000, 312L + 48000L * 3,
      title = "Söng", artist = "The Band")
    val mo = Ogg.metadata(opus)
    assert(mo.title == "Söng" && mo.artist == "The Band" &&
      mo.durationMs == 3000L && mo.pages == 3)
    // \x03vorbis comment header; key matching is case-insensitive by
    // construction (encoder emits upper, parser uppercases)
    val vorb = Ogg.encodeVorbisHeader(1, 22050, 22050L,
      title = "VTitle", artist = "VArtist")
    val mv = Ogg.metadata(vorb)
    assert(mv.title == "VTitle" && mv.artist == "VArtist" &&
      mv.durationMs == 1000L)
    // absent tags page → empty strings (the pre-r14 fixtures)
    val plain = Ogg.metadata(Ogg.encodeOpusHeader(1, 0, 48000, 48000L))
    assert(plain.title == "" && plain.artist == "")
    // hostile: a comment length overrunning the packet must be loud,
    // not a silent out-of-bounds read. Find the TITLE entry length
    // field inside the tags page body and clobber it huge; re-CRC the
    // page so the failure is the LENGTH check, not the CRC.
    val tagged = Ogg.encodeOpusHeader(1, 0, 48000, 48000L, title = "XY")
    // locate "TITLE=XY" and back up 4 to its length field
    val needle = "TITLE=XY".getBytes("ISO-8859-1")
    val at = tagged.indices.find(i => i + needle.length <= tagged.length &&
      needle.indices.forall(j => tagged(i + j) == needle(j))).get
    val bad = tagged.clone()
    bad(at - 1) = 0x7f.toByte // length high byte → far past the packet
    // re-CRC the middle page (starts at the second OggS)
    val page2 = (4 until bad.length).find(i => bad(i) == 'O' &&
      bad(i + 1) == 'g' && bad(i + 2) == 'g' && bad(i + 3) == 'S').get
    val page3 = (page2 + 4 until bad.length).find(i => bad(i) == 'O' &&
      bad(i + 1) == 'g' && bad(i + 2) == 'g' && bad(i + 3) == 'S').get
    val c = Ogg.crc(bad, page2, page3 - page2, zeroAt = 22)
    bad(page2 + 22) = (c & 0xff).toByte
    bad(page2 + 23) = ((c >> 8) & 0xff).toByte
    bad(page2 + 24) = ((c >> 16) & 0xff).toByte
    bad(page2 + 25) = ((c >> 24) & 0xff).toByte
    val e = intercept[IllegalArgumentException](Ogg.metadata(bad))
    assert(e.getMessage.contains("overruns"), e.getMessage)
  }

  test("flac: STREAMINFO bit unpacking round-trips across field boundaries") {
    import graft.kernel.Flac
    val m = Flac.metadata(Flac.encodeHeader(44100, 2, 16, 44100L * 11))
    assert(m == Flac.Meta(44100, 2, 16, 44100L * 11, 11000L))
    // odd rate + bps crossing the byte boundary + >32-bit total samples
    val m2 = Flac.metadata(Flac.encodeHeader(96000, 8, 24, (1L << 33) + 5))
    assert(m2.sampleRate == 96000 && m2.channels == 8 &&
      m2.bitsPerSample == 24 && m2.totalSamples == (1L << 33) + 5)
    // a VORBIS_COMMENT-first file violates the STREAMINFO-first rule
    val bad = Flac.encodeHeader(44100, 1, 16, 1L)
    bad(4) = 0x84.toByte
    intercept[IllegalArgumentException](Flac.metadata(bad))
    // VORBIS_COMMENT block round-trip (title+artist, artist-only)
    val tagged = Flac.metadata(Flac.encodeHeader(44100, 2, 16, 44100L,
      title = "FTitle", artist = "FArtist"))
    assert(tagged.title == "FTitle" && tagged.artist == "FArtist" &&
      tagged.durationMs == 1000L)
    val artistOnly = Flac.metadata(Flac.encodeHeader(8000, 1, 16, 0L,
      artist = "Solo"))
    assert(artistOnly.title == "" && artistOnly.artist == "Solo")
    // hostile: a metadata-block length overrunning the file is loud
    val hostile = Flac.encodeHeader(8000, 1, 16, 0L, title = "X")
    hostile(8 + 34 + 3) = 0x7f.toByte // comment block length low→huge
    hostile(8 + 34 + 2) = 0x7f.toByte
    val e = intercept[IllegalArgumentException](Flac.metadata(hostile))
    assert(e.getMessage.contains("overruns"), e.getMessage)
  }

  test("audio container dispatch: ogg/flac/wav/mp3 route; unknown is loud") {
    import graft.operators.Multimodal.audioContainerMeta
    import graft.kernel.{Flac, Mp3, Ogg, Wav}
    assert(audioContainerMeta(Ogg.encodeOpusHeader(1, 0, 48000, 48000L)) ==
      (("ogg", "opus", 1, 48000, 1000L, "", "")))
    assert(audioContainerMeta(Flac.encodeHeader(8000, 1, 16, 4000L)) ==
      (("flac", "flac", 1, 8000, 500L, "", "")))
    assert(audioContainerMeta(Wav.encode(Wav.Audio(8000, 1, 16,
      Array.fill(4000)(7)))) == (("wav", "pcm", 1, 8000, 500L, "", "")))
    // tags ride the dispatch too
    assert(audioContainerMeta(Ogg.encodeOpusHeader(1, 0, 48000, 48000L,
      title = "T", artist = "A")) ==
      (("ogg", "opus", 1, 48000, 1000L, "T", "A")))
    assert(audioContainerMeta(Mp3.encodeHeader(5, 128, 44100))._1 == "mp3")
    intercept[IllegalArgumentException](audioContainerMeta("nope".getBytes))
  }

  test("mp3: CBR frame walk — frames, rates, exact duration") {
    val bytes = Mp3.encodeHeader(frames = 38, bitrateKbps = 128,
      sampleRate = 44100)
    val m = Mp3.metadata(bytes)
    assert(m == Mp3.Meta("1", 44100, 128, vbr = false, frames = 38,
      durationMs = 38L * 1152 * 1000 / 44100, channels = 1))
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

  test("jpeg headerMeta: XMP APP1 after EXIF keeps orientation; trailing fill bytes loud") {
    import graft.kernel.Jpeg
    val base = Jpeg.encode(Jpeg.Image(16, 8, 1,
      Array.tabulate(128)(_ % 256)), orientation = 6)
    assert(Jpeg.headerMeta(base) == (16, 8, 6))
    // splice the standard XMP APP1 right before SOF — the wild shape
    // (EXIF first, XMP second); a parser that treats every APP1 as
    // EXIF resets the orientation to 1 here
    def findSof(b: Array[Byte]): Int = {
      var i = 2
      while (i + 1 < b.length &&
        !((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    // the NUL terminator after the namespace URI is built explicitly so
    // the spec source stays pure ASCII (a raw 0x00 byte makes git/grep
    // treat the whole file as binary)
    val xmpPayload =
      "http://ns.adobe.com/xap/1.0/".getBytes("ISO-8859-1") ++
        Array[Byte](0) ++ "<x:xmpmeta/>".getBytes("ISO-8859-1")
    val len = xmpPayload.length + 2
    val xmp = Array(0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ xmpPayload
    val at = findSof(base)
    val spliced = base.take(at) ++ xmp ++ base.drop(at)
    assert(Jpeg.headerMeta(spliced) == (16, 8, 6),
      "XMP APP1 clobbered the EXIF orientation")
    // decode path agrees (display dims swap under orientation 6)
    val img = Jpeg.decode(spliced)
    assert(img.width == 8 && img.height == 16)
    // a truncated stream ending in fill bytes must be loud, not AIOOBE
    val e = intercept[IllegalArgumentException](Jpeg.headerMeta(
      Array(0xff, 0xd8, 0xff, 0xff).map(_.toByte)))
    assert(e.getMessage.contains("truncated"))
  }

  test("mp4: truncated mvhd is loud, not a garbage duration") {
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0) ++
      "isom".getBytes("ISO-8859-1"))
    // an mvhd with only 16 payload bytes — the v0 layout needs 20
    val bad = ftyp ++ box("moov", box("mvhd", new Array[Byte](16)))
    val e = intercept[IllegalArgumentException](Mp4.metadata(bad))
    assert(e.getMessage.contains("mvhd"))
  }

  test("mp3: ID3v2.4 footer flag skips the 10-byte footer") {
    val base = Mp3.encodeHeader(3, 128, 44100, id3v2Bytes = 50)
    // set the footer flag and splice the footer in after the tag body
    val withFooter = base.clone()
    withFooter(5) = (withFooter(5) | 0x10).toByte
    val footer = "3DI".getBytes("ISO-8859-1") ++ new Array[Byte](7)
    val spliced = withFooter.take(60) ++ footer ++ withFooter.drop(60)
    val m = Mp3.metadata(spliced)
    assert(m.frames == 3 && m.sampleRate == 44100)
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

  test("mp3: ID3v2/ID3v1 text tags — all encodings, precedence, padding stop") {
    // v2.3 ISO-8859-1 with padding: frames parse, padding stops the walk
    val v23 = Mp3.encodeHeader(3, 128, 44100,
      id3 = Mp3.encodeId3v2("Açai Song", "Band", major = 3, enc = 0,
        padding = 64))
    val m23 = Mp3.metadata(v23)
    assert(m23.title == "Açai Song" && m23.artist == "Band" && m23.frames == 3)
    // v2.4 UTF-8 syncsafe frame sizes
    val v24 = Mp3.encodeHeader(2, 128, 44100,
      id3 = Mp3.encodeId3v2("Tïtle", "Ärtist", major = 4, enc = 3))
    val m24 = Mp3.metadata(v24)
    assert(m24.title == "Tïtle" && m24.artist == "Ärtist")
    // UTF-16 with BOM and UTF-16BE decode to the same strings
    val v16 = Mp3.metadata(Mp3.encodeHeader(1, 128, 44100,
      id3 = Mp3.encodeId3v2("U16", "A16", major = 3, enc = 1)))
    assert(v16.title == "U16" && v16.artist == "A16")
    val v16be = Mp3.metadata(Mp3.encodeHeader(1, 128, 44100,
      id3 = Mp3.encodeId3v2("BE", "BEA", major = 3, enc = 2)))
    assert(v16be.title == "BE" && v16be.artist == "BEA")
    // ID3v1 trailer alone
    val v1 = Mp3.metadata(Mp3.appendId3v1(
      Mp3.encodeHeader(2, 128, 44100), "Old Title", "Old Artist"))
    assert(v1.title == "Old Title" && v1.artist == "Old Artist" &&
      v1.frames == 2)
    // precedence: v2 wins over a disagreeing v1 trailer; v1 fills gaps
    val both = Mp3.metadata(Mp3.appendId3v1(
      Mp3.encodeHeader(1, 128, 44100,
        id3 = Mp3.encodeId3v2("NewT", "", major = 3)), "OldT", "OldA"))
    assert(both.title == "NewT" && both.artist == "OldA")
    // untagged → empty strings
    val none = Mp3.metadata(Mp3.encodeHeader(1, 128, 44100))
    assert(none.title == "" && none.artist == "")
  }

  test("mp3: ID3v2.2 TT2/TP1 — both encodings, v1 fill, flags, hostile") {
    // ISO-8859-1 with padding: 3-byte ids, 3-byte plain sizes walk
    val v22 = Mp3.metadata(Mp3.encodeHeader(2, 128, 44100,
      id3 = Mp3.encodeId3v2("Old Söng", "Old Bänd", major = 2, enc = 0,
        padding = 32)))
    assert(v22.title == "Old Söng" && v22.artist == "Old Bänd" &&
      v22.frames == 2)
    // UCS-2 (BOM-led — the only other encoding v2.2 defines)
    val u22 = Mp3.metadata(Mp3.encodeHeader(1, 128, 44100,
      id3 = Mp3.encodeId3v2("U2T", "U2A", major = 2, enc = 1)))
    assert(u22.title == "U2T" && u22.artist == "U2A")
    // v1 trailer fills only where the v2.2 tag said nothing
    val both = Mp3.metadata(Mp3.appendId3v1(
      Mp3.encodeHeader(1, 128, 44100,
        id3 = Mp3.encodeId3v2("N2T", "", major = 2)), "OldT", "OldA"))
    assert(both.title == "N2T" && both.artist == "OldA")
    // unsynchronisation declines text decode; the frame walk after the
    // tag is untouched
    val unsync = Mp3.encodeId3v2("X", "Y", major = 2)
    unsync(5) = 0x80.toByte
    val mu = Mp3.metadata(unsync ++ Mp3.encodeHeader(2, 128, 44100))
    assert(mu.title == "" && mu.artist == "" && mu.frames == 2)
    // whole-tag compression flag: v2.2 §3.1 defines no scheme — the tag
    // is ignored, never mis-decoded
    val comp = Mp3.encodeId3v2("X", "Y", major = 2)
    comp(5) = 0x40.toByte
    val mc = Mp3.metadata(comp ++ Mp3.encodeHeader(1, 128, 44100))
    assert(mc.title == "" && mc.artist == "")
    // hostile: a declared frame size overrunning the tag is loud
    val bad = Mp3.encodeId3v2("TTT", "AAA", major = 2)
    bad(13) = 0x7f.toByte // TT2's 3-byte size at offsets 13..15
    intercept[IllegalArgumentException](
      Mp3.metadata(bad ++ Mp3.encodeHeader(1, 128, 44100)))
    // hostile: encoding byte 2 does not exist in v2.2
    val badEnc = Mp3.encodeId3v2("T", "A", major = 2, enc = 0)
    badEnc(16) = 2 // payload encoding byte: 10 header + 3 id + 3 size
    intercept[IllegalArgumentException](
      Mp3.metadata(badEnc ++ Mp3.encodeHeader(1, 128, 44100)))
  }

  test("mp3: ID3v2 extended-header and unsynchronisation flags") {
    // v2.4 extended header (syncsafe size INCLUDING itself): splice a
    // minimal 6-byte ext header before the frames; tags must still read
    val v24 = Mp3.encodeId3v2("ExtT", "ExtA", major = 4, enc = 3)
    val body24 = v24.drop(10)
    val ext24 = Array[Byte](0, 0, 0, 6, 1, 0) // size 6, one flag byte, 0
    val n24 = body24.length + ext24.length
    val tag24 = Array[Byte]('I', 'D', '3', 4, 0, 0x40,
      ((n24 >> 21) & 0x7f).toByte, ((n24 >> 14) & 0x7f).toByte,
      ((n24 >> 7) & 0x7f).toByte, (n24 & 0x7f).toByte) ++ ext24 ++ body24
    val m24 = Mp3.metadata(tag24 ++ Mp3.encodeHeader(1, 128, 44100))
    assert(m24.title == "ExtT" && m24.artist == "ExtA", m24)
    // v2.3 extended header (plain size EXCLUDING its own 4 size bytes):
    // the standard 6-byte form is size=6 + 2 flag bytes + 4 padding-size
    val v23 = Mp3.encodeId3v2("E3T", "E3A", major = 3, enc = 0)
    val body23 = v23.drop(10)
    val ext23 = Array[Byte](0, 0, 0, 6, 0, 0, 0, 0, 0, 0)
    val n23 = body23.length + ext23.length
    val tag23 = Array[Byte]('I', 'D', '3', 3, 0, 0x40,
      ((n23 >> 21) & 0x7f).toByte, ((n23 >> 14) & 0x7f).toByte,
      ((n23 >> 7) & 0x7f).toByte, (n23 & 0x7f).toByte) ++ ext23 ++ body23
    val m23 = Mp3.metadata(tag23 ++ Mp3.encodeHeader(1, 128, 44100))
    assert(m23.title == "E3T" && m23.artist == "E3A", m23)
    // unsynchronised tag (flag 0x80): text would need 0xFF,0x00 escape
    // reversal — extraction declines (empty) rather than mis-decoding;
    // the frame walk after the tag is untouched
    val unsync = Mp3.encodeId3v2("NotRead", "NotRead", major = 3)
    unsync(5) = 0x80.toByte
    val mu = Mp3.metadata(unsync ++ Mp3.encodeHeader(2, 128, 44100))
    assert(mu.title == "" && mu.artist == "" && mu.frames == 2)
    // hostile: ext-header size overrunning the tag is loud
    val badExt = tag24.clone()
    badExt(13) = 0x7f.toByte // syncsafe ext size → far past the tag
    intercept[IllegalArgumentException](
      Mp3.metadata(badExt ++ Mp3.encodeHeader(1, 128, 44100)))
  }

  test("mp3: hostile ID3v2 text frames fail loudly") {
    // a TIT2 whose declared size overruns the tag body
    val ok = Mp3.encodeId3v2("T", "A", major = 3)
    val bad = ok.clone()
    bad(14) = 0x7f.toByte // TIT2 size byte 0 → huge
    intercept[IllegalArgumentException](
      Mp3.metadata(bad ++ Mp3.encodeHeader(1, 128, 44100).drop(0)))
    // v2.4 footer + tags still parse (regression guard on the footer
    // offset: text walk must stop at 10+len, not read into the footer)
    val v24 = Mp3.encodeId3v2("F", "G", major = 4)
    val withFooter = v24.clone()
    withFooter(5) = (withFooter(5) | 0x10).toByte
    val footer = "3DI".getBytes("ISO-8859-1") ++ new Array[Byte](7)
    val stream = withFooter ++ footer ++
      Mp3.encodeHeader(1, 128, 44100)
    val m = Mp3.metadata(stream)
    assert(m.title == "F" && m.artist == "G" && m.frames == 1)
  }

  test("ogg: comment packet spanning pages — accumulated, not truncated") {
    import graft.kernel.Ogg
    // a METADATA_BLOCK_PICTURE-sized OpusTags packet continues onto a
    // second comment page (all-255 lacing + continuation flag): tags
    // must still read — the pre-r15 parser treated the first page's
    // slice as the packet bound and threw on this valid stream
    val spanning = Ogg.encodeOpusHeaderSpanningTags(1, 0, 48000, 48000L,
      title = "Cover Art Söng", artist = "Big Band")
    val m = Ogg.metadata(spanning)
    assert(m.title == "Cover Art Söng" && m.artist == "Big Band" &&
      m.pages == 4 && m.durationMs == 1000L, m)
    // hostile: packet left open but the next page lacks the
    // continuation flag — loud, not a mis-framed parse
    val bad = spanning.clone()
    def nthPage(n: Int): Int = {
      var at = 0
      var k = 0
      while (k < n) {
        at = (at + 4 until bad.length).find(i => bad(i) == 'O' &&
          bad(i + 1) == 'g' && bad(i + 2) == 'g' && bad(i + 3) == 'S').get
        k += 1
      }
      at
    }
    val p3 = nthPage(2) // third page (0-based after two jumps)
    val p4 = nthPage(3)
    bad(p3 + 5) = 0 // clear the continuation bit
    val c = Ogg.crc(bad, p3, p4 - p3, zeroAt = 22)
    bad(p3 + 22) = (c & 0xff).toByte
    bad(p3 + 23) = ((c >> 8) & 0xff).toByte
    bad(p3 + 24) = ((c >> 16) & 0xff).toByte
    bad(p3 + 25) = ((c >> 24) & 0xff).toByte
    val e = intercept[IllegalArgumentException](Ogg.metadata(bad))
    assert(e.getMessage.contains("not a continuation"), e.getMessage)
  }

  test("mp3: ID3v2 frames with format flags set decline text decode") {
    // compression/encryption/DLI change the payload layout — decoding
    // encoding-byte + text would be silently wrong; the walk must skip
    // such a frame's text (and keep reading the clean sibling)
    // v2.3: TIT2 is the first frame (header at 10, flag byte 2 at 19)
    val v23 = Mp3.encodeId3v2("SecretT", "PlainA", major = 3, enc = 0)
    v23(19) = 0x80.toByte // v2.3 compression
    val m23 = Mp3.metadata(v23 ++ Mp3.encodeHeader(1, 128, 44100))
    assert(m23.title == "" && m23.artist == "PlainA", m23)
    // v2.4: data-length-indicator flag (0x01) — 4 extra payload bytes
    val v24 = Mp3.encodeId3v2("DliT", "PlainA", major = 4, enc = 3)
    v24(19) = 0x01.toByte
    val m24 = Mp3.metadata(v24 ++ Mp3.encodeHeader(1, 128, 44100))
    assert(m24.title == "" && m24.artist == "PlainA", m24)
    // v2.3 grouping bit (0x20) is also a layout change: skipped
    val grp = Mp3.encodeId3v2("GrpT", "PlainA", major = 3, enc = 0)
    grp(19) = 0x20.toByte
    val mg = Mp3.metadata(grp ++ Mp3.encodeHeader(1, 128, 44100))
    assert(mg.title == "" && mg.artist == "PlainA", mg)
    // STATUS-only flags (first flag byte) don't change the layout —
    // text still reads
    val st = Mp3.encodeId3v2("StatT", "StatA", major = 3, enc = 0)
    st(18) = 0x40.toByte // v2.3 file-alter-preserve (status byte)
    val ms = Mp3.metadata(st ++ Mp3.encodeHeader(1, 128, 44100))
    assert(ms.title == "StatT" && ms.artist == "StatA", ms)
  }
}
