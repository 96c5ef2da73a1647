package graft.kernel

/** Matroska / WebM container metadata — the EBML header walk, from the
  * public specs (RFC 8794 EBML structure + the Matroska element
  * registry): every element is [id:vint][size:vint][payload], where a
  * vint's leading-zero count in its first byte gives its width, element
  * IDs keep the marker bit (`0x1A45DFA3` is the EBML header's id as
  * stored) and sizes strip it. VP8/VP9/AV1/Opus PAYLOAD decode is out
  * of a pure-JVM engine's scope (the VP8-lossy rule), but the
  * structural metadata a training-data pipeline filters on lives in
  * uncompressed header elements:
  *   - `EBML/DocType` (0x4282): "webm" or "matroska"
  *   - `Segment/Info/TimestampScale` (0x2AD7B1): ns per timestamp unit,
  *     default 1,000,000 (= 1 ms)
  *   - `Segment/Info/Duration` (0x4489): a FLOAT element (4- or 8-byte
  *     IEEE 754) in timestamp-scale units
  *   - `Segment/Tracks/TrackEntry` (0xAE): TrackType (0x83; 1=video,
  *     2=audio, 17=subtitle), CodecID (0x86; "V_VP9", "A_OPUS", …),
  *     `Video/PixelWidth|PixelHeight` (0xB0/0xBA),
  *     `Audio/SamplingFrequency` (0xB5, float, default 8000) and
  *     `Audio/Channels` (0x9F, default 1)
  *
  * A live-streamed WebM legally carries an UNKNOWN-size Segment
  * (all-ones size vint) and no Duration — both are handled: the
  * unknown size is accepted for Segment only (children are walked to
  * end-of-file; every other unknown-size element is loud), and a
  * missing Duration reports `durationMs == -1` (documented sentinel —
  * "unknown / live", a valid stream state, unlike malformed bytes
  * which always raise).
  *
  * Untrusted-input discipline (the Png/Mp4 lesson): every vint is
  * bounds-checked, element ends are checked against their parent
  * before recursion, id widths are capped at the spec's 4 bytes, and a
  * 0x00 vint lead byte (width > 8) fails loudly instead of looping.
  */
object Mkv {

  /** One parsed track. `width`/`height` are PixelWidth/PixelHeight (0
    * for non-video tracks); `channels`/`sampleRate` carry the Matroska
    * defaults (1 / 8000) when the Audio element omits them, 0 for
    * non-audio tracks. */
  final case class Track(trackType: String, codecId: String,
      width: Int, height: Int, channels: Int, sampleRate: Int)

  /** Container-level metadata. `durationMs` derives from
    * Duration·TimestampScale (floored to whole ms); -1 when the stream
    * carries no Duration (live/streamed — see object doc). */
  final case class Meta(docType: String, timestampScaleNs: Long,
      durationMs: Long, tracks: Seq[Track]) {
    def video: Option[Track] = tracks.find(_.trackType == "video")
    def audio: Option[Track] = tracks.find(_.trackType == "audio")
  }

  // element ids, as stored (marker bit kept — RFC 8794 §5)
  private val EbmlHeader = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackTypeId = 0x83L
  private val CodecId = 0x86L
  private val VideoEl = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val AudioEl = 0xE1L
  private val SamplingFrequency = 0xB5L
  private val Channels = 0x9FL

  def isMkv(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (bytes(0) & 0xff) == 0x1a &&
      (bytes(1) & 0xff) == 0x45 && (bytes(2) & 0xff) == 0xdf &&
      (bytes(3) & 0xff) == 0xa3

  /** Read a vint at `off`; returns (value, width). `keepMarker` = true
    * for element ids (stored raw), false for sizes (data bits only). */
  private def readVint(b: Array[Byte], off: Int, to: Int,
      keepMarker: Boolean): (Long, Int) = {
    require(off < to, "ebml: truncated vint")
    val first = b(off) & 0xff
    require(first != 0, "ebml: vint lead byte 0x00 (width > 8 bytes)")
    val width = Integer.numberOfLeadingZeros(first) - 23
    require(off + width <= to, "ebml: vint overruns its parent")
    var v: Long =
      if (keepMarker) first.toLong
      else (first & ((1 << (8 - width)) - 1)).toLong
    var i = 1
    while (i < width) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    (v, width)
  }

  /** Walk the elements in [from, to); calls `f(id, payloadStart,
    * payloadEnd)` for each. An all-ones (unknown) size is accepted for
    * Segment only — its payload runs to the parent's end. */
  private def walk(b: Array[Byte], from: Int, to: Int)(
      f: (Long, Int, Int) => Unit): Unit = {
    var off = from
    while (off < to) {
      val (id, idw) = readVint(b, off, to, keepMarker = true)
      require(idw <= 4, f"ebml: element id at $off wider than 4 bytes")
      val (sz, szw) = readVint(b, off + idw, to, keepMarker = false)
      val unknown = sz == (1L << (7 * szw)) - 1
      val p = off + idw + szw
      val e =
        if (unknown) {
          require(id == Segment,
            f"ebml: unknown-size element 0x$id%x (Segment only)")
          to
        } else {
          require(sz >= 0 && sz <= (to - p).toLong,
            f"ebml: element 0x$id%x size $sz overruns its parent")
          p + sz.toInt
        }
      f(id, p, e)
      off = e
    }
  }

  /** Unsigned-integer element payload (0–8 bytes; empty = 0, per RFC
    * 8794 §7.1). */
  private def uint(b: Array[Byte], p: Int, e: Int): Long = {
    require(e - p <= 8, s"ebml: uint element ${e - p} bytes wide")
    var v = 0L
    var i = p
    while (i < e) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  /** Float element payload: 0 (= 0.0), 4 or 8 bytes (RFC 8794 §7.3). */
  private def float(b: Array[Byte], p: Int, e: Int): Double =
    (e - p) match {
      case 0 => 0.0
      case 4 => java.lang.Float.intBitsToFloat(uint(b, p, e).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(b, p, e))
      case n => throw new IllegalArgumentException(
        s"ebml: float element $n bytes wide (0/4/8 allowed)")
    }

  /** String element payload; trailing NUL padding stripped (RFC 8794
    * §13 allows zero-padding). */
  private def str(b: Array[Byte], p: Int, e: Int): String = {
    var end = e
    while (end > p && b(end - 1) == 0) end -= 1
    new String(b, p, end - p, "UTF-8")
  }

  def metadata(bytes: Array[Byte]): Meta = {
    require(isMkv(bytes), "not Matroska/WebM: no EBML magic at file start")
    var docType = ""
    var scale = 1000000L
    var duration = -1.0
    val tracks = Seq.newBuilder[Track]
    walk(bytes, 0, bytes.length) { (id, p, e) =>
      id match {
        case EbmlHeader =>
          walk(bytes, p, e) { (id2, p2, e2) =>
            if (id2 == DocType) docType = str(bytes, p2, e2)
          }
        case Segment =>
          walk(bytes, p, e) { (id2, p2, e2) =>
            id2 match {
              case Info =>
                walk(bytes, p2, e2) { (id3, p3, e3) =>
                  id3 match {
                    case TimestampScale =>
                      scale = uint(bytes, p3, e3)
                      require(scale > 0, "ebml: TimestampScale 0")
                    case Duration =>
                      duration = float(bytes, p3, e3)
                      require(duration >= 0 && !duration.isNaN,
                        s"ebml: negative/NaN Duration $duration")
                    case _ =>
                  }
                }
              case Tracks =>
                walk(bytes, p2, e2) { (id3, p3, e3) =>
                  if (id3 == TrackEntry) tracks += parseTrack(bytes, p3, e3)
                }
              case _ => // SeekHead, Cluster, Cues, Tags, … skipped by size
            }
          }
        case _ => // Void/CRC-32 at top level
      }
    }
    require(docType.nonEmpty, "ebml: no EBML/DocType element")
    val durationMs =
      if (duration < 0) -1L
      else math.floor(duration * (scale.toDouble / 1e6)).toLong
    Meta(docType, scale, durationMs, tracks.result())
  }

  private def parseTrack(b: Array[Byte], from: Int, to: Int): Track = {
    var tpe = 0L
    var codec = ""
    var w = 0
    var h = 0
    var ch = 0
    var sr = 0
    walk(b, from, to) { (id, p, e) =>
      id match {
        case TrackTypeId => tpe = uint(b, p, e)
        case CodecId => codec = str(b, p, e)
        case VideoEl =>
          walk(b, p, e) { (id2, p2, e2) =>
            id2 match {
              case PixelWidth => w = uint(b, p2, e2).toInt
              case PixelHeight => h = uint(b, p2, e2).toInt
              case _ =>
            }
          }
        case AudioEl =>
          // Matroska defaults: SamplingFrequency 8000, Channels 1
          ch = 1
          sr = 8000
          walk(b, p, e) { (id2, p2, e2) =>
            id2 match {
              case Channels => ch = uint(b, p2, e2).toInt
              case SamplingFrequency =>
                val f = float(b, p2, e2)
                require(f > 0 && f <= Int.MaxValue.toDouble,
                  s"ebml: SamplingFrequency $f out of range")
                sr = math.rint(f).toInt
              case _ =>
            }
          }
        case _ =>
      }
    }
    val name = tpe match {
      case 1 => "video"
      case 2 => "audio"
      case 17 => "subtitle"
      case t => s"type$t"
    }
    Track(name, codec, w, h, ch, sr)
  }

  // --- fixture encoder ----------------------------------------------------

  private def encId(id: Long): Array[Byte] = {
    var width = 1
    while ((id >>> (8 * width)) != 0) width += 1
    val out = new Array[Byte](width)
    var i = width - 1
    var rem = id
    while (i >= 0) { out(i) = (rem & 0xff).toByte; rem >>>= 8; i -= 1 }
    out
  }

  private def encSize(v: Long): Array[Byte] = {
    require(v >= 0, s"ebml size $v")
    var width = 1
    // all-ones within a width is the unknown-size sentinel — bump past it
    while (v >= (1L << (7 * width)) - 1) width += 1
    val out = new Array[Byte](width)
    var i = width - 1
    var rem = v
    while (i >= 0) { out(i) = (rem & 0xff).toByte; rem >>>= 8; i -= 1 }
    out(0) = (out(0) | (1 << (8 - width))).toByte
    out
  }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    encId(id) ++ encSize(payload.length.toLong) ++ payload

  private def uintBytes(v: Long): Array[Byte] = {
    require(v >= 0, s"ebml uint $v")
    var width = 1
    while ((v >>> (8 * width)) != 0) width += 1
    val out = new Array[Byte](width)
    var i = width - 1
    var rem = v
    while (i >= 0) { out(i) = (rem & 0xff).toByte; rem >>>= 8; i -= 1 }
    out
  }

  private def be64(v: Long): Array[Byte] =
    Array.tabulate(8)(i => ((v >>> (8 * (7 - i))) & 0xff).toByte)

  /** Build a structurally valid Matroska/WebM whose headers carry the
    * given metadata, with no clusters — [[metadata]] reads it; there is
    * no payload to decode (the encodeHeader pattern: fixtures for the
    * header walk, never a fake decode). `durationUnits < 0` omits the
    * Duration element (the live-stream shape). */
  def encodeHeader(docType: String, timestampScaleNs: Long,
      durationUnits: Double, tracks: Seq[Track]): Array[Byte] = {
    require(docType.nonEmpty, "docType required")
    require(timestampScaleNs > 0, s"timestampScale $timestampScaleNs")
    val ebml = el(EbmlHeader,
      el(0x4286L, uintBytes(1)) ++ // EBMLVersion
        el(0x42F7L, uintBytes(1)) ++ // EBMLReadVersion
        el(0x42F2L, uintBytes(4)) ++ // EBMLMaxIDLength
        el(0x42F3L, uintBytes(8)) ++ // EBMLMaxSizeLength
        el(DocType, docType.getBytes("UTF-8")) ++
        el(0x4287L, uintBytes(2)) ++ // DocTypeVersion
        el(0x4285L, uintBytes(2))) // DocTypeReadVersion
    val info = el(Info,
      el(TimestampScale, uintBytes(timestampScaleNs)) ++
        (if (durationUnits < 0) Array.empty[Byte]
         else el(Duration,
           be64(java.lang.Double.doubleToLongBits(durationUnits)))))
    val trackEls = tracks.zipWithIndex.map { case (t, i) =>
      val tpe = t.trackType match {
        case "video" => 1L
        case "audio" => 2L
        case "subtitle" => 17L
        case other => throw new IllegalArgumentException(
          s"unknown track type '$other'")
      }
      val media = t.trackType match {
        case "video" =>
          el(VideoEl, el(PixelWidth, uintBytes(t.width.toLong)) ++
            el(PixelHeight, uintBytes(t.height.toLong)))
        case "audio" =>
          el(AudioEl, el(Channels, uintBytes(t.channels.toLong)) ++
            el(SamplingFrequency,
              be64(java.lang.Double.doubleToLongBits(t.sampleRate.toDouble))))
        case _ => Array.empty[Byte]
      }
      el(TrackEntry,
        el(0xD7L, uintBytes(i + 1L)) ++ // TrackNumber
          el(0x73C5L, uintBytes(i + 1L)) ++ // TrackUID
          el(TrackTypeId, uintBytes(tpe)) ++
          el(CodecId, t.codecId.getBytes("UTF-8")) ++ media)
    }
    val segment = el(Segment,
      info ++ el(Tracks, trackEls.toArray.flatten))
    ebml ++ segment
  }
}
