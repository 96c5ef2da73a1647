package graft.kernel

/** MP4 / ISO Base Media File Format container metadata — the header
  * walk, from the public spec (ISO/IEC 14496-12 box structure): every
  * box is [size:u32][type:4cc][payload], `size==1` switches to a u64
  * largesize, container boxes (moov, trak, mdia, minf, stbl) nest
  * their children as the payload. H.264/H.265/AAC PAYLOAD decode is
  * out of a pure-JVM engine's scope (the VP8-lossy rule), but the
  * structural metadata a training-data pipeline filters on — brand,
  * duration, per-track handler and sample-entry codec, video display
  * dimensions — lives entirely in uncompressed box headers:
  *   - `ftyp`: major brand (isom/mp42/...)
  *   - `moov/mvhd`: movie timescale + duration (version 0: u32s at
  *     fixed offsets after creation/modification times; version 1:
  *     u64 times — both handled)
  *   - `moov/trak/tkhd`: track width/height as 16.16 fixed point at
  *     the end of the box (version 0/1 offsets differ)
  *   - `moov/trak/mdia/hdlr`: handler type (`vide`/`soun`/...)
  *   - `moov/trak/mdia/minf/stbl/stsd`: first sample entry's 4cc —
  *     the codec identifier (avc1, hvc1, mp4a, ...)
  *
  * Untrusted-input discipline (the Png/Webp lesson): every box size is
  * bounds-checked against its parent before recursion, u64 largesize
  * must fit the file, and a zero/negative size fails loudly instead of
  * looping.
  */
object Mp4 {

  /** One parsed track: handler 4cc ("vide"/"soun"/…), sample-entry
    * codec 4cc ("avc1"/"mp4a"/… — empty when stsd is absent), and the
    * tkhd display dims (integer part of 16.16 fixed point; 0 for
    * non-visual tracks). */
  final case class Track(handler: String, codec: String,
      width: Int, height: Int)

  /** Container-level metadata. `durationMs` derives from mvhd
    * duration/timescale, floored to whole milliseconds (integer
    * arithmetic — engine-exact). */
  final case class Meta(brand: String, durationMs: Long,
      tracks: Seq[Track]) {
    def video: Option[Track] = tracks.find(_.handler == "vide")
    def audio: Option[Track] = tracks.find(_.handler == "soun")
  }

  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** Walk the boxes in [from, to); call `f(type, payloadStart,
    * payloadEnd)` for each. */
  private def walk(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = from
    while (off + 8 <= to) {
      val size0 = u32(b, off)
      val typ = fourcc(b, off + 4)
      val (payload, end) =
        if (size0 == 1) {
          require(off + 16 <= to, s"mp4: truncated largesize box '$typ'")
          val size = u64(b, off + 8)
          // overflow-safe form (subtraction, never off+size): a crafted
          // largesize near 2^63 would wrap `off + size` negative, pass a
          // sum-form check, and make `end < off` — an unbounded walk
          require(size >= 16 && size <= (to - off).toLong,
            s"mp4: box '$typ' largesize $size overruns its parent")
          (off + 16, off + size.toInt)
        } else if (size0 == 0) {
          // size 0 = "to end of enclosing container" (spec §4.2)
          (off + 8, to)
        } else {
          require(size0 >= 8 && off + size0 <= to,
            s"mp4: box '$typ' size $size0 overruns its parent")
          (off + 8, off + size0.toInt)
        }
      f(typ, payload, end)
      off = end
    }
  }

  def metadata(bytes: Array[Byte]): Meta = {
    require(isMp4(bytes), "not an MP4: no ftyp box at file start")
    var brand = ""
    var durationMs = -1L
    val tracks = Seq.newBuilder[Track]
    walk(bytes, 0, bytes.length) { (typ, p, e) =>
      typ match {
        case "ftyp" =>
          require(e - p >= 4, "mp4: ftyp too short for a major brand")
          brand = fourcc(bytes, p)
        case "moov" =>
          walk(bytes, p, e) { (t2, p2, e2) =>
            t2 match {
              case "mvhd" =>
                val ver = bytes(p2) & 0xff
                // bounds-check the fixed layout like every other leaf
                // box — a truncated mvhd must be loud, not read the
                // next box's bytes as a duration
                require(e2 - p2 >= (if (ver == 1) 32 else 20),
                  s"mp4: mvhd v$ver too short (${e2 - p2} bytes)")
                val (timescale, duration) =
                  if (ver == 1) (u32(bytes, p2 + 20), u64(bytes, p2 + 24))
                  else (u32(bytes, p2 + 12), u32(bytes, p2 + 16))
                require(timescale > 0, "mp4: mvhd timescale 0")
                durationMs = duration * 1000L / timescale
              case "trak" => tracks += parseTrak(bytes, p2, e2)
              case _ =>
            }
          }
        case _ => // mdat, free, skip, ...
      }
    }
    require(durationMs >= 0, "mp4: no moov/mvhd box (streaming-only fragment?)")
    Meta(brand, durationMs, tracks.result())
  }

  private def parseTrak(b: Array[Byte], from: Int, to: Int): Track = {
    var handler = ""
    var codec = ""
    var w = 0
    var h = 0
    walk(b, from, to) { (t, p, e) =>
      t match {
        case "tkhd" =>
          val ver = b(p) & 0xff
          // width/height are the LAST 8 bytes of the box, 16.16 fixed
          // point — same tail position for both versions
          require(e - p >= 8, "mp4: tkhd too short")
          w = (u32(b, e - 8) >> 16).toInt
          h = (u32(b, e - 4) >> 16).toInt
          require(ver <= 1, s"mp4: tkhd version $ver")
        case "mdia" =>
          walk(b, p, e) { (t2, p2, e2) =>
            t2 match {
              case "hdlr" =>
                require(e2 - p2 >= 12, "mp4: hdlr too short")
                handler = fourcc(b, p2 + 8)
              case "minf" =>
                walk(b, p2, e2) { (t3, p3, e3) =>
                  if (t3 == "stbl") walk(b, p3, e3) { (t4, p4, e4) =>
                    if (t4 == "stsd") {
                      // fullbox header (4) + entry_count (4) + first
                      // entry [size:u32][format:4cc]
                      require(e4 - p4 >= 16, "mp4: stsd too short")
                      if (u32(b, p4 + 4) >= 1) codec = fourcc(b, p4 + 12)
                    }
                  }
                }
              case _ =>
            }
          }
        case _ =>
      }
    }
    Track(handler, codec, w, h)
  }

  // --- AVIF (AV1 Image File Format — the same ISO BMFF structure) ---------

  /** AVIF sniff: an ftyp whose major brand is avif (still) or avis
    * (sequence). */
  def isAvif(bytes: Array[Byte]): Boolean =
    isMp4(bytes) && {
      val b = fourcc(bytes, 8)
      b == "avif" || b == "avis"
    }

  /** AVIF image dimensions from `meta/iprp/ipco/ispe` — the spatial
    * extents live in uncompressed property boxes; AV1 payload decode is
    * out of scope (the VP8-lossy rule). `meta` is a FULLBOX (4-byte
    * version/flags precede its children), unlike moov. A file may carry
    * several `ispe` properties (thumbnails, alpha plane); without
    * walking the full pitm/ipma association this returns the
    * LARGEST-area extents — the primary image in every real encoder's
    * output, and a documented approximation rather than a guess. */
  def avifDims(bytes: Array[Byte]): (Int, Int) = {
    require(isAvif(bytes), "not an AVIF: ftyp brand is not avif/avis")
    var best = (0, 0)
    walk(bytes, 0, bytes.length) { (typ, p, e) =>
      if (typ == "meta") {
        require(e - p >= 4, "avif: meta fullbox truncated")
        walk(bytes, p + 4, e) { (t2, p2, e2) =>
          if (t2 == "iprp") walk(bytes, p2, e2) { (t3, p3, e3) =>
            if (t3 == "ipco") walk(bytes, p3, e3) { (t4, p4, e4) =>
              if (t4 == "ispe") {
                require(e4 - p4 >= 12, "avif: ispe truncated")
                val w = u32(bytes, p4 + 4).toInt
                val h = u32(bytes, p4 + 8).toInt
                require(w > 0 && h > 0, s"avif: degenerate ispe ${w}x$h")
                if (w.toLong * h > best._1.toLong * best._2) best = (w, h)
              }
            }
          }
        }
      }
    }
    require(best._1 > 0, "avif: no meta/iprp/ipco/ispe box")
    best
  }

  /** Fixture: a structurally valid AVIF header (ftyp + meta/iprp/ipco/
    * ispe + empty mdat) — [[avifDims]] reads it, nothing decodes. */
  def encodeAvifHeader(w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && h >= 1, s"avif dims ${w}x$h")
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
    val ftyp = box("ftyp", "avif".getBytes("ISO-8859-1") ++ be32(0) ++
      "mif1".getBytes("ISO-8859-1"))
    val ispe = box("ispe", be32(0) ++ be32(w.toLong) ++ be32(h.toLong))
    val meta = box("meta", be32(0) ++ box("iprp", box("ipco", ispe)))
    ftyp ++ meta ++ box("mdat", Array.empty[Byte])
  }

  // --- fixture encoder ----------------------------------------------------

  /** Build a structurally valid MP4 whose headers carry the given
    * metadata, with an empty mdat — [[metadata]] reads it; there is no
    * payload to decode (the encodeLossyHeader pattern: fixtures for the
    * header walk, never a fake decode). */
  def encodeHeader(brand: String, timescale: Long, duration: Long,
      tracks: Seq[Track]): Array[Byte] = {
    require(brand.length == 4, s"brand '$brand' must be a 4cc")
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
    val ftyp = box("ftyp",
      brand.getBytes("ISO-8859-1") ++ be32(0) ++
        "isom".getBytes("ISO-8859-1"))
    val mvhd = box("mvhd",
      be32(0) ++ // version+flags
        be32(0) ++ be32(0) ++ // creation, modification
        be32(timescale) ++ be32(duration) ++
        be32(0x00010000L) ++ // rate 1.0
        Array[Byte](1, 0, 0, 0) ++ // volume 1.0 + reserved
        new Array[Byte](8) ++ // reserved
        (Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
          .flatMap(be32).toArray) ++ // identity matrix
        new Array[Byte](24) ++ // pre_defined
        be32(tracks.length + 1)) // next_track_ID
    val traks = tracks.map { t =>
      val tkhd = box("tkhd",
        be32(7) ++ // version 0, flags: enabled|in-movie|in-preview
          be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(duration) ++
          new Array[Byte](8) ++ // reserved
          new Array[Byte](8) ++ // layer, alt group, volume, reserved
          (Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
            .flatMap(be32).toArray) ++
          be32(t.width.toLong << 16) ++ be32(t.height.toLong << 16))
      val hdlr = box("hdlr",
        be32(0) ++ be32(0) ++ t.handler.getBytes("ISO-8859-1") ++
          new Array[Byte](12) ++ Array[Byte](0)) // reserved + empty name
      val entry = box(t.codec, new Array[Byte](8)) // minimal sample entry
      val stsd = box("stsd", be32(0) ++ be32(1) ++ entry)
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", hdlr ++ minf)
      box("trak", tkhd ++ mdia)
    }
    val moov = box("moov", mvhd ++ traks.flatten.toArray)
    val mdat = box("mdat", Array.empty[Byte])
    ftyp ++ moov ++ mdat
  }
}
