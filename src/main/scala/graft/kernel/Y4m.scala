package graft.kernel

/** Pure-JVM Y4M (YUV4MPEG2) video codec, from the public yuv4mpeg
  * format description — the uncompressed interchange format mjpegtools/
  * ffmpeg emit (`-f yuv4mpeg`). The grammar is one ASCII stream header
  * (`YUV4MPEG2` + space-separated parameters: `W<int> H<int> F<rate>
  * I<interlace> A<aspect> C<colorspace> X<meta>`), then per frame an
  * ASCII `FRAME` line (optionally with parameters) followed by the raw
  * planes. Decode supports the progressive colorspaces whose plane
  * layout the header fully determines — C420 family (luma + 2 quarter
  * chroma planes), C422, C444, and Cmono — and rejects anything else
  * loudly. Encode writes C420 or Cmono.
  *
  * Frames decode to raw plane bytes; the luma plane is the first
  * `width·height` bytes of every frame in all supported layouts, which
  * is what frame-level feature stages consume.
  */
object Y4m {

  /** Decoded stream: `frames(i)` is frame i's raw plane data (luma
    * first). */
  final case class Video(width: Int, height: Int, colorspace: String,
      frames: Vector[Array[Byte]])

  private val Magic = "YUV4MPEG2"

  def isY4m(bytes: Array[Byte]): Boolean =
    bytes.length > Magic.length &&
      new String(bytes, 0, Magic.length, "US-ASCII") == Magic

  /** Bytes per frame for a supported colorspace, or an error. */
  private def frameBytes(c: String, w: Int, h: Int): Int = c match {
    case "C420" | "C420jpeg" | "C420paldv" | "C420mpeg2" =>
      require(w % 2 == 0 && h % 2 == 0, s"C420 needs even dims, got ${w}x$h")
      w * h * 3 / 2
    case "C422" =>
      require(w % 2 == 0, s"C422 needs even width, got $w")
      w * h * 2
    case "C444" => w * h * 3
    case "Cmono" => w * h
    case other =>
      throw new IllegalArgumentException(s"unsupported colorspace $other")
  }

  def decode(bytes: Array[Byte]): Video = {
    require(isY4m(bytes), "not a Y4M stream: bad magic")
    var off = Magic.length
    def readLine(): String = {
      val start = off
      while (off < bytes.length && bytes(off) != '\n') off += 1
      require(off < bytes.length, "truncated Y4M header line")
      off += 1 // consume the newline
      new String(bytes, start, off - 1 - start, "US-ASCII")
    }
    val header = readLine()
    var w, h = -1
    var cs = "C420" // the documented default when C is absent
    // untrusted-header discipline (the Png lesson): a non-numeric or
    // absurd dimension must raise IAE — the lenient crawl wrapper's
    // contract — never NumberFormatException or an int-overflowed
    // frame size that out-of-bounds a later plane walk
    def dim(p: String): Int = {
      val v = p.substring(1)
      require(v.nonEmpty && v.length <= 5 && v.forall(c => c >= '0' && c <= '9'),
        s"bad Y4M dimension '$p'")
      v.toInt
    }
    header.split(" ").filter(_.nonEmpty).foreach { p =>
      p.charAt(0) match {
        case 'W' => w = dim(p)
        case 'H' => h = dim(p)
        case 'C' => cs = p
        case 'I' =>
          require(p == "Ip" || p == "I?",
            s"interlaced Y4M not supported ($p) — deinterlace upstream")
        case _ => // F (rate), A (aspect), X (metadata) — not plane layout
      }
    }
    require(w > 0 && h > 0, s"missing/bad dimensions in header '$header'")
    // FRAMEWORK-WIDE decode budget (not just crawl hardening): every
    // video operator holds whole frames on-heap per row, so dims are
    // capped at 5 digits and w·h at 64 MPx — beyond 8K footage — to
    // keep a single row's allocation bounded. Spec-valid streams above
    // the budget are refused loudly here, by design.
    require(w.toLong * h <= (1L << 26),
      s"Y4M frame ${w}x$h exceeds the 64 MPx budget")
    val fb = frameBytes(cs, w, h)
    val frames = Vector.newBuilder[Array[Byte]]
    while (off < bytes.length) {
      val marker = readLine()
      require(marker == "FRAME" || marker.startsWith("FRAME "),
        s"expected FRAME marker, got '${marker.take(20)}'")
      require(off + fb <= bytes.length,
        s"truncated frame: need $fb bytes, have ${bytes.length - off}")
      frames += java.util.Arrays.copyOfRange(bytes, off, off + fb)
      off += fb
    }
    Video(w, h, cs, frames.result())
  }

  /** Encode C420 (frame data = w·h·3/2 bytes) or Cmono (w·h bytes). */
  def encode(v: Video): Array[Byte] = {
    val fb = frameBytes(v.colorspace, v.width, v.height)
    require(v.colorspace == "C420" || v.colorspace == "Cmono",
      s"encoder writes C420/Cmono, got ${v.colorspace}")
    v.frames.foreach(f => require(f.length == fb,
      s"frame has ${f.length} bytes, layout needs $fb"))
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"$Magic W${v.width} H${v.height} F25:1 Ip A1:1 ${v.colorspace}\n"
      .getBytes("US-ASCII"))
    v.frames.foreach { f =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(f)
    }
    out.toByteArray
  }
}
