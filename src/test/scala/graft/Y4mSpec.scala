package graft

import graft.kernel.Y4m
import graft.operators.Multimodal

/** [[graft.kernel.Y4m]] codec gates — decode tested against hand-built
  * ASCII-header streams from the yuv4mpeg grammar, independent of the
  * encoder; plus round-trips, the plane-layout matrix, loud rejection,
  * and the frame-stats kernel's hand-computed stride sampling.
  */
class Y4mSpec extends SparkSuite {

  private def stream(header: String, frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write((header + "\n").getBytes("US-ASCII"))
    frames.foreach { f =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(f)
    }
    out.toByteArray
  }

  test("hand-built C420 stream decodes: dims, frame count, exact planes") {
    // 2×2 C420: 4 luma + 1 Cb + 1 Cr = 6 bytes per frame
    val f0 = Array[Byte](10, 20, 30, 40, 100, -128)
    val f1 = Array[Byte](1, 2, 3, 4, 5, 6)
    val v = Y4m.decode(stream("YUV4MPEG2 W2 H2 F30:1 Ip A1:1 C420", Seq(f0, f1)))
    assert(v.width == 2 && v.height == 2 && v.colorspace == "C420")
    assert(v.frames.length == 2)
    assert(v.frames(0).toSeq == f0.toSeq && v.frames(1).toSeq == f1.toSeq)
  }

  test("plane-layout matrix: C422, C444, Cmono frame sizes; C absent defaults C420") {
    val v422 = Y4m.decode(stream("YUV4MPEG2 W2 H2 C422",
      Seq(Array.fill[Byte](8)(7))))
    assert(v422.frames.head.length == 8)
    val v444 = Y4m.decode(stream("YUV4MPEG2 W2 H2 C444",
      Seq(Array.fill[Byte](12)(7))))
    assert(v444.frames.head.length == 12)
    val mono = Y4m.decode(stream("YUV4MPEG2 W3 H2 Cmono",
      Seq(Array.fill[Byte](6)(7))))
    assert(mono.frames.head.length == 6)
    val dflt = Y4m.decode(stream("YUV4MPEG2 W2 H2",
      Seq(Array.fill[Byte](6)(7))))
    assert(dflt.colorspace == "C420" && dflt.frames.head.length == 6)
  }

  test("encode -> decode round-trips C420 and Cmono bit-exactly") {
    for (cs <- Seq("C420", "Cmono")) {
      val fb = if (cs == "C420") 6 else 4
      val frames = Vector.tabulate(3)(f => Array.tabulate[Byte](fb)(i => (f * 17 + i).toByte))
      val back = Y4m.decode(Y4m.encode(Y4m.Video(2, 2, cs, frames)))
      assert(back.width == 2 && back.height == 2 && back.colorspace == cs)
      assert(back.frames.map(_.toSeq) == frames.map(_.toSeq), s"drift at $cs")
    }
  }

  test("malformed streams fail loudly, never misparse") {
    assertThrows[IllegalArgumentException](Y4m.decode("RIFF....".getBytes))
    // interlaced
    val e1 = intercept[IllegalArgumentException](Y4m.decode(
      stream("YUV4MPEG2 W2 H2 It C420", Seq(Array.fill[Byte](6)(0)))))
    assert(e1.getMessage.contains("interlaced"))
    // unknown colorspace
    assertThrows[IllegalArgumentException](Y4m.decode(
      stream("YUV4MPEG2 W2 H2 C410", Seq(Array.fill[Byte](6)(0)))))
    // missing dimensions
    assertThrows[IllegalArgumentException](Y4m.decode(
      stream("YUV4MPEG2 F25:1", Seq.empty)))
    // truncated frame data
    assertThrows[IllegalArgumentException](Y4m.decode(
      stream("YUV4MPEG2 W2 H2 C420", Seq(Array.fill[Byte](3)(0)))))
    // odd dims under C420 subsampling
    assertThrows[IllegalArgumentException](Y4m.decode(
      stream("YUV4MPEG2 W3 H2 C420", Seq(Array.fill[Byte](9)(0)))))
  }

  test("videoFrameStats: stride sampling + hand-computed luma stats") {
    val spark2 = spark
    import spark2.implicits._
    // 2×2, 3 frames; luma quads (10,20,30,40), (1,2,3,4), (0,0,255,0);
    // chroma bytes deliberately extreme — they must NOT leak into stats
    val frames = Vector(
      Array[Byte](10, 20, 30, 40, -1, -1),
      Array[Byte](1, 2, 3, 4, -1, -1),
      Array[Byte](0, 0, -1, 0, -1, -1)) // -1 & 0xff = 255
    val media = Seq((5L, "video",
      Y4m.encode(Y4m.Video(2, 2, "C420", frames))))
      .toDF("doc_id", "media_type", "payload")
    val got = Multimodal.videoFrameStats(media, stride = 2)
      .orderBy("frame_idx").collect()
      .map(r => (r.getInt(1), r.getLong(4), r.getInt(5), r.getInt(6)))
    // frames 0 and 2 sampled; frame 1 skipped by the stride
    assert(got.toSeq == Seq((0, 100L, 10, 40), (2, 255L, 0, 255)))
  }

  // ---- video fingerprint (m21/m22) gates ----

  /** 16×8 C420 clip whose luma at (x, y, frame) is `lum`. */
  private def clip(nf: Int, lum: (Int, Int, Int) => Int): Array[Byte] = {
    val w = 16; val h = 8
    val frames = Vector.tabulate(nf) { f =>
      val frame = new Array[Byte](w * h * 3 / 2)
      for (y <- 0 until h; x <- 0 until w)
        frame(y * w + x) = lum(x, y, f).toByte
      java.util.Arrays.fill(frame, w * h, frame.length, 128.toByte)
      frame
    }
    Y4m.encode(Y4m.Video(w, h, "C420", frames))
  }

  private def fingerprint(payloads: Seq[(Long, Array[Byte])]): Map[Long, (String, Long)] = {
    val spark2 = spark
    import spark2.implicits._
    val media = payloads.map { case (id, p) => (id, "video", p) }
      .toDF("doc_id", "media_type", "payload")
    Multimodal.videoFingerprints(media).collect()
      .map(r => r.getLong(0) -> (r.getString(4), r.getLong(5))).toMap
  }

  test("videoFingerprints: hand-computed bits; brightness-scale invariance; bits↔hash repack") {
    // left half luma 10, right half 30: within every temporal bucket the
    // right-side cells (cx 2,3) beat the bucket average cell (160 vs
    // 240·16 > 2560), the left ones (80·16) don't → every (t, cy) row of
    // four bits reads "0011"
    val base = clip(4, (x, _, _) => if (x < 8) 10 else 30)
    val x3 = clip(4, (x, _, _) => if (x < 8) 30 else 90) // ×3 gain
    val got = fingerprint(Seq((1L, base), (2L, x3)))
    assert(got(1L)._1 == "0011" * 16)
    assert(got(1L)._2 == java.lang.Long.parseUnsignedLong("CCCCCCCCCCCCCCCC", 16))
    // ratio-form bits are invariant to a global gain change
    assert(got(2L) == got(1L))
    // the packed hash is a pure repack of the bit string (bit k = char k)
    val arb = fingerprint(Seq((3L, clip(5, (x, y, f) => (x * 31 + y * 17 + f * 7) % 97))))(3L)
    for (k <- 0 until 64)
      assert(((arb._2 >>> k) & 1L) == (if (arb._1.charAt(k) == '1') 1L else 0L), s"bit $k")
  }

  test("videoFingerprints: the temporal axis discriminates frame ORDER") {
    // same frames, reversed order: every temporal bucket sees the
    // opposite spatial pattern, so all 64 bits flip
    val fwd = clip(4, (x, _, f) => if ((f < 2) == (x < 8)) 30 else 10)
    val rev = clip(4, (x, _, f) => if ((f >= 2) == (x < 8)) 30 else 10)
    val got = fingerprint(Seq((1L, fwd), (2L, rev)))
    assert(java.lang.Long.bitCount(got(1L)._2 ^ got(2L)._2) == 64)
  }

  test("videoFingerprints: hostile inputs fail loudly") {
    // fewer frames than temporal buckets
    val short = clip(3, (x, _, _) => x)
    val e1 = intercept[org.apache.spark.SparkException] {
      fingerprint(Seq((1L, short)))
    }
    assert(e1.getMessage.contains("temporal") ||
      e1.getCause.getMessage.contains("temporal"))
    // dims not divisible by the spatial grid
    val spark2 = spark
    import spark2.implicits._
    val odd = Y4m.encode(Y4m.Video(6, 4, "Cmono",
      Vector.tabulate(4)(_ => Array.fill[Byte](24)(9))))
    val e2 = intercept[org.apache.spark.SparkException] {
      Multimodal.videoFingerprints(
        Seq((1L, "video", odd)).toDF("doc_id", "media_type", "payload")).collect()
    }
    assert(e2.getMessage.contains("divisible") ||
      e2.getCause.getMessage.contains("divisible"))
  }

  test("videoSceneCuts: hand-computed SADs, boundary-inclusive threshold") {
    val spark2 = spark
    import spark2.implicits._
    // base luma 50 everywhere; frame 1 identical (sad 0), frame 2 jumps
    // +20 (mean 20 → cut), frame 3 drifts +1 (mean 1 → no cut), frame 4
    // shifts by exactly the threshold mean 12 (inclusive → cut)
    val deltas = Seq(0, 0, 20, 21, 33)
    val media = Seq((9L, "video",
      graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(16, 8, "Cmono",
        deltas.map(d => Array.fill[Byte](16 * 8)((50 + d).toByte)).toVector))))
      .toDF("doc_id", "media_type", "payload")
    val got = Multimodal.videoSceneCuts(media, num = 12, den = 1)
      .orderBy("frame_idx").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (0, 0L, true),          // first frame always starts a scene
      (1, 0L, false),         // identical
      (2, 20L * 128, true),   // big jump
      (3, 1L * 128, false),   // small drift
      (4, 12L * 128, true)))  // exactly the threshold: >= cuts
  }

  test("videoKeyframes: one PNG per scene start, decoding back to the exact luma plane") {
    val spark2 = spark
    import spark2.implicits._
    // scenes: frames 0,1 at luma 10; frames 2,3 at 40 → keyframes 0, 2
    val lum = (f: Int) => if (f < 2) 10 else 40
    val frames = Vector.tabulate(4)(f =>
      Array.tabulate[Byte](16 * 8)(i => (lum(f) + i % 5).toByte))
    val media = Seq((7L, "video",
      graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(16, 8, "Cmono", frames))))
      .toDF("doc_id", "media_type", "payload")
    val got = Multimodal.videoKeyframes(media, num = 12, den = 1)
      .orderBy("frame_idx").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(0, 2))
    got.foreach { r =>
      val img = graft.kernel.Png.decode(r.getAs[Array[Byte]](4))
      assert(img.width == 16 && img.height == 8 && img.channels == 1)
      val f = frames(r.getInt(1))
      assert(img.samples.sameElements(f.map(_ & 0xff)),
        s"keyframe ${r.getInt(1)} luma drifted")
    }
  }

  test("videoImageMatches: a keyframe equal to a known image pairs; others do not") {
    val spark2 = spark
    import spark2.implicits._
    val w = 16; val h = 8
    // video: scene 0 = pattern A, scene 1 = pattern B (its keyframes
    // are frames 0 and 2); image corpus: B (must match), C (must not)
    def patt(seed: Int): Array[Int] =
      Array.tabulate(w * h)(i => (i % w / 2 * 31 + i / w * 17 + seed * 53) % 256)
    def frame(px: Array[Int]): Array[Byte] = {
      val f = new Array[Byte](w * h * 3 / 2)
      px.indices.foreach(i => f(i) = px(i).toByte)
      java.util.Arrays.fill(f, w * h, f.length, 128.toByte)
      f
    }
    val videos = Seq((5L, "video", graft.kernel.Y4m.encode(
      graft.kernel.Y4m.Video(w, h, "C420", Vector(
        frame(patt(1)), frame(patt(1)), frame(patt(2)), frame(patt(2)))))))
      .toDF("doc_id", "media_type", "payload")
    val images = Seq(
      (7L, "image", graft.kernel.Png.encode(
        graft.kernel.Png.Image(w, h, 1, 8, patt(2)))),
      (8L, "image", graft.kernel.Png.encode(
        graft.kernel.Png.Image(w, h, 1, 8, patt(9)))))
      .toDF("doc_id", "media_type", "payload")
    val got = Multimodal.videoImageMatches(videos, images, keyBits = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq((5L, 2L.toInt, 7L, 0)),
      s"expected exactly the scene-1 keyframe ↔ image 7 pair, got ${got.toSeq}")
  }

  test("videoNearDups: copies + gain-scaled copy pair; distinct footage does not") {
    // 1 = base, 2 = base at ×2 gain (hamming 0), 3 = top-bright,
    // 4 = checkerboard cells — both far from base (hamming 32)
    val base = clip(4, (x, _, _) => if (x < 8) 10 else 30)
    val pairs = {
      val spark2 = spark
      import spark2.implicits._
      val media = Seq(
        (1L, base),
        (2L, clip(4, (x, _, _) => if (x < 8) 20 else 60)),
        (3L, clip(4, (_, y, _) => if (y < 4) 30 else 10)),
        (4L, clip(4, (x, y, _) => if ((x / 4 + y / 2) % 2 == 0) 30 else 10)))
        .map { case (id, p) => (id, "video", p) }
        .toDF("doc_id", "media_type", "payload")
      Multimodal.videoNearDups(media, maxHamming = 2, keyBits = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    }
    assert(pairs == Seq((1L, 2L, 0)))
  }

  test("hostile headers: non-numeric and over-budget dims raise IAE; " +
      "the lenient crawl fingerprinter skips them") {
    import graft.operators.Multimodal
    def hdr(line: String): Array[Byte] =
      (line + "\nFRAME\n").getBytes("US-ASCII")
    // non-numeric dimension: IAE, never NumberFormatException (the
    // lenient contract catches IAE only)
    intercept[IllegalArgumentException] {
      graft.kernel.Y4m.decode(hdr("YUV4MPEG2 Wabc H8 Cmono"))
    }
    // absurd declared dims: the 64 MPx budget raises BEFORE any frame
    // walk can int-overflow w*h*3/2 into an out-of-bounds plane read
    intercept[IllegalArgumentException] {
      graft.kernel.Y4m.decode(hdr("YUV4MPEG2 W99999 H99999 Cmono"))
    }
    // six-digit dimension: rejected at the parse
    intercept[IllegalArgumentException] {
      graft.kernel.Y4m.decode(hdr("YUV4MPEG2 W100000 H8 Cmono"))
    }
    val spark2 = spark
    import spark2.implicits._
    val junk = Seq(
      (1L, hdr("YUV4MPEG2 Wabc H8 Cmono")),
      (2L, hdr("YUV4MPEG2 W99999 H99999 Cmono")))
      .toDF("doc_id", "payload")
    assert(Multimodal.crawlVideoFingerprints(junk).count() == 0L)
  }
}
