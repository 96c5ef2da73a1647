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
}
