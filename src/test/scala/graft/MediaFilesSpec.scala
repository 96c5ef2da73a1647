package graft

import org.apache.spark.sql.functions._

import graft.sources.MediaFiles

/** The binaryFile + CSV members of the declared scan surface: raw media
  * files become the multimodal binary-column table, the glob prunes at
  * listing time, and sidecar CSV metadata joins broadcast without
  * dropping unannotated payloads.
  */
class MediaFilesSpec extends SparkSuite {

  private def writeFiles(dir: java.io.File): Map[String, Array[Byte]] = {
    val payloads = Map(
      "a.img" -> Array[Byte](1, 2, 3, 4, 5),
      "b.img" -> Array.tabulate(300)(i => (i % 120).toByte),
      "c.wav" -> Array[Byte](9, 8, 7),
      // URI-hostile names: the raw binaryFile path column carries these
      // percent-encoded; media_id must round back to the real file name
      "my shot.img" -> Array[Byte](42),
      "a+b.img" -> Array[Byte](43),
      "notes.txt" -> "not media".getBytes("UTF-8"))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(new java.io.File(dir, name).toPath, bytes)
    }
    payloads
  }

  test("binaryFile scan: whole-file rows, exact bytes, glob prunes listing") {
    val dir = tempDir("media")
    val payloads = writeFiles(dir)

    val all = MediaFiles.scan(spark, dir.getAbsolutePath).collect()
    assert(all.map(_.getAs[String]("media_id")).sorted.toSeq ==
      payloads.keys.toSeq.sorted)
    all.foreach { r =>
      val expected = payloads(r.getAs[String]("media_id"))
      assert(r.getAs[Array[Byte]]("content").toSeq == expected.toSeq)
      assert(r.getAs[Long]("byte_len") == expected.length)
    }

    val imgs = MediaFiles.scan(spark, dir.getAbsolutePath, Some("*.img"))
    assert(imgs.collect().map(_.getAs[String]("media_id")).sorted.toSeq ==
      Seq("a+b.img", "a.img", "b.img", "my shot.img"))
  }

  test("sidecar CSV joins broadcast and keeps unannotated payloads") {
    val dir = tempDir("media2")
    writeFiles(dir)
    val csv = new java.io.File(tempDir("side"), "sidecar.csv")
    java.nio.file.Files.write(csv.toPath,
      ("media_id,media_type,label\n" +
        "a.img,image,cat\n" +
        "my shot.img,image,dog\n" +
        "c.wav,audio,speech\n").getBytes("UTF-8"))

    val joined = MediaFiles.withSidecar(
      MediaFiles.scan(spark, dir.getAbsolutePath), csv.getAbsolutePath)
    val byId = joined.collect()
      .map(r => r.getAs[String]("media_id") ->
        (Option(r.getAs[String]("media_type")), Option(r.getAs[String]("label"))))
      .toMap
    assert(byId("a.img") == ((Some("image"), Some("cat"))))
    assert(byId("c.wav") == ((Some("audio"), Some("speech"))))
    assert(byId("b.img") == ((None, None))) // unannotated payload kept
    assert(byId("my shot.img") == ((Some("image"), Some("dog")))) // decoded key joins
    assert(byId.size == 6)

    // the metadata side is the broadcast side of the join
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("scan feeds the multimodal kernel: real PNG features from file bytes") {
    import graft.kernel.Png
    val dir = tempDir("media3")
    // real PNG payloads on disk — the session-default decoder is the real
    // codec, so the scan→kernel path decodes actual pixels
    val pngs = Map(
      // 3×2 gray, mean = (0+50+100+150+200+250)/6 = 125.0
      "p1.img" -> Png.encode(Png.Image(3, 2, 1, 8,
        Array(0, 50, 100, 150, 200, 250))),
      // 2×2 RGB, samples 0,20,…,220 → mean = 1320/12 = 110.0
      "p2.img" -> Png.encode(Png.Image(2, 2, 3, 8,
        Array.tabulate(12)(i => i * 20))))
    pngs.foreach { case (name, bytes) =>
      java.nio.file.Files.write(new java.io.File(dir, name).toPath, bytes)
    }
    java.nio.file.Files.write(new java.io.File(dir, "notes.txt").toPath,
      "not media".getBytes("UTF-8")) // pruned by the glob before decode
    val media = MediaFiles.scan(spark, dir.getAbsolutePath, Some("*.img"))
      .select(abs(xxhash64(col("media_id"))).as("doc_id"),
        lit("image").as("media_type"), col("content").as("payload"),
        col("media_id"))
    val feats = graft.operators.Multimodal.decodeFeatures(media.drop("media_id"))
      .collect()
    assert(feats.length == 2)
    val byDims = feats.map(f => (f.width, f.height) -> f.channel_mean).toMap
    assert(byDims((3, 2)) == 125.0)
    assert(byDims((2, 2)) == 110.0)
  }
}
