package graft

import org.apache.spark.sql.functions._
import graft.operators.HashIndex

/** Persistent fingerprint-index lifecycle: build-vs-load parity, grow ≡
  * rebuild, hand-computed probe semantics (band screen THEN exact
  * hamming — a hash within distance but sharing no band slice is
  * correctly not a candidate), the hot-bucket guard, and
  * forget/vacuum/regrow takedown symmetry.
  */
class HashIndexSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_hixspec").toString

  private def sigs(rows: (Long, Long)*) =
    rows.toDF("doc_id", "hash")

  private def bucketSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("blk"), col("key"), col("doc_id"), col("hash"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("build-vs-load parity and hand-computed band keys") {
    val dir = tmp()
    // 0xDEAD_BEEF_CAFE_F00D: 16-bit slices (LSB-first blocks) are
    // f00d, cafe, beef, dead — hand-checkable rotated-window keys
    val h = 0xDEADBEEFCAFEF00DL
    HashIndex.build(sigs(1L -> h), dir)
    val ix = HashIndex.load(spark, dir)
    assert(ix.blocks == 4 && ix.keyBits == 16)
    assert(bucketSet(ix.buckets) == Set(
      (0, 0xF00DL, 1L, h), (1, 0xCAFEL, 1L, h),
      (2, 0xBEEFL, 1L, h), (3, 0xDEADL, 1L, h)))
    assert(ix.hashes.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, h)))
  }

  test("grow parity: build(A) + grow(B) equals build(A ∪ B)") {
    val a = Seq(1L -> 5L, 2L -> 0xFFFF0000L)
    val b = Seq(3L -> 0x123456789ABCDEFL)
    val grownDir = tmp(); val fullDir = tmp()
    HashIndex.build(sigs(a: _*), grownDir)
    HashIndex.grow(sigs(b: _*), grownDir)
    HashIndex.build(sigs((a ++ b): _*), fullDir)
    assert(bucketSet(HashIndex.load(spark, grownDir).buckets) ==
      bucketSet(HashIndex.load(spark, fullDir).buckets))
  }

  test("probe: band screen then exact hamming, hand-computed") {
    val dir = tmp()
    HashIndex.build(sigs(
      10L -> 0L,                   // all-zero anchor
      11L -> 0x0001000100010001L,  // hamming 4 from 0, but EVERY 16-bit
                                   //   slice differs — never a candidate
      12L -> 0xFFFFFFFFFFFFFFFFL), dir)
    val ix = HashIndex.load(spark, dir)
    val out = HashIndex.probe(ix,
        sigs(100L -> 1L, 101L -> 0x00FF00FF00FF00FFL), maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // batch 100 (hash 1, rotated keys 1,0,0,0): shares blocks 1–3
    // (key 0) with doc 10 → hamming 1; doc 11's pattern is
    // rotation-symmetric (every rotated key = 1) so block 0 collides
    // too → hamming 3; doc 12 shares nothing (keys all FFFF).
    // batch 101 (0x00FF… — every rotated key 0x00FF): no stored key
    // matches → zero rows even though hamming to 0 would be 32.
    assert(out == Set((100L, 10L, 1), (100L, 11L, 3)), out)
    // the same pair is screened OUT when maxHamming is 0
    assert(HashIndex.probe(ix, sigs(100L -> 1L), maxHamming = 0)
      .collect().isEmpty)
    // doc 11 IS within hamming 4 of the zero hash, but the band screen
    // (correctly, by LSH contract) never surfaces it
    assert(!HashIndex.probe(ix, sigs(102L -> 0L), maxHamming = 4)
      .collect().map(_.getLong(1)).contains(11L))
  }

  test("hot-bucket guard: an over-full probed bucket drops whole") {
    val dir = tmp()
    // 150 stored docs share ONE hash → every band bucket holds 150
    HashIndex.build(sigs((1L to 150L).map(i => i -> 0x42L): _*), dir)
    val ix = HashIndex.load(spark, dir)
    val batch = sigs(200L -> 0x42L)
    assert(HashIndex.probe(ix, batch, maxBucket = 100).collect().isEmpty)
    val uncapped = HashIndex.probe(ix, batch, maxBucket = 200).collect()
    assert(uncapped.length == 150 && uncapped.forall(_.getInt(2) == 0))
  }

  test("forget masks, vacuum drops physically, regrow serves again") {
    val dir = tmp()
    HashIndex.build(sigs(1L -> 7L, 2L -> 0xF0F0L), dir)
    val batch = sigs(100L -> 7L)
    def hits(): Set[Long] =
      HashIndex.probe(HashIndex.load(spark, dir), batch)
        .collect().map(_.getLong(1)).toSet
    assert(hits() == Set(1L))
    HashIndex.forget(Seq(1L).toDF("doc_id"), dir)
    assert(hits() == Set.empty[Long])
    HashIndex.vacuum(spark, dir)
    val vac = HashIndex.load(spark, dir)
    assert(!vac.hashes.collect().map(_.getLong(0)).contains(1L))
    assert(spark.read.parquet(s"$dir/tombstones.parquet").isEmpty)
    HashIndex.grow(sigs(3L -> 7L), dir)
    assert(hits() == Set(3L))
  }

  test("seeded random lifecycles: grow ≡ rebuild; probe ≡ reference screen") {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def refKeys(h: Long): Seq[Long] =
      (0 until 4).map(i => ((h >>> (16 * i)) | (h << (64 - 16 * i))) & 0xFFFFL)
    for (c <- 0 until 6) {
      val seed = mix(4200L + c)
      val nCorpus = 8 + (mix(seed) & 7).toInt
      val corpus = (1L to nCorpus).map(i => i -> mix(seed + i * 17))
      val batch = (100L until 100L + 5L).map { j =>
        val r = mix(seed + j * 31)
        if ((r & 3) == 0) {
          // a near-copy: flip 0–3 bits of a random corpus hash
          val base = corpus(((r >>> 8) % nCorpus).toInt)._2
          val flips = ((r >>> 16) & 3).toInt
          (j, (0 until flips).foldLeft(base)((h, f) =>
            h ^ (1L << (mix(seed + j * 7 + f) & 63))))
        } else (j, r) // genuinely random
      }
      val grownDir = tmp(); val fullDir = tmp()
      val (a, b) = corpus.partition(_._1 % 3 != 0)
      HashIndex.build(sigs(a: _*), grownDir)
      HashIndex.grow(sigs(b: _*), grownDir)
      HashIndex.build(sigs(corpus: _*), fullDir)
      assert(bucketSet(HashIndex.load(spark, grownDir).buckets) ==
        bucketSet(HashIndex.load(spark, fullDir).buckets), s"case $c")
      // reference screen-then-verify, O(batch × corpus) in plain Scala
      def reference(cs: Seq[(Long, Long)]): Set[(Long, Long, Int)] =
        (for {
          (bid, bh) <- batch
          (cid, ch) <- cs
          if refKeys(bh).zip(refKeys(ch)).exists(p => p._1 == p._2)
          d = java.lang.Long.bitCount(bh ^ ch)
          if d <= 8
        } yield (bid, cid, d)).toSet
      val ix = HashIndex.load(spark, grownDir)
      def probed(): Set[(Long, Long, Int)] =
        HashIndex.probe(ix, sigs(batch: _*), maxHamming = 8,
            maxBucket = 1000)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .toSet
      assert(probed() == reference(corpus), s"case $c")
      // forget a random third; masked probe ≡ reference over survivors
      val gone = corpus.map(_._1).filter(i => (mix(seed + i * 101) & 3) == 0)
      if (gone.nonEmpty) {
        HashIndex.forget(gone.toDF("doc_id"), grownDir)
        val masked = HashIndex.load(spark, grownDir)
        val expect = reference(corpus.filterNot(kv => gone.contains(kv._1)))
        val got = HashIndex.probe(masked, sigs(batch: _*), maxHamming = 8,
            maxBucket = 1000)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .toSet
        assert(got == expect, s"case $c after forget")
        // vacuum changes nothing observable
        HashIndex.vacuum(spark, grownDir)
        val vac = HashIndex.probe(HashIndex.load(spark, grownDir),
            sigs(batch: _*), maxHamming = 8, maxBucket = 1000)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .toSet
        assert(vac == expect, s"case $c after vacuum")
      }
    }
  }

  test("hostile config is loud") {
    intercept[IllegalArgumentException](
      HashIndex.build(sigs(1L -> 1L), tmp(), blocks = 5))
    intercept[IllegalArgumentException](
      HashIndex.build(sigs(1L -> 1L), tmp(), keyBits = 0))
  }

  // ---- m37 ≡ m16: index-served near-dups match the live banded form ----
  // Two-level tile images (the CrawlLoopSpec scheme — the aHash bit
  // vector IS the high-tile indicator, so every planted hamming distance
  // is provable): corpus images 1..3 persist in the index, batch images
  // probe it; the SAME decode kernel and the SAME banding must yield
  // exactly the live hammingNearDups pairs restricted to (batch, corpus).
  test("index-served near-dups equal the live cross pairs bit for bit") {
    import graft.operators.{Dedup, Multimodal}
    def px(highs: Set[Int]): Array[Int] =
      Array.tabulate(64 * 64) { i =>
        val bx = (i % 64) / 8; val by = (i / 64) / 8
        if (highs(by * 8 + bx)) 200 else 50
      }
    val h1 = (0 to 4).toSet
    val h2 = Set(20, 21, 22, 30, 31, 32)
    val h3 = Set(40, 41, 50, 51, 60, 61, 62)
    val plants: Seq[(Long, Array[Byte])] = Seq(
      1L -> graft.kernel.Png.encode(
        graft.kernel.Png.Image(64, 64, 1, 8, px(h1))),
      2L -> graft.kernel.Png.encode(
        graft.kernel.Png.Image(64, 64, 1, 8, px(h2))),
      3L -> graft.kernel.Png.encode(
        graft.kernel.Png.Image(64, 64, 1, 8, px(h3))),
      // batch: 10 = one-tile edit of 1 (ham 1); 20 = 2's exact pixels
      // re-encoded as GIF (ham 0 — only pixels decide); 30 = unique
      10L -> graft.kernel.Png.encode(
        graft.kernel.Png.Image(64, 64, 1, 8, px(h1 + 9))),
      20L -> graft.kernel.Gif.encode(
        graft.kernel.Gif.Image(64, 64, 1, px(h2))),
      30L -> graft.kernel.Png.encode(
        graft.kernel.Png.Image(64, 64, 1, 8, px(Set(7, 15, 23, 31, 39)))))
    val media = plants.toDF("doc_id", "payload")
      .select(col("doc_id"), lit("image").as("media_type"), col("payload"))
    val hashes = Multimodal.imageHashesWith(media,
        classOf[Multimodal.ImageDecoder].getName)
      .select(col("doc_id"), col("img_hash"))
      .localCheckpoint(true)

    val dir = tmp()
    HashIndex.build(hashes.filter(col("doc_id") < 10)
      .withColumnRenamed("img_hash", "hash"), dir)
    val served = Multimodal.imageNearDupsAgainstIndex(
        HashIndex.load(spark, dir),
        media.filter(col("doc_id") >= 10),
        classOf[Multimodal.ImageDecoder].getName)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(served == Set((10L, 1L, 1), (20L, 2L, 0)), served)

    // the live all-pairs form, restricted to cross (batch, corpus) pairs
    val live = Dedup.hammingNearDups(hashes, "img_hash", maxHamming = 2,
        keyBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .collect { case (a, b, h) if a < 10 && b >= 10 => (b, a, h) }
      .toSet
    assert(served == live, s"served $served vs live $live")

    // the crawl loop's LENIENT image hasher: same hashes bit for bit as
    // the strict form, undecodable payloads skip rather than fail
    val lenient = Multimodal.crawlImageHashes(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val strict = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lenient == strict, s"lenient $lenient vs strict $strict")
    val withJunk = media.unionByName(
      Seq((99L, "image", Array[Byte](0, 1, 2, 3)))
        .toDF("doc_id", "media_type", "payload"))
    assert(Multimodal.crawlImageHashes(withJunk).count() == media.count())
  }

  // ---- m38 ≡ m28: keyframes probing the stored image index ----
  test("index-served video→image matches equal the live m28 form") {
    import graft.operators.Multimodal
    val w = 16; val h = 8
    def cells(id: Long, salt: Long): Array[Int] = {
      val m1 = (id * 2654435761L + salt * 97L) % 251L + 2L
      val m2 = (id * 40503L + salt * 89L) % 239L + 3L
      Array.tabulate(w * h) { i =>
        val bx = (i % w) / 2; val y = i / w
        ((bx * m1 + y * m2 + id) % 256L).toInt
      }
    }
    def videoOf(id: Long, sharedSalt: Option[Long]): Array[Byte] = {
      val frames = Vector.tabulate(6) { f =>
        val frame = new Array[Byte](w * h * 3 / 2)
        val sc = f / 3
        val px = cells(id,
          if (sc == 1) sharedSalt.getOrElse(1L) else 0L)
        var i = 0
        while (i < w * h) { frame(i) = px(i).toByte; i += 1 }
        java.util.Arrays.fill(frame, w * h, frame.length, 128.toByte)
        frame
      }
      graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(w, h, "C420", frames))
    }
    // video 97 shares scene 1's salt (31) with image 97; video 5 doesn't
    val videos = Seq(
      (97L, "video", videoOf(97L, Some(31L))),
      (5L, "video", videoOf(5L, None)))
      .toDF("doc_id", "media_type", "payload")
    val images = Seq(
      (97L, "image", graft.kernel.Png.encode(
        graft.kernel.Png.Image(w, h, 1, 8, cells(97L, 31L)))),
      (5L, "image", graft.kernel.Png.encode(
        graft.kernel.Png.Image(w, h, 1, 8, cells(5L, 9999L)))))
      .toDF("doc_id", "media_type", "payload")
    val live = Multimodal.videoImageMatches(videos, images, keyBits = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSet
    val dir = tmp()
    HashIndex.build(Multimodal.imageHashesWith(images,
        classOf[Multimodal.ImageDecoder].getName)
      .select(col("doc_id"), col("img_hash").as("hash")), dir)
    val served = Multimodal.videoImageMatchesAgainstIndex(
        HashIndex.load(spark, dir), videos)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(served.contains((97L, 3, 97L, 0)), served)
    assert(served == live, s"served $served vs live $live")
  }

  // ---- m39 ≡ m22: index-served video near-dups match the live form ----
  // Two-level cell clips (the CrawlLoopSpec scheme: 8x8 Cmono, 4 frames,
  // 4x4 cells -> bit k = high-cell indicator, so every planted hamming
  // distance is provable; gain scaling preserves every bit): corpus
  // clips 1..3 persist in the index, batch clips probe it.
  test("index-served video near-dups equal the live cross pairs bit " +
      "for bit; lenient crawl fingerprints match the strict form") {
    import graft.operators.{Dedup, Multimodal}
    def y4m(highs: Set[Int], gain: Int): Array[Byte] = {
      val frames = Vector.tabulate(4) { t =>
        Array.tabulate[Byte](64) { i =>
          val c = ((i / 8) / 2) * 4 + (i % 8) / 2
          (if (highs(t * 16 + c)) 20 * gain else 5 * gain).toByte
        }
      }
      graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(8, 8, "Cmono", frames))
    }
    val h1 = (0 to 4).toSet
    val h2 = Set(20, 21, 22, 30, 31, 32)
    val h3 = Set(40, 41, 50, 51, 60, 61, 62)
    val plants: Seq[(Long, Array[Byte])] = Seq(
      1L -> y4m(h1, 1), 2L -> y4m(h2, 1), 3L -> y4m(h3, 1),
      // batch: 10 = one-cell edit of 1 (ham 1); 20 = clip 2 at triple
      // gain (novel bytes, ham 0 - ratio bits are gain-invariant);
      // 30 = unique (ham >= 5 to everything stored)
      10L -> y4m(h1 + 9, 1),
      20L -> y4m(h2, 3),
      30L -> y4m(Set(7, 15, 23, 31, 39), 1))
    val media = plants.toDF("doc_id", "payload")
      .select(col("doc_id"), lit("video").as("media_type"), col("payload"))
    val fps = Multimodal.videoFingerprints(media)
      .select(col("doc_id"), col("video_hash"))
      .localCheckpoint(true)

    val dir = tmp()
    HashIndex.build(fps.filter(col("doc_id") < 10)
      .withColumnRenamed("video_hash", "hash"), dir)
    val served = Multimodal.videoNearDupsAgainstIndex(
        HashIndex.load(spark, dir), media.filter(col("doc_id") >= 10))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(served == Set((10L, 1L, 1), (20L, 2L, 0)), served)

    // the live all-pairs form, restricted to cross (batch, corpus) pairs
    val live = Dedup.hammingNearDups(fps, "video_hash", maxHamming = 2,
        keyBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .collect { case (a, b, h) if a < 10 && b >= 10 => (b, a, h) }
      .toSet
    assert(served == live, s"served $served vs live $live")

    // the crawl loop's LENIENT video fingerprinter: same hashes bit for
    // bit as the strict form; compressed/short/ragged payloads skip
    val lenient = Multimodal.crawlVideoFingerprints(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val strict = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lenient == strict, s"lenient $lenient vs strict $strict")
    val junk = Seq(
      // not Y4M at all
      (90L, "video", Array[Byte](0, 0, 0, 24) ++
        "ftypisom".getBytes("US-ASCII")),
      // decodable but too short for tGrid=4 (2 frames)
      (91L, "video", graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(
        8, 8, "Cmono", Vector.fill(2)(new Array[Byte](64))))),
      // decodable but 6x6: dims not divisible by sGrid=4
      (92L, "video", graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(
        6, 6, "Cmono", Vector.fill(4)(new Array[Byte](36))))))
      .toDF("doc_id", "media_type", "payload")
    assert(Multimodal.crawlVideoFingerprints(
      media.unionByName(junk)).count() == media.count())
  }

  // ---- m40 ≡ m12: index-served audio near-dups match the live form ----
  test("index-served audio near-dups equal the live cross pairs bit " +
      "for bit; lenient crawl fingerprints match the strict form") {
    import graft.operators.{Dedup, Multimodal}
    // deterministic mono WAV; gain scales every sample - the
    // energy-delta fingerprint is amplitude-invariant (integer scaling
    // preserves every strict > between segment energies)
    def wavOf(seed: Long, gain: Int): Array[Byte] = {
      val samples = Array.tabulate(700) { i =>
        var z = seed * 1000L + i + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        (((z >>> 40) % 100L).toInt - 50) * gain
      }
      graft.kernel.Wav.encode(graft.kernel.Wav.Audio(8000, 1, 16, samples))
    }
    val plants: Seq[(Long, Array[Byte])] = Seq(
      1L -> wavOf(1L, 1), 2L -> wavOf(2L, 1), 3L -> wavOf(3L, 1),
      // batch: 20 = waveform 2 at triple gain (novel bytes, hamming 0);
      // 30 = unrelated
      20L -> wavOf(2L, 3),
      30L -> wavOf(9L, 1))
    val media = plants.toDF("doc_id", "payload")
      .select(col("doc_id"), lit("audio").as("media_type"), col("payload"))
    val fps = Multimodal.audioFingerprints(media)
      .select(col("doc_id"), col("audio_hash"))
      .localCheckpoint(true)

    val dir = tmp()
    HashIndex.build(fps.filter(col("doc_id") < 10)
      .withColumnRenamed("audio_hash", "hash"), dir)
    val served = Multimodal.audioNearDupsAgainstIndex(
        HashIndex.load(spark, dir), media.filter(col("doc_id") >= 10))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(served.contains((20L, 2L, 0)), served)
    assert(!served.exists(_._1 == 30L), served)

    // the live all-pairs form, restricted to cross (batch, corpus) pairs
    val live = Dedup.hammingNearDups(fps, "audio_hash", maxHamming = 2,
        keyBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .collect { case (a, b, h) if a < 10 && b >= 10 => (b, a, h) }
      .toSet
    assert(served == live, s"served $served vs live $live")

    // the crawl loop's LENIENT audio fingerprinter: same hashes bit for
    // bit as the strict form; undecodable containers skip
    val lenient = Multimodal.crawlAudioFingerprints(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val strict = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lenient == strict, s"lenient $lenient vs strict $strict")
    val junk = Seq((90L, "audio",
        graft.kernel.Mp3.encodeHeader(10, 128, 44100)))
      .toDF("doc_id", "media_type", "payload")
    assert(Multimodal.crawlAudioFingerprints(
      media.unionByName(junk)).count() == media.count())
  }
}
