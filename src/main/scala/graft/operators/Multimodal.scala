package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns beside typed metadata; decode / feature-extraction runs as a
  * batched partition-level kernel (`mapPartitions`), the same seam the
  * raster cogify kernel uses (SURVEY §2.2 A8: the canonical opaque heavy
  * UDF stage).
  *
  * Media decode is REAL: six pure-JVM codecs written from the public
  * container/bitstream specs (PNG, baseline+progressive JPEG, GIF, WAV,
  * Y4M, WebP/VP8L — `graft.kernel.{Png,Jpeg,Gif,Wav,Y4m,Webp}`) sit
  * behind the [[MediaDecoder]]/[[ImageDecoder]] seam, with [[PngDecoder]]
  * as the session default. Lossy codecs needing DCT/entropy machinery a
  * JVM-only build can't carry (VP8 pixel data, MP4/H.264, MP3/Opus) are
  * rejected LOUDLY at the same seam — never faked — but their CONTAINERS
  * are fully walked header-only (`kernel.{Mp4,Mp3,Ogg,Flac,Mkv}` + the
  * image sniff: structure, codecs, exact durations, dims, and the
  * declared text metadata — ID3v2/ID3v1 and Vorbis-comment title/artist
  * — via [[audioContainerMeta]]/[[videoContainerMeta]]/
  * [[ImageDecoder.sniff]]). [[FakeDecoder]] remains only as a pinned
  * oracle-baseline fixture: deterministic pseudo-features whose
  * SQL-derivability lets specific queries keep a DuckDB oracle.
  */
object Multimodal {
  /** Shared media-fixture id spine: the documents ids, repartitioned to
    * the session's parallelism BEFORE the per-row codec kernels run.
    * documents.parquet ships as ONE row group, so without this every
    * synthetic media fixture — and the image/audio/video encode+decode
    * work that follows it — runs as a chain of SINGLE-task jobs (r19
    * JobProbe: m16 = 13 jobs x 1 task, 10.9 s of serial codec work).
    * The guide §2.5 input-skew fix: repartition immediately after an
    * unsplittable input; the exchange carries 8-byte ids (noise next to
    * one image encode), the round-robin assignment is deterministic
    * (sort-before-repartition), and every consumer is row-local on
    * doc_id, so results are unchanged — only parallel. */
  private def docIds(s: SparkSession, d: String): Dataset[Long] = {
    import s.implicits._
    graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
  }


  /** A decoded media record: payload metadata + extracted features. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Int,
      sha: String,
      width: Int,
      height: Int,
      channel_mean: Double)

  // public: the Dataset encoder's generated code must reach the ctor
  final case class MediaIn(doc_id: Long, media_type: String, payload: Array[Byte])

  /** The media-codec seam: a production decoder (libjpeg/ffmpeg/… JNI
    * binding) implements these three calls and plugs in BY CLASS NAME —
    * the Spark-side kernel (schema, batching, partition lifecycle) never
    * changes. Implementations need a no-arg constructor: the kernel
    * instantiates ONE decoder per partition inside `mapPartitions` (≈
    * one codec context per task), so the class name, not the instance,
    * crosses the closure boundary — no Serializable demand on codec
    * handles. */
  trait MediaDecoder {
    /** payload → (width, height, channel mean). */
    def decode(payload: Array[Byte]): (Int, Int, Double)
    /** payload → (resized width, resized height, thumbnail bytes). */
    def resize(payload: Array[Byte]): (Int, Int, Array[Byte])
    /** payload → (width, height, grid×grid luminance block sums, row-major)
      * — the perceptual-hash input. Sums are EXACT integers (per-pixel
      * luminance = sum of color channels, alpha excluded; block
      * boundaries at `x*grid/w`), so hash bits derived from them are
      * engine-portable with no float rounding. */
    def blockSums(payload: Array[Byte], grid: Int): (Int, Int, Array[Long])
  }

  /** Session conf key naming the [[MediaDecoder]] implementation class;
    * defaults to the real pure-JVM [[PngDecoder]]. */
  val DecoderConfKey = "graft.media.decoder"

  /** The configured decoder class name for this session. */
  def decoderClass(spark: SparkSession): String =
    spark.conf.get(DecoderConfKey, classOf[PngDecoder].getName)

  private def instantiate(className: String): MediaDecoder =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[MediaDecoder]

  /** Real decoder: pure-JVM PNG via [[graft.kernel.Png]] (public spec,
    * java.util.zip inflate — no image library). Non-PNG payloads are
    * rejected loudly; a silent fake feature would be worse than an error.
    *
    * `channel_mean` is the mean over COLOR samples (alpha excluded;
    * palette expanded to RGB; 16-bit kept in 0..65535 sample units).
    * `resize` is a half-scale box filter (2×2 block average, floor) re-
    * encoded as 8-bit PNG — 16-bit sources scale down by `>> 8` first.
    */
  final class PngDecoder extends MediaDecoder {
    import graft.kernel.Png

    private def colorChannels(channels: Int): Int =
      if (channels == 2 || channels == 4) channels - 1 else channels

    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val img = Png.decode(payload)
      val cc = colorChannels(img.channels)
      var sum = 0L
      var i = 0
      while (i < img.samples.length) {
        if (i % img.channels < cc) sum += img.samples(i)
        i += 1
      }
      (img.width, img.height,
        sum.toDouble / (img.width.toLong * img.height * cc))
    }

    def blockSums(payload: Array[Byte], grid: Int): (Int, Int, Array[Long]) = {
      val img = Png.decode(payload)
      val cc = colorChannels(img.channels)
      val sums = new Array[Long](grid * grid)
      var y = 0
      while (y < img.height) {
        val by = y * grid / img.height
        var x = 0
        while (x < img.width) {
          val bx = x * grid / img.width
          var c = 0
          var lum = 0L
          while (c < cc) {
            lum += img.samples((y * img.width + x) * img.channels + c)
            c += 1
          }
          sums(by * grid + bx) += lum
          x += 1
        }
        y += 1
      }
      (img.width, img.height, sums)
    }

    def resize(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = Png.decode(payload)
      val rw = math.max(1, (img.width + 1) / 2)
      val rh = math.max(1, (img.height + 1) / 2)
      val ch = img.channels
      val out = new Array[Int](rw * rh * ch)
      val shift = if (img.bitDepth == 16) 8 else 0
      var y = 0
      while (y < rh) {
        var x = 0
        while (x < rw) {
          val x0 = x * 2; val y0 = y * 2
          val xN = math.min(2, img.width - x0)
          val yN = math.min(2, img.height - y0)
          var c = 0
          while (c < ch) {
            var sum = 0
            var dy = 0
            while (dy < yN) {
              var dx = 0
              while (dx < xN) {
                sum += (img.samples(((y0 + dy) * img.width + x0 + dx) * ch + c) >> shift)
                dx += 1
              }
              dy += 1
            }
            out((y * rw + x) * ch + c) = sum / (xN * yN)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      (rw, rh, Png.encode(Png.Image(rw, rh, ch, 8, out)))
    }
  }

  /** Real decoder: pure-JVM baseline JPEG via [[graft.kernel.Jpeg]]
    * (public T.81/JFIF spec — no image library). The crawl-dominant
    * image format; non-JPEG payloads are rejected loudly. Feature
    * semantics mirror [[PngDecoder]]: JPEG has no alpha, so every
    * channel is a color channel; `resize` is the same half-scale box
    * filter re-encoded as baseline 4:4:4 JPEG with flat quantization. */
  final class JpegDecoder extends MediaDecoder {
    import graft.kernel.Jpeg

    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val img = Jpeg.decode(payload)
      var sum = 0L
      var i = 0
      while (i < img.samples.length) { sum += img.samples(i); i += 1 }
      (img.width, img.height,
        sum.toDouble / (img.width.toLong * img.height * img.channels))
    }

    def blockSums(payload: Array[Byte], grid: Int): (Int, Int, Array[Long]) = {
      val img = Jpeg.decode(payload)
      val sums = new Array[Long](grid * grid)
      var y = 0
      while (y < img.height) {
        val by = y * grid / img.height
        var x = 0
        while (x < img.width) {
          val bx = x * grid / img.width
          var c = 0
          var lum = 0L
          while (c < img.channels) {
            lum += img.samples((y * img.width + x) * img.channels + c)
            c += 1
          }
          sums(by * grid + bx) += lum
          x += 1
        }
        y += 1
      }
      (img.width, img.height, sums)
    }

    def resize(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = Jpeg.decode(payload)
      val rw = math.max(1, (img.width + 1) / 2)
      val rh = math.max(1, (img.height + 1) / 2)
      val ch = img.channels
      val out = new Array[Int](rw * rh * ch)
      var y = 0
      while (y < rh) {
        var x = 0
        while (x < rw) {
          val x0 = x * 2; val y0 = y * 2
          val xN = math.min(2, img.width - x0)
          val yN = math.min(2, img.height - y0)
          var c = 0
          while (c < ch) {
            var sum = 0
            var dy = 0
            while (dy < yN) {
              var dx = 0
              while (dx < xN) {
                sum += img.samples(((y0 + dy) * img.width + x0 + dx) * ch + c)
                dx += 1
              }
              dy += 1
            }
            out((y * rw + x) * ch + c) = sum / (xN * yN)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      (rw, rh, Jpeg.encode(Jpeg.Image(rw, rh, ch, out)))
    }
  }

  /** Real decoder: pure-JVM GIF via [[graft.kernel.Gif]] (public spec —
    * no image library). Decode composites the FIRST frame (for still
    * images, the image itself) and always yields RGB, so feature
    * semantics mirror [[JpegDecoder]]. `resize` is the same half-scale
    * box filter — re-encoded as 8-bit PNG, not GIF, because box
    * averaging a palette image routinely exceeds 256 distinct colors
    * and the GIF encoder is exact-palette by contract (a thumbnail in a
    * different lossless container is honest; a silently quantized GIF
    * would not round-trip). */
  final class GifDecoder extends MediaDecoder {
    import graft.kernel.Gif

    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val img = Gif.decode(payload)
      var sum = 0L
      var i = 0
      while (i < img.samples.length) { sum += img.samples(i); i += 1 }
      (img.width, img.height,
        sum.toDouble / (img.width.toLong * img.height * img.channels))
    }

    def blockSums(payload: Array[Byte], grid: Int): (Int, Int, Array[Long]) = {
      val img = Gif.decode(payload)
      val sums = new Array[Long](grid * grid)
      var y = 0
      while (y < img.height) {
        val by = y * grid / img.height
        var x = 0
        while (x < img.width) {
          val bx = x * grid / img.width
          var c = 0
          var lum = 0L
          while (c < img.channels) {
            lum += img.samples((y * img.width + x) * img.channels + c)
            c += 1
          }
          sums(by * grid + bx) += lum
          x += 1
        }
        y += 1
      }
      (img.width, img.height, sums)
    }

    def resize(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = Gif.decode(payload)
      val rw = math.max(1, (img.width + 1) / 2)
      val rh = math.max(1, (img.height + 1) / 2)
      val ch = img.channels
      val out = new Array[Int](rw * rh * ch)
      var y = 0
      while (y < rh) {
        var x = 0
        while (x < rw) {
          val x0 = x * 2; val y0 = y * 2
          val xN = math.min(2, img.width - x0)
          val yN = math.min(2, img.height - y0)
          var c = 0
          while (c < ch) {
            var sum = 0
            var dy = 0
            while (dy < yN) {
              var dx = 0
              while (dx < xN) {
                sum += img.samples(((y0 + dy) * img.width + x0 + dx) * ch + c)
                dx += 1
              }
              dy += 1
            }
            out((y * rw + x) * ch + c) = sum / (xN * yN)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      (rw, rh, graft.kernel.Png.encode(graft.kernel.Png.Image(rw, rh, ch, 8, out)))
    }
  }

  /** Real decoder: pure-JVM lossless WebP via [[graft.kernel.Webp]]
    * (public VP8L spec — no image library). Feature semantics mirror
    * [[PngDecoder]]: alpha is metadata, not luminance, so it is
    * excluded from means/block sums — the same picture as RGBA PNG and
    * RGBA WebP must land on the same perceptual hash. Lossy VP8 rejects
    * loudly inside the kernel. */
  final class WebpDecoder extends MediaDecoder {
    import graft.kernel.Webp

    private def colorChannels(channels: Int): Int =
      if (channels == 4) 3 else channels

    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val img = Webp.decode(payload)
      val cc = colorChannels(img.channels)
      var sum = 0L
      var i = 0
      while (i < img.samples.length) {
        if (i % img.channels < cc) sum += img.samples(i)
        i += 1
      }
      (img.width, img.height,
        sum.toDouble / (img.width.toLong * img.height * cc))
    }

    def blockSums(payload: Array[Byte], grid: Int): (Int, Int, Array[Long]) = {
      val img = Webp.decode(payload)
      val cc = colorChannels(img.channels)
      val sums = new Array[Long](grid * grid)
      var y = 0
      while (y < img.height) {
        val by = y * grid / img.height
        var x = 0
        while (x < img.width) {
          val bx = x * grid / img.width
          var c = 0
          var lum = 0L
          while (c < cc) {
            lum += img.samples((y * img.width + x) * img.channels + c)
            c += 1
          }
          sums(by * grid + bx) += lum
          x += 1
        }
        y += 1
      }
      (img.width, img.height, sums)
    }

    def resize(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = Webp.decode(payload)
      val rw = math.max(1, (img.width + 1) / 2)
      val rh = math.max(1, (img.height + 1) / 2)
      val ch = img.channels
      val out = new Array[Int](rw * rh * ch)
      var y = 0
      while (y < rh) {
        var x = 0
        while (x < rw) {
          val x0 = x * 2; val y0 = y * 2
          val xN = math.min(2, img.width - x0)
          val yN = math.min(2, img.height - y0)
          var c = 0
          while (c < ch) {
            var sum = 0
            var dy = 0
            while (dy < yN) {
              var dx = 0
              while (dx < xN) {
                sum += img.samples(((y0 + dy) * img.width + x0 + dx) * ch + c)
                dx += 1
              }
              dy += 1
            }
            out((y * rw + x) * ch + c) = sum / (xN * yN)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      // half-scale thumbnail re-encoded losslessly in the same container
      (rw, rh, Webp.encode(Webp.Image(rw, rh, ch, out)))
    }
  }

  /** Format-sniffing image decoder — the real-crawl dispatch: a crawled
    * corpus mixes containers, and PIXELS, not container bytes, decide
    * duplication (the same picture saved as PNG, re-saved as JPEG,
    * exported as GIF, or re-encoded as WebP must land on the same
    * perceptual hash). Routes by file signature to [[PngDecoder]],
    * [[JpegDecoder]], [[GifDecoder]] or [[WebpDecoder]]; unknown
    * formats are rejected loudly (the DLQ contract at the kernel
    * boundary — a silent fake feature would poison the dedup tables). */
  final class ImageDecoder extends MediaDecoder {
    private val png = new PngDecoder
    private val jpeg = new JpegDecoder
    private val gif = new GifDecoder
    private val webp = new WebpDecoder
    private def route(payload: Array[Byte]): MediaDecoder =
      if (graft.kernel.Png.isPng(payload)) png
      else if (graft.kernel.Jpeg.isJpeg(payload)) jpeg
      else if (graft.kernel.Gif.isGif(payload)) gif
      else if (graft.kernel.Webp.isWebp(payload)) webp
      else if (graft.kernel.Mp4.isAvif(payload))
        throw new IllegalArgumentException(
          "AVIF (AV1 payload) pixel decode is not supported — metadata only")
      else throw new IllegalArgumentException(
        "unknown image format (not PNG, JPEG, GIF or WebP)")
    def decode(payload: Array[Byte]): (Int, Int, Double) =
      route(payload).decode(payload)
    def blockSums(payload: Array[Byte], grid: Int): (Int, Int, Array[Long]) =
      route(payload).blockSums(payload, grid)
    def resize(payload: Array[Byte]): (Int, Int, Array[Byte]) =
      route(payload).resize(payload)
  }

  object ImageDecoder {
    /** Header-only image metadata: container, codec flavor, whether the
      * PIXELS are decodable by this engine, and DISPLAY dims (JPEG EXIF
      * orientations 5–8 swap the stored axes — the same normalization
      * [[MediaDecoder.decode]] applies). */
    final case class ImageInfo(container: String, flavor: String,
        decodable: Boolean, width: Int, height: Int)

    /** Sniff + header parse, NO pixel decode — the metadata-table fast
      * path (m25), and the honest answer for containers whose headers
      * are readable but whose payloads are not (lossy VP8 WebP: the
      * dominant crawl flavor; dims are in the uncompressed keyframe
      * header, the DCT payload is out of a pure-JVM codec's scope). */
    def sniff(payload: Array[Byte]): ImageInfo = {
      import graft.kernel.{Gif, Jpeg, Png, Webp}
      if (Png.isPng(payload)) {
        val (w, h) = Png.headerDims(payload)
        ImageInfo("png", "", decodable = true, w, h)
      } else if (Jpeg.isJpeg(payload)) {
        val (w, h, o) = Jpeg.headerMeta(payload)
        val swap = o >= 5
        ImageInfo("jpeg", "", decodable = true,
          if (swap) h else w, if (swap) w else h)
      } else if (Gif.isGif(payload)) {
        val (w, h) = Gif.headerDims(payload)
        ImageInfo("gif", "", decodable = true, w, h)
      } else if (graft.kernel.Mp4.isAvif(payload)) {
        // AV1 payload decode is out of scope — dims from the
        // uncompressed ispe property box (the VP8-lossy rule)
        val (w, h) = graft.kernel.Mp4.avifDims(payload)
        ImageInfo("avif", "av1", decodable = false, w, h)
      } else if (Webp.isWebp(payload)) {
        val m = Webp.metadata(payload)
        // lossy pixels (DCT) and animated composites are both out of
        // the pure-JVM decode surface — header metadata only
        ImageInfo("webp", m.flavor,
          decodable = m.flavor == "lossless" && !m.animated,
          m.width, m.height)
      } else throw new IllegalArgumentException(
        "unknown image format (not PNG, JPEG, GIF or WebP)")
    }
  }

  /** Header-only AUDIO container dispatch — the m25/sniff rule for the
    * formats crawls actually serve under the audio content-type
    * family: MP3 frame walk, Ogg
    * (Opus/Vorbis id headers, CRC-verified pages), FLAC STREAMINFO,
    * and RIFF/WAV (whose PCM payload this engine can also fully
    * decode). Returns (container, codec, channels, sampleRate,
    * durationMs, title, artist) — the declared text metadata comes from
    * ID3v2/ID3v1 (MP3) and Vorbis comments (Ogg), "" where the
    * container carries none (WAV) or the walk doesn't read it (FLAC
    * STREAMINFO-only); unknown containers are loud. */
  def audioContainerMeta(payload: Array[Byte])
      : (String, String, Int, Int, Long, String, String) = {
    import graft.kernel.{Flac, Mp3, Ogg, Wav}
    if (Ogg.isOgg(payload)) {
      val m = Ogg.metadata(payload)
      ("ogg", m.codec, m.channels, m.sampleRate, m.durationMs,
        m.title, m.artist)
    } else if (Flac.isFlac(payload)) {
      val m = Flac.metadata(payload)
      ("flac", "flac", m.channels, m.sampleRate, m.durationMs,
        m.title, m.artist)
    } else if (payload.length >= 12 && payload(0) == 'R' &&
        payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
        payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' &&
        payload(11) == 'E') {
      val a = Wav.decode(payload)
      ("wav", "pcm", a.channels, a.sampleRate,
        a.samples.length.toLong / a.channels * 1000L / a.sampleRate, "", "")
    } else if (Mp3.isMp3(payload)) {
      val m = Mp3.metadata(payload)
      ("mp3", "mp3", m.channels, m.sampleRate, m.durationMs,
        m.title, m.artist)
    } else throw new IllegalArgumentException(
      "unknown audio container (not Ogg, FLAC, WAV or MP3)")
  }

  /** Header-only VIDEO container dispatch — the audio-side rule applied
    * to the two containers web video actually ships in: ISO BMFF / MP4
    * (box walk, [[graft.kernel.Mp4]]) and Matroska / WebM (EBML walk,
    * [[graft.kernel.Mkv]]). Returns (container, videoCodec, width,
    * height, durationMs) for the FIRST video track (0-dims for
    * audio-only containers; durationMs -1 for a live WebM with no
    * Duration element); compressed payloads stay undecodable by
    * contract, unknown containers are loud. */
  def videoContainerMeta(payload: Array[Byte])
      : (String, String, Int, Int, Long) = {
    import graft.kernel.{Mkv, Mp4}
    if (Mkv.isMkv(payload)) {
      val m = Mkv.metadata(payload)
      val v = m.video
      (m.docType, v.map(_.codecId).getOrElse(""),
        v.map(_.width).getOrElse(0), v.map(_.height).getOrElse(0),
        m.durationMs)
    } else if (Mp4.isMp4(payload)) {
      val m = Mp4.metadata(payload)
      val v = m.video
      ("mp4", v.map(_.codec).getOrElse(""), v.map(_.width).getOrElse(0),
        v.map(_.height).getOrElse(0), m.durationMs)
    } else throw new IllegalArgumentException(
      "unknown video container (not MP4/ISO-BMFF or Matroska/WebM)")
  }

  /** Header-only metadata over a crawl media table
    * ([[graft.sources.WarcSource.mediaResponses]] shape: url, family,
    * payload): images dispatch through [[ImageDecoder.sniff]], video
    * containers through [[videoContainerMeta]] (MP4 + Matroska/WebM),
    * audio through [[audioContainerMeta]] — one row-local map, the
    * media bytes never cross an exchange. `decodable` reports whether this engine
    * can produce PIXELS/SAMPLES (true only for the image codecs it
    * carries; AV payload decode is loudly out of scope). */
  def crawlMediaMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("url"), col("family"), col("payload"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (url, family, p) =>
          family match {
            case "image" =>
              val i = ImageDecoder.sniff(p)
              (url, family, i.container, i.decodable, i.width, i.height, 0L)
            case "video" =>
              val (container, _, w, h, durationMs) = videoContainerMeta(p)
              (url, family, container, false, w, h, durationMs)
            case "audio" =>
              val (container, _, _, _, durationMs, _, _) =
                audioContainerMeta(p)
              (url, family, container, container == "wav", 0, 0, durationMs)
            case other =>
              throw new IllegalArgumentException(s"unknown media family '$other'")
          }
        }
      }
      .toDF("url", "family", "container", "decodable", "width", "height",
        "duration_ms")
  }

  /** STUB decoder (test/offline baseline — the driver corpus carries text
    * stand-in payloads, not decodable media): derives deterministic fake
    * dimensions/stats from the payload's sha-256 digest so the pipeline
    * shape is testable offline AND every feature is SQL-derivable (the
    * m02 oracle recomputes them from hex slices of the digest).
    */
  final class FakeDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val md = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
      val width = 64 + (((md(0) & 0xff) << 8 | (md(1) & 0xff)) % 1024)
      val height = 64 + (((md(2) & 0xff) << 8 | (md(3) & 0xff)) % 1024)
      // fake "channel mean" in [0, 256): digest bytes 4-5 scaled — an
      // arbitrary deterministic stand-in, like width/height
      val mean = (((md(4) & 0xff) << 8 | (md(5) & 0xff)) % 25600) / 100.0
      (width, height, mean)
    }

    /** STUB resize: halves the decoded dimensions and keeps the first
      * ⌈len/4⌉ payload bytes as the "thumbnail" (a real implementation
      * hands the codec a target box). Deterministic AND SQL-derivable,
      * so the resize stage is oracle-gated like decode. */
    def resize(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      val (w, h, _) = decode(payload)
      val thumbLen = (payload.length + 3) / 4
      (w / 2, h / 2, java.util.Arrays.copyOf(payload, thumbLen))
    }

    /** STUB block sums: digest-derived pseudo-sums (same digest → same
      * tile), so identical payloads still hash identically through the
      * perceptual-hash pipeline offline. */
    def blockSums(payload: Array[Byte], grid: Int): (Int, Int, Array[Long]) = {
      val (w, h, _) = decode(payload)
      val md = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
      val sums = Array.tabulate(grid * grid)(i =>
        ((md(i % md.length) & 0xff).toLong << 8 | (md((i * 7 + 3) % md.length) & 0xff)))
      (w, h, sums)
    }
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString

  /** The batched decode stage: binary column in, feature struct out.
    * Partition-level so decoder setup amortizes across the batch — the
    * shape a Pandas-UDF/`mapInPandas` stage has in PySpark.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] =
    decodeFeaturesWith(media, decoderClass(media.sparkSession))

  /** [[decodeFeatures]] with an explicit [[MediaDecoder]] class. */
  def decodeFeaturesWith(media: DataFrame,
      decoderCls: String): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        val decoder = instantiate(decoderCls) // one per partition/batch
        val sha256 = java.security.MessageDigest.getInstance("SHA-256")
        it.map { m =>
          val (w, h, mean) = decoder.decode(m.payload)
          MediaFeatures(m.doc_id, m.media_type, m.payload.length,
            hex(sha256.digest(m.payload)), w, h, mean)
        }
      }
  }

  /** The batched resize stage through the same partition kernel: binary
    * in, binary (thumbnail) out plus new dimensions — returned with
    * content hashes so the stage is oracle-checkable. */
  def resizeMedia(media: DataFrame): DataFrame =
    resizeMediaWith(media, decoderClass(media.sparkSession))

  /** [[resizeMedia]] with an explicit [[MediaDecoder]] class. */
  def resizeMediaWith(media: DataFrame, decoderCls: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        val decoder = instantiate(decoderCls)
        val sha256 = java.security.MessageDigest.getInstance("SHA-256")
        it.map { m =>
          val (rw, rh, thumb) = decoder.resize(m.payload)
          (m.doc_id, rw, rh, thumb.length, hex(sha256.digest(thumb)))
        }
      }
      .toDF("doc_id", "r_width", "r_height", "thumb_len", "thumb_sha")
  }

  /** Per-image perceptual hash (average-hash family) through the batched
    * decode kernel: decode → `grid`×`grid` integer luminance block sums →
    * bit per block set iff `blockSum · grid² > totalSum` (strict — the
    * scale-free comparison stays in exact integers, so the SAME bits come
    * out of any engine that can see the pixels) → one byte per grid row
    * (`row_bytes`) plus the 64-bit packed form (`img_hash`, grid 8).
    * Re-encodes of the same pixels hash identically regardless of the
    * compressed byte stream; small edits flip few bits, which is what
    * makes hamming distance the image near-dup metric. */
  def imageHashes(media: DataFrame, grid: Int = 8): DataFrame =
    imageHashesWith(media, decoderClass(media.sparkSession), grid)

  /** [[imageHashes]] with an explicit [[MediaDecoder]] class. */
  def imageHashesWith(media: DataFrame, decoderCls: String,
      grid: Int = 8): DataFrame = {
    require(grid >= 1 && grid <= 8, s"grid $grid outside 1..8 (64-bit packing)")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        val decoder = instantiate(decoderCls)
        it.map { m =>
          val (w, h, sums) = decoder.blockSums(m.payload, grid)
          val total = sums.sum
          val n = grid * grid
          val rowBytes = Array.tabulate(grid) { by =>
            var b = 0
            var bx = 0
            while (bx < grid) {
              if (sums(by * grid + bx) * n > total) b |= 1 << bx
              bx += 1
            }
            b
          }
          var hash = 0L
          var i = 0
          while (i < grid) { hash |= rowBytes(i).toLong << (8 * i); i += 1 }
          (m.doc_id, w, h, rowBytes.toSeq, hash)
        }
      }
      .toDF("doc_id", "width", "height", "row_bytes", "img_hash")
  }

  /** Image near-duplicate pairs: perceptual hashes through the SAME
    * banded-hamming screen-and-verify machinery simhash uses
    * ([[Dedup.hammingNearDups]] — rotated key windows, capBuckets skew
    * guard, exact `bit_count(xor)` verdict). Catches re-encodes, minor
    * crops/edits, brightness tweaks — the image-side dedup a multimodal
    * training corpus needs where byte-level dedup sees distinct files. */
  def imageNearDups(media: DataFrame, maxHamming: Int = 2,
      keyBits: Int = 0, maxBucket: Int = 100, sigCount: Long = -1L): DataFrame =
    imageNearDupsWith(media, decoderClass(media.sparkSession),
      maxHamming, keyBits, maxBucket, sigCount)

  /** [[imageNearDups]] with an explicit [[MediaDecoder]] class.
    * `sigCount` (when >= 0) supplies the corpus cardinality for LSH key
    * sizing — pass it when the caller knows the count from a frame
    * UPSTREAM of the encode/decode kernel (one hash per payload, so the
    * cardinalities match); counting `media` itself executes the whole
    * media-synthesis/decode lineage once extra just to size keys. */
  def imageNearDupsWith(media: DataFrame, decoderCls: String,
      maxHamming: Int = 2, keyBits: Int = 0, maxBucket: Int = 100,
      sigCount: Long = -1L): DataFrame =
    Dedup.hammingNearDups(
      imageHashesWith(media, decoderCls).select(col("doc_id"), col("img_hash")),
      "img_hash", maxHamming, keyBits = keyBits, maxBucket = maxBucket,
      // LSH key sizing counts a cheap frame (same cardinality: one hash
      // per payload) so the decode kernel runs once, not twice; an
      // explicit keyBits makes the count unused — skip it entirely
      sigCount = if (keyBits > 0) 0L
        else if (sigCount >= 0) sigCount else media.count())

  /** Audio feature extraction through the same batched partition kernel
    * shape as the image path: parse RIFF/PCM ([[graft.kernel.Wav]] —
    * real pure-JVM decode, not a stub), emit exact-integer features
    * (sample sum, absolute sum, peak) so the stage is engine-portable
    * and oracle-checkable. Float features (RMS, spectra) belong in a
    * downstream projection over these integers. */
  /** Decode a supported LOSSLESS audio container to PCM: RIFF/WAV, or
    * FLAC through the full frame decode ([[graft.kernel.Flac.decodeAudio]]
    * — FLAC is lossless, so its samples are exactly recoverable, unlike
    * the MP3/Ogg/MP4 lossy containers which stay header-only by the
    * loud out-of-scope rule). Container sniffed by magic. */
  private[operators] def decodeAudioAny(payload: Array[Byte]): graft.kernel.Wav.Audio =
    if (graft.kernel.Flac.isFlac(payload)) graft.kernel.Flac.decodeAudio(payload)
    else graft.kernel.Wav.decode(payload)

  def audioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        it.map { m =>
          val a = decodeAudioAny(m.payload)
          var sum = 0L; var absSum = 0L; var peak = 0L
          var i = 0
          while (i < a.samples.length) {
            val s = a.samples(i)
            sum += s
            val ab = math.abs(s.toLong)
            absSum += ab
            if (ab > peak) peak = ab
            i += 1
          }
          (m.doc_id, a.sampleRate, a.channels, a.samples.length.toLong,
            sum, absSum, peak)
        }
      }
      .toDF("doc_id", "sample_rate", "n_channels", "n_samples",
        "pcm_sum", "pcm_abs_sum", "peak")
  }

  /** Audio fingerprint (Shazam-lite energy-delta hash): the decoded
    * sample stream splits into `frames` segments (floor boundaries
    * `k·n/frames` — the 1-D form of the image hash's block scheme), each
    * segment's energy is the exact integer Σ|s|, and bit k is set iff
    * `energy(k+1) > energy(k)`. 65 segments → 64 delta bits, packed one
    * byte per 8 bits (`row_bytes`) plus the 64-bit form (`audio_hash`).
    *
    * The comparison chain makes the fingerprint AMPLITUDE-invariant by
    * construction (volume scales every energy in proportion, the
    * greater-than chain is unchanged) — the audio analog of the image
    * hash's brightness-shift invariance — and all-integer, so the bits
    * are engine-portable and m11 is oracle-gated. */
  /** The energy-delta bit math shared by [[audioFingerprints]] and the
    * crawl loop's lenient form: per-segment exact Σ|s| energies, bit k
    * set iff energy(k+1) > energy(k), packed LSB-first per byte. */
  private def energyDeltaBytes(samples: Array[Int], frames: Int): Array[Int] = {
    val n = samples.length
    val energy = new Array[Long](frames)
    var i = 0
    while (i < n) {
      energy(((i.toLong * frames) / n).toInt) += math.abs(samples(i).toLong)
      i += 1
    }
    val nBits = frames - 1
    val rowBytes = new Array[Int]((nBits + 7) / 8)
    var k = 0
    while (k < nBits) {
      if (energy(k + 1) > energy(k)) rowBytes(k / 8) |= 1 << (k % 8)
      k += 1
    }
    rowBytes
  }

  private def packHash64(rowBytes: Array[Int]): Long = {
    var hash = 0L
    var r = 0
    while (r < rowBytes.length) { hash |= rowBytes(r).toLong << (8 * r); r += 1 }
    hash
  }

  def audioFingerprints(media: DataFrame, frames: Int = 65): DataFrame = {
    require(frames >= 2 && frames <= 65, s"frames $frames outside 2..65")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        it.map { m =>
          val a = decodeAudioAny(m.payload)
          val n = a.samples.length
          require(n >= frames, s"doc ${m.doc_id}: $n samples < $frames frames")
          val rowBytes = energyDeltaBytes(a.samples, frames)
          (m.doc_id, n.toLong, rowBytes.toSeq, packHash64(rowBytes))
        }
      }
      .toDF("doc_id", "n_samples", "row_bytes", "audio_hash")
  }

  /** [[imageHashes]] for CRAWLED images — the htmlResponses lenient
    * contract applied to the perceptual-hash stage: payloads in a
    * container this engine can't decode to pixels (AVIF, lossy WebP,
    * truncated streams) SKIP the row instead of failing the batch.
    * Returns (doc_id, hash) — the [[HashIndex]] signature shape. */
  def crawlImageHashes(media: DataFrame, grid: Int = 8): DataFrame = {
    require(grid >= 1 && grid <= 8, s"grid $grid outside 1..8")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decoder = new ImageDecoder
        it.flatMap { case (id, p) =>
          try {
            val (_, _, sums) = decoder.blockSums(p, grid)
            val total = sums.sum
            val n = grid * grid
            var hash = 0L
            var i = 0
            while (i < n) {
              // the [[imageHashesWith]] packing: bit (by, bx) at
              // position 8·by + bx (identity at grid 8) — parity with
              // the strict form is spec-pinned
              if (sums(i) * n > total) hash |= 1L << (8 * (i / grid) + i % grid)
              i += 1
            }
            Some((id, hash))
          } catch { case _: IllegalArgumentException => None }
        }
      }
      .toDF("doc_id", "hash")
  }

  /** [[audioFingerprints]] for CRAWLED audio — the htmlResponses
    * lenient contract applied to the fingerprint stage: decodable WAV
    * and FLAC payloads with ≥ `frames` samples fingerprint (FLAC is
    * lossless — a WAV→FLAC re-post decodes to the same PCM and the
    * same fingerprint); lossy MP3/Ogg (decode loudly out of scope) and
    * malformed or too-short streams SKIP the row instead of failing
    * the batch. Returns (doc_id, hash) — the [[HashIndex]] signature
    * shape. */
  def crawlAudioFingerprints(media: DataFrame,
      frames: Int = 65): DataFrame = {
    require(frames >= 2 && frames <= 65, s"frames $frames outside 2..65")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          try {
            // WAV or FLAC (full lossless frame decode since r17) — a
            // WAV→FLAC re-encode decodes to identical PCM, so it lands
            // on the SAME fingerprint the stored index already holds
            val a = decodeAudioAny(p)
            if (a.samples.length < frames) None
            else Some((id, packHash64(energyDeltaBytes(a.samples, frames))))
          } catch { case _: IllegalArgumentException => None }
        }
      }
      .toDF("doc_id", "hash")
  }

  /** Audio near-duplicate pairs: fingerprints through the shared banded
    * hamming machinery ([[Dedup.hammingNearDups]]) — catches re-encodes
    * and volume changes of the same recording. */
  def audioNearDups(media: DataFrame, maxHamming: Int = 2,
      keyBits: Int = 0, maxBucket: Int = 100): DataFrame =
    Dedup.hammingNearDups(
      audioFingerprints(media).select(col("doc_id"), col("audio_hash")),
      "audio_hash", maxHamming, keyBits = keyBits, maxBucket = maxBucket,
      // count the raw frame, not the decoded one (see imageNearDupsWith);
      // unused when keyBits is explicit — skip the extra pass
      sigCount = if (keyBits > 0) 0L else media.count())

  /** Audio activity segmentation — the VAD-shaped primitive a speech
    * training pipeline runs before transcription/feature models: split
    * the waveform into fixed frames, call a frame ACTIVE when its mean
    * absolute amplitude reaches `num/den`, and emit one row per maximal
    * run of active frames (segment bounds, frame count, energy). The
    * m23 scene-cut idea for the audio modality; every verdict is exact
    * integer arithmetic (`energy·den ≥ num·samples`), so segmentation
    * is engine-reproducible and oracle-checkable (gaps-and-islands in
    * SQL). Decode and the run walk live in the partition kernel. */
  def audioSegments(media: DataFrame, frameLen: Int = 256, num: Int = 100,
      den: Int = 1): DataFrame = {
    require(frameLen >= 1 && num >= 0 && den > 0,
      s"frameLen $frameLen threshold $num/$den")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        it.flatMap { m =>
          val a = decodeAudioAny(m.payload)
          val n = a.samples.length
          val nf = (n + frameLen - 1) / frameLen
          val e = new Array[Long](nf)
          val c = new Array[Int](nf)
          var i = 0
          while (i < n) {
            e(i / frameLen) += math.abs(a.samples(i).toLong)
            c(i / frameLen) += 1
            i += 1
          }
          val segs = Seq.newBuilder[(Long, Int, Int, Int, Int, Long)]
          var f = 0
          var segStart = -1
          var segE = 0L
          var segIdx = 0
          while (f <= nf) {
            val active = f < nf && e(f) * den >= num.toLong * c(f)
            if (active) {
              if (segStart < 0) { segStart = f; segE = 0L }
              segE += e(f)
            } else if (segStart >= 0) {
              segs += ((m.doc_id, segIdx, segStart, f - 1, f - segStart, segE))
              segIdx += 1
              segStart = -1
            }
            f += 1
          }
          segs.result()
        }
      }
      .toDF("doc_id", "seg_idx", "start_frame", "end_frame", "n_frames",
        "energy")
  }

  /** Active-clip EXTRACTION — the payload half of [[audioSegments]]
    * (m24 decides, this materializes): each maximal active run leaves
    * the task as a self-contained 16-bit WAV ([[graft.kernel.Wav]]),
    * the unit a speech pipeline feeds to transcription/feature models —
    * the m26 keyframe treatment for the audio modality. Decode, the
    * run walk, and the clip encode stay inside the partition kernel;
    * only clip payloads cross an exchange, never whole recordings. */
  def audioClips(media: DataFrame, frameLen: Int = 256, num: Int = 100,
      den: Int = 1): DataFrame = {
    require(frameLen >= 1 && num >= 0 && den > 0,
      s"frameLen $frameLen threshold $num/$den")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        it.flatMap { m =>
          val a = decodeAudioAny(m.payload)
          require(a.channels == 1,
            s"doc ${m.doc_id}: audioClips slices mono streams; " +
              s"${a.channels}-channel input must be downmixed upstream")
          val n = a.samples.length
          val nf = (n + frameLen - 1) / frameLen
          val e = new Array[Long](nf)
          val c = new Array[Int](nf)
          var i = 0
          while (i < n) {
            e(i / frameLen) += math.abs(a.samples(i).toLong)
            c(i / frameLen) += 1
            i += 1
          }
          val out = Seq.newBuilder[(Long, Int, Int, Int, Array[Byte])]
          var f = 0
          var segStart = -1
          var segIdx = 0
          while (f <= nf) {
            val active = f < nf && e(f) * den >= num.toLong * c(f)
            if (active && segStart < 0) segStart = f
            else if (!active && segStart >= 0) {
              val from = segStart * frameLen
              val until = math.min(f * frameLen, n)
              out += ((m.doc_id, segIdx, from, until - from,
                graft.kernel.Wav.encode(graft.kernel.Wav.Audio(
                  a.sampleRate, a.channels, 16,
                  java.util.Arrays.copyOfRange(a.samples, from, until)))))
              segIdx += 1
              segStart = -1
            }
            f += 1
          }
          out.result()
        }
      }
      .toDF("doc_id", "seg_idx", "start_sample", "n_samples", "wav")
  }

  /** Real video frame sampling: parse Y4M ([[graft.kernel.Y4m]]), keep
    * every `stride`-th frame (the m05 decimation, now over REAL frames
    * instead of byte slices), and emit exact-integer luma-plane stats
    * per sampled frame — the decode-then-featurize shape a video
    * training pipeline runs before per-frame models. One input row fans
    * out to one row per sampled frame inside the partition kernel; the
    * raw planes never leave the task. */
  def videoFrameStats(media: DataFrame, stride: Int = 2): DataFrame = {
    require(stride >= 1, s"stride $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        it.flatMap { m =>
          val v = graft.kernel.Y4m.decode(m.payload)
          val n = v.width * v.height // luma plane leads every layout
          v.frames.iterator.zipWithIndex
            .filter(_._2 % stride == 0)
            .map { case (f, idx) =>
              var sum = 0L; var mn = 255; var mx = 0
              var i = 0
              while (i < n) {
                val b = f(i) & 0xff
                sum += b
                if (b < mn) mn = b
                if (b > mx) mx = b
                i += 1
              }
              (m.doc_id, idx, v.width, v.height, sum, mn, mx)
            }
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height",
        "luma_sum", "luma_min", "luma_max")
  }

  /** Video perceptual fingerprint — the m08 aHash idea grown a TEMPORAL
    * axis (the classic video-hash cube): frames fall into `tGrid` equal
    * temporal buckets, each frame's luma plane into `sGrid`×`sGrid`
    * spatial cells, and bit (t, cy, cx) asks whether that cell's luma
    * mass beats its temporal bucket's average cell. The comparison is
    * ratio-form, so the fingerprint is invariant to global brightness /
    * gain scaling (re-encodes, levels tweaks) exactly like m08's image
    * bits and m11's audio bits — and every bit is exact integer
    * arithmetic, so an independent engine can recompute the whole hash.
    * Emits both the 64-char bit string (driver-comparable scalar — the
    * m08 row_bytes lesson) and the packed 64-bit hash for the banded
    * hamming pair machinery. Decode runs inside the partition kernel;
    * raw planes never leave the task. */
  def videoFingerprints(media: DataFrame, tGrid: Int = 4,
      sGrid: Int = 4): DataFrame = {
    require(tGrid >= 1 && sGrid >= 1 && tGrid * sGrid * sGrid <= 64,
      s"tGrid $tGrid x sGrid $sGrid^2 exceeds 64-bit packing")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        it.map { m =>
          val v = graft.kernel.Y4m.decode(m.payload)
          val nf = v.frames.length
          require(nf >= tGrid,
            s"doc ${m.doc_id}: $nf frames < $tGrid temporal buckets")
          require(v.width % sGrid == 0 && v.height % sGrid == 0,
            s"doc ${m.doc_id}: ${v.width}x${v.height} not divisible by $sGrid")
          val (bits, hash) = videoCubeBits(v, tGrid, sGrid)
          (m.doc_id, nf, v.width, v.height, bits, hash)
        }
      }
      .toDF("doc_id", "n_frames", "width", "height", "hash_bits",
        "video_hash")
  }

  /** The temporal×spatial cube computation [[videoFingerprints]] and
    * [[crawlVideoFingerprints]] share bit for bit. Callers must have
    * checked `frames.length >= tGrid` and `width/height % sGrid == 0`. */
  private def videoCubeBits(v: graft.kernel.Y4m.Video, tGrid: Int,
      sGrid: Int): (String, Long) = {
    val nf = v.frames.length
    val cw = v.width / sGrid; val ch = v.height / sGrid
    val nCells = sGrid * sGrid
    val cells = new Array[Long](tGrid * nCells)
    var f = 0
    while (f < nf) {
      val t = ((f.toLong * tGrid) / nf).toInt
      val frame = v.frames(f) // luma plane leads every layout
      var y = 0
      while (y < v.height) {
        val rowBase = (t * sGrid + y / ch) * sGrid
        var x = 0
        while (x < v.width) {
          cells(rowBase + x / cw) += frame(y * v.width + x) & 0xff
          x += 1
        }
        y += 1
      }
      f += 1
    }
    val bits = new Array[Char](tGrid * nCells)
    var hash = 0L
    var t = 0
    while (t < tGrid) {
      var total = 0L
      var c = 0
      while (c < nCells) { total += cells(t * nCells + c); c += 1 }
      c = 0
      while (c < nCells) {
        val k = t * nCells + c
        if (cells(k) * nCells > total) { bits(k) = '1'; hash |= 1L << k }
        else bits(k) = '0'
        c += 1
      }
      t += 1
    }
    (new String(bits), hash)
  }

  /** [[videoFingerprints]] for CRAWLED video — the htmlResponses lenient
    * contract applied to the fingerprint stage: only decodable Y4M
    * payloads with at least `tGrid` frames and dims divisible by `sGrid`
    * fingerprint; compressed AV containers (MP4/Matroska — bitstream
    * decode is loudly out of scope, m30's walk is header-only), malformed
    * streams, and too-short or ragged clips SKIP the row instead of
    * failing the batch. Gain/brightness-scaled re-encodes keep the SAME
    * fingerprint (ratio-form bits), which is exactly what the crawl
    * loop's video screen exists to catch. Returns (doc_id, hash) — the
    * [[HashIndex]] signature shape. */
  def crawlVideoFingerprints(media: DataFrame, tGrid: Int = 4,
      sGrid: Int = 4): DataFrame = {
    require(tGrid >= 1 && sGrid >= 1 && tGrid * sGrid * sGrid <= 64,
      s"tGrid $tGrid x sGrid $sGrid^2 exceeds 64-bit packing")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          try {
            val v = graft.kernel.Y4m.decode(p)
            if (v.frames.length < tGrid || v.width % sGrid != 0 ||
                v.height % sGrid != 0) None
            else Some((id, videoCubeBits(v, tGrid, sGrid)._2))
          } catch { case _: IllegalArgumentException => None }
        }
      }
      .toDF("doc_id", "hash")
  }

  /** Video near-duplicate pairs: fingerprints through the shared banded
    * hamming machinery ([[Dedup.hammingNearDups]]) — catches re-encodes
    * and brightness/gain changes of the same footage, the video-side
    * dedup a multimodal training corpus needs where byte-level dedup
    * sees distinct files. `sigCount` as in [[imageNearDupsWith]]: pass
    * the known corpus count so the decode kernel runs once. */
  def videoNearDups(media: DataFrame, maxHamming: Int = 2,
      keyBits: Int = 0, maxBucket: Int = 100, sigCount: Long = -1L): DataFrame =
    Dedup.hammingNearDups(
      videoFingerprints(media).select(col("doc_id"), col("video_hash")),
      "video_hash", maxHamming, keyBits = keyBits, maxBucket = maxBucket,
      sigCount = if (keyBits > 0) 0L
        else if (sigCount >= 0) sigCount else media.count())

  /** Video scene-cut detection — the keyframe-sampling primitive: a
    * training pipeline samples frames at SCENE CHANGES, not on a blind
    * stride (m05/m13), or it wastes its frame budget inside static
    * shots and misses short ones. Per consecutive frame pair compute
    * the luma SAD (sum of absolute differences); frame f starts a new
    * scene when the mean absolute delta is at least `num/den` luma
    * units (default 12): `sad·den ≥ num·pixels`, an exact integer
    * comparison, so every verdict is
    * engine-reproducible and the whole operator oracle-checkable.
    * Frame 0 always starts a scene. Decode and the frame-pair walk run
    * inside the partition kernel; planes never leave the task. */
  def videoSceneCuts(media: DataFrame, num: Int = 12,
      den: Int = 1): DataFrame = {
    require(num >= 0 && den > 0, s"threshold $num/$den")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        it.flatMap { m =>
          val v = graft.kernel.Y4m.decode(m.payload)
          val n = v.width * v.height // luma plane leads every layout
          v.frames.iterator.zipWithIndex.map { case (f, idx) =>
            if (idx == 0) (m.doc_id, 0, 0L, true)
            else {
              val prev = v.frames(idx - 1)
              var sad = 0L
              var i = 0
              while (i < n) {
                sad += math.abs((f(i) & 0xff) - (prev(i) & 0xff))
                i += 1
              }
              (m.doc_id, idx, sad, sad * den >= num.toLong * n)
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "sad", "is_cut")
  }

  /** Keyframe EXTRACTION — the payload-producing half of scene-cut
    * sampling ([[videoSceneCuts]] decides, this materializes): each
    * scene's first frame leaves the task as a self-contained grayscale
    * PNG ([[graft.kernel.Png]]), the artifact an image-model training
    * pipeline ingests downstream (the m-family image operators run on
    * these directly — keyframes feed m07/m08 unchanged). Decode, SAD
    * walk, and PNG encode all stay inside the partition kernel; only
    * the (small) keyframe payloads cross an exchange, never full
    * clips. */
  def videoKeyframes(media: DataFrame, num: Int = 12,
      den: Int = 1): DataFrame = {
    require(num >= 0 && den > 0, s"threshold $num/$den")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        it.flatMap { m =>
          val v = graft.kernel.Y4m.decode(m.payload)
          val n = v.width * v.height
          v.frames.iterator.zipWithIndex.flatMap { case (f, idx) =>
            val cut =
              if (idx == 0) true
              else {
                val prev = v.frames(idx - 1)
                var sad = 0L
                var i = 0
                while (i < n) {
                  sad += math.abs((f(i) & 0xff) - (prev(i) & 0xff))
                  i += 1
                }
                sad * den >= num.toLong * n
              }
            if (!cut) None
            else {
              val luma = Array.tabulate(n)(i => f(i) & 0xff)
              Some((m.doc_id, idx, v.width, v.height,
                graft.kernel.Png.encode(
                  graft.kernel.Png.Image(v.width, v.height, 1, 8, luma))))
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height", "png")
  }

  /** CROSS-MODALITY dedup: which videos contain known images? Keyframes
    * ([[videoKeyframes]]) hash through the SAME perceptual-hash kernel
    * as the image corpus ([[imageHashesWith]]), and the shared banded
    * hamming machinery pairs them — a video whose scene start is a
    * known image (slideshows, stills re-encoded as clips, meme videos)
    * surfaces without any video-vs-video comparison. Keyframe rows ride
    * a composite id namespace (video·10⁶ + frame, image ids negated) so
    * ONE pair join covers both modalities; same-modality pairs are
    * filtered out. Returns (video_id, frame_idx, image_id, hamming). */
  def videoImageMatches(videos: DataFrame, images: DataFrame,
      maxHamming: Int = 0, num: Int = 12, den: Int = 1,
      keyBits: Int = 0, maxBucket: Int = 100,
      sigCount: Long = -1L): DataFrame = {
    val FrameCap = 1000000L
    val kf = videoKeyframes(videos, num, den)
    val kfMedia = kf.select(
      when(col("frame_idx") < FrameCap && col("doc_id") >= 0,
          col("doc_id") * FrameCap + col("frame_idx"))
        .otherwise(raise_error(concat(lit("videoImageMatches: id namespace "),
          lit("overflow at video "), col("doc_id").cast("string")))
          .cast("long"))
        .as("doc_id"),
      lit("image").as("media_type"), col("png").as("payload"))
    val vHashes = imageHashesWith(kfMedia, classOf[PngDecoder].getName)
      .select(col("doc_id"), col("img_hash"))
    val iHashes = imageHashesWith(images, decoderClass(images.sparkSession))
      .select(
        // same loudness as the video side: a negative image doc_id would
        // map through -id-1 INTO the positive keyframe namespace and
        // misattribute matches
        when(col("doc_id") >= 0, -col("doc_id") - 1)
          .otherwise(raise_error(concat(
            lit("videoImageMatches: negative image doc_id "),
            col("doc_id").cast("string"))).cast("long"))
          .as("doc_id"),
        col("img_hash"))
    val pairs = Dedup.hammingNearDups(
      vHashes.union(iHashes), "img_hash", maxHamming,
      keyBits = keyBits, maxBucket = maxBucket,
      sigCount = if (keyBits > 0) 0L
        else if (sigCount >= 0) sigCount
        else videos.count() * 2 + images.count())
    // doc_a < doc_b, so a cross pair always lands image (negative) on
    // the a side and keyframe (positive) on the b side
    pairs.filter(col("doc_a") < 0 && col("doc_b") >= 0)
      .select(expr(s"doc_b div $FrameCap").as("video_id"),
        (col("doc_b") % FrameCap).cast("int").as("frame_idx"),
        (-col("doc_a") - 1).as("image_id"),
        col("hamming"))
  }

  /** Animated-GIF frame sampling — the m13 shape over the third real
    * video-ish container: composite frames via [[graft.kernel.Gif]]
    * (transparency and disposal applied, so stats describe what a
    * viewer SEES per frame, not raw sub-rects), keep every `stride`-th
    * composited frame, and emit exact-integer RGB stats. One input row
    * fans out per sampled frame inside the partition kernel; canvases
    * never leave the task. */
  def gifFrameStats(media: DataFrame, stride: Int = 2): DataFrame = {
    require(stride >= 1, s"stride $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaIn]
      .mapPartitions { it =>
        it.flatMap { m =>
          val anim = graft.kernel.Gif.decodeFrames(m.payload)
          anim.frames.iterator.zipWithIndex
            .filter(_._2 % stride == 0)
            .map { case (f, idx) =>
              var sum = 0L; var mn = 255; var mx = 0
              var i = 0
              while (i < f.length) {
                val v = f(i)
                sum += v
                if (v < mn) mn = v
                if (v > mx) mx = v
                i += 1
              }
              (m.doc_id, idx, anim.width, anim.height, sum, mn, mx)
            }
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height",
        "rgb_sum", "v_min", "v_max")
  }

  /** [[imageNearDups]] served from the STORED fingerprint index
    * ([[HashIndex]]) — the r04/r05→r08/r09 amortization applied to the
    * media family: the corpus's perceptual hashes persist once; each
    * arriving batch decodes ONLY its own images, probes the index, and
    * never re-hashes or re-shuffles the corpus. Returns
    * (doc_id, corpus_id, hamming ≤ maxHamming). */
  def imageNearDupsAgainstIndex(ix: HashIndex.Loaded, media: DataFrame,
      decoderCls: String, maxHamming: Int = 2,
      maxBucket: Int = 100): DataFrame =
    HashIndex.probe(ix,
      imageHashesWith(media, decoderCls)
        .select(col("doc_id"), col("img_hash").as("hash")),
      maxHamming, maxBucket)

  /** The m16/m37 fixture: one image per doc, 64×64 of 8×8 tiles (each
    * hash cell is exactly one tile, so the 64 hash bits vary
    * independently — smaller tilings would collapse "unique" images
    * onto a handful of hashes and explode the pair join). ids in the
    * mod-97/89/83/79 groups share IDENTICAL pixels across four
    * containers (PNG/JPEG/GIF/WebP — lossless for constant tiles);
    * everyone else is unique (multiplicative variation, container
    * rotating by id mod 4). */
  private def mixedContainerMedia(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docIds(s, d)
      .mapPartitions { it =>
        it.map { id =>
          val w = 64; val h = 64
          def tiles(m1: Long, m2: Long, add: Long): Array[Int] =
            Array.tabulate(w * h) { i =>
              val bx = (i % w) / 8; val by = (i / w) / 8
              ((bx * m1 + by * m2 + add) % 256L).toInt
            }
          // container codes: 0 = PNG, 1 = JPEG, 2 = GIF, 3 = WebP
          val (px, container) =
            if (id % 97 == 0) (tiles(57L, 131L, 23L), 0)
            else if (id % 89 == 0) (tiles(57L, 131L, 23L), 1)
            else if (id % 83 == 0) (tiles(57L, 131L, 23L), 2)
            else if (id % 79 == 0) (tiles(57L, 131L, 23L), 3)
            else {
              val m1 = (id * 2654435761L) % 251L + 2L
              val m2 = (id * 40503L) % 239L + 3L
              (tiles(m1, m2, id), (id % 4).toInt)
            }
          val payload = container match {
            case 0 => graft.kernel.Png.encode(
              graft.kernel.Png.Image(w, h, 1, 8, px))
            case 1 => graft.kernel.Jpeg.encode(
              graft.kernel.Jpeg.Image(w, h, 1, px))
            case 2 => graft.kernel.Gif.encode(
              graft.kernel.Gif.Image(w, h, 1, px))
            case _ => graft.kernel.Webp.encode(
              graft.kernel.Webp.Image(w, h, 3,
                px.flatMap(v => Array(v, v, v))))
          }
          (id, "image", payload)
        }
      }
      .toDF("doc_id", "media_type", "payload")
  }

  /** Per-dataset stored fingerprint index over m16's corpus split
    * (doc_id ≢ 0 mod 10) — hashes go through the real four-container
    * decode; built 80/20 so grow parity sits under m37's oracle. */
  private def mixedHashIndex(s: SparkSession, d: String): String =
    IxScratch.cached("hashix-mixed:" + IxScratch.fingerprint(d),
        "graft_hash_mixed") { p =>
      val corpus = imageHashesWith(
          mixedContainerMedia(s, d).filter(col("doc_id") % 10 =!= 0),
          classOf[ImageDecoder].getName)
        .select(col("doc_id"), col("img_hash").as("hash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      HashIndex.build(corpus.filter(col("doc_id") % 7 =!= 0), p)
      HashIndex.grow(corpus.filter(col("doc_id") % 7 === 0), p)
      corpus.unpersist(blocking = false)
    }

  /** [[videoImageMatches]] served from a STORED image fingerprint index:
    * the known-image corpus's perceptual hashes persist once; each
    * arriving video batch extracts ONLY its keyframes, hashes them
    * through the same kernel, and probes — the live m28 form re-hashes
    * and re-bands the whole image corpus per call. No id-namespace
    * union needed: the probe's batch/stored sides are separate by
    * construction. Returns (video_id, frame_idx, image_id, hamming). */
  def videoImageMatchesAgainstIndex(ix: HashIndex.Loaded, videos: DataFrame,
      maxHamming: Int = 0, num: Int = 12, den: Int = 1,
      maxBucket: Int = 100): DataFrame = {
    val FrameCap = 1000000L
    val kf = videoKeyframes(videos, num, den)
    val kfMedia = kf.select(
      when(col("frame_idx") < FrameCap && col("doc_id") >= 0,
          col("doc_id") * FrameCap + col("frame_idx"))
        .otherwise(raise_error(concat(
          lit("videoImageMatchesAgainstIndex: id namespace overflow at "),
          lit("video "), col("doc_id").cast("string"))).cast("long"))
        .as("doc_id"),
      lit("image").as("media_type"), col("png").as("payload"))
    val vHashes = imageHashesWith(kfMedia, classOf[PngDecoder].getName)
      .select(col("doc_id"), col("img_hash").as("hash"))
    HashIndex.probe(ix, vHashes, maxHamming, maxBucket)
      .select(expr(s"doc_id div $FrameCap").as("video_id"),
        (col("doc_id") % FrameCap).cast("int").as("frame_idx"),
        col("corpus_id").as("image_id"), col("hamming"))
  }

  /** The m22/m39 fixture: 6-frame 16×8 C420 clips — ids ≡ 0 mod 97
    * share one structured clip, ids ≡ 0 mod 89 (not 97) carry the SAME
    * clip at double brightness (luma ≤ 100, ×2 never clamps — the
    * ratio-form cube is scale-invariant, hamming 0), everyone else gets
    * genuinely different footage via a splitmix-finalized luma (the m11
    * lesson: linear-residue patterns collide HONESTLY under sum-based
    * bits). The whole formula replays in the m22/m39 oracle SQL. */
  private def m22Media(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = 16; val h = 8; val nf = 6
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    docIds(s, d)
      .mapPartitions { it =>
        it.map { id =>
          def clip(base: Long, scale: Int): Vector[Array[Byte]] =
            Vector.tabulate(nf) { f =>
              val frame = new Array[Byte](w * h * 3 / 2)
              var i = 0
              while (i < w * h) {
                val v =
                  if (base < 0) // planted identity: structured 0..100
                    ((i % w) * 3L + (i / w) * 7L + f * 11L + 13L) % 101L
                  else // unique footage: nonlinear in (id, f, pixel)
                    mix(base * 0x100000001b3L + f * 8191L + i) & 0xffL
                frame(i) = (v * scale).toByte
                i += 1
              }
              java.util.Arrays.fill(frame, w * h, frame.length, 128.toByte)
              frame
            }
          val frames =
            if (id % 97 == 0) clip(-1L, 1)
            else if (id % 89 == 0) clip(-1L, 2)
            else clip(id, 1)
          (id, "video",
            graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(w, h, "C420", frames)))
        }
      }
      .toDF("doc_id", "media_type", "payload")
  }

  /** [[videoNearDups]] served from the STORED fingerprint index — the
    * m37 amortization for the video modality: the corpus's cube
    * fingerprints persist once; each arriving batch decodes ONLY its own
    * clips, probes the index, and never re-fingerprints or re-bands the
    * corpus. Returns (doc_id, corpus_id, hamming ≤ maxHamming). */
  def videoNearDupsAgainstIndex(ix: HashIndex.Loaded, videos: DataFrame,
      maxHamming: Int = 2, maxBucket: Int = 100, tGrid: Int = 4,
      sGrid: Int = 4): DataFrame =
    HashIndex.probe(ix,
      videoFingerprints(videos, tGrid, sGrid)
        .select(col("doc_id"), col("video_hash").as("hash")),
      maxHamming, maxBucket)

  /** Per-dataset stored video fingerprint index over m39's corpus split
    * (doc_id ≢ 0 mod 10), built 80/20 so grow parity sits under the
    * oracle. */
  private def videoHashIndexDir(s: SparkSession, d: String): String =
    IxScratch.cached("hashix-video:" + IxScratch.fingerprint(d),
        "graft_hash_video") { p =>
      val corpus = videoFingerprints(
          m22Media(s, d).filter(col("doc_id") % 10 =!= 0))
        .select(col("doc_id"), col("video_hash").as("hash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      HashIndex.build(corpus.filter(col("doc_id") % 7 =!= 0), p)
      HashIndex.grow(corpus.filter(col("doc_id") % 7 === 0), p)
      corpus.unpersist(blocking = false)
    }

  /** The m12/m40 fixture: 650-sample mono WAVs — ids ≡ 0 mod 97 share
    * one waveform, ids ≡ 0 mod 89 (not 97) carry it at half volume
    * (amplitude-invariant energy-delta bits → hamming 0), everyone else
    * gets splitmix-scrambled samples (the |s|-based fingerprint makes
    * linear-residue or sign-mirrored streams collide HONESTLY). The
    * whole formula replays in the m12/m40 oracle SQL. */
  private def m12Media(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docIds(s, d)
      .mapPartitions { it =>
        it.map { id =>
          val n = 650
          val samples =
            if (id % 97 == 0)
              Array.tabulate(n)(i => (((i * 53L + 17L) % 3001L) - 1500L).toInt)
            else if (id % 89 == 0)
              // the same recording at half volume (truncating toward
              // zero keeps energies proportional enough: bits from
              // strict > on halved sums match the full-volume chain
              // for this waveform — spec-pinned)
              Array.tabulate(n)(i => ((((i * 53L + 17L) % 3001L) - 1500L) / 2L).toInt)
            else
              // splitmix-style scrambled samples: the fingerprint is
              // |s|-based, so sign-mirrored or linear-residue streams
              // collide HONESTLY (same energies) — a nonlinear
              // finalizer is needed to make distinct docs' bit chains
              // actually independent
              Array.tabulate(n) { i =>
                var z = i * 0x9E3779B97F4A7C15L + id * 0xBF58476D1CE4E5B9L
                z ^= z >>> 30; z *= 0x94D049BB133111EBL; z ^= z >>> 27
                (java.lang.Math.floorMod(z, 3801L) - 1900L).toInt
              }
          (id, "audio",
            graft.kernel.Wav.encode(graft.kernel.Wav.Audio(8000, 1, 16, samples)))
        }
      }
      .toDF("doc_id", "media_type", "payload")
  }

  /** [[audioNearDups]] served from the STORED fingerprint index — the
    * m37/m39 amortization for the audio modality, completing the
    * per-modality serving family: the corpus's energy-delta fingerprints
    * persist once; each arriving batch decodes ONLY its own audio and
    * probes. Returns (doc_id, corpus_id, hamming ≤ maxHamming). */
  def audioNearDupsAgainstIndex(ix: HashIndex.Loaded, audio: DataFrame,
      maxHamming: Int = 2, maxBucket: Int = 100,
      frames: Int = 65): DataFrame =
    HashIndex.probe(ix,
      audioFingerprints(audio, frames)
        .select(col("doc_id"), col("audio_hash").as("hash")),
      maxHamming, maxBucket)

  /** Per-dataset stored audio fingerprint index over m40's corpus split
    * (doc_id ≢ 0 mod 10), built 80/20 so grow parity sits under the
    * oracle. */
  private def audioHashIndexDir(s: SparkSession, d: String): String =
    IxScratch.cached("hashix-audio:" + IxScratch.fingerprint(d),
        "graft_hash_audio") { p =>
      val corpus = audioFingerprints(
          m12Media(s, d).filter(col("doc_id") % 10 =!= 0))
        .select(col("doc_id"), col("audio_hash").as("hash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      HashIndex.build(corpus.filter(col("doc_id") % 7 =!= 0), p)
      HashIndex.grow(corpus.filter(col("doc_id") % 7 === 0), p)
      corpus.unpersist(blocking = false)
    }

  /** The m28/m38 fixture: 16×8 frames of 8×8 blocks (2×1 px each),
    * varying multiplicatively per (id, salt) — each doc's still is
    * UNIQUE to it (a global shared tile would form a >maxBucket band
    * bucket at sf0.1 and the cap would drop every match); "shared"
    * (id ≡ 0 mod 97) means the video's scene 1 uses the SAME salt (31)
    * as that doc's image. */
  private def m28Cells(id: Long, salt: Long): Array[Int] = {
    val w = 16; val h = 8
    val m1 = (id * 2654435761L + salt * 97L) % 251L + 2L
    val m2 = (id * 40503L + salt * 89L) % 239L + 3L
    Array.tabulate(w * h) { i =>
      val bx = (i % w) / 2; val y = i / w
      ((bx * m1 + y * m2 + id) % 256L).toInt
    }
  }

  private def m28Videos(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = 16; val h = 8
    docIds(s, d)
      .mapPartitions { it =>
        it.map { id =>
          val shared = id % 97 == 0
          val frames = Vector.tabulate(6) { f =>
            val frame = new Array[Byte](w * h * 3 / 2)
            val sc = f / 3
            val px = m28Cells(id, if (shared && sc == 1) 31L else sc.toLong)
            var i = 0
            while (i < w * h) { frame(i) = px(i).toByte; i += 1 }
            java.util.Arrays.fill(frame, w * h, frame.length, 128.toByte)
            frame
          }
          (id, "video",
            graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(w, h, "C420", frames)))
        }
      }
      .toDF("doc_id", "media_type", "payload")
  }

  private def m28Images(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = 16; val h = 8
    docIds(s, d)
      .mapPartitions { it =>
        it.map { id =>
          val px = m28Cells(id, if (id % 97 == 0) 31L else 9999L)
          (id, "image",
            graft.kernel.Png.encode(graft.kernel.Png.Image(w, h, 1, 8, px)))
        }
      }
      .toDF("doc_id", "media_type", "payload")
  }

  /** Per-dataset stored fingerprint index over m28's image corpus,
    * built 80/20 so grow parity sits under m38's oracle. */
  private def m28ImageIndex(s: SparkSession, d: String): String =
    IxScratch.cached("hashix-m28img:" + IxScratch.fingerprint(d),
        "graft_hash_img") { p =>
      val sigs = imageHashesWith(m28Images(s, d),
          classOf[ImageDecoder].getName)
        .select(col("doc_id"), col("img_hash").as("hash"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      HashIndex.build(sigs.filter(col("doc_id") % 7 =!= 0), p)
      HashIndex.grow(sigs.filter(col("doc_id") % 7 === 0), p)
      sigs.unpersist(blocking = false)
    }

  /** Build a media table over the documents corpus: text bytes stand in
    * for the media payload (deterministic, offline). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Binary payload metadata (byte length + sha-256) — SQL-derivable,
    // so the binary-column plumbing itself is oracle-gated.
    ("m01_media_meta", (s: SparkSession, d: String) => {
      mediaTable(graft.Tables.documents(s, d))
        .select(col("doc_id"), col("media_type"),
          length(col("payload")).as("byte_len"),
          sha2(col("payload"), 256).as("sha"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
        CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        sha256(text) AS sha
      FROM documents ORDER BY doc_id""")),

    // Full decode stage through the partition kernel (stubbed decoder) —
    // oracle-gated: every feature derives from the payload's sha-256, so
    // DuckDB recomputes width/height/mean from hex slices of the digest
    // and the kernel's batched mapPartitions path is hash-verified
    // end-to-end (determinism also asserted in LlmOpsSpec).
    ("m02_media_features", (s: SparkSession, d: String) => {
      // FakeDecoder pinned explicitly: the driver corpus payloads are
      // text stand-ins (not decodable media), and Fake's sha-derived
      // features are what DuckDB can recompute. Real media goes through
      // the default PngDecoder (m07 gates that path on real bytes).
      decodeFeaturesWith(mediaTable(graft.Tables.documents(s, d)),
          classOf[FakeDecoder].getName)
        .toDF()
        .orderBy(col("doc_id"))
    },
    Some("""WITH m AS (
        SELECT doc_id,
          ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
          CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
          sha256(text) AS sha
        FROM documents)
      SELECT doc_id, media_type, byte_len, sha,
        CAST(64 + CAST(concat('0x', substr(sha, 1, 4)) AS INTEGER) % 1024 AS INTEGER) AS width,
        CAST(64 + CAST(concat('0x', substr(sha, 5, 4)) AS INTEGER) % 1024 AS INTEGER) AS height,
        (CAST(concat('0x', substr(sha, 9, 4)) AS INTEGER) % 25600) / 100.0 AS channel_mean
      FROM m ORDER BY doc_id""")),

    // Resize stage through the same partition kernel (stub codec —
    // halved dims + prefix thumbnail): binary in, binary out, new
    // metadata; every output is sha/length-derivable so the kernel path
    // is hash-verified.
    ("m04_media_resize", (s: SparkSession, d: String) => {
      // FakeDecoder pinned for the same reason as m02
      resizeMediaWith(mediaTable(graft.Tables.documents(s, d)),
          classOf[FakeDecoder].getName)
        .orderBy(col("doc_id"))
    },
    Some("""WITH m AS (
        -- corpus is pure ASCII (asserted by the Spark side matching):
        -- char slices of text == byte slices of the payload, and
        -- sha256(VARCHAR) hashes its UTF-8 bytes
        SELECT doc_id, text, sha256(text) AS sha FROM documents)
      SELECT doc_id,
        CAST((64 + CAST(concat('0x', substr(sha, 1, 4)) AS INTEGER) % 1024) // 2 AS INTEGER) AS r_width,
        CAST((64 + CAST(concat('0x', substr(sha, 5, 4)) AS INTEGER) % 1024) // 2 AS INTEGER) AS r_height,
        CAST((length(text) + 3) // 4 AS INTEGER) AS thumb_len,
        sha256(substr(text, 1, CAST((length(text) + 3) // 4 AS INTEGER))) AS thumb_sha
      FROM m ORDER BY doc_id""")),

    // Frame sampling for video payloads: fixed-size byte "frames", every
    // stride-th one — generator (sequence+explode) over binary slices,
    // the decimation shape a video pipeline runs before per-frame decode.
    ("m05_frame_sample", (s: SparkSession, d: String) => {
      val frame = 64
      val stride = 4
      val vids = mediaTable(graft.Tables.documents(s, d))
        .filter(col("media_type") === "video" && length(col("payload")) > 0)
      val slice = col("payload").substr(col("frame_idx") * frame + 1, lit(frame))
      vids.select(col("doc_id"),
          explode(sequence(lit(0),
            ((length(col("payload")) - 1) / frame).cast("int"),
            lit(stride))).as("frame_idx"),
          col("payload"))
        .select(col("doc_id"), col("frame_idx"),
          length(slice).as("frame_len"),
          sha2(slice, 256).as("frame_sha"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""WITH vids AS (
        -- ASCII corpus: char slices == byte slices (see m04 note)
        SELECT doc_id, text FROM documents
        WHERE ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] = 'video'
          AND length(text) > 0),
      frames AS (
        SELECT doc_id, text,
          unnest(range(0, (length(text) - 1) // 64 + 1, 4)) AS frame_idx
        FROM vids)
      SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        CAST(length(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS INTEGER) AS frame_len,
        sha256(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS frame_sha
      FROM frames ORDER BY doc_id, frame_idx""")),

    // REAL-decoder gate: synthesize an actual PNG per document (gray
    // 8-bit, analytic gradient pixels), push the bytes through the
    // batched decode kernel with the production PngDecoder, and
    // hash-compare dimensions + channel mean against DuckDB computing
    // the same gradient mean arithmetically. This pins the full real
    // path — encode → zlib → per-row filters → decode → feature math —
    // to an engine that never saw the PNG, so a codec regression cannot
    // hide behind the stub. Mean parity is exact: integer pixel sum ÷
    // integer count, one correctly-rounded double division in both.
    ("m07_png_decode", (s: SparkSession, d: String) => {
      import s.implicits._
      val png = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val w = (8 + id % 13).toInt
            val h = (8 + id % 7).toInt
            val px = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                px(y * w + x) = ((x + 3L * y + id) % 256).toInt
                x += 1
              }
              y += 1
            }
            (id, "image",
              graft.kernel.Png.encode(graft.kernel.Png.Image(w, h, 1, 8, px)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      decodeFeaturesWith(png, classOf[PngDecoder].getName)
        .select(col("doc_id"), col("width"), col("height"), col("channel_mean"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dims AS (
        SELECT doc_id,
          CAST(8 + doc_id % 13 AS INTEGER) AS width,
          CAST(8 + doc_id % 7 AS INTEGER) AS height
        FROM documents),
      xs AS ( -- unnest in the SELECT list: DuckDB's range() table
              -- function takes no lateral column refs
        SELECT doc_id, width, height, unnest(range(0, width)) AS x FROM dims),
      px AS (
        SELECT doc_id, width, height, (x + 3 * unnest(range(0, height)) + doc_id) % 256 AS v
        FROM xs)
      SELECT doc_id, width, height,
        CAST(sum(v) AS DOUBLE) / (width * height) AS channel_mean
      FROM px GROUP BY doc_id, width, height ORDER BY doc_id""")),

    // Perceptual image hash through the REAL decoder, oracle-gated: the
    // synthetic gradient PNGs' block sums are exact integers, so DuckDB
    // recomputes every hash bit arithmetically from the same pixel
    // formula — engine-independent verification of decode → block-sum →
    // bit → row-byte, the whole perceptual-hash path. (Dims are
    // multiples of the grid so blocks are uniform; the kernel's floor
    // boundaries cover ragged dims deterministically but the oracle
    // covers the uniform case.)
    ("m08_image_hash", (s: SparkSession, d: String) => {
      import s.implicits._
      val png = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val w = (8 + 8 * (id % 2)).toInt
            val h = 8
            val px = Array.tabulate(w * h)(i =>
              (((i % w) * 7L + (i / w) * 5L + id * 3L) % 256L).toInt)
            (id, "image",
              graft.kernel.Png.encode(graft.kernel.Png.Image(w, h, 1, 8, px)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      imageHashesWith(png, classOf[PngDecoder].getName)
        .select(col("doc_id"), col("width"), col("height"),
          // scalar encoding: the driver's oracle harness sorts whole result
          // frames, and array cells are unhashable there — join to a string
          array_join(col("row_bytes").cast("array<string>"), "-")
            .as("row_bytes"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(8 + 8 * (doc_id % 2) AS INTEGER) AS width,
          8 AS height
        FROM documents),
      xs AS (
        SELECT doc_id, width, height, unnest(range(0, width)) AS x FROM dims),
      pix AS (
        SELECT doc_id, width, height, x, unnest(range(0, height)) AS y FROM xs),
      blocks AS (
        SELECT doc_id, width, height,
          CAST((x * 8) // width AS INTEGER) AS bx, CAST(y AS INTEGER) AS by,
          sum((x * 7 + y * 5 + doc_id * 3) % 256) AS bsum
        FROM pix GROUP BY doc_id, width, height, bx, by),
      tot AS (SELECT doc_id, sum(bsum) AS total FROM blocks GROUP BY doc_id),
      bits AS (
        SELECT b.doc_id, b.width, b.height, b.by, b.bx,
          CASE WHEN b.bsum * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM blocks b JOIN tot t ON b.doc_id = t.doc_id),
      rws AS (
        SELECT doc_id, width, height, by,
          CAST(sum(bit * (1 << bx)) AS INTEGER) AS row_byte
        FROM bits GROUP BY doc_id, width, height, by)
      SELECT doc_id, width, height,
        string_agg(CAST(row_byte AS VARCHAR), '-' ORDER BY by) AS row_bytes
      FROM rws GROUP BY doc_id, width, height ORDER BY doc_id""")),

    // REAL audio decode, oracle-gated: synthetic PCM waveforms (integer
    // triangle-ish residues) round-trip through the real WAV encoder and
    // parser; every emitted feature is an exact integer DuckDB
    // recomputes from the same sample formula — header layout, chunk
    // walk, little-endian int16 decode, and the feature math all gated.
    ("m10_audio_meta", (s: SparkSession, d: String) => {
      import s.implicits._
      val wav = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val n = (64 + id % 64).toInt
            val samples = Array.tabulate(n)(i =>
              (((i * 37L + id * 11L) % 4001L) - 2000L).toInt)
            (id, "audio",
              graft.kernel.Wav.encode(graft.kernel.Wav.Audio(8000, 1, 16, samples)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      audioFeatures(wav).orderBy(col("doc_id"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(64 + doc_id % 64 AS INTEGER) AS n FROM documents),
      pos AS (
        SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
      sm AS (
        SELECT doc_id, n, (i * 37 + doc_id * 11) % 4001 - 2000 AS s FROM pos)
      SELECT doc_id, 8000 AS sample_rate, 1 AS n_channels,
        CAST(n AS BIGINT) AS n_samples,
        CAST(sum(s) AS BIGINT) AS pcm_sum,
        CAST(sum(abs(s)) AS BIGINT) AS pcm_abs_sum,
        CAST(max(abs(s)) AS BIGINT) AS peak
      FROM sm GROUP BY doc_id, n ORDER BY doc_id""")),

    // REAL FLAC frame decode, oracle-gated (the m10 treatment for the
    // compressed lossless container): the same synthetic PCM encodes
    // through the real FLAC encoder — multi-frame fixed-blocking
    // streams with rice-coded fixed-predictor subframes, a partial
    // last frame, and per-id stereo decorrelation (mono / left-side /
    // mid-side) — then decodes through the full RFC 9639 frame grammar
    // (CRC-8/CRC-16 verified per frame, STREAMINFO MD5 verified at the
    // end). FLAC is lossless, so every feature is the exact integer
    // DuckDB recomputes from the sample formula: rice coding, predictor
    // reconstruction, and stereo inversion all land on the oracle hash.
    ("m41_flac_decode", (s: SparkSession, d: String) => {
      import s.implicits._
      val flac = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val n = (96 + (id % 48) * 2).toInt // even: always frame-aligned
            val samples = Array.tabulate(n)(i =>
              (((i * 37L + id * 11L) % 4001L) - 2000L).toInt)
            val ch = (1 + id % 2).toInt
            val stereo =
              if (ch == 1) "independent"
              else if (id % 4 == 1) "left_side" else "mid_side"
            (id, "audio", graft.kernel.Flac.encode(
              graft.kernel.Wav.Audio(8000, ch, 16, samples),
              blockSize = 32, stereo = stereo))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      audioFeatures(flac).orderBy(col("doc_id"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(96 + (doc_id % 48) * 2 AS INTEGER) AS n
        FROM documents),
      pos AS (
        SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
      sm AS (
        SELECT doc_id, n, (i * 37 + doc_id * 11) % 4001 - 2000 AS s FROM pos)
      SELECT doc_id, 8000 AS sample_rate,
        CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
        CAST(n AS BIGINT) AS n_samples,
        CAST(sum(s) AS BIGINT) AS pcm_sum,
        CAST(sum(abs(s)) AS BIGINT) AS pcm_abs_sum,
        CAST(max(abs(s)) AS BIGINT) AS peak
      FROM sm GROUP BY doc_id, n ORDER BY doc_id""")),

    // CROSS-CONTAINER audio near-dups — the m16 story for the audio
    // modality, possible now that FLAC decodes losslessly: pair p's
    // recording ships as WAV under doc 2p and as FLAC under doc 2p+1
    // (identical PCM, different containers and bytes); the sniffing
    // decode collapses both onto ONE energy-delta fingerprint, so the
    // banded hamming join finds every cross-container pair at hamming
    // 0. Waveforms are splitmix-scrambled per pair (the m11 lesson —
    // |s|-based energies make linear residues collide honestly), so
    // distinct pairs stay apart. FULL oracle: DuckDB rebuilds the
    // two-round splitmix in HUGEINT, the segment energies, every delta
    // bit, the 16-bit band keys, the cap, and the per-bit hamming —
    // container-blindness is exactly what the shared PCM formula
    // proves, since both containers must decode to the same bits.
    ("m42_mixed_audio_neardup", (s: SparkSession, d: String) => {
      import s.implicits._
      val media = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val p = id / 2
            val samples = Array.tabulate(650) { i =>
              var z = i * 0x9E3779B97F4A7C15L + p * 0xBF58476D1CE4E5B9L
              z ^= z >>> 30; z *= 0x94D049BB133111EBL; z ^= z >>> 27
              (java.lang.Math.floorMod(z, 3801L) - 1900L).toInt
            }
            val audio = graft.kernel.Wav.Audio(8000, 1, 16, samples)
            val payload =
              if (id % 2 == 0) graft.kernel.Wav.encode(audio)
              else graft.kernel.Flac.encode(audio, blockSize = 256)
            (id, "audio", payload)
          }
        }
        .toDF("doc_id", "media_type", "payload")
      audioNearDups(media, maxHamming = 2, keyBits = 16)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH pos AS (
        SELECT d.doc_id, i.i FROM documents d,
          (SELECT CAST(unnest(range(0, 650)) AS BIGINT) AS i) i),
      mix AS (
        SELECT doc_id, i, xor(z2, z2 // 134217728::HUGEINT) AS z3 FROM (
          SELECT doc_id, i,
            ((zx % 4294967296::HUGEINT) * 321982955::HUGEINT
              + (((zx % 4294967296::HUGEINT) * 2496678331::HUGEINT
                  + (zx // 4294967296::HUGEINT) * 321982955::HUGEINT)
                % 4294967296::HUGEINT) * 4294967296::HUGEINT)
              % 18446744073709551616::HUGEINT AS z2
          FROM (
            SELECT doc_id, i, xor(z1, z1 // 1073741824::HUGEINT) AS zx
            FROM (
              SELECT doc_id, i,
                (i::HUGEINT * 11400714819323198485::HUGEINT +
                  (doc_id // 2)::HUGEINT * 13787848793156543929::HUGEINT)
                  % 18446744073709551616::HUGEINT AS z1
              FROM pos) a0) a) b),
      sm AS (
        SELECT doc_id, i,
          CAST((CASE WHEN z3 >= 9223372036854775808::HUGEINT
              THEN z3 - 18446744073709551616::HUGEINT ELSE z3 END
              % 3801 + 3801) % 3801 - 1900 AS BIGINT) AS s
        FROM mix),
      en AS (
        SELECT doc_id, i // 10 AS k, sum(abs(s)) AS e
        FROM sm GROUP BY doc_id, k),
      bits AS (
        SELECT doc_id, k AS pos,
          CASE WHEN lead(e) OVER (PARTITION BY doc_id ORDER BY k) > e
            THEN 1 ELSE 0 END AS bit
        FROM en WHERE k < 65),
      b64 AS (SELECT * FROM bits WHERE pos < 64),
      bands AS (
        SELECT doc_id, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM b64 GROUP BY doc_id, blk),
      kept AS (
        SELECT doc_id, blk, key FROM (
          SELECT doc_id, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM bands) t WHERE n <= 100),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b
          ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id),
      ham AS (
        SELECT c.doc_a, c.doc_b,
          CAST(sum(abs(ba.bit - bb.bit)) AS INTEGER) AS hamming
        FROM cand c
        JOIN b64 ba ON ba.doc_id = c.doc_a
        JOIN b64 bb ON bb.doc_id = c.doc_b AND bb.pos = ba.pos
        GROUP BY c.doc_a, c.doc_b)
      SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 2
      ORDER BY doc_a, doc_b""")),

    // Audio activity segmentation, oracle-gated end to end: waveforms
    // carry REAL speech-like structure (32-sample blocks alternate loud
    // noise and near-silence on a per-doc schedule), frames are half a
    // block so runs span frames, and DuckDB recomputes every segment
    // with the classic gaps-and-islands window over the recomputed
    // frame energies — decode, framing, threshold, and run assembly all
    // hash-verified.
    ("m24_audio_segments", (s: SparkSession, d: String) => {
      import s.implicits._
      val wav = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val n = (192 + id % 64).toInt
            val samples = Array.tabulate(n) { i =>
              if ((i / 32 + id) % 3 != 0)
                (((i * 37L + id * 11L) % 4001L) - 2000L).toInt // loud
              else ((i * 7L) % 21L - 10L).toInt // near-silent
            }
            (id, "audio",
              graft.kernel.Wav.encode(graft.kernel.Wav.Audio(8000, 1, 16, samples)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      audioSegments(wav, frameLen = 16, num = 100, den = 1)
        .orderBy(col("doc_id"), col("seg_idx"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(192 + doc_id % 64 AS INTEGER) AS n FROM documents),
      pos AS (
        SELECT doc_id, unnest(range(0, n)) AS i FROM dims),
      sm AS (
        SELECT doc_id, i,
          CASE WHEN ((i // 32) + doc_id) % 3 <> 0
            THEN (i * 37 + doc_id * 11) % 4001 - 2000
            ELSE (i * 7) % 21 - 10 END AS s
        FROM pos),
      fr AS (
        SELECT doc_id, CAST(i // 16 AS INTEGER) AS f,
          sum(abs(s)) AS e, count(*) AS c
        FROM sm GROUP BY doc_id, i // 16),
      act AS (
        SELECT doc_id, f, e,
          f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
        FROM fr WHERE e >= 100 * c),
      seg AS (
        SELECT doc_id, min(f) AS start_frame, max(f) AS end_frame,
          count(*) AS nf, sum(e) AS energy
        FROM act GROUP BY doc_id, grp)
      SELECT doc_id,
        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_frame) - 1
          AS INTEGER) AS seg_idx,
        start_frame, end_frame,
        CAST(nf AS INTEGER) AS n_frames,
        CAST(energy AS BIGINT) AS energy
      FROM seg ORDER BY doc_id, seg_idx""")),

    // Active-clip extraction over the m24 corpus: one WAV per active
    // run. FULL oracle since r18: the registered output carries the
    // clip SCHEDULE (m35's oracle-replayed spans verbatim) plus the
    // emitted payload's LENGTH — and a canonical 16-bit mono RIFF is
    // exactly 44 + 2·n_samples bytes (Wav.encode's fixed layout), so
    // even the length column is engine-exact. The payload BYTES remain
    // gated by WavSpec round-trips and m35's re-decoded digests.
    ("m27_audio_clips", (s: SparkSession, d: String) => {
      import s.implicits._
      val wav = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val n = (192 + id % 64).toInt
            val samples = Array.tabulate(n) { i =>
              if ((i / 32 + id) % 3 != 0)
                (((i * 37L + id * 11L) % 4001L) - 2000L).toInt
              else ((i * 7L) % 21L - 10L).toInt
            }
            (id, "audio",
              graft.kernel.Wav.encode(graft.kernel.Wav.Audio(8000, 1, 16, samples)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      audioClips(wav, frameLen = 16, num = 100, den = 1)
        .select(col("doc_id"), col("seg_idx"), col("start_sample"),
          col("n_samples"), length(col("wav")).as("wav_len"))
        .orderBy(col("doc_id"), col("seg_idx"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(192 + doc_id % 64 AS INTEGER) AS n FROM documents),
      pos AS (
        SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
      sm AS (
        SELECT doc_id, n, i,
          CASE WHEN ((i // 32) + doc_id) % 3 <> 0
            THEN (i * 37 + doc_id * 11) % 4001 - 2000
            ELSE (i * 7) % 21 - 10 END AS s
        FROM pos),
      fr AS (
        SELECT doc_id, CAST(i // 16 AS INTEGER) AS f,
          sum(abs(s)) AS e, count(*) AS c
        FROM sm GROUP BY doc_id, i // 16),
      act AS (
        SELECT doc_id, f,
          f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
        FROM fr WHERE e >= 100 * c),
      seg AS (
        SELECT doc_id, min(f) AS sf, max(f) AS ef
        FROM act GROUP BY doc_id, grp),
      clips AS (
        SELECT s2.doc_id,
          CAST(row_number() OVER (PARTITION BY s2.doc_id ORDER BY s2.sf) - 1
            AS INTEGER) AS seg_idx,
          s2.sf * 16 AS start_sample,
          least((s2.ef + 1) * 16, d2.n) - s2.sf * 16 AS n_samples
        FROM seg s2 JOIN dims d2 ON s2.doc_id = d2.doc_id)
      SELECT doc_id, seg_idx,
        CAST(start_sample AS INTEGER) AS start_sample,
        CAST(n_samples AS INTEGER) AS n_samples,
        CAST(44 + 2 * n_samples AS INTEGER) AS wav_len
      FROM clips ORDER BY doc_id, seg_idx""")),

    // Digest twin of m27 (the metadata-twin oracle pattern): m27's WAV
    // payload column is inherently un-oracle-able, but re-DECODING every
    // emitted clip and reducing it to exact-integer digests puts the
    // whole chain under DuckDB — activity schedule, clip span slicing,
    // AND the encode→decode payload round trip (pcm_wsum is
    // position-weighted, so a shifted or reordered clip breaks the
    // hash, not just a corrupted one).
    ("m35_clip_digest", (s: SparkSession, d: String) => {
      import s.implicits._
      val wav = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val n = (192 + id % 64).toInt
            val samples = Array.tabulate(n) { i =>
              if ((i / 32 + id) % 3 != 0)
                (((i * 37L + id * 11L) % 4001L) - 2000L).toInt
              else ((i * 7L) % 21L - 10L).toInt
            }
            (id, "audio",
              graft.kernel.Wav.encode(graft.kernel.Wav.Audio(8000, 1, 16, samples)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      audioClips(wav, frameLen = 16, num = 100, den = 1)
        .select(col("doc_id"), col("seg_idx"), col("start_sample"),
          col("n_samples"), col("wav"))
        .as[(Long, Int, Int, Int, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, seg, start, nSamp, bytes) =>
            val a = graft.kernel.Wav.decode(bytes)
            require(a.sampleRate == 8000 && a.channels == 1 &&
              a.samples.length == nSamp,
              s"doc $id clip $seg: decoded shape disagrees with the schedule")
            var sum = 0L; var wsum = 0L; var j = 0
            while (j < a.samples.length) {
              sum += a.samples(j)
              wsum += (j + 1L) * a.samples(j)
              j += 1
            }
            (id, seg, start, nSamp, sum, wsum)
          }
        }
        .toDF("doc_id", "seg_idx", "start_sample", "n_samples",
          "pcm_sum", "pcm_wsum")
        .orderBy(col("doc_id"), col("seg_idx"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(192 + doc_id % 64 AS INTEGER) AS n FROM documents),
      pos AS (
        SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
      sm AS (
        SELECT doc_id, n, i,
          CASE WHEN ((i // 32) + doc_id) % 3 <> 0
            THEN (i * 37 + doc_id * 11) % 4001 - 2000
            ELSE (i * 7) % 21 - 10 END AS s
        FROM pos),
      fr AS (
        SELECT doc_id, CAST(i // 16 AS INTEGER) AS f,
          sum(abs(s)) AS e, count(*) AS c
        FROM sm GROUP BY doc_id, i // 16),
      act AS (
        SELECT doc_id, f,
          f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
        FROM fr WHERE e >= 100 * c),
      seg AS (
        SELECT doc_id, min(f) AS sf, max(f) AS ef
        FROM act GROUP BY doc_id, grp),
      clips AS (
        SELECT s2.doc_id,
          CAST(row_number() OVER (PARTITION BY s2.doc_id ORDER BY s2.sf) - 1
            AS INTEGER) AS seg_idx,
          s2.sf * 16 AS start_sample,
          least((s2.ef + 1) * 16, d2.n) - s2.sf * 16 AS n_samples
        FROM seg s2 JOIN dims d2 ON s2.doc_id = d2.doc_id),
      dg AS (
        SELECT c2.doc_id, c2.seg_idx, c2.start_sample, c2.n_samples,
          sum(sm.s) AS pcm_sum,
          sum((sm.i - c2.start_sample + 1) * sm.s) AS pcm_wsum
        FROM clips c2 JOIN sm ON sm.doc_id = c2.doc_id
          AND sm.i >= c2.start_sample
          AND sm.i < c2.start_sample + c2.n_samples
        GROUP BY c2.doc_id, c2.seg_idx, c2.start_sample, c2.n_samples)
      SELECT doc_id, seg_idx,
        CAST(start_sample AS INTEGER) AS start_sample,
        CAST(n_samples AS INTEGER) AS n_samples,
        CAST(pcm_sum AS BIGINT) AS pcm_sum,
        CAST(pcm_wsum AS BIGINT) AS pcm_wsum
      FROM dg ORDER BY doc_id, seg_idx""")),

    // Audio fingerprint through the real WAV parser, oracle-gated like
    // m08: 65 uniform segments of the synthetic waveform, integer
    // energies, delta bits recomputed by DuckDB via a LEAD window over
    // the grouped energies — decode, segmentation, energy math, bit
    // chain, and byte packing all hash-verified.
    ("m11_audio_hash", (s: SparkSession, d: String) => {
      import s.implicits._
      val wav = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val n = 65 * (10 + id % 7).toInt
            val samples = Array.tabulate(n)(i =>
              (((i * 37L + id * 11L) % 4001L) - 2000L).toInt)
            (id, "audio",
              graft.kernel.Wav.encode(graft.kernel.Wav.Audio(8000, 1, 16, samples)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      audioFingerprints(wav)
        .select(col("doc_id"), col("n_samples"),
          // scalar encoding for the driver's sort-based harness (see m08)
          array_join(col("row_bytes").cast("array<string>"), "-")
            .as("row_bytes"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(10 + doc_id % 7 AS INTEGER) AS seg,
          CAST(65 * (10 + doc_id % 7) AS INTEGER) AS n
        FROM documents),
      pos AS (SELECT doc_id, seg, n, unnest(range(0, n)) AS i FROM dims),
      en AS (
        SELECT doc_id, n, CAST((i * 65) // n AS INTEGER) AS k,
          sum(abs((i * 37 + doc_id * 11) % 4001 - 2000)) AS e
        FROM pos GROUP BY doc_id, n, k),
      bits AS (
        SELECT doc_id, n, k,
          CASE WHEN lead(e) OVER (PARTITION BY doc_id ORDER BY k) > e
            THEN 1 ELSE 0 END AS bit
        FROM en),
      bytes AS (
        SELECT doc_id, n, k // 8 AS r,
          CAST(sum(bit * (1 << (k % 8))) AS INTEGER) AS b
        FROM bits WHERE k < 64 GROUP BY doc_id, n, r)
      SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        string_agg(CAST(b AS VARCHAR), '-' ORDER BY r) AS row_bytes
      FROM bytes GROUP BY doc_id, n ORDER BY doc_id""")),

    // REAL video decode, oracle-gated: synthetic C420 Y4M streams
    // (analytic luma gradient per frame, flat chroma) through the real
    // encoder and parser, every 2nd frame sampled, per-frame integer
    // luma stats hash-compared against DuckDB recomputing them from the
    // pixel formula — header grammar, FRAME walk, plane layout, stride
    // sampling, and the feature math all gated.
    ("m13_video_frames", (s: SparkSession, d: String) => {
      import s.implicits._
      val w = 16; val h = 8
      val y4m = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val nf = (4 + id % 4).toInt
            val frames = Vector.tabulate(nf) { f =>
              val frame = new Array[Byte](w * h * 3 / 2)
              var i = 0
              while (i < w * h) {
                frame(i) =
                  (((i % w) * 7L + (i / w) * 5L + f * 13L + id * 3L) % 256L).toByte
                i += 1
              }
              java.util.Arrays.fill(frame, w * h, frame.length, 128.toByte)
              frame
            }
            (id, "video",
              graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(w, h, "C420", frames)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      videoFrameStats(y4m, stride = 2)
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(4 + doc_id % 4 AS INTEGER) AS nf FROM documents),
      fr AS (
        SELECT doc_id, unnest(range(0, nf)) AS f FROM dims),
      sampled AS (SELECT doc_id, CAST(f AS INTEGER) AS f FROM fr WHERE f % 2 = 0),
      xs AS (
        SELECT doc_id, f, unnest(range(0, 16)) AS x FROM sampled),
      px AS (
        SELECT doc_id, f, x, unnest(range(0, 8)) AS y FROM xs),
      lum AS (
        SELECT doc_id, f, (x * 7 + y * 5 + f * 13 + doc_id * 3) % 256 AS v
        FROM px)
      SELECT doc_id, f AS frame_idx, 16 AS width, 8 AS height,
        CAST(sum(v) AS BIGINT) AS luma_sum,
        CAST(min(v) AS INTEGER) AS luma_min,
        CAST(max(v) AS INTEGER) AS luma_max
      FROM lum GROUP BY doc_id, f ORDER BY doc_id, frame_idx""")),

    // Video perceptual hash, oracle-gated END TO END: every bit of the
    // temporal×spatial fingerprint rides exact integer comparisons, so
    // DuckDB recomputes the full 64-char bit string from the same
    // deterministic luma formula the Spark side encodes through the
    // REAL Y4M container (encode → header grammar → frame walk →
    // bucket/cell sums → ratio bits). The packed 64-bit hash is a pure
    // repack of these bits (spec-pinned in Y4mSpec) and is exercised by
    // m22's pair machinery — it stays out of this projection so every
    // output column is a driver-comparable scalar.
    ("m21_video_hash", (s: SparkSession, d: String) => {
      import s.implicits._
      val w = 16; val h = 8
      val y4m = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val nf = (4 + id % 4).toInt
            val frames = Vector.tabulate(nf) { f =>
              val frame = new Array[Byte](w * h * 3 / 2)
              var i = 0
              while (i < w * h) {
                frame(i) =
                  (((i % w) * 7L + (i / w) * 5L + f * 13L + id * 3L) % 256L).toByte
                i += 1
              }
              java.util.Arrays.fill(frame, w * h, frame.length, 128.toByte)
              frame
            }
            (id, "video",
              graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(w, h, "C420", frames)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      videoFingerprints(y4m, tGrid = 4, sGrid = 4)
        .select(col("doc_id"), col("n_frames"), col("width"), col("height"),
          col("hash_bits"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(4 + doc_id % 4 AS INTEGER) AS nf FROM documents),
      fr AS (
        SELECT doc_id, nf, unnest(range(0, nf)) AS f FROM dims),
      xs AS (
        SELECT doc_id, nf, f, unnest(range(0, 16)) AS x FROM fr),
      px AS (
        SELECT doc_id, nf, f, x, unnest(range(0, 8)) AS y FROM xs),
      lum AS (
        SELECT doc_id, nf,
          CAST((f * 4) // nf AS INTEGER) AS t,
          CAST(y // 2 AS INTEGER) AS cy,
          CAST(x // 4 AS INTEGER) AS cx,
          (x * 7 + y * 5 + f * 13 + doc_id * 3) % 256 AS v
        FROM px),
      cells AS (
        SELECT doc_id, nf, t, cy, cx, sum(v) AS cs
        FROM lum GROUP BY doc_id, nf, t, cy, cx),
      buckets AS (
        SELECT doc_id, t, sum(cs) AS bt FROM cells GROUP BY doc_id, t),
      bits AS (
        SELECT c.doc_id, c.nf, (c.t * 4 + c.cy) * 4 + c.cx AS k,
          CASE WHEN c.cs * 16 > b.bt THEN '1' ELSE '0' END AS b
        FROM cells c JOIN buckets b ON c.doc_id = b.doc_id AND c.t = b.t)
      SELECT doc_id, CAST(max(nf) AS INTEGER) AS n_frames,
        16 AS width, 8 AS height,
        string_agg(b, '' ORDER BY k) AS hash_bits
      FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // Mixed-container image metadata extraction — the (container,
    // flavor, decodable, display width, display height) table a
    // multimodal filter runs before any decode-heavy stage — and it is
    // now HEADER-ONLY ([[ImageDecoder.sniff]]): a metadata table that
    // pixel-decodes every payload is wrong at crawl scale, and
    // header-only is what lets it cover lossy VP8 WebP (the DOMINANT
    // WebP flavor — dims sit in the uncompressed keyframe header) whose
    // pixels this engine loudly refuses. Oracle-gated end to end:
    // payloads rotate PNG/JPEG/GIF/WebP per doc with planted per-class
    // dimensions, JPEGs carry an EXIF orientation tag cycling all 8
    // values (the emitted dims must be DISPLAY dims — tags 5–8 swap
    // axes), and the WebP rows alternate lossless VP8L with
    // lossy-header files that must report dims with decodable=false.
    ("m25_image_meta", (s: SparkSession, d: String) => {
      import s.implicits._
      val media = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val payload = (id % 4) match {
              case 0 =>
                val w = (16 + id % 8).toInt; val h = (8 + id % 4).toInt
                graft.kernel.Png.encode(graft.kernel.Png.Image(w, h, 1, 8,
                  Array.tabulate(w * h)(i => ((i * 31 + id) % 256).toInt)))
              case 1 =>
                // id ≡ 1 mod 4, so id%8 only hits {1,5}; id/4 cycles
                // the tag through all 8 values
                val tag = (id / 4 % 8 + 1).toInt
                graft.kernel.Jpeg.encode(
                  graft.kernel.Jpeg.Image(16, 8, 1,
                    Array.tabulate(16 * 8)(i => ((i / 8 * 17 + id) % 256).toInt)),
                  orientation = tag)
              case 2 =>
                val w = (12 + id % 5).toInt; val h = (7 + id % 3).toInt
                graft.kernel.Gif.encode(graft.kernel.Gif.Image(w, h, 1,
                  Array.tabulate(w * h)(i => ((i * 7 + id) % 200).toInt)))
              case _ =>
                val w = (10 + id % 6).toInt; val h = (6 + id % 4).toInt
                // id ≡ 3 mod 4 → id%8 ∈ {3, 7}: 3 = lossless VP8L,
                // 7 = lossy VP8 (header-only fixture, same dim plant)
                if (id % 8 == 3)
                  graft.kernel.Webp.encode(graft.kernel.Webp.Image(w, h, 3,
                    Array.tabulate(w * h * 3)(i => ((i * 11 + id) % 256).toInt)))
                else graft.kernel.Webp.encodeLossyHeader(w, h)
            }
            (id, "image", payload)
          }
        }
        .toDF("doc_id", "media_type", "payload")
      media.select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, p) =>
            val info = ImageDecoder.sniff(p)
            (id, info.container, info.flavor, info.decodable,
              info.width, info.height, p.length.toLong)
          }
        }
        .toDF("doc_id", "container", "flavor", "decodable", "width",
          "height", "byte_len")
        .select(col("doc_id"), col("container"), col("flavor"),
          col("decodable"), col("width"), col("height"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
          ELSE 'webp' END AS container,
        CASE WHEN doc_id % 4 <> 3 THEN ''
          WHEN doc_id % 8 = 3 THEN 'lossless' ELSE 'lossy' END AS flavor,
        (doc_id % 8 <> 7) AS decodable,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN CAST(16 + doc_id % 8 AS INTEGER)
          WHEN 1 THEN CASE WHEN (doc_id // 4) % 8 >= 4
            THEN 8 ELSE 16 END
          WHEN 2 THEN CAST(12 + doc_id % 5 AS INTEGER)
          ELSE CAST(10 + doc_id % 6 AS INTEGER) END AS width,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN CAST(8 + doc_id % 4 AS INTEGER)
          WHEN 1 THEN CASE WHEN (doc_id // 4) % 8 >= 4
            THEN 16 ELSE 8 END
          WHEN 2 THEN CAST(7 + doc_id % 3 AS INTEGER)
          ELSE CAST(6 + doc_id % 4 AS INTEGER) END AS height
      FROM documents ORDER BY doc_id""")),

    // Scene-cut detection, oracle-gated end to end: clips carry REAL
    // scene structure (luma pattern shifts every 3 frames — consecutive
    // frames within a scene are identical, boundaries jump), and DuckDB
    // recomputes every per-frame SAD by self-joining the pixel walk at
    // f vs f-1 and every cut verdict from the same integer rule.
    ("m23_scene_cuts", (s: SparkSession, d: String) => {
      import s.implicits._
      val w = 16; val h = 8
      val y4m = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val nf = (6 + id % 5).toInt
            val frames = Vector.tabulate(nf) { f =>
              val frame = new Array[Byte](w * h * 3 / 2)
              var i = 0
              while (i < w * h) {
                frame(i) = (((i % w) * 7L + (i / w) * 5L +
                  (f / 3) * 67L + id * 3L) % 256L).toByte
                i += 1
              }
              java.util.Arrays.fill(frame, w * h, frame.length, 128.toByte)
              frame
            }
            (id, "video",
              graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(w, h, "C420", frames)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      videoSceneCuts(y4m, num = 12, den = 1)
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(6 + doc_id % 5 AS INTEGER) AS nf FROM documents),
      fr AS (
        SELECT doc_id, unnest(range(0, nf)) AS f FROM dims),
      xs AS (
        SELECT doc_id, f, unnest(range(0, 16)) AS x FROM fr),
      px AS (
        SELECT doc_id, f, x, unnest(range(0, 8)) AS y FROM xs),
      lum AS (
        SELECT doc_id, f, x, y,
          (x * 7 + y * 5 + (f // 3) * 67 + doc_id * 3) % 256 AS v
        FROM px),
      sads AS (
        SELECT a.doc_id, a.f AS frame_idx, sum(abs(a.v - b.v)) AS sad
        FROM lum a JOIN lum b
          ON a.doc_id = b.doc_id AND b.f = a.f - 1
            AND a.x = b.x AND a.y = b.y
        GROUP BY a.doc_id, a.f)
      SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        CAST(sad AS BIGINT) AS sad,
        sad >= 12 * 128 AS is_cut
      FROM sads
      UNION ALL
      SELECT doc_id, 0 AS frame_idx, CAST(0 AS BIGINT) AS sad, true AS is_cut
      FROM dims
      ORDER BY doc_id, frame_idx""")),

    // Cross-modality dedup: every 97th doc's video carries a scene
    // whose keyframe PIXELS equal that doc's corpus image (the
    // slideshow/still-re-encode case); everyone else's videos and
    // images are arithmetic-unique. NOW FULLY ORACLE-GATED (r14, the
    // m09/m16/m22 pattern extended one stage deeper): pixels are
    // constant per 2×1 hash block and derive from integer congruences,
    // so DuckDB replays the ENTIRE composed pipeline — per-frame SAD →
    // scene-cut verdict (sad·den ≥ num·n) → keyframe schedule → aHash
    // ratio bits for keyframes AND images → the id-namespace union →
    // 16-bit band keys → bucket cap → hamming-0 verification →
    // namespace unmap. A Y4M/PNG decode, SAD, cut-threshold, hash,
    // banding, or namespace bug breaks the hash. Non-match behavior
    // additionally spec-gated in Y4mSpec.
    ("m28_video_image_matches", (s: SparkSession, d: String) => {
      videoImageMatches(m28Videos(s, d), m28Images(s, d), keyBits = 16)
        .orderBy(col("video_id"), col("frame_idx"), col("image_id"))
    },
    Some("""WITH grid AS (
        SELECT bx.bx, y.y FROM
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS bx) bx,
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS y) y),
      -- video scene cells: s ∈ {0,1}; a shared doc's scene 1 uses
      -- salt 31 (the same salt its image uses), everything else salt s
      vcells AS (
        SELECT d.doc_id, s.s, g.y * 8 + g.bx AS pos,
          (g.bx * ((d.doc_id * 2654435761 +
              (CASE WHEN d.doc_id % 97 = 0 AND s.s = 1
                THEN 31 ELSE s.s END) * 97) % 251 + 2)
            + g.y * ((d.doc_id * 40503 +
              (CASE WHEN d.doc_id % 97 = 0 AND s.s = 1
                THEN 31 ELSE s.s END) * 89) % 239 + 3)
            + d.doc_id) % 256 AS v
        FROM documents d, grid g,
          (SELECT CAST(unnest(range(0, 2)) AS BIGINT) AS s) s),
      -- the f=3 scene boundary's per-pixel SAD (each cell is 2 pixels);
      -- within-scene transitions are zero. Cut iff sad*den >= num*n
      -- with num=12, den=1, n=128
      sad3 AS (
        SELECT a.doc_id, 2 * sum(abs(a.v - b.v)) AS sad
        FROM vcells a JOIN vcells b
          ON a.doc_id = b.doc_id AND a.pos = b.pos
          AND a.s = 0 AND b.s = 1
        GROUP BY a.doc_id),
      -- keyframes: frame 0 (scene 0) always; frame 3 (scene 1) iff cut
      kf AS (
        SELECT doc_id, CAST(0 AS INTEGER) AS frame_idx, 0 AS s
        FROM documents
        UNION ALL
        SELECT doc_id, CAST(3 AS INTEGER) AS frame_idx, 1 AS s
        FROM sad3 WHERE sad >= 12 * 128),
      icells AS (
        SELECT d.doc_id, g.y * 8 + g.bx AS pos,
          (g.bx * ((d.doc_id * 2654435761 +
              (CASE WHEN d.doc_id % 97 = 0 THEN 31 ELSE 9999 END) * 97)
              % 251 + 2)
            + g.y * ((d.doc_id * 40503 +
              (CASE WHEN d.doc_id % 97 = 0 THEN 31 ELSE 9999 END) * 89)
              % 239 + 3)
            + d.doc_id) % 256 AS v
        FROM documents d, grid g),
      -- ratio-form aHash bits (block sum = 2v; ×2 cancels), under the
      -- videoImageMatches id namespace: keyframes at vid*1000000+f,
      -- images at -id-1
      vtot AS (SELECT doc_id, s, sum(v) AS total FROM vcells GROUP BY 1, 2),
      vbits AS (
        SELECT k.doc_id * 1000000 + k.frame_idx AS nsid, c.pos,
          CASE WHEN c.v * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM kf k
        JOIN vcells c ON c.doc_id = k.doc_id AND c.s = k.s
        JOIN vtot t ON t.doc_id = k.doc_id AND t.s = k.s),
      itot AS (SELECT doc_id, sum(v) AS total FROM icells GROUP BY 1),
      ibits AS (
        SELECT -c.doc_id - 1 AS nsid, c.pos,
          CASE WHEN c.v * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM icells c JOIN itot t USING (doc_id)),
      bits AS (SELECT * FROM vbits UNION ALL SELECT * FROM ibits),
      bands AS (
        SELECT nsid, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM bits GROUP BY nsid, blk),
      kept AS (
        SELECT nsid, blk, key FROM (
          SELECT nsid, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM bands) t WHERE n <= 100),
      cand AS (
        SELECT DISTINCT a.nsid AS doc_a, b.nsid AS doc_b
        FROM kept a JOIN kept b
          ON a.blk = b.blk AND a.key = b.key AND a.nsid < b.nsid),
      ham AS (
        SELECT c.doc_a, c.doc_b,
          CAST(sum(abs(ba.bit - bb.bit)) AS INTEGER) AS hamming
        FROM cand c
        JOIN bits ba ON ba.nsid = c.doc_a
        JOIN bits bb ON bb.nsid = c.doc_b AND bb.pos = ba.pos
        GROUP BY c.doc_a, c.doc_b)
      SELECT doc_b // 1000000 AS video_id,
        CAST(doc_b % 1000000 AS INTEGER) AS frame_idx,
        -doc_a - 1 AS image_id, hamming
      FROM ham
      WHERE hamming <= 0 AND doc_a < 0 AND doc_b >= 0
      ORDER BY video_id, frame_idx, image_id""")),

    // m28 SERVED FROM THE STORED HashIndex — the last hammingNearDups
    // call site amortized: the known-image corpus hashes once into the
    // persisted index (build 80% → grow 20%), each video batch extracts
    // only its keyframes and probes. The oracle replays the whole
    // pipeline — SAD scene cuts → keyframe schedule → ratio bits →
    // band slices → STORED-side cap → exact hamming — over the m28
    // congruence fixture; bit parity with the live m28 form is spec'd
    // in HashIndexSpec.
    ("m38_index_video_matches", (s: SparkSession, d: String) => {
      videoImageMatchesAgainstIndex(
          HashIndex.load(s, m28ImageIndex(s, d)), m28Videos(s, d),
          maxHamming = 0)
        .orderBy(col("video_id"), col("frame_idx"), col("image_id"))
    },
    Some("""WITH grid AS (
        SELECT bx.bx, y.y FROM
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS bx) bx,
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS y) y),
      vcells AS (
        SELECT d.doc_id, s.s, g.y * 8 + g.bx AS pos,
          (g.bx * ((d.doc_id * 2654435761 +
              (CASE WHEN d.doc_id % 97 = 0 AND s.s = 1
                THEN 31 ELSE s.s END) * 97) % 251 + 2)
            + g.y * ((d.doc_id * 40503 +
              (CASE WHEN d.doc_id % 97 = 0 AND s.s = 1
                THEN 31 ELSE s.s END) * 89) % 239 + 3)
            + d.doc_id) % 256 AS v
        FROM documents d, grid g,
          (SELECT CAST(unnest(range(0, 2)) AS BIGINT) AS s) s),
      sad3 AS (
        SELECT a.doc_id, 2 * sum(abs(a.v - b.v)) AS sad
        FROM vcells a JOIN vcells b
          ON a.doc_id = b.doc_id AND a.pos = b.pos
          AND a.s = 0 AND b.s = 1
        GROUP BY a.doc_id),
      kf AS (
        SELECT doc_id, CAST(0 AS INTEGER) AS frame_idx, 0 AS s
        FROM documents
        UNION ALL
        SELECT doc_id, CAST(3 AS INTEGER) AS frame_idx, 1 AS s
        FROM sad3 WHERE sad >= 12 * 128),
      icells AS (
        SELECT d.doc_id, g.y * 8 + g.bx AS pos,
          (g.bx * ((d.doc_id * 2654435761 +
              (CASE WHEN d.doc_id % 97 = 0 THEN 31 ELSE 9999 END) * 97)
              % 251 + 2)
            + g.y * ((d.doc_id * 40503 +
              (CASE WHEN d.doc_id % 97 = 0 THEN 31 ELSE 9999 END) * 89)
              % 239 + 3)
            + d.doc_id) % 256 AS v
        FROM documents d, grid g),
      vtot AS (SELECT doc_id, s, sum(v) AS total FROM vcells GROUP BY 1, 2),
      -- keyframe (batch) bits under the vid*10^6+frame namespace;
      -- image (stored) bits under raw ids — probe sides never union
      vbits AS (
        SELECT k.doc_id * 1000000 + k.frame_idx AS nsid, c.pos,
          CASE WHEN c.v * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM kf k
        JOIN vcells c ON c.doc_id = k.doc_id AND c.s = k.s
        JOIN vtot t ON t.doc_id = k.doc_id AND t.s = k.s),
      itot AS (SELECT doc_id, sum(v) AS total FROM icells GROUP BY 1),
      ibits AS (
        SELECT c.doc_id, c.pos,
          CASE WHEN c.v * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM icells c JOIN itot t USING (doc_id)),
      vbands AS (
        SELECT nsid, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM vbits GROUP BY nsid, blk),
      ibands AS (
        SELECT doc_id, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM ibits GROUP BY doc_id, blk),
      -- the stored-side hot-bucket cap (probe counts only its own side)
      keptI AS (
        SELECT doc_id, blk, key FROM (
          SELECT doc_id, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM ibands) t WHERE n <= 100),
      cand AS (
        SELECT DISTINCT v.nsid, i.doc_id AS image_id
        FROM vbands v JOIN keptI i ON v.blk = i.blk AND v.key = i.key),
      ham AS (
        SELECT c.nsid, c.image_id,
          CAST(sum(abs(vb.bit - ib.bit)) AS INTEGER) AS hamming
        FROM cand c
        JOIN vbits vb ON vb.nsid = c.nsid
        JOIN ibits ib ON ib.doc_id = c.image_id AND ib.pos = vb.pos
        GROUP BY c.nsid, c.image_id)
      SELECT nsid // 1000000 AS video_id,
        CAST(nsid % 1000000 AS INTEGER) AS frame_idx,
        image_id, hamming
      FROM ham WHERE hamming <= 0
      ORDER BY video_id, frame_idx, image_id""")),

    // Keyframe extraction over the m23 scene-structured corpus: one
    // grayscale PNG per scene start. The cut schedule is the
    // oracle-verified m23 one; the payloads themselves are gated in
    // Y4mSpec (each keyframe PNG decodes back to the exact luma plane).
    // Rows-only: PNG bytes are not SQL-recomputable.
    ("m26_video_keyframes", (s: SparkSession, d: String) => {
      import s.implicits._
      val w = 16; val h = 8
      val y4m = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val nf = (6 + id % 5).toInt
            val frames = Vector.tabulate(nf) { f =>
              val frame = new Array[Byte](w * h * 3 / 2)
              var i = 0
              while (i < w * h) {
                frame(i) = (((i % w) * 7L + (i / w) * 5L +
                  (f / 3) * 67L + id * 3L) % 256L).toByte
                i += 1
              }
              java.util.Arrays.fill(frame, w * h, frame.length, 128.toByte)
              frame
            }
            (id, "video",
              graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(w, h, "C420", frames)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      videoKeyframes(y4m, num = 12, den = 1)
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          length(col("png")).as("png_len"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }, None),

    // Digest twin of m26 (the metadata-twin oracle pattern): the
    // keyframe PNG payloads stay binary, but re-DECODING every emitted
    // keyframe and reducing the luma plane to exact-integer digests
    // puts the whole chain under DuckDB — the SAD cut schedule, the
    // keyframe selection, AND the PNG encode→decode round trip
    // (luma_wsum is position-weighted, so a transposed or shifted
    // plane breaks the hash, not just a corrupted one).
    ("m34_keyframe_digest", (s: SparkSession, d: String) => {
      import s.implicits._
      val w = 16; val h = 8
      val y4m = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val nf = (6 + id % 5).toInt
            val frames = Vector.tabulate(nf) { f =>
              val frame = new Array[Byte](w * h * 3 / 2)
              var i = 0
              while (i < w * h) {
                frame(i) = (((i % w) * 7L + (i / w) * 5L +
                  (f / 3) * 67L + id * 3L) % 256L).toByte
                i += 1
              }
              java.util.Arrays.fill(frame, w * h, frame.length, 128.toByte)
              frame
            }
            (id, "video",
              graft.kernel.Y4m.encode(graft.kernel.Y4m.Video(w, h, "C420", frames)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      videoKeyframes(y4m, num = 12, den = 1)
        .select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"), col("png"))
        .as[(Long, Int, Int, Int, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, fi, ww, hh, png) =>
            val img = graft.kernel.Png.decode(png)
            require(img.width == ww && img.height == hh &&
              img.channels == 1 && img.bitDepth == 8,
              s"doc $id keyframe $fi: decoded shape disagrees")
            var sum = 0L; var wsum = 0L; var i = 0
            while (i < img.samples.length) {
              sum += img.samples(i)
              wsum += (i + 1L) * img.samples(i)
              i += 1
            }
            (id, fi, ww, hh, sum, wsum)
          }
        }
        .toDF("doc_id", "frame_idx", "width", "height",
          "luma_sum", "luma_wsum")
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(6 + doc_id % 5 AS INTEGER) AS nf FROM documents),
      fr AS (
        SELECT doc_id, unnest(range(0, nf)) AS f FROM dims),
      px AS (
        SELECT doc_id, f, unnest(range(0, 128)) AS i FROM fr),
      lum AS (
        SELECT doc_id, f, i,
          ((i % 16) * 7 + (i // 16) * 5 + (f // 3) * 67 + doc_id * 3) % 256
            AS v
        FROM px),
      sads AS (
        SELECT a.doc_id, a.f, sum(abs(a.v - b.v)) AS sad
        FROM lum a JOIN lum b
          ON a.doc_id = b.doc_id AND b.f = a.f - 1 AND a.i = b.i
        GROUP BY a.doc_id, a.f),
      cuts AS (
        SELECT doc_id, 0 AS f FROM dims
        UNION ALL
        SELECT doc_id, f FROM sads WHERE sad >= 12 * 128),
      dg AS (
        SELECT l.doc_id, l.f AS frame_idx,
          sum(l.v) AS luma_sum, sum((l.i + 1) * l.v) AS luma_wsum
        FROM lum l JOIN cuts c ON l.doc_id = c.doc_id AND l.f = c.f
        GROUP BY l.doc_id, l.f)
      SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        16 AS width, 8 AS height,
        CAST(luma_sum AS BIGINT) AS luma_sum,
        CAST(luma_wsum AS BIGINT) AS luma_wsum
      FROM dg ORDER BY doc_id, frame_idx""")),

    // Video near-dup pairs over planted identities — the m12 scheme for
    // the video modality: ids ≡ 0 mod 97 share one clip; ids ≡ 0 mod 89
    // (not 97) carry the SAME clip at double brightness (luma capped at
    // 100 so ×2 never clamps — the ratio-form bits are scale-invariant,
    // hamming 0); everyone else gets genuinely different footage via a
    // splitmix-finalized luma (the m11 lesson: linear-residue patterns
    // collide HONESTLY under sum-based bits — plant uniqueness with a
    // nonlinear mix). NOW FULLY ORACLE-GATED (r13, the m09/m12
    // treatment — see the oracle SQL below); constructed-hamming
    // semantics and the bits↔hash repack additionally spec-gated in
    // Y4mSpec.
    ("m22_video_neardup", (s: SparkSession, d: String) => {
      val media = m22Media(s, d)
      videoNearDups(media, maxHamming = 2,
          // keyBits pinned to 16: the dialect-shared banding contract
          // (see m09) the oracle recomputes
          keyBits = 16)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    // The m09/m12 oracle treatment for the video modality: DuckDB
    // rebuilds the temporal×spatial fingerprint cube from the planted
    // luma formulas — the unique-footage family through the FULL
    // splitmix64 finalizer in HUGEINT mod-2^64 arithmetic (both 64×64
    // multiplies split into 32-bit halves) — then the 16-bit bands,
    // the bucket cap, the candidate equi-join, and the exact hamming
    // verdict.
    Some("""WITH px AS (
        SELECT d.doc_id, f.f, x.x, y.y FROM documents d,
          (SELECT CAST(unnest(range(0, 6)) AS BIGINT) AS f) f,
          (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS x) x,
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS y) y),
      z0 AS (
        SELECT doc_id, f, x, y,
          (doc_id::HUGEINT * 1099511628211 + f * 8191 + (y * 16 + x)
            + 11400714819323198485::HUGEINT)
            % 18446744073709551616::HUGEINT AS z
        FROM px),
      za AS (SELECT doc_id, f, x, y,
        xor(z, z // 1073741824::HUGEINT) AS z FROM z0),
      zb AS (SELECT doc_id, f, x, y,
        ((z % 4294967296::HUGEINT) * 484763065::HUGEINT
          + (((z % 4294967296::HUGEINT) * 3210233709::HUGEINT
              + (z // 4294967296::HUGEINT) * 484763065::HUGEINT)
            % 4294967296::HUGEINT) * 4294967296::HUGEINT)
          % 18446744073709551616::HUGEINT AS z FROM za),
      zc AS (SELECT doc_id, f, x, y,
        xor(z, z // 134217728::HUGEINT) AS z FROM zb),
      zd AS (SELECT doc_id, f, x, y,
        ((z % 4294967296::HUGEINT) * 321982955::HUGEINT
          + (((z % 4294967296::HUGEINT) * 2496678331::HUGEINT
              + (z // 4294967296::HUGEINT) * 321982955::HUGEINT)
            % 4294967296::HUGEINT) * 4294967296::HUGEINT)
          % 18446744073709551616::HUGEINT AS z FROM zc),
      ze AS (SELECT doc_id, f, x, y,
        xor(z, z // 2147483648::HUGEINT) AS z FROM zd),
      lum AS (
        SELECT p.doc_id, p.f, p.x, p.y,
          CASE WHEN p.doc_id % 97 = 0
              THEN (p.x * 3 + p.y * 7 + p.f * 11 + 13) % 101
            WHEN p.doc_id % 89 = 0
              THEN ((p.x * 3 + p.y * 7 + p.f * 11 + 13) % 101) * 2
            ELSE CAST(e.z % 256 AS BIGINT) END AS v
        FROM px p JOIN ze e ON p.doc_id = e.doc_id AND p.f = e.f
          AND p.x = e.x AND p.y = e.y),
      cells AS (
        SELECT doc_id, (f * 4) // 6 AS t, y // 2 AS cy, x // 4 AS cx,
          sum(v) AS cs
        FROM lum GROUP BY doc_id, t, cy, cx),
      buckets AS (
        SELECT doc_id, t, sum(cs) AS bt FROM cells GROUP BY doc_id, t),
      bits AS (
        SELECT c.doc_id, (c.t * 4 + c.cy) * 4 + c.cx AS pos,
          CASE WHEN c.cs * 16 > b.bt THEN 1 ELSE 0 END AS bit
        FROM cells c JOIN buckets b
          ON c.doc_id = b.doc_id AND c.t = b.t),
      bands AS (
        SELECT doc_id, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM bits GROUP BY doc_id, blk),
      kept AS (
        SELECT doc_id, blk, key FROM (
          SELECT doc_id, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM bands) t WHERE n <= 100),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b
          ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id),
      ham AS (
        SELECT c.doc_a, c.doc_b,
          CAST(sum(abs(ba.bit - bb.bit)) AS INTEGER) AS hamming
        FROM cand c
        JOIN bits ba ON ba.doc_id = c.doc_a
        JOIN bits bb ON bb.doc_id = c.doc_b AND bb.pos = ba.pos
        GROUP BY c.doc_a, c.doc_b)
      SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 2
      ORDER BY doc_a, doc_b""")),

    // m22 SERVED FROM THE STORED HashIndex (the m37 amortization for
    // the video modality, completing the index-served media family:
    // m37 image→image, m38 video→image, m39 video→video): the corpus
    // side (doc_id ≢ 0 mod 10) fingerprints through the real Y4M
    // decode ONCE into a persisted index (build 80% → grow 20%), and
    // the batch (doc_id ≡ 0 mod 10) decodes only itself and probes.
    // FULLY oracle-gated: DuckDB rebuilds the temporal×spatial cube
    // from the planted luma formulas (incl. the splitmix64 finalizer
    // in HUGEINT mod-2^64 arithmetic), the 16-bit bands, the
    // stored-side-only bucket cap, the candidate equi-join, and the
    // exact hamming verdict. Served ≡ live parity is spec'd in
    // HashIndexSpec.
    ("m39_index_video_neardup", (s: SparkSession, d: String) => {
      val batch = m22Media(s, d).filter(col("doc_id") % 10 === 0)
      videoNearDupsAgainstIndex(
          HashIndex.load(s, videoHashIndexDir(s, d)), batch,
          maxHamming = 2, maxBucket = 100)
        .orderBy(col("doc_id"), col("corpus_id"))
    },
    Some("""WITH px AS (
        SELECT d.doc_id, f.f, x.x, y.y FROM documents d,
          (SELECT CAST(unnest(range(0, 6)) AS BIGINT) AS f) f,
          (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS x) x,
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS y) y),
      z0 AS (
        SELECT doc_id, f, x, y,
          (doc_id::HUGEINT * 1099511628211 + f * 8191 + (y * 16 + x)
            + 11400714819323198485::HUGEINT)
            % 18446744073709551616::HUGEINT AS z
        FROM px),
      za AS (SELECT doc_id, f, x, y,
        xor(z, z // 1073741824::HUGEINT) AS z FROM z0),
      zb AS (SELECT doc_id, f, x, y,
        ((z % 4294967296::HUGEINT) * 484763065::HUGEINT
          + (((z % 4294967296::HUGEINT) * 3210233709::HUGEINT
              + (z // 4294967296::HUGEINT) * 484763065::HUGEINT)
            % 4294967296::HUGEINT) * 4294967296::HUGEINT)
          % 18446744073709551616::HUGEINT AS z FROM za),
      zc AS (SELECT doc_id, f, x, y,
        xor(z, z // 134217728::HUGEINT) AS z FROM zb),
      zd AS (SELECT doc_id, f, x, y,
        ((z % 4294967296::HUGEINT) * 321982955::HUGEINT
          + (((z % 4294967296::HUGEINT) * 2496678331::HUGEINT
              + (z // 4294967296::HUGEINT) * 321982955::HUGEINT)
            % 4294967296::HUGEINT) * 4294967296::HUGEINT)
          % 18446744073709551616::HUGEINT AS z FROM zc),
      ze AS (SELECT doc_id, f, x, y,
        xor(z, z // 2147483648::HUGEINT) AS z FROM zd),
      lum AS (
        SELECT p.doc_id, p.f, p.x, p.y,
          CASE WHEN p.doc_id % 97 = 0
              THEN (p.x * 3 + p.y * 7 + p.f * 11 + 13) % 101
            WHEN p.doc_id % 89 = 0
              THEN ((p.x * 3 + p.y * 7 + p.f * 11 + 13) % 101) * 2
            ELSE CAST(e.z % 256 AS BIGINT) END AS v
        FROM px p JOIN ze e ON p.doc_id = e.doc_id AND p.f = e.f
          AND p.x = e.x AND p.y = e.y),
      cells AS (
        SELECT doc_id, (f * 4) // 6 AS t, y // 2 AS cy, x // 4 AS cx,
          sum(v) AS cs
        FROM lum GROUP BY doc_id, t, cy, cx),
      buckets AS (
        SELECT doc_id, t, sum(cs) AS bt FROM cells GROUP BY doc_id, t),
      bits AS (
        SELECT c.doc_id, (c.t * 4 + c.cy) * 4 + c.cx AS pos,
          CASE WHEN c.cs * 16 > b.bt THEN 1 ELSE 0 END AS bit
        FROM cells c JOIN buckets b
          ON c.doc_id = b.doc_id AND c.t = b.t),
      bands AS (
        SELECT doc_id, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM bits GROUP BY doc_id, blk),
      keptC AS (
        SELECT doc_id, blk, key FROM (
          SELECT doc_id, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM bands WHERE doc_id % 10 <> 0) t WHERE n <= 100),
      bandsB AS (
        SELECT doc_id, blk, key FROM bands WHERE doc_id % 10 = 0),
      cand AS (
        SELECT DISTINCT b.doc_id, c.doc_id AS corpus_id
        FROM bandsB b JOIN keptC c ON b.blk = c.blk AND b.key = c.key),
      ham AS (
        SELECT cd.doc_id, cd.corpus_id,
          CAST(sum(abs(ba.bit - bb.bit)) AS INTEGER) AS hamming
        FROM cand cd
        JOIN bits ba ON ba.doc_id = cd.doc_id
        JOIN bits bb ON bb.doc_id = cd.corpus_id AND bb.pos = ba.pos
        GROUP BY cd.doc_id, cd.corpus_id)
      SELECT doc_id, corpus_id, hamming FROM ham WHERE hamming <= 2
      ORDER BY doc_id, corpus_id""")),

    // Audio near-dup pairs over planted identities: ids ≡ 0 mod 97
    // share one waveform, ids ≡ 0 mod 89 (not 97) carry the same
    // waveform at half volume — amplitude-invariant, so hamming 0 —
    // everyone else gets genuinely different (multiplicative) waveforms.
    // NOW FULLY ORACLE-GATED (r13, the m09 treatment): keyBits pinned
    // to 16 makes the band keys contiguous hash slices, and DuckDB
    // recomputes the whole pipeline — WAV samples (incl. the splitmix64
    // finalizer in HUGEINT mod-2^64 arithmetic and the truncate-toward-
    // zero half-volume division), segment energies, energy-delta bits,
    // band keys, the >100 bucket cap, candidate equi-join, and the
    // exact hamming verdict. Constructed-hamming semantics additionally
    // spec-gated in WavSpec.
    ("m12_audio_neardup", (s: SparkSession, d: String) => {
      val wav = m12Media(s, d)
      audioNearDups(wav, maxHamming = 2, keyBits = 16)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH pos AS (
        SELECT d.doc_id, i.i FROM documents d,
          (SELECT CAST(unnest(range(0, 650)) AS BIGINT) AS i) i),
      mix AS (
        -- splitmix64 in HUGEINT; the 64x64 multiply is split into
        -- 32-bit halves (lo*cl + ((lo*ch + hi*cl) mod 2^32)*2^32, the
        -- hi*ch*2^64 term vanishing mod 2^64) because the naive
        -- product overflows INT128
        SELECT doc_id, i, xor(z2, z2 // 134217728::HUGEINT) AS z3 FROM (
          SELECT doc_id, i,
            ((zx % 4294967296::HUGEINT) * 321982955::HUGEINT
              + (((zx % 4294967296::HUGEINT) * 2496678331::HUGEINT
                  + (zx // 4294967296::HUGEINT) * 321982955::HUGEINT)
                % 4294967296::HUGEINT) * 4294967296::HUGEINT)
              % 18446744073709551616::HUGEINT AS z2
          FROM (
            SELECT doc_id, i, xor(z1, z1 // 1073741824::HUGEINT) AS zx
            FROM (
              SELECT doc_id, i,
                (i::HUGEINT * 11400714819323198485::HUGEINT +
                  doc_id::HUGEINT * 13787848793156543929::HUGEINT)
                  % 18446744073709551616::HUGEINT AS z1
              FROM pos) a0) a) b),
      sm AS (
        SELECT p.doc_id, p.i,
          CASE WHEN p.doc_id % 97 = 0 THEN (p.i * 53 + 17) % 3001 - 1500
            WHEN p.doc_id % 89 = 0 THEN
              CASE WHEN (p.i * 53 + 17) % 3001 - 1500 < 0
                THEN -((1500 - (p.i * 53 + 17) % 3001) // 2)
                ELSE ((p.i * 53 + 17) % 3001 - 1500) // 2 END
            ELSE CAST((CASE WHEN m.z3 >= 9223372036854775808::HUGEINT
                THEN m.z3 - 18446744073709551616::HUGEINT ELSE m.z3 END
                % 3801 + 3801) % 3801 - 1900 AS BIGINT)
          END AS s
        FROM pos p JOIN mix m ON p.doc_id = m.doc_id AND p.i = m.i),
      en AS (
        SELECT doc_id, i // 10 AS k, sum(abs(s)) AS e
        FROM sm GROUP BY doc_id, k),
      bits AS (
        SELECT doc_id, k AS pos,
          CASE WHEN lead(e) OVER (PARTITION BY doc_id ORDER BY k) > e
            THEN 1 ELSE 0 END AS bit
        FROM en WHERE k < 65),
      b64 AS (SELECT * FROM bits WHERE pos < 64),
      bands AS (
        SELECT doc_id, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM b64 GROUP BY doc_id, blk),
      kept AS (
        SELECT doc_id, blk, key FROM (
          SELECT doc_id, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM bands) t WHERE n <= 100),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b
          ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id),
      ham AS (
        SELECT c.doc_a, c.doc_b,
          CAST(sum(abs(ba.bit - bb.bit)) AS INTEGER) AS hamming
        FROM cand c
        JOIN b64 ba ON ba.doc_id = c.doc_a
        JOIN b64 bb ON bb.doc_id = c.doc_b AND bb.pos = ba.pos
        GROUP BY c.doc_a, c.doc_b)
      SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 2
      ORDER BY doc_a, doc_b""")),

    // m12 SERVED FROM THE STORED HashIndex — the audio modality's turn
    // (the serving family is now complete: m37 image→image, m38
    // video→image, m39 video→video, m40 audio→audio): the corpus side
    // (doc_id ≢ 0 mod 10) fingerprints through the real WAV decode ONCE
    // into a persisted index (build 80% → grow 20%), and the batch
    // (doc_id ≡ 0 mod 10) decodes only itself and probes. FULLY
    // oracle-gated: DuckDB rebuilds the energy-delta fingerprints from
    // the planted sample formulas (incl. splitmix64 in HUGEINT and the
    // truncate-toward-zero half-volume division), the 16-bit bands, the
    // stored-side-only bucket cap, the candidate equi-join, and the
    // exact hamming verdict. Served ≡ live parity spec'd in
    // HashIndexSpec.
    ("m40_index_audio_neardup", (s: SparkSession, d: String) => {
      val batch = m12Media(s, d).filter(col("doc_id") % 10 === 0)
      audioNearDupsAgainstIndex(
          HashIndex.load(s, audioHashIndexDir(s, d)), batch,
          maxHamming = 2, maxBucket = 100)
        .orderBy(col("doc_id"), col("corpus_id"))
    },
    Some("""WITH pos AS (
        SELECT d.doc_id, i.i FROM documents d,
          (SELECT CAST(unnest(range(0, 650)) AS BIGINT) AS i) i),
      mix AS (
        -- splitmix64 in HUGEINT; the 64x64 multiply is split into
        -- 32-bit halves (lo*cl + ((lo*ch + hi*cl) mod 2^32)*2^32, the
        -- hi*ch*2^64 term vanishing mod 2^64) because the naive
        -- product overflows INT128
        SELECT doc_id, i, xor(z2, z2 // 134217728::HUGEINT) AS z3 FROM (
          SELECT doc_id, i,
            ((zx % 4294967296::HUGEINT) * 321982955::HUGEINT
              + (((zx % 4294967296::HUGEINT) * 2496678331::HUGEINT
                  + (zx // 4294967296::HUGEINT) * 321982955::HUGEINT)
                % 4294967296::HUGEINT) * 4294967296::HUGEINT)
              % 18446744073709551616::HUGEINT AS z2
          FROM (
            SELECT doc_id, i, xor(z1, z1 // 1073741824::HUGEINT) AS zx
            FROM (
              SELECT doc_id, i,
                (i::HUGEINT * 11400714819323198485::HUGEINT +
                  doc_id::HUGEINT * 13787848793156543929::HUGEINT)
                  % 18446744073709551616::HUGEINT AS z1
              FROM pos) a0) a) b),
      sm AS (
        SELECT p.doc_id, p.i,
          CASE WHEN p.doc_id % 97 = 0 THEN (p.i * 53 + 17) % 3001 - 1500
            WHEN p.doc_id % 89 = 0 THEN
              CASE WHEN (p.i * 53 + 17) % 3001 - 1500 < 0
                THEN -((1500 - (p.i * 53 + 17) % 3001) // 2)
                ELSE ((p.i * 53 + 17) % 3001 - 1500) // 2 END
            ELSE CAST((CASE WHEN m.z3 >= 9223372036854775808::HUGEINT
                THEN m.z3 - 18446744073709551616::HUGEINT ELSE m.z3 END
                % 3801 + 3801) % 3801 - 1900 AS BIGINT)
          END AS s
        FROM pos p JOIN mix m ON p.doc_id = m.doc_id AND p.i = m.i),
      en AS (
        SELECT doc_id, i // 10 AS k, sum(abs(s)) AS e
        FROM sm GROUP BY doc_id, k),
      bits AS (
        SELECT doc_id, k AS pos,
          CASE WHEN lead(e) OVER (PARTITION BY doc_id ORDER BY k) > e
            THEN 1 ELSE 0 END AS bit
        FROM en WHERE k < 65),
      b64 AS (SELECT * FROM bits WHERE pos < 64),
      bands AS (
        SELECT doc_id, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM b64 GROUP BY doc_id, blk),
      keptC AS (
        SELECT doc_id, blk, key FROM (
          SELECT doc_id, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM bands WHERE doc_id % 10 <> 0) t WHERE n <= 100),
      bandsB AS (
        SELECT doc_id, blk, key FROM bands WHERE doc_id % 10 = 0),
      cand AS (
        SELECT DISTINCT b.doc_id, c.doc_id AS corpus_id
        FROM bandsB b JOIN keptC c ON b.blk = c.blk AND b.key = c.key),
      ham AS (
        SELECT cd.doc_id, cd.corpus_id,
          CAST(sum(abs(ba.bit - bb.bit)) AS INTEGER) AS hamming
        FROM cand cd
        JOIN b64 ba ON ba.doc_id = cd.doc_id
        JOIN b64 bb ON bb.doc_id = cd.corpus_id AND bb.pos = ba.pos
        GROUP BY cd.doc_id, cd.corpus_id)
      SELECT doc_id, corpus_id, hamming FROM ham WHERE hamming <= 2
      ORDER BY doc_id, corpus_id""")),

    // Image near-duplicate pairs over planted identities: ids ≡ 0 mod 97
    // share one image, ids ≡ 0 mod 89 (and not 97) carry the same image
    // with one corner block brightened (a hamming-1-or-2 edit), everyone
    // else is unique. NOW FULLY ORACLE-GATED (r13): with keyBits pinned
    // to 16, the rotated band keys collapse to contiguous 16-bit hash
    // slices — (h >>> 16·blk) & 0xffff, the shiftleft term contributing
    // only masked-away zeros — and DuckDB recomputes the WHOLE pipeline
    // on the per-bit table (PNG block sums → aHash bits → band keys →
    // >100 bucket cap → equi-join candidates → exact hamming ≤ 2), so a
    // decode, hash, banding, cap, or verify bug breaks the hash.
    // Planted-pair semantics additionally spec-gated in PngSpec over
    // hand-built bit patterns.
    ("m09_image_neardup", (s: SparkSession, d: String) => {
      import s.implicits._
      val png = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val w = 16; val h = 8
            val px =
              if (id % 97 == 0)
                Array.tabulate(w * h)(i =>
                  (((i % w) * 3L + (i / w) * 11L + 7L) % 256L).toInt)
              else if (id % 89 == 0)
                Array.tabulate(w * h) { i =>
                  val base = (((i % w) * 3L + (i / w) * 11L + 7L) % 256L).toInt
                  // brighten the (0,0) block: x<2, y=0
                  if (i % w < 2 && i / w == 0) (base + 96) % 256 else base
                }
              else {
                // unique images must vary MULTIPLICATIVELY per doc: the
                // hash is additive-shift invariant by construction (a
                // brightness offset moves every block sum and the total
                // in proportion), so `gradient + id` would collide all
                // "unique" docs onto one hash
                val m1 = (id * 2654435761L) % 251L + 2L
                val m2 = (id * 40503L) % 239L + 3L
                Array.tabulate(w * h)(i =>
                  (((i % w) * m1 + (i / w) * m2 + id) % 256L).toInt)
              }
            (id, "image",
              graft.kernel.Png.encode(graft.kernel.Png.Image(w, h, 1, 8, px)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      imageNearDupsWith(png, classOf[PngDecoder].getName, maxHamming = 2,
          // keyBits pinned to 16: the dialect-shared banding contract
          // (16-bit aligned slices) the oracle recomputes
          keyBits = 16)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH px AS (
        SELECT d.doc_id, x.x, y.y,
          CASE WHEN d.doc_id % 97 = 0 THEN (x.x * 3 + y.y * 11 + 7) % 256
            WHEN d.doc_id % 89 = 0 THEN
              CASE WHEN x.x < 2 AND y.y = 0
                THEN ((x.x * 3 + y.y * 11 + 7) % 256 + 96) % 256
                ELSE (x.x * 3 + y.y * 11 + 7) % 256 END
            ELSE (x.x * ((d.doc_id * 2654435761) % 251 + 2)
              + y.y * ((d.doc_id * 40503) % 239 + 3) + d.doc_id) % 256
          END AS v
        FROM documents d,
          (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS x) x,
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS y) y),
      blocks AS (
        SELECT doc_id, x // 2 AS bx, y AS by, sum(v) AS bsum
        FROM px GROUP BY doc_id, bx, by),
      tot AS (SELECT doc_id, sum(bsum) AS total FROM blocks GROUP BY doc_id),
      bits AS (
        SELECT b.doc_id, b.by * 8 + b.bx AS pos,
          CASE WHEN b.bsum * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM blocks b JOIN tot t USING (doc_id)),
      bands AS (
        SELECT doc_id, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM bits GROUP BY doc_id, blk),
      kept AS (
        SELECT doc_id, blk, key FROM (
          SELECT doc_id, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM bands) t WHERE n <= 100),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b
          ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id),
      ham AS (
        SELECT c.doc_a, c.doc_b,
          CAST(sum(abs(ba.bit - bb.bit)) AS INTEGER) AS hamming
        FROM cand c
        JOIN bits ba ON ba.doc_id = c.doc_a
        JOIN bits bb ON bb.doc_id = c.doc_b AND bb.pos = ba.pos
        GROUP BY c.doc_a, c.doc_b)
      SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 2
      ORDER BY doc_a, doc_b""")),

    // REAL JPEG decode, oracle-gated (the m07 treatment for the
    // crawl-dominant format): synthesize a baseline 4:2:0 color JFIF per
    // document from constant 8×8 tiles of gray-valued pixels — a
    // constant tile's DCT is DC-only, gray pixels make chroma exactly
    // 128, and flat quantization keeps both, so the lossy codec is
    // BIT-EXACT on this family (JpegSpec pins the theorem) and DuckDB
    // can recompute the decoded features arithmetically. Pins marker
    // parse → Huffman → dequant → IDCT → upsample → YCbCr→RGB → feature
    // math against an engine that never saw the JPEG.
    ("m14_jpeg_decode", (s: SparkSession, d: String) => {
      import s.implicits._
      val jpg = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val w = (16 * (1 + id % 2)).toInt
            val h = (16 * (1 + id % 3)).toInt
            val rgb = new Array[Int](w * h * 3)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = (((x / 8) * 31L + (y / 8) * 17L + id * 7L) % 256L).toInt
                val o = (y * w + x) * 3
                rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
                x += 1
              }
              y += 1
            }
            (id, "image", graft.kernel.Jpeg.encode(
              graft.kernel.Jpeg.Image(w, h, 3, rgb), subsample420 = true))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      decodeFeaturesWith(jpg, classOf[JpegDecoder].getName)
        .select(col("doc_id"), col("width"), col("height"), col("channel_mean"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dims AS (
        SELECT doc_id,
          CAST(16 * (1 + doc_id % 2) AS INTEGER) AS width,
          CAST(16 * (1 + doc_id % 3) AS INTEGER) AS height
        FROM documents),
      bxs AS (
        SELECT doc_id, width, height, unnest(range(0, width // 8)) AS bx FROM dims),
      blocks AS (
        SELECT doc_id, width, height, bx, unnest(range(0, height // 8)) AS by FROM bxs),
      vals AS (
        SELECT doc_id, width, height,
          (bx * 31 + by * 17 + doc_id * 7) % 256 AS v
        FROM blocks)
      SELECT doc_id, width, height,
        -- 64 px per tile, 3 identical channels; numerator and
        -- denominator match the Spark division operand-for-operand
        CAST(sum(v) * 64 * 3 AS DOUBLE) / (width * height * 3) AS channel_mean
      FROM vals GROUP BY doc_id, width, height ORDER BY doc_id""")),

    // Perceptual hash through the REAL JPEG decoder, oracle-gated (the
    // m08 treatment): grayscale constant-tile JPEGs decode bit-exact,
    // every 4×4 hash cell lies inside one 8×8 tile, so DuckDB recomputes
    // every hash bit from the tile formula — decode → block-sum → bit →
    // row-byte across the JPEG path, hash-verified end to end.
    ("m15_jpeg_hash", (s: SparkSession, d: String) => {
      import s.implicits._
      val jpg = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val w = 32; val h = 32
            val px = Array.tabulate(w * h) { i =>
              val bx = (i % w) / 8; val by = (i / w) / 8
              ((bx * 29L + by * 13L + id * 5L) % 256L).toInt
            }
            (id, "image", graft.kernel.Jpeg.encode(
              graft.kernel.Jpeg.Image(w, h, 1, px)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      imageHashesWith(jpg, classOf[JpegDecoder].getName)
        .select(col("doc_id"), col("width"), col("height"),
          // scalar encoding for the driver's sort-based harness (see m08)
          array_join(col("row_bytes").cast("array<string>"), "-")
            .as("row_bytes"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH cs AS (
        SELECT doc_id, unnest(range(0, 8)) AS cx FROM documents),
      cells AS (
        SELECT doc_id, cx, unnest(range(0, 8)) AS cy FROM cs),
      sums AS ( -- 4×4-pixel hash cell inside the constant 8×8 tile
        SELECT doc_id, cx, cy,
          16 * (((cx // 2) * 29 + (cy // 2) * 13 + doc_id * 5) % 256) AS bsum
        FROM cells),
      tot AS (SELECT doc_id, sum(bsum) AS total FROM sums GROUP BY doc_id),
      bits AS (
        SELECT s.doc_id, s.cx, s.cy,
          CASE WHEN s.bsum * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM sums s JOIN tot t ON s.doc_id = t.doc_id),
      rws AS (
        SELECT doc_id, cy, CAST(sum(bit * (1 << cx)) AS INTEGER) AS row_byte
        FROM bits GROUP BY doc_id, cy)
      SELECT doc_id, 32 AS width, 32 AS height,
        string_agg(CAST(row_byte AS VARCHAR), '-' ORDER BY cy) AS row_bytes
      FROM rws GROUP BY doc_id ORDER BY doc_id""")),

    // PROGRESSIVE JPEG decode, oracle-gated: the same constant-tile
    // exactness as m14, but through the SOF2 multi-scan path — DC
    // first/refinement scans, spectral AC bands, successive-approximation
    // refinement with EOB runs — so the whole progressive protocol is
    // hash-verified against DuckDB recomputing the tile arithmetic.
    // (Real crawls are a substantial fraction progressive; a
    // baseline-only decoder silently drops them to the DLQ.)
    ("m17_jpeg_progressive", (s: SparkSession, d: String) => {
      import s.implicits._
      val jpg = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val w = (8 * (2 + id % 3)).toInt
            val h = 16
            val px = Array.tabulate(w * h) { i =>
              val bx = (i % w) / 8; val by = (i / w) / 8
              ((bx * 29L + by * 13L + id * 11L) % 256L).toInt
            }
            (id, "image", graft.kernel.Jpeg.encodeProgressive(
              graft.kernel.Jpeg.Image(w, h, 1, px)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      decodeFeaturesWith(jpg, classOf[JpegDecoder].getName)
        .select(col("doc_id"), col("width"), col("height"), col("channel_mean"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dims AS (
        SELECT doc_id,
          CAST(8 * (2 + doc_id % 3) AS INTEGER) AS width,
          16 AS height
        FROM documents),
      bxs AS (
        SELECT doc_id, width, height, unnest(range(0, width // 8)) AS bx FROM dims),
      blocks AS (
        SELECT doc_id, width, height, bx, unnest(range(0, height // 8)) AS by FROM bxs),
      vals AS (
        SELECT doc_id, width, height,
          (bx * 29 + by * 13 + doc_id * 11) % 256 AS v
        FROM blocks)
      SELECT doc_id, width, height,
        CAST(sum(v) * 64 AS DOUBLE) / (width * height) AS channel_mean
      FROM vals GROUP BY doc_id, width, height ORDER BY doc_id""")),

    // EXIF-orientation-normalized perceptual hash, oracle-gated: every
    // document's constant-tile JPEG is STORED rotated (orientation tag
    // 6), and DuckDB recomputes the hash bits from the DISPLAY-side
    // pixel formula — so the gate fails unless decode applies the EXIF
    // remap exactly (dimension swap included). This is the phone-photo
    // dedup requirement: the hash must see the picture, not the storage.
    ("m18_jpeg_orientation", (s: SparkSession, d: String) => {
      import s.implicits._
      val jpg = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val w = 24; val h = 16 // stored; displays as 16×24 under tag 6
            val px = Array.tabulate(w * h) { i =>
              val bx = (i % w) / 8; val by = (i / w) / 8
              ((bx * 19L + by * 23L + id * 13L) % 256L).toInt
            }
            (id, "image", graft.kernel.Jpeg.encode(
              graft.kernel.Jpeg.Image(w, h, 1, px), orientation = 6))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      imageHashesWith(jpg, classOf[JpegDecoder].getName)
        .select(col("doc_id"), col("width"), col("height"),
          array_join(col("row_bytes").cast("array<string>"), "-")
            .as("row_bytes"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH xs AS (
        SELECT doc_id, unnest(range(0, 16)) AS x FROM documents),
      pix AS (
        SELECT doc_id, x, unnest(range(0, 24)) AS y FROM xs),
      -- display pixel (x,y) sources stored tile (y//8, 1 - x//8):
      -- tag 6 means rotate the stored 24x16 image 90 deg clockwise
      cells AS (
        SELECT doc_id, CAST(x // 2 AS INTEGER) AS bx, CAST(y // 3 AS INTEGER) AS by,
          ((y // 8) * 19 + (1 - x // 8) * 23 + doc_id * 13) % 256 AS v
        FROM pix),
      sums AS (
        SELECT doc_id, bx, by, sum(v) AS bsum FROM cells GROUP BY doc_id, bx, by),
      tot AS (SELECT doc_id, sum(bsum) AS total FROM sums GROUP BY doc_id),
      bits AS (
        SELECT s.doc_id, s.bx, s.by,
          CASE WHEN s.bsum * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM sums s JOIN tot t ON s.doc_id = t.doc_id),
      rws AS (
        SELECT doc_id, by, CAST(sum(bit * (1 << bx)) AS INTEGER) AS row_byte
        FROM bits GROUP BY doc_id, by)
      SELECT doc_id, 16 AS width, 24 AS height,
        string_agg(CAST(row_byte AS VARCHAR), '-' ORDER BY by) AS row_bytes
      FROM rws GROUP BY doc_id ORDER BY doc_id""")),

    // Real-GIF decode, oracle-gated end to end: per-document grayscale
    // formula images, LZW-compressed into real GIF containers (every
    // third document INTERLACED — the decode result is identical, so
    // the same oracle pins both row orders), decoded through the full
    // LZW → palette → composite path, features recomputed by DuckDB
    // from the pixel formula. GIF is lossless, so no constant-tile
    // exactness theorem is needed — ANY formula round-trips bit-exact.
    ("m19_gif_decode", (s: SparkSession, d: String) => {
      import s.implicits._
      val gif = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val w = (9 + id % 14).toInt
            val h = (7 + id % 6).toInt
            val px = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                px(y * w + x) = ((x * 5L + y * 3L + id) % 256L).toInt
                x += 1
              }
              y += 1
            }
            (id, "image", graft.kernel.Gif.encode(
              graft.kernel.Gif.Image(w, h, 1, px), interlaced = id % 3 == 0))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      decodeFeaturesWith(gif, classOf[GifDecoder].getName)
        .select(col("doc_id"), col("width"), col("height"), col("channel_mean"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dims AS (
        SELECT doc_id,
          CAST(9 + doc_id % 14 AS INTEGER) AS width,
          CAST(7 + doc_id % 6 AS INTEGER) AS height
        FROM documents),
      xs AS (
        SELECT doc_id, width, height, unnest(range(0, width)) AS x FROM dims),
      px AS (
        SELECT doc_id, width, height,
          (x * 5 + 3 * unnest(range(0, height)) + doc_id) % 256 AS v
        FROM xs)
      SELECT doc_id, width, height,
        -- gray expands to (v,v,v): numerator and denominator mirror the
        -- Spark division operand-for-operand (3·sum over 3·pixels)
        CAST(sum(v) * 3 AS DOUBLE) / (width * height * 3) AS channel_mean
      FROM px GROUP BY doc_id, width, height ORDER BY doc_id""")),

    // Animated-GIF frame stats, oracle-gated: full-frame animations
    // (disposal none — composited canvas == frame raster), stride-2
    // sampling, exact-integer RGB stats recomputed by DuckDB per
    // sampled frame. The m13 video treatment for the GIF container.
    ("m20_gif_frames", (s: SparkSession, d: String) => {
      import s.implicits._
      val w = 12; val h = 7
      val gif = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val nf = (3 + id % 3).toInt
            val frames = Seq.tabulate(nf) { f =>
              Array.tabulate(w * h) { i =>
                (((i % w) * 7L + (i / w) * 11L + f * 29L + id * 3L) % 256L).toInt
              }
            }
            (id, "image",
              graft.kernel.Gif.encodeAnimation(w, h, frames, channels = 1))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      gifFrameStats(gif, stride = 2)
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""WITH dims AS (
        SELECT doc_id, CAST(3 + doc_id % 3 AS INTEGER) AS nf FROM documents),
      fr AS (
        SELECT doc_id, unnest(range(0, nf)) AS f FROM dims),
      sampled AS (SELECT doc_id, CAST(f AS INTEGER) AS f FROM fr WHERE f % 2 = 0),
      xs AS (
        SELECT doc_id, f, unnest(range(0, 12)) AS x FROM sampled),
      px AS (
        SELECT doc_id, f, x, unnest(range(0, 7)) AS y FROM xs),
      vals AS (
        SELECT doc_id, f, (x * 7 + y * 11 + f * 29 + doc_id * 3) % 256 AS v
        FROM px)
      SELECT doc_id, f AS frame_idx, 12 AS width, 7 AS height,
        CAST(sum(v) * 3 AS BIGINT) AS rgb_sum,
        CAST(min(v) AS INTEGER) AS v_min,
        CAST(max(v) AS INTEGER) AS v_max
      FROM vals GROUP BY doc_id, f ORDER BY doc_id, frame_idx""")),

    // Real-WebP decode, oracle-gated end to end: per-document RGB
    // formula images encoded as lossless VP8L containers (real Huffman
    // codes through the code-length coder), decoded through the full
    // RIFF → VP8L → prefix-code path, features recomputed by DuckDB
    // from the pixel formula. VP8L is lossless, so ANY formula
    // round-trips bit-exact (the m19 GIF treatment — no constant-tile
    // theorem needed).
    ("m29_webp_decode", (s: SparkSession, d: String) => {
      import s.implicits._
      val webp = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val w = (9 + id % 14).toInt
            val h = (7 + id % 6).toInt
            val px = new Array[Int](w * h * 3)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val base = (y * w + x) * 3
                px(base) = ((x * 5L + y * 3L + id) % 256L).toInt
                px(base + 1) = ((x * 7L + y * 11L + id * 3L) % 256L).toInt
                px(base + 2) = ((x * 13L + y * 17L + id * 5L) % 256L).toInt
                x += 1
              }
              y += 1
            }
            (id, "image", graft.kernel.Webp.encode(
              graft.kernel.Webp.Image(w, h, 3, px)))
          }
        }
        .toDF("doc_id", "media_type", "payload")
      decodeFeaturesWith(webp, classOf[WebpDecoder].getName)
        .select(col("doc_id"), col("width"), col("height"), col("channel_mean"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dims AS (
        SELECT doc_id,
          CAST(9 + doc_id % 14 AS INTEGER) AS width,
          CAST(7 + doc_id % 6 AS INTEGER) AS height
        FROM documents),
      xs AS (
        SELECT doc_id, width, height, unnest(range(0, width)) AS x FROM dims),
      xy AS (
        SELECT doc_id, width, height, x, unnest(range(0, height)) AS y FROM xs),
      px AS (
        SELECT doc_id, width, height,
          (x * 5 + y * 3 + doc_id) % 256 +
          (x * 7 + y * 11 + doc_id * 3) % 256 +
          (x * 13 + y * 17 + doc_id * 5) % 256 AS v
        FROM xy)
      SELECT doc_id, width, height,
        CAST(sum(v) AS DOUBLE) / (width * height * 3) AS channel_mean
      FROM px GROUP BY doc_id, width, height ORDER BY doc_id""")),

    // Cross-container image near-dups — the real-crawl dedup story: the
    // SAME picture saved as PNG by one site, re-saved as JPEG by
    // another, and exported as GIF by a third must collapse onto one
    // perceptual hash, because pixels, not container bytes, decide
    // duplication. ids ≡ 0 mod 97 carry a constant-tile image as PNG;
    // ids ≡ 0 mod 89 carry the IDENTICAL pixels as JPEG (constant tiles
    // make the JPEG re-encode lossless); ids ≡ 0 mod 83 the same pixels
    // as GIF (lossless by nature; its RGB expansion scales every block
    // sum by 3, which the ratio-form hash bits are invariant to) —
    // hamming 0 across all three formats — and ids ≡ 0 mod 79 the same
    // pixels again as lossless WebP (VP8L; its RGB expansion is the
    // same ×3 the ratio-form bits ignore). Everyone else is unique
    // (multiplicative variation, container rotating by id mod 4).
    // NOW FULLY ORACLE-GATED (r14, the m09/m12/m22 conversion): with
    // keyBits pinned to 16 the band keys are contiguous 16-bit hash
    // slices, and because each hash cell is exactly one constant 8×8
    // tile, DuckDB recomputes the whole pipeline from the TILE values
    // (ratio-form bits are invariant to each container's ×1/×3 channel
    // expansion) — tile grid → bits → band keys → cap → candidates →
    // exact hamming ≤ 2. A decode bug in ANY of the four codecs, or a
    // banding/cap/verify bug, breaks the hash. Cross-format collapse
    // additionally spec-gated in JpegSpec and WebpSpec.
    ("m16_mixed_image_neardup", (s: SparkSession, d: String) => {
      val media = mixedContainerMedia(s, d)
      imageNearDupsWith(media, classOf[ImageDecoder].getName, maxHamming = 2,
          // keyBits pinned to 16: the dialect-shared banding contract
          // (16-bit aligned slices) the oracle recomputes; an explicit
          // keyBits also skips the sigCount sizing pass entirely
          keyBits = 16)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH grid AS (
        SELECT bx.bx, by.by FROM
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS bx) bx,
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS by) by),
      cells AS (
        SELECT d.doc_id, g.by * 8 + g.bx AS pos,
          CASE WHEN d.doc_id % 97 = 0 THEN (g.bx * 57 + g.by * 131 + 23) % 256
            WHEN d.doc_id % 89 = 0 THEN (g.bx * 57 + g.by * 131 + 23) % 256
            WHEN d.doc_id % 83 = 0 THEN (g.bx * 57 + g.by * 131 + 23) % 256
            WHEN d.doc_id % 79 = 0 THEN (g.bx * 57 + g.by * 131 + 23) % 256
            ELSE (g.bx * ((d.doc_id * 2654435761) % 251 + 2)
              + g.by * ((d.doc_id * 40503) % 239 + 3) + d.doc_id) % 256
          END AS v
        FROM documents d, grid g),
      tot AS (SELECT doc_id, sum(v) AS total FROM cells GROUP BY doc_id),
      bits AS (
        SELECT c.doc_id, c.pos,
          CASE WHEN c.v * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM cells c JOIN tot t USING (doc_id)),
      bands AS (
        SELECT doc_id, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM bits GROUP BY doc_id, blk),
      kept AS (
        SELECT doc_id, blk, key FROM (
          SELECT doc_id, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM bands) t WHERE n <= 100),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b
          ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id),
      ham AS (
        SELECT c.doc_a, c.doc_b,
          CAST(sum(abs(ba.bit - bb.bit)) AS INTEGER) AS hamming
        FROM cand c
        JOIN bits ba ON ba.doc_id = c.doc_a
        JOIN bits bb ON bb.doc_id = c.doc_b AND bb.pos = ba.pos
        GROUP BY c.doc_a, c.doc_b)
      SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 2
      ORDER BY doc_a, doc_b""")),

    // m16 SERVED FROM THE STORED HashIndex (the r04/r05→r08/r09
    // amortization applied to the last index family): the corpus side
    // (doc_id ≢ 0 mod 10) hashes through the real four-container decode
    // ONCE into a persisted index (build 80% → grow 20%), and the batch
    // (doc_id ≡ 0 mod 10) probes it — the live m16 form re-hashes and
    // re-bands the whole corpus per call; this one decodes only the
    // batch. The oracle replays the ENTIRE pipeline from the tile
    // congruences — tile grid → ratio bits → 16-bit band slices →
    // stored-side bucket cap → candidate join → exact hamming — so a
    // decode, banding, grow, cap, or verify bug anywhere breaks the
    // hash. Bit parity with the live form is spec'd in HashIndexSpec.
    ("m37_index_mixed_neardup", (s: SparkSession, d: String) => {
      val batch = mixedContainerMedia(s, d).filter(col("doc_id") % 10 === 0)
      imageNearDupsAgainstIndex(
          HashIndex.load(s, mixedHashIndex(s, d)), batch,
          classOf[ImageDecoder].getName, maxHamming = 2, maxBucket = 100)
        .orderBy(col("doc_id"), col("corpus_id"))
    },
    Some("""WITH grid AS (
        SELECT bx.bx, by.by FROM
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS bx) bx,
          (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS by) by),
      cells AS (
        SELECT d.doc_id, g.by * 8 + g.bx AS pos,
          CASE WHEN d.doc_id % 97 = 0 THEN (g.bx * 57 + g.by * 131 + 23) % 256
            WHEN d.doc_id % 89 = 0 THEN (g.bx * 57 + g.by * 131 + 23) % 256
            WHEN d.doc_id % 83 = 0 THEN (g.bx * 57 + g.by * 131 + 23) % 256
            WHEN d.doc_id % 79 = 0 THEN (g.bx * 57 + g.by * 131 + 23) % 256
            ELSE (g.bx * ((d.doc_id * 2654435761) % 251 + 2)
              + g.by * ((d.doc_id * 40503) % 239 + 3) + d.doc_id) % 256
          END AS v
        FROM documents d, grid g),
      tot AS (SELECT doc_id, sum(v) AS total FROM cells GROUP BY doc_id),
      bits AS (
        SELECT c.doc_id, c.pos,
          CASE WHEN c.v * 64 > t.total THEN 1 ELSE 0 END AS bit
        FROM cells c JOIN tot t USING (doc_id)),
      bands AS (
        SELECT doc_id, pos // 16 AS blk,
          sum(bit * (1 << (pos % 16))) AS key
        FROM bits GROUP BY doc_id, blk),
      keptC AS (
        SELECT doc_id, blk, key FROM (
          SELECT doc_id, blk, key,
            count(*) OVER (PARTITION BY blk, key) AS n
          FROM bands WHERE doc_id % 10 <> 0) t WHERE n <= 100),
      bandsB AS (
        SELECT doc_id, blk, key FROM bands WHERE doc_id % 10 = 0),
      cand AS (
        SELECT DISTINCT b.doc_id, c.doc_id AS corpus_id
        FROM bandsB b JOIN keptC c ON b.blk = c.blk AND b.key = c.key),
      ham AS (
        SELECT cd.doc_id, cd.corpus_id,
          CAST(sum(abs(ba.bit - bb.bit)) AS INTEGER) AS hamming
        FROM cand cd
        JOIN bits ba ON ba.doc_id = cd.doc_id
        JOIN bits bb ON bb.doc_id = cd.corpus_id AND bb.pos = ba.pos
        GROUP BY cd.doc_id, cd.corpus_id)
      SELECT doc_id, corpus_id, hamming FROM ham WHERE hamming <= 2
      ORDER BY doc_id, corpus_id""")),

    // Per-label embedding band statistics through the mergeable
    // BandStats aggregator (A12's raster-stats shape over float arrays).
    // FULL oracle since r18: everything the REGISTERED output carries is
    // order-free — count/min/max exactly, and the histogram-interpolated
    // p50 is a FIXED-ORDER double formula over exact integer bin counts
    // (bin = trunc-toward-zero of (v+1)/2·20 clamped to [0,19]; the
    // first bin whose cumulative count reaches 0.5·n supplies
    // histMin + (bin + (target−acc)/h)·w, clamped to [min,max]) that
    // DuckDB replays op for op. The Chan-merged mean/m2 the aggregator
    // also maintains stay OUT of the registered output (order-sensitive
    // in the last ulp — partition-independence of the rest is spec-gated
    // in KernelSpec).
    ("m03_band_stats", (s: SparkSession, d: String) => {
      import s.implicits._
      val agg = graft.kernel.BandStats.Agg(-1.0, 1.0, bins = 20)
      graft.Tables.embeddings(s, d)
        .select(col("label"), col("embedding"))
        .as[(Int, Array[Float])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg.toColumn.name("stats"))
        .map { case (label, st) =>
          (label, st.count, st.min, st.max, st.p50) }
        .toDF("label", "n_values", "min_v", "max_v", "p50")
        .orderBy(col("label"))
    },
    Some("""WITH vals AS (
        SELECT label, CAST(UNNEST(embedding) AS DOUBLE) AS v FROM embeddings),
      base AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n_values,
          min(v) AS min_v, max(v) AS max_v
        FROM vals GROUP BY label),
      binned AS (
        SELECT label,
          GREATEST(0, LEAST(19, CAST(trunc(
            (v - (-1.0)) / (1.0 - (-1.0)) * 20) AS INTEGER))) AS bin
        FROM vals),
      hist AS (
        SELECT label, bin, count(*) AS h FROM binned GROUP BY label, bin),
      cum AS (
        SELECT label, bin, h,
          sum(h) OVER (PARTITION BY label ORDER BY bin) AS cumh
        FROM hist),
      sel AS (
        SELECT label, bin, h, acc FROM (
          SELECT c.label, c.bin, c.h, c.cumh - c.h AS acc,
            row_number() OVER (PARTITION BY c.label ORDER BY c.bin) AS rn
          FROM cum c JOIN base b ON b.label = c.label
          WHERE c.h > 0
            AND CAST(c.cumh AS DOUBLE) >= 0.5 * CAST(b.n_values AS DOUBLE)) z
        WHERE rn = 1)
      SELECT b.label, b.n_values, b.min_v, b.max_v,
        GREATEST(b.min_v, LEAST(b.max_v,
          -1.0 + (s.bin + (0.5 * CAST(b.n_values AS DOUBLE)
            - CAST(s.acc AS DOUBLE)) / CAST(s.h AS DOUBLE))
            * ((1.0 - (-1.0)) / 20))) AS p50
      FROM base b JOIN sel s ON s.label = b.label
      ORDER BY b.label""")),

    // m03's oracle-stable twin: every output survives the hash compare
    // because the arithmetic is exact — count/min/max are order-free,
    // the "sum" is an integer sum of floor(v·2^24) fixed-point values
    // (float32 inputs fit losslessly in double; floor+BIGINT-sum are
    // bit-identical across engines where a float sum is not), and the
    // median is the LOWER-median ELEMENT picked by rank (quantile
    // interpolation differs between engines in the last ulp).
    ("m06_band_stats_exact", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      // ONE exchange: the rank window hash-partitions by label, and the
      // following groupBy(label) reuses that partitioning (no second
      // shuffle) — the median element is just a conditional min over the
      // already-ranked rows
      val vals = graft.Tables.embeddings(s, d)
        .select(col("label"), explode(col("embedding")).as("v"))
        .withColumn("v", col("v").cast("double"))
      vals
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("label")).orderBy(col("v"))))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("label"))))
        .groupBy(col("label")).agg(
          count(lit(1)).as("n_values"),
          min(col("v")).as("min_v"),
          max(col("v")).as("max_v"),
          sum(floor(col("v") * 16777216).cast("long")).as("sum_q24"),
          min(when(col("rn") === expr("(cnt + 1) div 2"), col("v")))
            .as("median_lo"))
        .orderBy(col("label"))
    },
    Some("""WITH vals AS (
        SELECT label, CAST(UNNEST(embedding) AS DOUBLE) AS v FROM embeddings),
      ranked AS (
        SELECT label, v,
          row_number() OVER (PARTITION BY label ORDER BY v) AS rn,
          count(*) OVER (PARTITION BY label) AS cnt FROM vals)
      SELECT label, count(*) AS n_values, min(v) AS min_v, max(v) AS max_v,
        CAST(sum(CAST(floor(v * 16777216) AS BIGINT)) AS BIGINT) AS sum_q24,
        min(CASE WHEN rn = (cnt + 1) // 2 THEN v END) AS median_lo
      FROM ranked GROUP BY label ORDER BY label""")),

    // MP4 structural metadata, oracle-gated: the ISO BMFF box walk
    // (kernel/Mp4.scala) over planted containers — brand, EXACT
    // integer-floored duration from mvhd timescale/duration, per-track
    // handler/codec/dims from tkhd+hdlr+stsd; every third file is
    // video+audio, the rest audio-only. H.264/AAC payloads stay
    // undecodable by contract — this is the decode-free filter table
    // (the m25 rule) for the dominant VIDEO container a crawl yields.
    ("m30_video_meta", (s: SparkSession, d: String) => {
      import s.implicits._
      val media = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val brand = if (id % 2 == 0) "isom" else "mp42"
            val dur = (id % 100 + 1) * 600 + (id % 7) * 60
            val tracks =
              if (id % 3 == 0)
                Seq(graft.kernel.Mp4.Track("vide", "avc1",
                  (320 + id % 64).toInt, (180 + id % 36).toInt),
                  graft.kernel.Mp4.Track("soun", "mp4a", 0, 0))
              else Seq(graft.kernel.Mp4.Track("soun", "mp4a", 0, 0))
            (id, graft.kernel.Mp4.encodeHeader(brand, 600, dur, tracks))
          }
        }
        .toDF("doc_id", "payload")
      media.as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, p) =>
            val m = graft.kernel.Mp4.metadata(p)
            val v = m.video
            (id, m.brand, m.durationMs, m.tracks.length,
              v.map(_.codec).getOrElse(""), v.map(_.width).getOrElse(0),
              v.map(_.height).getOrElse(0),
              m.audio.map(_.codec).getOrElse(""))
          }
        }
        .toDF("doc_id", "brand", "duration_ms", "n_tracks", "video_codec",
          "width", "height", "audio_codec")
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
        ((doc_id % 100 + 1) * 600 + (doc_id % 7) * 60) * 1000 // 600
          AS duration_ms,
        CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS n_tracks,
        CASE WHEN doc_id % 3 = 0 THEN 'avc1' ELSE '' END AS video_codec,
        CASE WHEN doc_id % 3 = 0 THEN CAST(320 + doc_id % 64 AS INTEGER)
          ELSE 0 END AS width,
        CASE WHEN doc_id % 3 = 0 THEN CAST(180 + doc_id % 36 AS INTEGER)
          ELSE 0 END AS height,
        'mp4a' AS audio_codec
      FROM documents ORDER BY doc_id""")),

    // MP3 structural metadata, oracle-gated: the frame-header walk
    // (kernel/Mp3.scala) over planted CBR streams — frame count, rates,
    // the EXACT sample-arithmetic duration
    // floor(frames·1152·1000/sampleRate), and the DECLARED text tags
    // (title/artist): the id mod 7 rotation plants an ID3v2.3
    // ISO-8859-1 tag with real TIT2/TPE1 frames + padding, an ID3v2.4
    // UTF-8 tag (syncsafe frame sizes), an ID3v1-only trailer, an
    // ID3v2.3 UTF-16 tag (BOM decode), an untagged file, an ID3v2.2
    // ISO-8859-1 tag (3-byte TT2/TP1 ids, 3-byte plain sizes — the
    // 1990s files real crawls still carry), and an ID3v2.2 UCS-2 tag —
    // every tag syntax decodes to the SAME DuckDB-recomputable string.
    // The Huffman audio payload stays undecodable by contract.
    ("m31_audio_meta", (s: SparkSession, d: String) => {
      import s.implicits._
      val rates = Array(96, 128, 192, 320)
      val srs = Array(44100, 48000, 32000)
      val media = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            import graft.kernel.Mp3
            val frames = (10 + id % 50).toInt
            val br = rates((id % 4).toInt)
            val sr = srs((id % 3).toInt)
            val title = s"T$id"
            val artist = s"A${id % 7}"
            val payload = (id % 7) match {
              case 0 => Mp3.encodeHeader(frames, br, sr,
                id3 = Mp3.encodeId3v2(title, artist, major = 3, enc = 0,
                  padding = (100 + id % 20).toInt))
              case 1 => Mp3.encodeHeader(frames, br, sr,
                id3 = Mp3.encodeId3v2(title, artist, major = 4, enc = 3))
              case 2 => Mp3.appendId3v1(
                Mp3.encodeHeader(frames, br, sr), title, artist)
              case 3 => Mp3.encodeHeader(frames, br, sr,
                id3 = Mp3.encodeId3v2(title, artist, major = 3, enc = 1))
              case 4 => Mp3.encodeHeader(frames, br, sr)
              case 5 => Mp3.encodeHeader(frames, br, sr,
                id3 = Mp3.encodeId3v2(title, artist, major = 2, enc = 0,
                  padding = (50 + id % 10).toInt))
              case _ => Mp3.encodeHeader(frames, br, sr,
                id3 = Mp3.encodeId3v2(title, artist, major = 2, enc = 1))
            }
            (id, payload)
          }
        }
        .toDF("doc_id", "payload")
      media.as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, p) =>
            val m = graft.kernel.Mp3.metadata(p)
            (id, m.version, m.sampleRate, m.bitrateKbps, m.frames,
              m.durationMs, m.title, m.artist)
          }
        }
        .toDF("doc_id", "version", "sample_rate", "bitrate_kbps", "frames",
          "duration_ms", "title", "artist")
        .orderBy(col("doc_id"))
    },
    Some("""WITH p AS (
        SELECT doc_id,
          CAST(10 + doc_id % 50 AS INTEGER) AS frames,
          CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 96 WHEN 1 THEN 128
            WHEN 2 THEN 192 ELSE 320 END AS bitrate_kbps,
          CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 44100 WHEN 1 THEN 48000
            ELSE 32000 END AS sample_rate
        FROM documents)
      SELECT doc_id, '1' AS version, sample_rate, bitrate_kbps, frames,
        CAST(frames AS BIGINT) * 1152 * 1000 // sample_rate AS duration_ms,
        CASE WHEN doc_id % 7 = 4 THEN '' ELSE 'T' || doc_id END AS title,
        CASE WHEN doc_id % 7 = 4 THEN '' ELSE 'A' || (doc_id % 7) END
          AS artist
      FROM p ORDER BY doc_id""")),

    // The full audio-container dispatch, oracle-gated: payloads rotate
    // Ogg-Opus (CRC-verified pages, 48 kHz granule math minus preSkip),
    // Ogg-Vorbis (granules at the stream rate), FLAC (STREAMINFO
    // bit-unpacking), and MP3 (frame walk + channel mode) — each with
    // planted params whose exact integer durations DuckDB recomputes.
    // A page-CRC, granule, bit-offset, or dispatch bug breaks the hash.
    ("m32_audio_containers", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.kernel.{Flac, Mp3, Ogg}
      val media = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val payload = (id % 4) match {
              // opus carries an OpusTags comment page (title only —
              // absent fields are omitted, the real-tagger shape);
              // vorbis a \x03vorbis comment page with both fields
              case 0 => Ogg.encodeOpusHeader((1 + id % 2).toInt, 312, 48000,
                312L + (id % 50 + 1) * 960L, title = s"OT$id")
              case 1 => Ogg.encodeVorbisHeader(2, 44100, (id % 60 + 1) * 4410L,
                title = s"VT$id", artist = s"VA${id % 5}")
              // flac carries a VORBIS_COMMENT block (artist only — the
              // omitted-field shape on this branch)
              case 2 => Flac.encodeHeader(22050, (1 + id % 2).toInt, 16,
                (id % 40 + 1) * 2205L, artist = s"FA${id % 4}")
              case _ =>
                val base = Mp3.encodeHeader((10 + id % 50).toInt, 128, 44100,
                  id3 = if (id % 8 == 3)
                    Mp3.encodeId3v2(s"MT$id", s"MA${id % 3}") else null)
                base
            }
            (id, "audio", payload)
          }
        }
        .toDF("doc_id", "media_type", "payload")
      media.select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, p) =>
            val (container, codec, ch, sr, dur, title, artist) =
              audioContainerMeta(p)
            (id, container, codec, ch, sr, dur, title, artist)
          }
        }
        .toDF("doc_id", "container", "codec", "channels", "sample_rate",
          "duration_ms", "title", "artist")
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN 'ogg' WHEN 1 THEN 'ogg' WHEN 2 THEN 'flac'
          ELSE 'mp3' END AS container,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN 'opus' WHEN 1 THEN 'vorbis' WHEN 2 THEN 'flac'
          ELSE 'mp3' END AS codec,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN CAST(1 + doc_id % 2 AS INTEGER)
          WHEN 1 THEN 2
          WHEN 2 THEN CAST(1 + doc_id % 2 AS INTEGER)
          ELSE 1 END AS channels,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN 48000 WHEN 1 THEN 44100 WHEN 2 THEN 22050
          ELSE 44100 END AS sample_rate,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN (doc_id % 50 + 1) * 20
          WHEN 1 THEN (doc_id % 60 + 1) * 100
          WHEN 2 THEN (doc_id % 40 + 1) * 100
          ELSE CAST(10 + doc_id % 50 AS BIGINT) * 1152 * 1000 // 44100
          END AS duration_ms,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN 'OT' || doc_id
          WHEN 1 THEN 'VT' || doc_id
          ELSE CASE WHEN doc_id % 8 = 3 THEN 'MT' || doc_id ELSE '' END
          END AS title,
        CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 1 THEN 'VA' || (doc_id % 5)
          WHEN 2 THEN 'FA' || (doc_id % 4)
          ELSE CASE WHEN doc_id % 8 = 3 THEN 'MA' || (doc_id % 3) ELSE '' END
          END AS artist
      FROM documents ORDER BY doc_id""")),

    // Matroska/WebM structural metadata, oracle-gated: the EBML vint
    // walk (kernel/Mkv.scala) over planted containers — DocType,
    // EXACT integer duration (planted at the default 1 ms
    // TimestampScale, so the float Duration element is integer-exact),
    // per-track type/codec, video pixel dims, audio channels + rate.
    // The rotation covers video+audio WebM, audio-only Matroska
    // (Vorbis), video-only WebM (VP8), and every fifth file a LIVE
    // stream (no Duration element → the -1 sentinel). VP8/VP9/Opus
    // payloads stay undecodable by contract — this is the decode-free
    // filter table (the m25/m30 rule) for the OTHER video container a
    // crawl yields.
    ("m33_webm_meta", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.kernel.Mkv
      val media = docIds(s, d)
        .mapPartitions { it =>
          it.map { id =>
            val tracks = (id % 3) match {
              case 0 => Seq(
                Mkv.Track("video", "V_VP9",
                  (640 + id % 16).toInt, (360 + id % 9).toInt, 0, 0),
                Mkv.Track("audio", "A_OPUS", 0, 0, 2, 48000))
              case 1 => Seq(
                Mkv.Track("audio", "A_VORBIS", 0, 0, (1 + id % 2).toInt,
                  44100))
              case _ => Seq(
                Mkv.Track("video", "V_VP8",
                  (320 + id % 32).toInt, (240 + id % 24).toInt, 0, 0))
            }
            val docType = if (id % 3 == 1) "matroska" else "webm"
            val dur: Double =
              if (id % 5 == 0) -1.0 else ((id % 90 + 1) * 500).toDouble
            (id, Mkv.encodeHeader(docType, 1000000L, dur, tracks))
          }
        }
        .toDF("doc_id", "payload")
      media.as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, p) =>
            val m = Mkv.metadata(p)
            val v = m.video
            val a = m.audio
            (id, m.docType, m.durationMs, m.tracks.length,
              v.map(_.codecId).getOrElse(""),
              v.map(_.width).getOrElse(0), v.map(_.height).getOrElse(0),
              a.map(_.codecId).getOrElse(""),
              a.map(_.channels).getOrElse(0),
              a.map(_.sampleRate).getOrElse(0))
          }
        }
        .toDF("doc_id", "doc_type", "duration_ms", "n_tracks",
          "video_codec", "width", "height", "audio_codec", "channels",
          "sample_rate")
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        CASE WHEN doc_id % 3 = 1 THEN 'matroska' ELSE 'webm' END
          AS doc_type,
        CASE WHEN doc_id % 5 = 0 THEN -1
          ELSE (doc_id % 90 + 1) * 500 END AS duration_ms,
        CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS n_tracks,
        CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'V_VP9'
          WHEN 2 THEN 'V_VP8' ELSE '' END AS video_codec,
        CASE CAST(doc_id % 3 AS INTEGER)
          WHEN 0 THEN CAST(640 + doc_id % 16 AS INTEGER)
          WHEN 2 THEN CAST(320 + doc_id % 32 AS INTEGER)
          ELSE 0 END AS width,
        CASE CAST(doc_id % 3 AS INTEGER)
          WHEN 0 THEN CAST(360 + doc_id % 9 AS INTEGER)
          WHEN 2 THEN CAST(240 + doc_id % 24 AS INTEGER)
          ELSE 0 END AS height,
        CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'A_OPUS'
          WHEN 1 THEN 'A_VORBIS' ELSE '' END AS audio_codec,
        CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 2
          WHEN 1 THEN CAST(1 + doc_id % 2 AS INTEGER)
          ELSE 0 END AS channels,
        CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 48000
          WHEN 1 THEN 44100 ELSE 0 END AS sample_rate
      FROM documents ORDER BY doc_id""")),

    // The composed CRAWL→MULTIMODAL pipeline in one oracle-gated query
    // (the LAION-shape first step): raw WARC segments → record grammar
    // → media-response extraction (content-type families, transfer
    // decode — half the payloads ride a gzip Content-Encoding) →
    // header-only metadata per family (image sniff / MP4 box walk /
    // MP3 frame walk). HTML responses must NOT leak in; a bug in the
    // record grammar, the family filter, the gzip layer, or any of the
    // five header parsers breaks the hash. Media bytes never cross an
    // exchange — the only shuffle is the final ORDER BY.
    ("c05_crawl_media", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.kernel.{Gif, Mp3, Mp4, Png, Warc, Webp}
      val segments = docIds(s, d)
        .mapPartitions { it =>
          val recs = it.map { id =>
            val url = s"https://m${id % 19}.example.com/f$id"
            val (ct, body): (String, Array[Byte]) = (id % 6) match {
              case 0 =>
                val w = (16 + id % 8).toInt; val h = (8 + id % 4).toInt
                ("image/png", Png.encode(Png.Image(w, h, 1, 8,
                  Array.tabulate(w * h)(i => ((i * 31 + id) % 256).toInt))))
              case 1 =>
                ("image/webp", Webp.encodeLossyHeader(
                  (10 + id % 6).toInt, (6 + id % 4).toInt))
              case 2 =>
                val w = (12 + id % 5).toInt; val h = (7 + id % 3).toInt
                ("image/gif", Gif.encode(Gif.Image(w, h, 1,
                  Array.tabulate(w * h)(i => ((i * 7 + id) % 200).toInt))))
              case 3 =>
                ("video/mp4", Mp4.encodeHeader("isom", 600, (id % 100 + 1) * 600,
                  Seq(Mp4.Track("vide", "avc1", (320 + id % 64).toInt,
                    (180 + id % 36).toInt),
                    Mp4.Track("soun", "mp4a", 0, 0))))
              case 4 =>
                ("audio/mpeg", Mp3.encodeHeader((10 + id % 50).toInt, 128, 44100))
              case _ =>
                ("text/html", "<html><body>not media</body></html>"
                  .getBytes("UTF-8"))
            }
            val gz = id % 2 == 0
            val hdrs = Seq("Content-Type" -> ct) ++
              (if (gz) Seq("Content-Encoding" -> "gzip") else Nil)
            (id, (Seq(
              "WARC-Type" -> "response",
              "WARC-Target-URI" -> url,
              "WARC-Record-ID" -> s"<urn:uuid:media-$id>",
              "WARC-Date" -> "2025-04-01T00:00:00Z",
              "Content-Type" -> "application/http;msgtype=response"),
              Warc.renderHttpResponse(200, hdrs,
                if (gz) Warc.gzipBytes(body) else body)))
          }.toSeq
          if (recs.isEmpty) Iterator.empty
          else Iterator((s"file:/crawl/media-${recs.head._1}.warc.gz",
            Warc.writeGz(recs.map(_._2))))
        }
        .toDF("path", "content")
      val media = graft.sources.WarcSource.mediaResponses(
        graft.sources.WarcSource.records(segments))
      crawlMediaMeta(media).orderBy(col("url"))
    },
    Some("""SELECT 'https://m' || (doc_id % 19) || '.example.com/f' || doc_id
          AS url,
        CASE CAST(doc_id % 6 AS INTEGER)
          WHEN 0 THEN 'image' WHEN 1 THEN 'image' WHEN 2 THEN 'image'
          WHEN 3 THEN 'video' ELSE 'audio' END AS family,
        CASE CAST(doc_id % 6 AS INTEGER)
          WHEN 0 THEN 'png' WHEN 1 THEN 'webp' WHEN 2 THEN 'gif'
          WHEN 3 THEN 'mp4' ELSE 'mp3' END AS container,
        (doc_id % 6 IN (0, 2)) AS decodable,
        CASE CAST(doc_id % 6 AS INTEGER)
          WHEN 0 THEN CAST(16 + doc_id % 8 AS INTEGER)
          WHEN 1 THEN CAST(10 + doc_id % 6 AS INTEGER)
          WHEN 2 THEN CAST(12 + doc_id % 5 AS INTEGER)
          WHEN 3 THEN CAST(320 + doc_id % 64 AS INTEGER)
          ELSE 0 END AS width,
        CASE CAST(doc_id % 6 AS INTEGER)
          WHEN 0 THEN CAST(8 + doc_id % 4 AS INTEGER)
          WHEN 1 THEN CAST(6 + doc_id % 4 AS INTEGER)
          WHEN 2 THEN CAST(7 + doc_id % 3 AS INTEGER)
          WHEN 3 THEN CAST(180 + doc_id % 36 AS INTEGER)
          ELSE 0 END AS height,
        CASE CAST(doc_id % 6 AS INTEGER)
          WHEN 3 THEN (doc_id % 100 + 1) * 1000
          WHEN 4 THEN CAST(10 + doc_id % 50 AS BIGINT) * 1152 * 1000 // 44100
          ELSE 0 END AS duration_ms
      FROM documents WHERE doc_id % 6 <> 5 ORDER BY url"""))
  )
}
