package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kernel.Warc

/** WARC crawl-archive ingestion — the front door of a web-scale
  * training-data pipeline: `.warc.gz` segments in, an
  * (url, fetch time, html) table out, feeding the curation chain
  * (htmlToText → C4 gate → dedup → …).
  *
  * Layout at scale: crawl archives are ~1 GiB gzip files with one gzip
  * member per record — NOT block-splittable, so the unit of parallelism
  * is the FILE, exactly how production crawl processing shards (one
  * task per segment; a 100 TB crawl is ~100k segments → ample
  * parallelism). `binaryFile` distributes the listing and
  * `pathGlobFilter` prunes at listing time; each task parses its whole
  * segment in-memory and fans out one row per record, so raw archive
  * bytes never cross an exchange — only the projected records do.
  */
object WarcSource {

  /** Scan WARC files under `dir` into one row per record:
    * (path, record_idx, warc_type, target_uri, warc_date, record_id,
    * content_type, byte_len, content). */
  def scan(spark: SparkSession, dir: String,
      glob: Option[String] = Some("*.warc*")): DataFrame = {
    val base = spark.read.format("binaryFile")
    val withGlob = glob.fold(base)(g => base.option("pathGlobFilter", g))
    records(withGlob.load(dir).select(col("path"), col("content")))
  }

  /** The segment → record-rows transform [[scan]]/[[scanStream]] share:
    * one row per WARC record of each (path, content) segment, parsed
    * inside the task. Public so in-memory segment frames (tests, the
    * c02 composition) ride the same code path as file scans. */
  def records(segments: DataFrame): DataFrame = {
    val spark = segments.sparkSession
    import spark.implicits._
    segments.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (path, bytes) =>
          Warc.parseAll(bytes).iterator.zipWithIndex.map { case (r, i) =>
            (path, i, r.warcType, r.targetUri, r.date, r.recordId,
              r.contentType, r.content.length.toLong, r.content)
          }
        }
      }
      .toDF("path", "record_idx", "warc_type", "target_uri", "warc_date",
        "record_id", "content_type", "byte_len", "content")
  }

  /** Streaming form of [[scan]]: watch `dir` for newly landed crawl
    * segments (the continuous-crawl shape — fetchers drop `.warc.gz`
    * files, the pipeline ingests them as they arrive). Same
    * one-file-per-task parse, same output schema, so the whole
    * downstream chain ([[htmlResponses]] → htmlToText → gates →
    * admission dedup) runs unchanged on the stream — batch/stream
    * parity is the library-wide operator contract. */
  def scanStream(spark: SparkSession, dir: String,
      glob: Option[String] = Some("*.warc*"),
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    records(scanStreamRaw(spark, dir, glob, maxFilesPerTrigger))

  /** CDX-style capture index rows over raw WARC segments — the
    * random-access index crawl infrastructure serves next to the
    * archives themselves (the CDX(J) convention: sorted
    * url-key/timestamp lines pointing at (file, offset, length)).
    * Input: one row per segment (path, content). Output: one row per
    * `response` record — (urlkey, ts, url, mime, status, digest,
    * filename, rec_offset, rec_length) where the last three are the
    * random-access pointer: slicing the archive at
    * [rec_offset, rec_offset + rec_length) re-parses to exactly that
    * record ([[graft.kernel.Warc.parseLocated]]'s contract, spec-gated).
    * urlkey is the t28 canonical URL (scheme/host case, default ports,
    * www, fragments, tracking params); ts is the WARC-Date's digits in
    * the 14-digit CDX form; mime is the media type without parameters;
    * digest is sha-256 hex of the HTTP body. Index building is a pure
    * map over segments — each task indexes its own files, nothing but
    * the index rows crosses an exchange; sorting by (urlkey, ts) at
    * write time is the ONE shuffle a global index inherently needs. */
  def cdxRows(segments: DataFrame): DataFrame = {
    val spark = segments.sparkSession
    import spark.implicits._
    segments.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val sha256 = java.security.MessageDigest.getInstance("SHA-256")
        it.flatMap { case (path, bytes) =>
          val filename = path.substring(path.lastIndexOf('/') + 1)
          Warc.parseLocated(bytes).iterator
            .filter(l => l.record.warcType == "response" ||
              l.record.warcType == "revisit")
            .map { loc =>
              val ts = loc.record.date.filter(_.isDigit).take(14)
              if (loc.record.warcType == "revisit") {
                // revisit records carry no payload — the digest comes
                // from the WARC-Payload-Digest header (it names the
                // ORIGINAL capture's content, which is exactly what a
                // CDX lookup must resolve to); mime is the standard
                // CDX marker, status 0 (a revisit has no HTTP message)
                val digest = loc.record.headers
                  .getOrElse("warc-payload-digest", "")
                  .stripPrefix("sha-256:")
                (loc.record.targetUri, ts, "warc/revisit", 0, digest,
                  filename, loc.offset, loc.length)
              } else {
                val http = Warc.httpResponse(loc.record.content)
                val mime = http.contentType.split(";")(0).trim.toLowerCase
                (loc.record.targetUri, ts, mime, http.status,
                  sha256.digest(http.body).map("%02x".format(_)).mkString,
                  filename, loc.offset, loc.length)
              }
            }
        }
      }
      .toDF("url", "ts", "mime", "status", "digest", "filename",
        "rec_offset", "rec_length")
      .withColumn("urlkey", graft.operators.Curate.canonicalUrl(col("url")))
      .select(col("urlkey"), col("ts"), col("url"), col("mime"),
        col("status"), col("digest"), col("filename"), col("rec_offset"),
        col("rec_length"))
  }

  /** [[cdxRows]] over a directory of WARC segments (the file-based
    * form): same listing-prune + file-per-task layout as [[scan]]. */
  def cdxIndex(spark: SparkSession, dir: String,
      glob: Option[String] = Some("*.warc*")): DataFrame = {
    val base = spark.read.format("binaryFile")
    val withGlob = glob.fold(base)(g => base.option("pathGlobFilter", g))
    cdxRows(withGlob.load(dir).select(col("path"), col("content")))
  }

  /** Streaming form of [[cdxRows]]: index crawl segments as the
    * fetchers land them ([[scanStream]]'s continuous-crawl shape) —
    * each micro-batch appends the new segments' capture rows. The
    * per-file indexing is a stateless map, so batch/stream parity holds
    * by construction (spec-gated); a periodic [[cdxWrite]] compaction
    * turns the append log into the sorted serving layout. */
  def cdxStream(spark: SparkSession, dir: String,
      glob: Option[String] = Some("*.warc*"),
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    cdxRows(scanStreamRaw(spark, dir, glob, maxFilesPerTrigger))

  private def scanStreamRaw(spark: SparkSession, dir: String,
      glob: Option[String], maxFilesPerTrigger: Option[Int]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val base = spark.readStream.format("binaryFile").schema(schema)
    val withGlob = glob.fold(base)(g => base.option("pathGlobFilter", g))
    val withTrig = maxFilesPerTrigger.fold(withGlob)(n =>
      withGlob.option("maxFilesPerTrigger", n))
    withTrig.load(dir).select(col("path"), col("content"))
  }

  /** Raw (path, content) segment stream — the input side of the
    * continuous-crawl admission loop ([[cdxAdmit]] inside a
    * foreachBatch sink) and of [[scanStream]]/[[cdxStream]]. */
  def segmentStream(spark: SparkSession, dir: String,
      glob: Option[String] = Some("*.warc*"),
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    scanStreamRaw(spark, dir, glob, maxFilesPerTrigger)

  /** One admission step of the continuous-crawl loop: index the batch
    * segments, screen them against the stored CDX parquet at `indexDir`
    * ([[cdxDedup]]; an absent index admits everything), APPEND the
    * novel captures, and return the verdicts. Single-writer contract
    * like [[graft.operators.DedupIndex]]. Both the batch index rows and
    * the verdicts are FROZEN (eager localCheckpoint) before the append
    * — the DedupIndex.grow lesson: appending to a path a cached plan
    * also reads fires invalidation through the plan's lineage and
    * silently recomputes against the half-grown table. */
  def cdxAdmit(segments: DataFrame, indexDir: String): DataFrame = {
    val spark = segments.sparkSession
    // cdx is a LAZY checkpoint: the eager verdicts checkpoint below is
    // its first action, so one job materializes BOTH frozen leaves
    // (was two sequential checkpoint jobs); both are leaves before the
    // append, so the freeze-before-append discipline holds unchanged
    val cdx = cdxRows(segments).localCheckpoint(false)
    val stored =
      if (new java.io.File(indexDir.stripPrefix("file:")).exists())
        spark.read.parquet(indexDir)
      else cdx.limit(0)
    val verdicts = cdxDedup(cdx, stored).localCheckpoint(true)
    val admitted = cdx.join(
      verdicts.filter(col("verdict") === "novel")
        .select(col("urlkey"), col("digest")).distinct(),
      Seq("urlkey", "digest"), "left_semi")
    admitted.write.mode("append").parquet(indexDir)
    verdicts
  }

  /** Write a CDX index in the serving layout: GLOBALLY SORTED by
    * (urlkey, ts) across range-partitioned shard files — the layout
    * index servers binary-search (a shard manifest of min/max keys is
    * the secondary index; here the parquet footer min/max statistics ARE
    * that manifest). `repartitionByRange` + `sortWithinPartitions` is
    * the one total-order exchange a sorted index inherently needs — no
    * driver-side sort, no single-task global sort; at 100 TB the range
    * exchange samples keys and every shard sorts independently. */
  def cdxWrite(cdx: DataFrame, outDir: String, nShards: Int = 8): Unit =
    cdx.repartitionByRange(nShards, col("urlkey"), col("ts"))
      .sortWithinPartitions(col("urlkey"), col("ts"))
      .write.mode("overwrite").parquet(outDir)

  /** Re-crawl dedup against a stored capture index — the screen a
    * continuous crawl runs before admitting freshly fetched pages:
    * a batch capture is `url_dup` when its canonical URL is already
    * indexed (a re-fetch of a known page, regardless of content drift),
    * else `content_dup` when its body digest is known under some OTHER
    * URL (mirrors, aliases, tracking-URL copies), else `novel`. Verdict
    * precedence url > content mirrors how crawl dedup reports.
    *
    * Shape: two key-level left-semi-style probes — the index sides
    * project to DISTINCT keys first, so however many historic captures
    * share a urlkey or digest, the join carries each key once; the
    * batch never explodes and at scale the stored side streams from
    * its sorted parquet shards ([[cdxWrite]]) with the d11 broadcast
    * discipline when the BATCH is the small side. */
  def cdxDedup(batch: DataFrame, stored: DataFrame): DataFrame = {
    val knownUrls = stored.select(col("urlkey")).distinct()
      .withColumn("url_known", lit(true))
    val knownDigests = stored.select(col("digest")).distinct()
      .withColumn("digest_known", lit(true))
    batch
      .join(knownUrls, Seq("urlkey"), "left")
      .join(knownDigests, Seq("digest"), "left")
      .select(col("urlkey"), col("url"), col("digest"),
        when(coalesce(col("url_known"), lit(false)), lit("url_dup"))
          .when(coalesce(col("digest_known"), lit(false)), lit("content_dup"))
          .otherwise(lit("novel")).as("verdict"))
  }

  /** Project the HTML page table out of a record scan: `response`
    * records whose HTTP payload is text/html, split into
    * (url, warc_date, http_status, html). Non-2xx responses are kept —
    * dropping them is the caller's filter, not the reader's guess.
    * The body goes through the FULL transfer decode
    * ([[graft.kernel.Warc.decodeText]]): chunked de-framing, gzip /
    * deflate Content-Encoding, and charset resolution (Content-Type
    * param → bounded meta sniff → UTF-8) — real crawl responses hit all
    * three constantly, and a raw UTF-8 decode would feed silent
    * mojibake into the curation chain.
    *
    * Undecodable TRANSFER layers — a content coding this engine has no
    * codec for (br, zstd), malformed chunk framing, a truncated deflate
    * stream — SKIP the page by default instead of killing the job: a
    * crawl-scale extraction must survive one broken record (charset
    * problems never throw — they decode with U+FFFD). `lenient = false`
    * restores the loud kernel behavior for curated inputs where an
    * undecodable record means the ARCHIVE is broken. */
  def htmlResponses(records: DataFrame, lenient: Boolean = true): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .filter(col("warc_type") === "response")
      .select(col("target_uri"), col("warc_date"), col("content"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (uri, date, content) =>
          def extract(): Option[(String, String, Int, String)] = {
            // httpResponse is INSIDE the lenient scope: a malformed
            // response head (garbage status line) is as routine in a
            // real crawl as a broken coding, and must not kill the job
            val http = Warc.httpResponse(content)
            if (!http.contentType.toLowerCase.startsWith("text/html")) None
            else Some((uri, date, http.status, Warc.decodeText(http)))
          }
          if (lenient)
            // IOException covers the gzip path's ZipException/EOFException
            // on corrupt or truncated bodies — the most common coding must
            // not be the one that escapes the lenient contract
            try extract()
            catch { case _: IllegalArgumentException | _: java.io.IOException => None }
          else extract()
        }
      }
      .toDF("url", "warc_date", "http_status", "html")
  }

  /** Project the MEDIA response table out of a record scan — the
    * multimodal sibling of [[htmlResponses]]: `response` records whose
    * HTTP payload is an image/audio/video type, with the transfer
    * layers undone ([[graft.kernel.Warc.decodedBody]] — chunked,
    * gzip/deflate) but the media BYTES left opaque. Same lenient
    * contract: an undecodable transfer layer skips the record by
    * default (a crawl-scale extraction must survive one broken
    * response); `lenient = false` restores the loud kernel behavior.
    * Media bytes never cross an exchange here — this is a row-local
    * projection feeding the header-only metadata kernels
    * ([[graft.operators.Multimodal.ImageDecoder.sniff]],
    * [[graft.kernel.Mp4.metadata]], [[graft.kernel.Mp3.metadata]]). */
  def mediaResponses(records: DataFrame, lenient: Boolean = true): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .filter(col("warc_type") === "response")
      .select(col("target_uri"), col("warc_date"), col("content"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (uri, date, content) =>
          def extract(): Option[(String, String, Int, String, String, Array[Byte])] = {
            // head parse inside the lenient scope (the htmlResponses rule)
            val http = Warc.httpResponse(content)
            val ct = http.contentType.toLowerCase
            val family = ct.takeWhile(_ != '/')
            if (!Set("image", "audio", "video").contains(family)) None
            else Some((uri, date, http.status, ct, family,
              Warc.decodedBody(http)))
          }
          if (lenient)
            try extract()
            catch {
              case _: IllegalArgumentException | _: java.io.IOException => None
            }
          else extract()
        }
      }
      .toDF("url", "warc_date", "http_status", "content_type", "family",
        "payload")
  }

  /** One WAT metadata envelope (fixed field order, minimal JSON
    * escaping) — the Common Crawl WAT sidecar's per-response payload
    * shape: enough header/link structure to build link graphs and
    * frontier tables WITHOUT touching page bytes. Deterministic by
    * construction, so both engines can rebuild the exact string. */
  def watEnvelope(url: String, status: Int, mime: String, length: Long,
      links: Seq[String]): String = {
    def q(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    s"""{"url":${q(url)},"status":$status,"mime":${q(mime)},""" +
      s""""length":$length,"links":[${links.map(q).mkString(",")}]}"""
  }

  private val WatHref =
    java.util.regex.Pattern.compile("<a\\s[^>]*href=\"(https?://[^\"#]+)")

  /** Outbound links of an HTML body — the kernel-side twin of
    * [[graft.sources.Frontier.extractLinks]]'s column regex (same
    * pattern, same dialect), for use inside partition kernels. */
  def extractHrefs(html: String): Seq[String] = {
    val m = WatHref.matcher(html)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group(1)
    out.result()
  }

  /** Archive a fetched batch against a stored capture index with ISO
    * 28500 §6.7 REVISIT semantics — the write side of re-crawl dedup
    * ([[cdxDedup]] is the read side): a fetch whose payload digest is
    * already indexed archives as a `revisit` record (profile
    * identical-payload-digest, `WARC-Refers-To-Target-URI` naming the
    * prior capture, `WARC-Payload-Digest` carrying the shared digest,
    * EMPTY content block); novel payloads archive as full `response`
    * records. This is what keeps a continuous crawl's archive growth
    * proportional to NEW content — re-fetches cost headers, not bodies.
    *
    * `fetches`: (url, warc_date, body). `stored`: (digest, url) —
    * historic payload digests with a representative capture URL.
    * Returns member-per-record gzip segments (path, content), `nSegs`
    * per hash of url. Shape: one row-local digest pass, one join on
    * digest (the stored side projects to distinct digests first), one
    * keyed aggregation into segments; payload bytes cross exactly one
    * exchange (into their segment). */
  def archiveWithRevisits(fetches: DataFrame, stored: DataFrame,
      nSegs: Int = 16): DataFrame = {
    val spark = fetches.sparkSession
    import spark.implicits._
    // an optional content_type column lets media fetches archive under
    // their real HTTP type (the crawl loop's multimodal branch needs
    // mediaResponses to classify them back out); absent, every fetch is
    // an HTML page — the original contract, unchanged
    val typed =
      if (fetches.columns.contains("content_type"))
        fetches.select(col("url"), col("warc_date"), col("body"),
          col("content_type"))
      else fetches.select(col("url"), col("warc_date"), col("body"),
        lit("text/html; charset=utf-8").as("content_type"))
    val digested = typed.withColumn("digest", sha2(col("body"), 256))
    val known = stored
      .groupBy(col("digest"))
      .agg(min(col("url")).as("refers_uri"))
    digested.join(known, Seq("digest"), "left")
      .select(col("url"), col("warc_date"), col("body"),
        col("content_type"), col("digest"), col("refers_uri"))
      .as[(String, String, Array[Byte], String, String, Option[String])]
      .groupByKey { case (url, _, _, _, _, _) =>
        math.floorMod(scala.util.hashing.MurmurHash3.stringHash(url), nSegs) }
      .mapGroups { (seg, it) =>
        val recs = it.toSeq.sortBy(_._1).map {
          case (url, date, body, ct, digest, refersUri) =>
            val base = Seq(
              "WARC-Target-URI" -> url,
              "WARC-Record-ID" -> s"<urn:graft:capture:$url>",
              "WARC-Date" -> date,
              "WARC-Payload-Digest" -> s"sha-256:$digest")
            refersUri match {
              case Some(prior) => (Seq(
                "WARC-Type" -> "revisit",
                "WARC-Profile" ->
                  "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest",
                "WARC-Refers-To-Target-URI" -> prior) ++ base,
                Array.empty[Byte])
              case None => (Seq(
                "WARC-Type" -> "response",
                "Content-Type" -> "application/http;msgtype=response") ++ base,
                Warc.renderHttpResponse(200, ct, body))
            }
        }
        (s"file:/crawl/revisit-seg-$seg.warc.gz", Warc.writeGz(recs))
      }
      .toDF("path", "content")
  }

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(
    // WARC ingestion, oracle-gated end to end: every document becomes a
    // two-record crawl segment (warcinfo + response) written with ONE
    // GZIP MEMBER PER RECORD — the real archive layout — then parsed
    // back through the full reader path: concatenated-member gunzip →
    // record grammar → Content-Length slicing → HTTP status/header/body
    // split. DuckDB recomputes the URL, record count, status,
    // content type, and the sha + byte length of the extracted HTML
    // body from the same template, so a framing bug ANYWHERE in the
    // chain (member walk, header parse, length arithmetic, HTTP split)
    // breaks the hash compare. File-based scan + listing-prune and the
    // htmlResponses → htmlToText chain are spec-gated in WarcSpec.
    ("w01_warc_extract", (s: SparkSession, d: String) => {
      import s.implicits._
      graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, String)]
        .mapPartitions { it =>
          val sha256 = java.security.MessageDigest.getInstance("SHA-256")
          it.map { case (id, text) =>
            val html = s"<html><body><h1>Doc $id</h1><p>" + text +
              "</p></body></html>"
            val body = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val gz = Warc.writeGz(Seq(
              (Seq(
                "WARC-Type" -> "warcinfo",
                "WARC-Record-ID" -> s"<urn:uuid:info-$id>",
                "WARC-Date" -> "2025-01-01T00:00:00Z",
                "Content-Type" -> "application/warc-fields"),
                "software: graft\r\n".getBytes("US-ASCII")),
              (Seq(
                "WARC-Type" -> "response",
                "WARC-Target-URI" -> s"http://example.com/doc/$id",
                "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
                "WARC-Date" -> "2025-01-01T00:00:00Z",
                "Content-Type" -> "application/http;msgtype=response"),
                Warc.renderHttpResponse(200, "text/html; charset=utf-8", body))))
            val recs = Warc.parseAll(gz)
            val resp = recs.find(_.warcType == "response").get
            val http = Warc.httpResponse(resp.content)
            (id, resp.targetUri, recs.length, http.status, http.contentType,
              http.body.length.toLong,
              sha256.digest(http.body).map("%02x".format(_)).mkString)
          }
        }
        .toDF("doc_id", "url", "n_records", "http_status", "content_type",
          "body_len", "body_sha")
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        'http://example.com/doc/' || doc_id AS url,
        2 AS n_records,
        200 AS http_status,
        'text/html; charset=utf-8' AS content_type,
        CAST(strlen('<html><body><h1>Doc ' || doc_id || '</h1><p>' || text ||
          '</p></body></html>') AS BIGINT) AS body_len,
        sha256('<html><body><h1>Doc ' || doc_id || '</h1><p>' || text ||
          '</p></body></html>') AS body_sha
      FROM documents ORDER BY doc_id""")),

    // CDX capture-index build, oracle-gated end to end: documents group
    // into MULTI-RECORD segments (warcinfo + one response per doc, the
    // member-per-record gzip layout), and the index path — RFC 1952
    // member walk with verified trailers, record grammar, HTTP split,
    // URL canonicalization, 14-digit timestamp, digest — must reproduce
    // DuckDB's recomputation of every field from the same templates.
    // Messy inputs are planted ON PURPOSE: uppercase host, explicit
    // default port, tracking param (urlkey must normalize), mixed
    // text/html + text/plain, non-2xx statuses. The (offset, length)
    // random-access pointers are deflate-dependent — projected out here;
    // their slice-reparse contract is spec-gated in WarcSpec.
    ("w02_cdx_index", (s: SparkSession, d: String) => {
      import s.implicits._
      val segments = graft.Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .groupByKey { case (id, _) => id % 41 }
        .mapGroups { (seg, it) =>
          val docs = it.toSeq.sortBy(_._1)
          val recs = (Seq(
            (Seq(
              "WARC-Type" -> "warcinfo",
              "WARC-Record-ID" -> s"<urn:uuid:info-$seg>",
              "WARC-Date" -> "2025-01-01T00:00:00Z",
              "Content-Type" -> "application/warc-fields"),
              "software: graft\r\n".getBytes("US-ASCII"))) ++
            docs.map { case (id, text) =>
              val day = (id % 27 + 1).toInt
              val mime = if (id % 2 == 0) "text/html" else "text/plain"
              val status = if (id % 3 == 0) 404 else 200
              val body = s"Doc $id: $text"
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              (Seq(
                "WARC-Type" -> "response",
                "WARC-Target-URI" ->
                  s"https://WWW.Example.com:443/doc/$id?utm_source=feed&id=$id",
                "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
                "WARC-Date" -> f"2025-01-${day}%02dT03:04:05Z",
                "Content-Type" -> "application/http;msgtype=response"),
                Warc.renderHttpResponse(status, s"$mime; charset=utf-8", body))
            })
          (s"file:/crawl/seg-$seg.warc.gz", Warc.writeGz(recs))
        }
        .toDF("path", "content")
      cdxRows(segments)
        .select(col("urlkey"), col("ts"), col("url"), col("mime"),
          col("status"), col("digest"), col("filename"))
        .orderBy(col("urlkey"), col("ts"))
    },
    Some("""SELECT
        'https://example.com/doc/' || doc_id || '?id=' || doc_id AS urlkey,
        '202501' || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0') ||
          '030405' AS ts,
        'https://WWW.Example.com:443/doc/' || doc_id ||
          '?utm_source=feed&id=' || doc_id AS url,
        CASE WHEN doc_id % 2 = 0 THEN 'text/html' ELSE 'text/plain' END AS mime,
        CASE WHEN doc_id % 3 = 0 THEN 404 ELSE 200 END AS status,
        sha256('Doc ' || doc_id || ': ' || text) AS digest,
        'seg-' || (doc_id % 41) || '.warc.gz' AS filename
      FROM documents ORDER BY urlkey, ts""")),

    // Re-crawl dedup against the stored CDX index, oracle-gated end to
    // end: the "stored" index comes from even docs' segments, the
    // incoming batch from odd docs with planted classes — re-fetches of
    // a stored URL with drifted content (url_dup), new URLs carrying a
    // stored body verbatim (content_dup — mirror/alias detection by
    // digest), and genuinely novel pages. Both sides run the REAL
    // segment-build → member walk → HTTP split → canonicalize → digest
    // path; DuckDB recomputes every verdict from the plant arithmetic.
    ("w08_cdx_dedup", (s: SparkSession, d: String) => {
      import s.implicits._
      def segs(rows: org.apache.spark.sql.Dataset[(Long, String, String)]): DataFrame =
        rows.groupByKey { case (id, _, _) => id % 37 }
          .mapGroups { (seg, it) =>
            val recs = it.toSeq.sortBy(_._1).map { case (id, url, body) =>
              (Seq(
                "WARC-Type" -> "response",
                "WARC-Target-URI" -> url,
                "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
                "WARC-Date" -> "2025-01-01T00:00:00Z",
                "Content-Type" -> "application/http;msgtype=response"),
                Warc.renderHttpResponse(200, "text/html; charset=utf-8",
                  body.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            }
            (s"file:/crawl/seg-$seg.warc.gz", Warc.writeGz(recs))
          }
          .toDF("path", "content")
      val docs = graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
      val even = docs.filter(col("doc_id") % 2 === 0)
        .as[(Long, String)].map { case (id, text) =>
          (id, s"https://example.com/doc/$id", s"Doc $id: $text") }
      val prev = docs.select((col("doc_id") + 1).as("doc_id"),
        col("text").as("prev_text"))
      val odd = docs.filter(col("doc_id") % 2 === 1)
        .join(prev, Seq("doc_id"))
        .select(col("doc_id"), col("text"), col("prev_text"))
        .as[(Long, String, String)].map { case (id, text, prevText) =>
          if (id % 5 == 1)
            (id, s"https://example.com/doc/${id - 1}", s"Changed $id: $text")
          else if (id % 5 == 3)
            (id, s"https://example.com/alias/$id", s"Doc ${id - 1}: $prevText")
          else
            (id, s"https://example.com/doc/$id", s"Doc $id: $text")
        }
      cdxDedup(cdxRows(segs(odd)), cdxRows(segs(even)))
        .orderBy(col("urlkey"))
    },
    Some("""WITH odd AS (
        SELECT d.doc_id, d.text, p.text AS prev_text
        FROM documents d JOIN documents p ON p.doc_id = d.doc_id - 1
        WHERE d.doc_id % 2 = 1),
      batch AS (
        SELECT doc_id,
          CASE CAST(doc_id % 5 AS INTEGER)
            WHEN 1 THEN 'https://example.com/doc/' || (doc_id - 1)
            WHEN 3 THEN 'https://example.com/alias/' || doc_id
            ELSE 'https://example.com/doc/' || doc_id END AS url,
          CASE CAST(doc_id % 5 AS INTEGER)
            WHEN 1 THEN 'Changed ' || doc_id || ': ' || text
            WHEN 3 THEN 'Doc ' || (doc_id - 1) || ': ' || prev_text
            ELSE 'Doc ' || doc_id || ': ' || text END AS body
        FROM odd)
      SELECT url AS urlkey, url, sha256(body) AS digest,
        CASE CAST(doc_id % 5 AS INTEGER)
          WHEN 1 THEN 'url_dup' WHEN 3 THEN 'content_dup'
          ELSE 'novel' END AS verdict
      FROM batch ORDER BY urlkey""")),

    // HTTP transfer decoding, oracle-gated end to end (the r11
    // VERDICT's top real-input hole): every document becomes a response
    // record whose body is served the way REAL origins serve it — one
    // of seven wire shapes by doc_id: identity / Content-Encoding
    // gzip / deflate / Transfer-Encoding chunked / chunked-over-gzip /
    // an ISO-8859-1 charset param carrying bytes UTF-8 would mangle /
    // a bare text/html whose windows-1252 charset only a <meta> sniff
    // can find. The record round-trips the full archive path
    // (member-per-record gzip → grammar → HTTP split) and the body
    // comes back through Warc.decodeText (de-chunk → inflate → charset
    // resolve). The oracle is the planted-effective-outcome: DuckDB
    // rebuilds the ORIGINAL page text from the same template, so the
    // engine only hash-matches if every decode layer recovers the page
    // EXACTLY — mojibake, a dropped chunk, or a charset miss all break
    // the sha.
    ("w09_http_decode", (s: SparkSession, d: String) => {
      import s.implicits._
      // fixture-spine widening (the r19 docsWide treatment, guide §2.5):
      // the per-row gzip/chunk encode + archive round trip otherwise
      // runs as ONE serial task off the single-row-group documents file;
      // the chain is row-local, so results are unchanged
      graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, String)]
        .mapPartitions { it =>
          val sha256 = java.security.MessageDigest.getInstance("SHA-256")
          it.map { case (id, text) =>
            val cls = (id % 7).toInt
            val html =
              if (cls == 6)
                s"<html><head><meta charset=windows-1252></head>" +
                  s"<body><p>Doc $id € $text</p></body></html>"
              else if (cls == 5)
                s"<html><body><p>Doc $id éü $text</p></body></html>"
              else s"<html><body><p>Doc $id $text</p></body></html>"
            val pageBytes = cls match {
              case 5 => html.getBytes("ISO-8859-1")
              case 6 => html.getBytes("windows-1252")
              case _ => html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            }
            val (headers, wire) = cls match {
              case 0 => (Seq("Content-Type" -> "text/html; charset=utf-8"),
                pageBytes)
              case 1 => (Seq("Content-Type" -> "text/html",
                "Content-Encoding" -> "gzip"), Warc.gzipBytes(pageBytes))
              case 2 => (Seq("Content-Type" -> "text/html",
                "Content-Encoding" -> "deflate"), Warc.zlibBytes(pageBytes))
              case 3 => (Seq("Content-Type" -> "text/html",
                "Transfer-Encoding" -> "chunked"),
                Warc.chunkBytes(pageBytes, 7))
              case 4 => (Seq("Content-Type" -> "text/html",
                "Content-Encoding" -> "gzip",
                "Transfer-Encoding" -> "chunked"),
                Warc.chunkBytes(Warc.gzipBytes(pageBytes), 5))
              case 5 => (Seq(
                "Content-Type" -> "text/html; charset=iso-8859-1"),
                pageBytes)
              case _ => (Seq("Content-Type" -> "text/html"), pageBytes)
            }
            val gz = Warc.writeGz(Seq((Seq(
              "WARC-Type" -> "response",
              "WARC-Target-URI" -> s"http://example.com/doc/$id",
              "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
              "WARC-Date" -> "2025-01-01T00:00:00Z",
              "Content-Type" -> "application/http;msgtype=response"),
              Warc.renderHttpResponse(200, headers, wire))))
            val resp = Warc.parseAll(gz).head
            val http = Warc.httpResponse(resp.content)
            val decoded = Warc.decodeText(http)
            (id, cls, http.status,
              sha256.digest(decoded
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8))
                .map("%02x".format(_)).mkString)
          }
        }
        .toDF("doc_id", "enc_class", "http_status", "html_sha")
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(doc_id % 7 AS INTEGER) AS enc_class,
        200 AS http_status,
        sha256(CASE CAST(doc_id % 7 AS INTEGER)
          WHEN 6 THEN '<html><head><meta charset=windows-1252></head>' ||
            '<body><p>Doc ' || doc_id || ' € ' || text || '</p></body></html>'
          WHEN 5 THEN '<html><body><p>Doc ' || doc_id || ' éü ' ||
            text || '</p></body></html>'
          ELSE '<html><body><p>Doc ' || doc_id || ' ' || text ||
            '</p></body></html>' END) AS html_sha
      FROM documents ORDER BY doc_id""")),

    // WET derivation, oracle-gated end to end — the Common Crawl
    // sidecar format: response archives re-emit as `conversion`
    // records carrying the EXTRACTED text with a `WARC-Refers-To` link
    // back to the source response (ISO 28500 §6.8's conversion
    // semantics). The chain runs the full real path twice: response
    // segments → member gunzip → grammar → HTTP split → htmlToText →
    // conversion re-archive (writer) → parse BACK (reader) → text
    // digest. DuckDB rebuilds the extracted text from the page
    // template through the t27 strip/decode/normalize recipe, so a bug
    // in the writer, the reader, the linkage, or the extraction breaks
    // the hash.
    ("w11_wet_extract", (s: SparkSession, d: String) => {
      import s.implicits._
      // fixture-spine widening — see w09 (per-row gzip archive writes,
      // then a second per-row WET re-archive + re-parse downstream)
      val segments = graft.Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, String)]
        .map { case (id, text) =>
          val html = s"<html><body><h1>Doc $id</h1><p>" + text +
            "</p></body></html>"
          val gz = Warc.writeGz(Seq((Seq(
            "WARC-Type" -> "response",
            "WARC-Target-URI" -> s"http://example.com/doc/$id",
            "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
            "WARC-Date" -> "2025-01-01T00:00:00Z",
            "Content-Type" -> "application/http;msgtype=response"),
            Warc.renderHttpResponse(200, "text/html; charset=utf-8",
              html.getBytes(java.nio.charset.StandardCharsets.UTF_8)))))
          (s"file:/crawl/wet-$id.warc.gz", gz)
        }
        .toDF("path", "content")
      val pages = htmlResponses(records(segments))
      pages
        .select(col("url"), col("warc_date"),
          graft.operators.Curate.htmlToText(col("html")).as("wtext"))
        .as[(String, String, String)]
        .mapPartitions { it =>
          val sha256 = java.security.MessageDigest.getInstance("SHA-256")
          it.map { case (url, date, text) =>
            val wet = Warc.writeGz(Seq((Seq(
              "WARC-Type" -> "conversion",
              "WARC-Target-URI" -> url,
              "WARC-Record-ID" -> s"<urn:graft:wet:$url>",
              "WARC-Refers-To" -> s"<urn:uuid:resp-${url.split('/').last}>",
              "WARC-Date" -> date,
              "Content-Type" -> "text/plain"), text.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))))
            // back through the real reader: the WET round trip
            val rec = Warc.parseAll(wet).head
            (url, rec.warcType,
              rec.headers.getOrElse("warc-refers-to", ""),
              rec.content.length.toLong,
              sha256.digest(rec.content).map("%02x".format(_)).mkString)
          }
        }
        .toDF("url", "warc_type", "refers_to", "text_len", "text_sha")
        .orderBy(col("url"))
    },
    Some("""WITH page AS (
        SELECT doc_id,
          '<html><body><h1>Doc ' || doc_id || '</h1><p>' || text ||
            '</p></body></html>' AS h
        FROM documents),
      stripped AS (
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(h,
              '(?is)<script[^>]*>.*?</script>', '', 'g'),
              '(?is)<style[^>]*>.*?</style>', '', 'g'),
              '(?s)<!--.*?-->', '', 'g'),
              '(?i)</?(?:p|div|br|h[1-6]|li|tr|table|ul|ol)[^>]*>',
                chr(10), 'g'),
              '<[^>]*>', '', 'g') AS t
        FROM page),
      decoded AS (
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(t,
              '&lt;', '<', 'g'),
              '&gt;', '>', 'g'),
              '&quot;', '"', 'g'),
              '&#39;', '''', 'g'),
              '&nbsp;', ' ', 'g'),
              '&amp;', '&', 'g') AS t
        FROM stripped),
      cleaned AS (
        SELECT doc_id,
          trim(regexp_replace(regexp_replace(regexp_replace(t,
            '[ \t]+', ' ', 'g'),
            '\s*\n\s*', chr(10), 'g'),
            '^\n|\n$', '', 'g')) AS w
        FROM decoded)
      SELECT 'http://example.com/doc/' || doc_id AS url,
        'conversion' AS warc_type,
        '<urn:uuid:resp-' || doc_id || '>' AS refers_to,
        CAST(strlen(w) AS BIGINT) AS text_len,
        sha256(w) AS text_sha
      FROM cleaned ORDER BY url""")),

    // Revisit archiving, oracle-gated end to end — the WRITE side of
    // re-crawl dedup (w08 is the read side): odd docs are the fetched
    // batch, even docs the stored index, and every 5th-mod batch fetch
    // re-serves its predecessor's exact payload — those must archive as
    // EMPTY revisit records (identical-payload-digest profile,
    // Refers-To-Target-URI naming the prior capture) while novel
    // payloads archive as full responses. The segments parse BACK
    // through the real reader and DuckDB recomputes every field —
    // type, profile, digest, linkage, body length — from the plant
    // rule, so the join, the record grammar, and the empty-block
    // framing are all under the hash.
    ("w12_revisit_archive", (s: SparkSession, d: String) => {
      import s.implicits._
      val docs = graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
      val prev = docs.select((col("doc_id") + 1).as("doc_id"),
        col("text").as("prev_text"))
      val odd = docs.filter(col("doc_id") % 2 === 1).join(prev, Seq("doc_id"))
      val fetches = odd.select(
        concat(lit("https://example.com/doc/"), col("doc_id").cast("string"))
          .as("url"),
        lit("2025-01-01T00:00:00Z").as("warc_date"),
        encode(when(col("doc_id") % 5 === 3,
            concat(lit("Doc "), (col("doc_id") - 1).cast("string"),
              lit(": "), col("prev_text")))
          .otherwise(concat(lit("Doc "), col("doc_id").cast("string"),
            lit(": "), col("text"))), "UTF-8").as("body"))
      val stored = docs.filter(col("doc_id") % 2 === 0).select(
        sha2(encode(concat(lit("Doc "), col("doc_id").cast("string"),
          lit(": "), col("text")), "UTF-8"), 256).as("digest"),
        concat(lit("https://example.com/doc/"), col("doc_id").cast("string"))
          .as("url"))
      archiveWithRevisits(fetches, stored)
        .as[(String, Array[Byte])]
        .mapPartitions { it =>
          it.flatMap { case (_, bytes) =>
            Warc.parseAll(bytes).map { r =>
              val bodyLen =
                if (r.warcType == "response")
                  Warc.httpResponse(r.content).body.length.toLong
                else r.content.length.toLong
              (r.targetUri, r.warcType,
                r.headers.getOrElse("warc-profile", ""),
                r.headers.getOrElse("warc-payload-digest", ""),
                r.headers.getOrElse("warc-refers-to-target-uri", ""),
                bodyLen)
            }
          }
        }
        .toDF("url", "warc_type", "profile", "payload_digest",
          "refers_uri", "body_len")
        .orderBy(col("url"))
    },
    Some("""WITH odd AS (
        SELECT d.doc_id, d.text, p.text AS prev_text
        FROM documents d JOIN documents p ON p.doc_id = d.doc_id - 1
        WHERE d.doc_id % 2 = 1),
      f AS (
        SELECT doc_id,
          'https://example.com/doc/' || doc_id AS url,
          CASE WHEN doc_id % 5 = 3
            THEN 'Doc ' || (doc_id - 1) || ': ' || prev_text
            ELSE 'Doc ' || doc_id || ': ' || text END AS body,
          doc_id % 5 = 3 AS is_rev
        FROM odd)
      SELECT url,
        CASE WHEN is_rev THEN 'revisit' ELSE 'response' END AS warc_type,
        CASE WHEN is_rev
          THEN 'http://netpreserve.org/warc/1.0/revisit/identical-payload-digest'
          ELSE '' END AS profile,
        'sha-256:' || sha256(body) AS payload_digest,
        CASE WHEN is_rev THEN 'https://example.com/doc/' || (doc_id - 1)
          ELSE '' END AS refers_uri,
        CAST(CASE WHEN is_rev THEN 0 ELSE strlen(body) END AS BIGINT)
          AS body_len
      FROM f ORDER BY url""")),

    // WAT derivation, oracle-gated end to end — the OTHER Common Crawl
    // sidecar (w11 is WET/text; this is metadata): every response
    // re-emits as an ISO 28500 `metadata` record whose JSON payload
    // carries status, mime, payload length, and the page's outbound
    // links (the input to w06's link graph) — fixed field order, so
    // DuckDB rebuilds the exact envelope. The chain runs archive →
    // parse → HTTP split → href extraction → metadata re-archive →
    // parse BACK, so the writer, the reader, the linkage, and the link
    // regex are all under the hash.
    ("w13_wat_extract", (s: SparkSession, d: String) => {
      import s.implicits._
      val segments = graft.Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val html = s"<html><body><h1>Doc $id</h1><p>" + text +
            s""" <a href="https://example.com/next/${id + 1}">n</a>""" +
            "</p></body></html>"
          val gz = Warc.writeGz(Seq((Seq(
            "WARC-Type" -> "response",
            "WARC-Target-URI" -> s"http://example.com/doc/$id",
            "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
            "WARC-Date" -> "2025-01-01T00:00:00Z",
            "Content-Type" -> "application/http;msgtype=response"),
            Warc.renderHttpResponse(200, "text/html; charset=utf-8",
              html.getBytes(java.nio.charset.StandardCharsets.UTF_8)))))
          (s"file:/crawl/wat-$id.warc.gz", gz)
        }
        .toDF("path", "content")
      records(segments)
        .filter(col("warc_type") === "response")
        .select(col("target_uri"), col("warc_date"), col("content"))
        .as[(String, String, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (uri, date, content) =>
            val http = Warc.httpResponse(content)
            val body = Warc.decodeText(http)
            val wat = watEnvelope(uri, http.status,
              http.contentType.split(";")(0).trim.toLowerCase,
              http.body.length.toLong, extractHrefs(body))
            val gz = Warc.writeGz(Seq((Seq(
              "WARC-Type" -> "metadata",
              "WARC-Target-URI" -> uri,
              "WARC-Record-ID" -> s"<urn:graft:wat:$uri>",
              "WARC-Refers-To" -> s"<urn:uuid:resp-${uri.split('/').last}>",
              "WARC-Date" -> date,
              "Content-Type" -> "application/json"),
              wat.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
            val rec = Warc.parseAll(gz).head
            (uri, rec.warcType,
              rec.headers.getOrElse("warc-refers-to", ""),
              new String(rec.content, java.nio.charset.StandardCharsets.UTF_8))
          }
        }
        .toDF("url", "warc_type", "refers_to", "wat_json")
        .orderBy(col("url"))
    },
    Some("""WITH page AS (
        SELECT doc_id,
          '<html><body><h1>Doc ' || doc_id || '</h1><p>' || text ||
            ' <a href="https://example.com/next/' || (doc_id + 1) ||
            '">n</a></p></body></html>' AS h
        FROM documents)
      SELECT 'http://example.com/doc/' || doc_id AS url,
        'metadata' AS warc_type,
        '<urn:uuid:resp-' || doc_id || '>' AS refers_to,
        '{"url":"http://example.com/doc/' || doc_id ||
          '","status":200,"mime":"text/html","length":' || strlen(h) ||
          ',"links":["https://example.com/next/' || (doc_id + 1) ||
          '"]}' AS wat_json
      FROM page ORDER BY url""")))
}
