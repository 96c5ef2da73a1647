package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.functions.GraftFunctions

/** End-to-end corpus curation — the library's operator families
  * composed in the order a web-scale training-data pipeline actually
  * runs them (C4 / CCNet / RefinedWeb lineage):
  *
  *   extract (HTML → text) → line gate + PII scrub + doc floor →
  *   exact dedup → near-dup dedup (LSH pairs → connected components →
  *   apply) → exact-substring dedup → decontamination vs an eval
  *   reference → (caller) `Training.writeShards`.
  *
  * Near-dup BEFORE substring dedup (the RefinedWeb §3.4 order, not
  * arbitrary): document-level duplicate signal must be measured before
  * the substring pass cuts the very runs that carry it — reversed, two
  * near-identical documents first lose their shared runs and then look
  * unrelated to MinHash.
  *
  * Every stage is one of the independently oracle/spec-gated operators;
  * this object adds only the plumbing and a per-stage row report. Each
  * stage persists before its count — the count doubles as the eager
  * audit a production run wants anyway, and downstream stages then read
  * the cache instead of recomputing the chain (the multi-reference rule
  * every heavy operator here already follows internally).
  *
  * Scale posture: stages are the operators' own shapes (map stages,
  * census + semi-join, banded LSH, alternating-star components,
  * broadcast anti-joins). The decontamination step uses the d08
  * broadcast shape — eval grams broadcast, the corpus side never
  * shuffles — with `hashGrams` long keys by default.
  */
object CorpusPipeline {

  case class Opts(
      minLineWords: Int = 3,
      minDocWords: Int = 5,
      substrMinLen: Int = 8,
      nearDupTau: Double = 0.5,
      contaminationN: Int = 8,
      hashGrams: Boolean = true,
      /** The C4 line gate targets raw web-crawl text (terminal
        * punctuation, boilerplate substrings). A corpus that is already
        * clean prose — or synthetic text with no sentence structure —
        * would be wiped by it; such runs turn it off and keep the PII
        * scrub + document word floor. */
      lineGate: Boolean = true,
      /** Extraction for html corpora: false = tag-strip
        * ([[Curate.htmlToText]] — keeps nav menus and footers), true =
        * Boilerpipe-style main-content extraction
        * ([[Curate.mainTextUdf]], t44) — the single biggest
        * text-quality lever on raw crawl. Ignored when the corpus is
        * already text. */
      mainExtraction: Boolean = false,
      /** Near-dup hash family: false = the native FNV/xxhash path
        * ([[Dedup.minhashNearDups]], production default); true = the
        * md5-derived family ([[DedupIndex.keyedBandsMd5]]) through the
        * IDENTICAL [[Dedup.minhashNearDupsKeyed]] machinery — the
        * oracle-twin knob (c13), the d14/DedupIndex family
        * parameterization applied to the composition. */
      md5Family: Boolean = false)

  /** Returns (curated corpus, per-stage report (stage, rows) in run
    * order). `raw` needs (doc_id, text|html, ...); extra columns ride
    * through. */
  def curate(raw: DataFrame, evalRef: Option[DataFrame] = None,
      opts: Opts = Opts()): (DataFrame, DataFrame) = {
    val spark = raw.sparkSession
    import spark.implicits._
    val stages = scala.collection.mutable.ArrayBuffer[(String, Long, Double)]()
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame]()
    // per-stage wall seconds ride the report (r11 VERDICT item 7 — the
    // c01/c02 wobble diagnosis needs to NAME the wobbling stage, not
    // re-derive it with a side probe); startNanos lets a stage charge
    // pre-persist work (the pairs checkpoint) to its own row
    def mark(name: String, df: DataFrame, startNanos: Long = -1L): DataFrame = {
      val t0 = if (startNanos > 0) startNanos else System.nanoTime()
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      cached += p
      val n = p.count()
      stages += ((name, n, (System.nanoTime() - t0) / 1e9))
      p
    }

    // 0. extraction: an `html` column is the raw-crawl form; a corpus
    // that is already text passes through — uncached (the stage is the
    // identity, so caching it would only duplicate the source scan the
    // next stage performs anyway; the report still gets the ingest count)
    val extracted =
      if (raw.columns.contains("html"))
        mark("extract",
          raw.withColumn("text",
            if (opts.mainExtraction) Curate.mainTextUdf(col("html"))
            else Curate.htmlToText(col("html"))).drop("html"))
      else {
        val t0 = System.nanoTime()
        val n = raw.count()
        stages += (("extract", n, (System.nanoTime() - t0) / 1e9))
        raw
      }

    // 1. line-level gate (C4 rules), PII scrub, document word floor —
    // all row-local, one projection + one filter
    val keptLines = GraftFunctions.c4_line_gate(
      split(col("text"), "\n"), opts.minLineWords)
    val gatedText =
      if (opts.lineGate) Curate.redactPii(concat_ws("\n", keptLines))
      else Curate.redactPii(col("text"))
    val gated = mark("gate_scrub", extracted
      .withColumn("text", gatedText)
      .filter(size(split(trim(col("text")), "\\s+")) >= opts.minDocWords))

    // 2. exact dedup on the normalized content hash; min doc_id wins
    // (the d01 idempotent re-ingest rule). min_by carries the whole
    // winning row through ONE corpus exchange — the previous
    // agg-then-semi-join shape paid that same shuffle for the join AND
    // a second corpus scan
    val exact = mark("exact_dedup", gated
      .withColumn("doc_md5",
        md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))))
      .groupBy(col("doc_md5"))
      .agg(min_by(struct(gated.columns.map(col): _*), col("doc_id")).as("row"))
      .select(col("row.*")))

    // 3. near-dup dedup: banded MinHash-LSH pairs → connected
    // components (large-star/small-star) → apply (broadcast anti-join).
    // Components and survivor choice run over PAIR ENDPOINTS only — a
    // document in no candidate pair can never be dropped, so the corpus
    // never enters the label join or the per-component window (labeling
    // everything pushed the full corpus through a shuffle+window to
    // conclude keep=true for ~98% of rows; at 100 TB the endpoint set
    // is the few percent that collided)
    // pairs are eagerly checkpointed, not just persisted: every
    // downstream stage's plan otherwise CONTAINS the whole LSH DAG via
    // the endpoint set, and Catalyst re-analyzes that tree per action —
    // measured 131 jobs totalling ~6 task-seconds under ~4 MINUTES of
    // driver-side planning before this cut. The checkpoint is a
    // lineage-free leaf the size of the candidate pair list.
    val tNearDup0 = System.nanoTime()
    val rawPairs =
      if (opts.md5Family) {
        // the oracle-twin family: the same banded keyed-pairs machinery
        // fed by md5-derived signatures/band keys (the d14 recipe); the
        // keyed frame persists exactly like minhashNearDups' own
        val keyedMd5 = DedupIndex.keyedBandsMd5(
            exact.select(col("doc_id"), col("text")), 12, 4, 3)
          .persist(StorageLevel.MEMORY_AND_DISK)
        Dedup.minhashNearDupsKeyed(exact, keyedMd5, opts.nearDupTau,
          maxBucket = 100)
      } else Dedup.minhashNearDups(exact, tau = opts.nearDupTau)
    val pairs = rawPairs
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .localCheckpoint(true)
    val endpoints = pairs.select(col("u").as("node"))
      .union(pairs.select(col("v").as("node"))).distinct()
    val labeled = Clusters.labelAll(endpoints, pairs)
    val plan = Clusters.dedupPlan(labeled, exact)
    // the checkpointed LSH DAG is the expensive half of this stage —
    // charge it here, not to the next count
    val neardup = mark("near_dedup", Clusters.applyDedup(exact, plan), tNearDup0)

    // 4. exact-substring dedup (d10): duplicated >= minLen runs are cut
    // in place; documents reduced below the word floor drop out
    val cut = Dedup.substringDedup(neardup, opts.substrMinLen,
        hashGrams = opts.hashGrams)
      .select(col("doc_id"), col("cleaned").as("text"))
    val substr = mark("substring_dedup", neardup.drop("text")
      .join(cut, Seq("doc_id"))
      .filter(size(split(trim(col("text")), "\\s+")) >= opts.minDocWords))

    // 5. decontamination: drop any surviving doc sharing an n-gram with
    // the eval reference — eval grams broadcast (the d08 100 TB shape),
    // the corpus side never shuffles for the probe
    val fin = evalRef match {
      case Some(ev) =>
        def keyed(df: DataFrame): DataFrame =
          if (opts.hashGrams) df.withColumn("gram", xxhash64(col("gram")))
          else df
        val evalGrams = keyed(ev.select(
          explode(Dedup.shingles(col("text"), opts.contaminationN))
            .as("gram"))).distinct()
        val bad = keyed(substr.select(col("doc_id"),
            explode(Dedup.shingles(col("text"), opts.contaminationN))
              .as("gram")))
          .join(broadcast(evalGrams), Seq("gram"))
          .select(col("doc_id")).distinct()
        mark("decontaminate",
          substr.join(broadcast(bad), Seq("doc_id"), "left_anti"))
      case None => substr
    }
    // every stage is persisted + counted, so the final frame's cache is
    // materialized — upstream stage caches are dead weight past this point
    cached.filter(_ ne fin).foreach(_.unpersist(blocking = false))
    val report = stages.toSeq.zipWithIndex
      .map { case ((name, n, secs), i) => (i, name, n, secs) }
      .toDF("stage_idx", "stage", "rows", "secs")
    (fin, report)
  }

  /** The WEB form of [[curate]] — the full crawl-to-corpus loop in one
    * composition, starting from raw WARC segments instead of a clean
    * documents table:
    *
    *   WARC record parse → HTML response extraction → HTTP 2xx filter →
    *   URL-level dedup (t28 canonicalization, min-url survivor) →
    *   [[curate]] (HTML→text, gates, exact/near/substring dedup,
    *   decontamination).
    *
    * Survivor ids are `xxhash64(urlkey)` — stable across re-crawls of
    * the same page, which is what makes the downstream dedup stages
    * idempotent under re-ingestion. Returns (final corpus, combined
    * per-stage report). Every pre-curation stage is a map or one
    * keyed aggregation; raw archive bytes never cross an exchange
    * (the w01/w02 scan shape). */
  def crawlCurate(segments: DataFrame, evalRef: Option[DataFrame] = None,
      opts: Opts = Opts(),
      /** Admission filter from a CDX screen ([[graft.sources.WarcSource
        * .cdxAdmit]]): when set, only pages whose canonical urlkey is in
        * this (batch-bounded, broadcast) frame proceed to curation —
        * the continuous-crawl loop's seam, so url_dup/content_dup
        * captures never pay extraction or dedup. */
      admitKeys: Option[DataFrame] = None,
      /** A pre-parsed [[graft.sources.WarcSource.records]] frame over
        * the SAME segments, when the caller already paid the archive
        * parse (the crawl loop's media branch reads the same records):
        * the gunzip + WARC-grammar pass over the batch archive runs
        * once instead of twice per batch. Counts and results are
        * identical — same transform, same input. */
      preParsed: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val spark = segments.sparkSession
    import spark.implicits._
    val pre = scala.collection.mutable.ArrayBuffer[(String, Long, Double)]()
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def mark(name: String, df: DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      cached += p
      val n = p.count()
      pre += ((name, n, (System.nanoTime() - t0) / 1e9))
      p
    }
    val records = mark("records",
      preParsed.getOrElse(graft.sources.WarcSource.records(segments)))
    val pages = mark("html_pages",
      graft.sources.WarcSource.htmlResponses(records))
    val ok = mark("http_ok",
      pages.filter(col("http_status") >= 200 && col("http_status") < 300))
    val canon0 = ok.withColumn("urlkey", Curate.canonicalUrl(col("url")))
    val canon = admitKeys match {
      case Some(keys) => mark("admitted", canon0.join(
        broadcast(keys.select(col("urlkey")).distinct()),
        Seq("urlkey"), "left_semi"))
      case None => canon0
    }
    val urlDedup = mark("url_dedup", canon
      .groupBy(col("urlkey"))
      // (url, warc_date) survivor key: total under re-crawls of one URL
      .agg(min_by(struct(canon.columns.map(col): _*),
        struct(col("url"), col("warc_date"))).as("row"))
      .select(col("row.*")))
    // lineage cut (the c01 checkpoint lesson): every curate stage's
    // plan otherwise CONTAINS the whole segment-parse DAG and Catalyst
    // re-analyzes it per action — the pages table is the size that
    // matters from here on, so freeze it as a leaf.
    // Survivor id family follows opts.md5Family (the Signer discipline):
    // production ids are xxhash64(urlkey); the oracle twin derives them
    // from md5 so DuckDB recomputes every downstream survivor choice.
    val idCol =
      if (opts.md5Family)
        conv(substring(md5(col("urlkey")), 1, 15), 16, 10).cast("long")
      else xxhash64(col("urlkey"))
    val raw = urlDedup.select(
      idCol.as("doc_id"), col("url"), col("urlkey"),
      col("html"))
      .localCheckpoint(true)
    val (fin, inner) = curate(raw, evalRef, opts)
    val innerRows = inner.orderBy(col("stage_idx")).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    val report = (pre.toSeq ++ innerRows).zipWithIndex
      .map { case ((name, n, secs), i) => (i, name, n, secs) }
      .toDF("stage_idx", "stage", "rows", "secs")
    cached.foreach(_.unpersist(blocking = false))
    (fin, report)
  }

  /** The planted WARC crawl fixture c02 and c14 share: each doc becomes
    * one HTTP response record in a 41-way segment split, with
    * deterministic mess — 404s (id%7), image responses (id%11),
    * URL-variant re-crawls of the PREVIOUS doc's page (id%89), a fixed
    * boilerplate page shared by every 83rd doc, and every 79th ok page
    * served gzip-coded inside chunked framing (transfer-decode parity).
    * The branch precedence (7 → 11 → 89 → 83 → real) is part of the
    * oracle contract — c14's SQL replays the same CASE chain. */
  private[graft] def syntheticSegments(
      docs: org.apache.spark.sql.Dataset[(Long, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey { case (id, _) => id % 41 }
      .mapGroups { (seg, it) =>
        val ds = it.toSeq.sortBy(_._1)
        val recs = ds.map { case (id, text) =>
          val (status, mime, url, body) =
            if (id % 7 == 0)
              (404, "text/html",
                s"https://example.com/doc/$id", "<html>gone</html>")
            else if (id % 11 == 0)
              (200, "image/png",
                s"https://example.com/img/$id", "not-a-page")
            else if (id % 89 == 0)
              // URL-variant re-crawl of the PREVIOUS doc's page:
              // canonicalizes onto doc id-1's urlkey
              (200, "text/html",
                s"https://WWW.Example.com:443/doc/${id - 1}?utm_source=x",
                s"<html><body><p>recrawl of ${id - 1}</p></body></html>")
            else if (id % 83 == 0)
              (200, "text/html", s"https://example.com/doc/$id",
                "<html><body><p>shared boilerplate page body here" +
                  " with enough words to pass the floor.</p></body></html>")
            else
              (200, "text/html", s"https://example.com/doc/$id",
                s"<html><body><h1>Doc $id</h1><p>" + text +
                  "</p></body></html>")
          // every 79th page serves its body the way real origins do —
          // gzip-coded inside chunked framing; the extraction chain
          // must see the SAME page text as the plain-wire form
          // (transfer-decode parity spec-gated in CorpusPipelineSpec)
          val wire =
            if (id % 79 == 0 && status == 200 && mime == "text/html")
              graft.kernel.Warc.renderHttpResponse(status, Seq(
                "Content-Type" -> s"$mime; charset=utf-8",
                "Content-Encoding" -> "gzip",
                "Transfer-Encoding" -> "chunked"),
                graft.kernel.Warc.chunkBytes(graft.kernel.Warc.gzipBytes(
                  body.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 64))
            else graft.kernel.Warc.renderHttpResponse(status,
              s"$mime; charset=utf-8",
              body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (Seq(
            "WARC-Type" -> "response",
            "WARC-Target-URI" -> url,
            "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
            "WARC-Date" -> "2025-01-01T00:00:00Z",
            "Content-Type" -> "application/http;msgtype=response"),
            wire)
        }
        (s"file:/crawl/seg-$seg.warc.gz", graft.kernel.Warc.writeGz(recs))
      }
      .toDF("path", "content")
  }

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(
    // The full curation chain over the documents table, a ~1% slice held
    // out as the eval reference. Not SQL-expressible (the near-dup stage
    // is banded MinHash-LSH + connected components); CorpusPipelineSpec
    // gates every stage on a witness corpus, and each stage is itself an
    // independently oracle-gated operator (t27/t24/t10/d01/d03/d06/d09/
    // d10/d08). The registered frame is the per-stage row report in run
    // order — one monotone row per stage, so a regression that wipes the
    // corpus at any stage is visible in the driver's rows-only gate —
    // and the query itself refuses to return a vacuous result: the chain
    // must leave survivors. The synthetic documents table is plain text
    // with no sentence structure, so the web-crawl C4 line gate is off
    // (the knob a pre-cleaned corpus uses in production); every other
    // stage runs for real. Fully deterministic (md5 buckets, seeded LSH,
    // min-id survivors ⇒ stable stage counts).
    ("c01_corpus_curate", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("source"))
      val (_, report) = curate(
        docs.filter(col("doc_id") % 97 =!= 0),
        evalRef = Some(docs.filter(col("doc_id") % 97 === 0)),
        opts = Opts(lineGate = false))
      val st = report.orderBy(col("stage_idx")).collect()
      require(st.nonEmpty && st.last.getLong(2) > 0L,
        "c01: curation chain left no survivors — " +
          st.map(r => s"${r.getString(1)}=${r.getLong(2)}").mkString(", "))
      report.orderBy(col("stage_idx"))
    }, None),

    // c01's ORACLE TWIN — the COMPOSITION under the hash compare (the
    // d14/s16 family treatment applied to the whole pipeline): the
    // IDENTICAL curate() chain with the near-dup stage under the md5
    // family (Opts.md5Family → keyedBandsMd5 through the same
    // minhashNearDupsKeyed machinery) and raw-string grams for the
    // substring/decontamination stages (hashGrams = false), so EVERY
    // stage is SQL-replayable: PII redaction (t10's regex replay), the
    // word floor, exact dedup (min-id per normalized md5), md5-minhash
    // banding + cap + exact-Jaccard verify (d14), connected components
    // + longest-text canonical survivors (d06's recursive closure),
    // substring-span cuts + reassembly (d10), and the 8-gram eval
    // decontamination (d08). The registered output is the per-stage
    // row report — six exact counts that only match if every stage
    // agreed. Built ONCE per dataset (IxScratch, the c12 discipline);
    // the oracle hash-validates the artifact at both SFs; c01 stays the
    // live production-family anchor.
    ("c13_corpus_curate_md5", (s: SparkSession, d: String) => {
      val dir = IxScratch.cached(
          IxScratch.fingerprint(d) + "|c13-report", "graft-c13-") { p =>
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("source"))
        val (_, report) = curate(
          docs.filter(col("doc_id") % 97 =!= 0),
          evalRef = Some(docs.filter(col("doc_id") % 97 === 0)),
          opts = Opts(lineGate = false, hashGrams = false,
            md5Family = true))
        report.orderBy(col("stage_idx"))
          .select(col("stage_idx"), col("stage"), col("rows"))
          .coalesce(1).write.parquet(p + "/report.parquet")
      }
      s.read.parquet(dir + "/report.parquet").orderBy(col("stage_idx"))
    },
    Some("""WITH RECURSIVE src AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
      ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
      gated AS MATERIALIZED (
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
            '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS text
        FROM src),
      gkept AS MATERIALIZED (
        SELECT doc_id, text FROM gated
        WHERE len(string_split_regex(trim(text), '\s+')) >= 5),
      ex AS MATERIALIZED (
        SELECT doc_id, text FROM (
          SELECT doc_id, text, row_number() OVER (
            PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
            ORDER BY doc_id) AS rn
          FROM gkept) z WHERE rn = 1),
      sh AS MATERIALIZED (
        SELECT doc_id, text,
          CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
               THEN list_distinct(list_transform(
                 range(0, len(string_split_regex(trim(text), '\s+')) - 2),
                 i -> concat_ws(' ',
                   string_split_regex(trim(text), '\s+')[i+1],
                   string_split_regex(trim(text), '\s+')[i+2],
                   string_split_regex(trim(text), '\s+')[i+3])))
               ELSE [text] END AS sh
        FROM ex),
      grams3 AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      sig AS MATERIALIZED (
        SELECT doc_id, i.range AS i,
          min(CAST(concat('0x', substr(
            md5(concat(CAST(i.range AS VARCHAR), ':', g)), 1, 15))
            AS BIGINT)) AS s
        FROM grams3 CROSS JOIN range(12) i
        GROUP BY doc_id, i.range),
      bands AS MATERIALIZED (
        SELECT doc_id, CAST(i // 3 AS INTEGER) AS band,
          md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY i)) AS key
        FROM sig GROUP BY doc_id, i // 3),
      hot AS (
        SELECT band, key FROM bands GROUP BY band, key
        HAVING count(*) > 100),
      capped AS MATERIALIZED (
        SELECT b.* FROM bands b
        LEFT JOIN hot h ON b.band = h.band AND b.key = h.key
        WHERE h.band IS NULL),
      prs AS (
        SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
        FROM capped x JOIN capped y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
      ver AS MATERIALIZED (
        SELECT u, v FROM prs p
        JOIN sh a ON a.doc_id = p.u
        JOIN sh b ON b.doc_id = p.v
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
            >= 0.5),
      edges AS (SELECT u, v FROM ver UNION SELECT v AS u, u AS v FROM ver),
      nodes AS (SELECT DISTINCT u AS node FROM edges),
      reach(u, v) AS (
        SELECT node AS u, node AS v FROM nodes
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
      dplan AS MATERIALIZED (
        SELECT c.doc_id,
          first_value(c.doc_id) OVER (PARTITION BY c.component
            ORDER BY length(e.text) DESC, c.doc_id ASC) AS canonical_id
        FROM comp c JOIN ex e ON e.doc_id = c.doc_id),
      nd AS MATERIALIZED (
        SELECT e.doc_id, e.text FROM ex e
        WHERE NOT EXISTS (SELECT 1 FROM dplan p
          WHERE p.doc_id = e.doc_id AND p.doc_id <> p.canonical_id)),
      toks AS MATERIALIZED (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM nd),
      g8 AS MATERIALIZED (
        SELECT doc_id, CAST(r.i AS INTEGER) AS pos,
          array_to_string(tk[r.i+1 : r.i+8], ' ') AS gram
        FROM toks, unnest(range(0, greatest(len(tk) - 7, 0))) AS r(i)),
      dup AS (SELECT gram FROM g8 GROUP BY gram HAVING count(*) >= 2),
      dpos AS (
        SELECT doc_id, pos, pos + 7 AS e FROM g8
        WHERE gram IN (SELECT gram FROM dup)),
      runs AS (
        SELECT doc_id, pos, e,
          max(e) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_end
        FROM dpos),
      marked AS (
        SELECT doc_id, pos, e,
          lag(run_end) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_end
        FROM runs),
      flagged AS (
        SELECT doc_id, pos, e,
          sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                   THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
        FROM marked),
      sp AS MATERIALIZED (
        SELECT doc_id, span_id, min(pos) AS s, max(e) AS e
        FROM flagged GROUP BY doc_id, span_id),
      tokens AS (
        SELECT doc_id, CAST(r.i - 1 AS INTEGER) AS pos, tk[r.i] AS tok
        FROM toks, unnest(range(1, len(tk) + 1)) AS r(i)),
      kept AS MATERIALIZED (
        SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS text
        FROM tokens t
        WHERE NOT EXISTS (SELECT 1 FROM sp
          WHERE sp.doc_id = t.doc_id AND t.pos BETWEEN sp.s AND sp.e)
        GROUP BY t.doc_id),
      ss AS MATERIALIZED (
        SELECT doc_id, text FROM kept
        WHERE len(string_split_regex(trim(text), '\s+')) >= 5),
      cg AS MATERIALIZED (
        SELECT DISTINCT gram FROM (
          SELECT unnest(
            CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 8
            THEN list_distinct(list_transform(
              range(0, len(string_split_regex(trim(text), '\s+')) - 7),
              i -> array_to_string(
                string_split_regex(trim(text), '\s+')[i+1:i+8], ' ')))
            ELSE [text] END) AS gram
          FROM ev) z),
      bad AS (
        SELECT DISTINCT doc_id FROM (
          SELECT doc_id, unnest(
            CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 8
            THEN list_distinct(list_transform(
              range(0, len(string_split_regex(trim(text), '\s+')) - 7),
              i -> array_to_string(
                string_split_regex(trim(text), '\s+')[i+1:i+8], ' ')))
            ELSE [text] END) AS gram
          FROM ss) z
        WHERE gram IN (SELECT gram FROM cg)),
      fin AS (
        SELECT doc_id FROM ss
        WHERE doc_id NOT IN (SELECT doc_id FROM bad))
      SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
        CAST("rows" AS BIGINT) AS "rows"
      FROM (VALUES
        (0, 'extract', (SELECT count(*) FROM src)),
        (1, 'gate_scrub', (SELECT count(*) FROM gkept)),
        (2, 'exact_dedup', (SELECT count(*) FROM ex)),
        (3, 'near_dedup', (SELECT count(*) FROM nd)),
        (4, 'substring_dedup', (SELECT count(*) FROM ss)),
        (5, 'decontaminate', (SELECT count(*) FROM fin)))
        AS t(stage_idx, stage, "rows")
      ORDER BY stage_idx""")),

    // The crawl-to-corpus composition: documents become WARC crawl
    // segments (the w02 member-per-record layout) with PLANTED mess —
    // 404s (dropped at http_ok), image responses (dropped at
    // html_pages), URL-variant re-crawls of the previous doc's page
    // (collapse at url_dedup), and a fixed boilerplate page shared by
    // every 83rd doc (collapses at exact dedup) — then the full chain
    // runs: record grammar → HTTP split → canonicalization → HTML→text
    // → gates → exact/near/substring dedup. Rows-only (the near-dup
    // stage is not SQL-expressible); CorpusPipelineSpec gates every
    // stage with witnesses, and each stage is an independently
    // oracle-gated operator (w01/w02/t28/t27/t24/d01/d03/d06/d09/d10).
    ("c02_crawl_curate", (s: SparkSession, d: String) => {
      import s.implicits._
      val segments = syntheticSegments(Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)])
      val (_, report) = crawlCurate(segments, opts = Opts(lineGate = false))
      val st = report.orderBy(col("stage_idx")).collect()
      require(st.nonEmpty && st.last.getLong(2) > 0L,
        "c02: crawl chain left no survivors — " +
          st.map(r => s"${r.getString(1)}=${r.getLong(2)}").mkString(", "))
      report.orderBy(col("stage_idx"))
    }, None),

    // c02's ORACLE TWIN — the WEB composition under the hash compare
    // (the c13 treatment applied one level up): the IDENTICAL
    // crawlCurate chain — WARC record grammar (w01's parse) → HTML
    // response extraction + transfer decode (w09) → 2xx filter → t28
    // URL canonicalization + (url, warc_date) survivor → the c13
    // six-stage curation — with every non-replayable family swapped for
    // its md5 twin via Opts.md5Family: survivor ids are md5-derived
    // longs instead of xxhash64, near-dup runs keyedBandsMd5 through
    // the same minhashNearDupsKeyed machinery, grams stay raw strings.
    // The oracle replays the planted fixture's record classification
    // (the same 7/11/89/83 precedence chain syntheticSegments encodes),
    // the full t28 canonicalization over the planted URLs, the min-url
    // survivor choice, the t27 HTML→text regex chain, and then c13's
    // entire six-stage SQL — ten exact stage counts that only match if
    // every leg agreed. Built ONCE per dataset (IxScratch); c02 stays
    // the live production-family anchor (xxhash64 ids, fnv near-dup).
    ("c14_crawl_curate_md5", (s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IxScratch.cached(
          IxScratch.fingerprint(d) + "|c14-report", "graft-c14-") { p =>
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val segments = syntheticSegments(
          docs.filter(col("doc_id") % 97 =!= 0).as[(Long, String)])
        val (_, report) = crawlCurate(segments,
          evalRef = Some(docs.filter(col("doc_id") % 97 === 0)),
          opts = Opts(lineGate = false, hashGrams = false,
            md5Family = true))
        report.orderBy(col("stage_idx"))
          .select(col("stage_idx"), col("stage"), col("rows"))
          .coalesce(1).write.parquet(p + "/report.parquet")
      }
      s.read.parquet(dir + "/report.parquet").orderBy(col("stage_idx"))
    },
    Some("""WITH RECURSIVE d0 AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
      ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
      cls AS MATERIALIZED (
        SELECT doc_id, text,
          CASE WHEN doc_id % 7 = 0 THEN 'gone'
               WHEN doc_id % 11 = 0 THEN 'img'
               WHEN doc_id % 89 = 0 THEN 'recrawl'
               WHEN doc_id % 83 = 0 THEN 'boiler'
               ELSE 'real' END AS kind
        FROM d0),
      okpages AS MATERIALIZED (
        SELECT doc_id,
          CASE WHEN kind = 'recrawl'
               THEN 'https://WWW.Example.com:443/doc/' || (doc_id - 1) ||
                 '?utm_source=x'
               ELSE 'https://example.com/doc/' || doc_id END AS url,
          CASE WHEN kind = 'recrawl'
               THEN '<html><body><p>recrawl of ' || (doc_id - 1) ||
                 '</p></body></html>'
               WHEN kind = 'boiler'
               THEN '<html><body><p>shared boilerplate page body here' ||
                 ' with enough words to pass the floor.</p></body></html>'
               ELSE '<html><body><h1>Doc ' || doc_id || '</h1><p>' || text ||
                 '</p></body></html>'
          END AS html
        FROM cls WHERE kind IN ('recrawl', 'boiler', 'real')),
      uparts AS (
        SELECT doc_id, url, html,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
            AS scheme,
          lower(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
          regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS rawpath,
          regexp_extract(url, '\?([^#]*)', 1) AS q
        FROM okpages),
      ucanon AS MATERIALIZED (
        SELECT doc_id, url, html,
          scheme || '://' ||
          regexp_replace(
            CASE WHEN scheme = 'http'
                   THEN regexp_replace(hostport, ':80$', '')
                 WHEN scheme = 'https'
                   THEN regexp_replace(hostport, ':443$', '')
                 ELSE hostport END,
            '^www\.', '') ||
          CASE WHEN rawpath = '' THEN '/'
               WHEN length(rawpath) > 1
                 THEN regexp_replace(rawpath, '/$', '')
               ELSE rawpath END ||
          CASE WHEN coalesce(array_to_string(list_filter(string_split(q, '&'),
                 p -> NOT regexp_matches(p,
                   '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=')
                 AND p <> ''), '&'), '') = ''
               THEN ''
               ELSE '?' || array_to_string(list_filter(string_split(q, '&'),
                 p -> NOT regexp_matches(p,
                   '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=')
                 AND p <> ''), '&')
          END AS urlkey
        FROM uparts),
      surv AS MATERIALIZED (
        SELECT urlkey, html FROM (
          SELECT urlkey, html,
            row_number() OVER (PARTITION BY urlkey ORDER BY url ASC) AS rn
          FROM ucanon) z WHERE rn = 1),
      hstripped AS (
        SELECT urlkey,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(html,
              '(?is)<script[^>]*>.*?</script>', '', 'g'),
              '(?is)<style[^>]*>.*?</style>', '', 'g'),
              '(?s)<!--.*?-->', '', 'g'),
              '(?i)</?(?:p|div|br|h[1-6]|li|tr|table|ul|ol)[^>]*>',
                chr(10), 'g'),
              '<[^>]*>', '', 'g') AS t
        FROM surv),
      hdecoded AS (
        SELECT urlkey,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(t,
              '&lt;', '<', 'g'),
              '&gt;', '>', 'g'),
              '&quot;', '"', 'g'),
              '&#39;', '''', 'g'),
              '&nbsp;', ' ', 'g'),
              '&amp;', '&', 'g') AS t
        FROM hstripped),
      src AS MATERIALIZED (
        SELECT CAST(concat('0x', substr(md5(urlkey), 1, 15)) AS BIGINT)
            AS doc_id,
          trim(regexp_replace(regexp_replace(regexp_replace(t,
            '[ \t]+', ' ', 'g'),
            '\s*\n\s*', chr(10), 'g'),
            '^\n|\n$', '', 'g')) AS text
        FROM hdecoded),
      gated AS MATERIALIZED (
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
            '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS text
        FROM src),
      gkept AS MATERIALIZED (
        SELECT doc_id, text FROM gated
        WHERE len(string_split_regex(trim(text), '\s+')) >= 5),
      ex AS MATERIALIZED (
        SELECT doc_id, text FROM (
          SELECT doc_id, text, row_number() OVER (
            PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
            ORDER BY doc_id) AS rn
          FROM gkept) z WHERE rn = 1),
      sh AS MATERIALIZED (
        SELECT doc_id, text,
          CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
               THEN list_distinct(list_transform(
                 range(0, len(string_split_regex(trim(text), '\s+')) - 2),
                 i -> concat_ws(' ',
                   string_split_regex(trim(text), '\s+')[i+1],
                   string_split_regex(trim(text), '\s+')[i+2],
                   string_split_regex(trim(text), '\s+')[i+3])))
               ELSE [text] END AS sh
        FROM ex),
      grams3 AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      sig AS MATERIALIZED (
        SELECT doc_id, i.range AS i,
          min(CAST(concat('0x', substr(
            md5(concat(CAST(i.range AS VARCHAR), ':', g)), 1, 15))
            AS BIGINT)) AS s
        FROM grams3 CROSS JOIN range(12) i
        GROUP BY doc_id, i.range),
      bands AS MATERIALIZED (
        SELECT doc_id, CAST(i // 3 AS INTEGER) AS band,
          md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY i)) AS key
        FROM sig GROUP BY doc_id, i // 3),
      hot AS (
        SELECT band, key FROM bands GROUP BY band, key
        HAVING count(*) > 100),
      capped AS MATERIALIZED (
        SELECT b.* FROM bands b
        LEFT JOIN hot h ON b.band = h.band AND b.key = h.key
        WHERE h.band IS NULL),
      prs AS (
        SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
        FROM capped x JOIN capped y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
      ver AS MATERIALIZED (
        SELECT u, v FROM prs p
        JOIN sh a ON a.doc_id = p.u
        JOIN sh b ON b.doc_id = p.v
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
            >= 0.5),
      edges AS (SELECT u, v FROM ver UNION SELECT v AS u, u AS v FROM ver),
      nodes AS (SELECT DISTINCT u AS node FROM edges),
      reach(u, v) AS (
        SELECT node AS u, node AS v FROM nodes
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
      dplan AS MATERIALIZED (
        SELECT c.doc_id,
          first_value(c.doc_id) OVER (PARTITION BY c.component
            ORDER BY length(e.text) DESC, c.doc_id ASC) AS canonical_id
        FROM comp c JOIN ex e ON e.doc_id = c.doc_id),
      nd AS MATERIALIZED (
        SELECT e.doc_id, e.text FROM ex e
        WHERE NOT EXISTS (SELECT 1 FROM dplan p
          WHERE p.doc_id = e.doc_id AND p.doc_id <> p.canonical_id)),
      toks AS MATERIALIZED (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM nd),
      g8 AS MATERIALIZED (
        SELECT doc_id, CAST(r.i AS INTEGER) AS pos,
          array_to_string(tk[r.i+1 : r.i+8], ' ') AS gram
        FROM toks, unnest(range(0, greatest(len(tk) - 7, 0))) AS r(i)),
      dup AS (SELECT gram FROM g8 GROUP BY gram HAVING count(*) >= 2),
      dpos AS (
        SELECT doc_id, pos, pos + 7 AS e FROM g8
        WHERE gram IN (SELECT gram FROM dup)),
      runs AS (
        SELECT doc_id, pos, e,
          max(e) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_end
        FROM dpos),
      marked AS (
        SELECT doc_id, pos, e,
          lag(run_end) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_end
        FROM runs),
      flagged AS (
        SELECT doc_id, pos, e,
          sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                   THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
        FROM marked),
      sp AS MATERIALIZED (
        SELECT doc_id, span_id, min(pos) AS s, max(e) AS e
        FROM flagged GROUP BY doc_id, span_id),
      tokens AS (
        SELECT doc_id, CAST(r.i - 1 AS INTEGER) AS pos, tk[r.i] AS tok
        FROM toks, unnest(range(1, len(tk) + 1)) AS r(i)),
      kept AS MATERIALIZED (
        SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS text
        FROM tokens t
        WHERE NOT EXISTS (SELECT 1 FROM sp
          WHERE sp.doc_id = t.doc_id AND t.pos BETWEEN sp.s AND sp.e)
        GROUP BY t.doc_id),
      ss AS MATERIALIZED (
        SELECT doc_id, text FROM kept
        WHERE len(string_split_regex(trim(text), '\s+')) >= 5),
      cg AS MATERIALIZED (
        SELECT DISTINCT gram FROM (
          SELECT unnest(
            CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 8
            THEN list_distinct(list_transform(
              range(0, len(string_split_regex(trim(text), '\s+')) - 7),
              i -> array_to_string(
                string_split_regex(trim(text), '\s+')[i+1:i+8], ' ')))
            ELSE [text] END) AS gram
          FROM ev) z),
      bad AS (
        SELECT DISTINCT doc_id FROM (
          SELECT doc_id, unnest(
            CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 8
            THEN list_distinct(list_transform(
              range(0, len(string_split_regex(trim(text), '\s+')) - 7),
              i -> array_to_string(
                string_split_regex(trim(text), '\s+')[i+1:i+8], ' ')))
            ELSE [text] END) AS gram
          FROM ss) z
        WHERE gram IN (SELECT gram FROM cg)),
      fin AS (
        SELECT doc_id FROM ss
        WHERE doc_id NOT IN (SELECT doc_id FROM bad))
      SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
        CAST("rows" AS BIGINT) AS "rows"
      FROM (VALUES
        (0, 'records', (SELECT count(*) FROM cls)),
        (1, 'html_pages', (SELECT count(*) FROM cls WHERE kind <> 'img')),
        (2, 'http_ok', (SELECT count(*) FROM okpages)),
        (3, 'url_dedup', (SELECT count(*) FROM surv)),
        (4, 'extract', (SELECT count(*) FROM src)),
        (5, 'gate_scrub', (SELECT count(*) FROM gkept)),
        (6, 'exact_dedup', (SELECT count(*) FROM ex)),
        (7, 'near_dedup', (SELECT count(*) FROM nd)),
        (8, 'substring_dedup', (SELECT count(*) FROM ss)),
        (9, 'decontaminate', (SELECT count(*) FROM fin)))
        AS t(stage_idx, stage, "rows")
      ORDER BY stage_idx""")))
}
