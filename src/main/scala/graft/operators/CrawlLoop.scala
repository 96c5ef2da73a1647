package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.sources.{Frontier, WarcSource}

/** c08 — the composed continuous-crawl loop, the engine's end-to-end
  * story in one gated pipeline (the full generalization of the
  * reference's ingest loop, cloud-optimized-data-pipelines
  * OPERATING.md-style discover→fetch→transform→publish, re-expressed
  * as a crawl that FEEDS ITS OWN indexes):
  *
  *   frontier budgets (c07's PageRank × politeness machinery) select
  *   the fetch set → fetched pages archive REVISIT-aware against the
  *   stored capture digests (w12) → the CDX admission screen grows the
  *   capture index and gates curation (w08/cdxAdmit) → crawlCurate
  *   (c02) runs ONLY on admitted novel captures → survivors of the
  *   incremental corpus dedup (d11) grow ALL THREE stored index
  *   families — DedupIndex, RetrievalIndex, DecontamIndex — plus the
  *   published corpus itself, so batch k+1 is screened against
  *   everything batch k admitted.
  *
  * Scale posture: every stage is one of the already-audited shapes —
  * the frontier leg broadcasts a hosts-sized budget frame; archive
  * segments are built per url-hash group and their bytes never cross
  * another exchange; admission probes project the stored index to
  * DISTINCT keys; curation is the c02 chain; index grows append
  * id/hash/posting-shaped rows. The loop adds NO corpus-shaped
  * exchange of its own — only the per-batch fixed scheduling cost of
  * composing them, which amortizes with batch size at 100 TB.
  *
  * Lineage discipline (the index-append-invalidation lesson): the
  * fetch batch, the archive segments, and the dedup survivors are each
  * frozen with an eager localCheckpoint BEFORE any append to a path
  * their plans read — cdxAdmit and the three grows mutate exactly the
  * tables the next stage's inputs derive from.
  */
object CrawlLoop {

  /** On-disk homes of the loop's stored artifacts: the capture index,
    * the published corpus, the four index families (text dedup,
    * retrieval, decontamination, media fingerprints), and the run
    * ledger ([[State.manifestDir]] — every batch's per-stage report
    * plus index row counts, so a RESTARTED loop can answer "what did
    * batch k admit" without re-running anything). */
  final case class State(root: String) {
    def cdxDir: String = s"$root/cdx.parquet"
    def corpusDir: String = s"$root/corpus.parquet"
    def dedupDir: String = s"$root/dedup_ix"
    def retrievalDir: String = s"$root/retrieval_ix"
    def decontamDir: String = s"$root/decontam_ix"
    def hashDir: String = s"$root/hash_ix"
    // per-family fingerprint indexes: hamming distance across
    // modalities is meaningless, so image, audio, and video hashes
    // never share a band space
    def audioHashDir: String = s"$root/hash_ix_audio"
    def videoHashDir: String = s"$root/hash_ix_video"
    def manifestDir: String = s"$root/manifest.parquet"
  }

  def freshState(): State = State(
    java.nio.file.Files.createTempDirectory("graft_crawl_loop").toString)

  private def exists(p: String): Boolean =
    new java.io.File(p.stripPrefix("file:")).exists()

  /** Exact row count of a parquet table from its file FOOTERS, summed
    * driver-side — no Spark job, no scan. The manifest needs six stored
    * tables' totals per batch; as Spark `count()` jobs those were the
    * batch's only non-batch-shaped work (r16 VERDICT), where footer
    * reads are microseconds per file. */
  // one Configuration for every footer read — constructing one per
  // file re-parses the default resource XMLs
  private lazy val footerConf = new org.apache.hadoop.conf.Configuration()

  private[graft] def footerRows(p: String): Long = {
    // the java.nio walk below only sees the LOCAL filesystem: a state
    // dir on hdfs:/s3a: would silently sum to 0 and the manifest would
    // record zero row counts with no error — fail loudly instead (the
    // loop's state dirs are file-local by construction; route through
    // Hadoop FileSystem if that ever changes)
    require(!p.contains("://") || p.startsWith("file://"),
      s"footerRows: non-local path '$p' — only file: paths walk here")
    val root = new java.io.File(p.stripPrefix("file:"))
    if (!root.exists()) return 0L
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(root.toPath)
    try {
      files.iterator().asScala
        .filter(f => java.nio.file.Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet") &&
          // Spark's reader ignores _temporary/staging and hidden paths;
          // counting them here would over-count vs what any consumer
          // reads (orphans from a killed write, in-flight attempts)
          !root.toPath.relativize(f).iterator().asScala.exists { seg =>
            val s = seg.toString
            s.startsWith("_") || s.startsWith(".")
          })
        .map { f =>
          val in = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.toUri), footerConf))
          try in.getRecordCount finally in.close()
        }.sum
    } finally files.close()
  }

  /** Max of a non-null INT64 column across a parquet table, from the
    * file FOOTER column statistics — the [[footerRows]] treatment for
    * the manifest's `batch_ord` high-water mark (driver-side metadata
    * read, no Spark job). Returns None when the dir is missing, empty,
    * or any block lacks usable stats for `column` (caller falls back to
    * a real read — correctness never rides on stats being present). */
  private[graft] def footerMaxLong(p: String, column: String): Option[Long] = {
    require(!p.contains("://") || p.startsWith("file://"),
      s"footerMaxLong: non-local path '$p' — only file: paths walk here")
    val root = new java.io.File(p.stripPrefix("file:"))
    if (!root.exists()) return None
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(root.toPath)
    try {
      val maxes = files.iterator().asScala
        .filter(f => java.nio.file.Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet") &&
          !root.toPath.relativize(f).iterator().asScala.exists { seg =>
            val s = seg.toString
            s.startsWith("_") || s.startsWith(".")
          })
        .map { f =>
          val in = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.toUri), footerConf))
          try {
            val blockMaxes = in.getFooter.getBlocks.asScala.map { blk =>
              blk.getColumns.asScala
                .find(_.getPath.toDotString == column)
                .flatMap(c => Option(c.getStatistics))
                .filter(s => !s.isEmpty && s.hasNonNullValue)
                .map(_.genericGetMax) match {
                case Some(v: java.lang.Long) => Some(v.longValue())
                case _ => None
              }
            }
            if (blockMaxes.isEmpty || blockMaxes.exists(_.isEmpty)) None
            else Some(blockMaxes.flatten.max)
          } finally in.close()
        }.toSeq
      if (maxes.isEmpty || maxes.exists(_.isEmpty)) None
      else Some(maxes.flatten.max)
    } finally files.close()
  }

  /** Per-host fetch budgets from the PREVIOUS batch's link graph —
    * c07's allocation: PageRank masses (Q fixed-point, engine-exact)
    * scaled to budget = 1 + ⌊mass·scale/10^12⌋. Hosts absent from the
    * graph (unlinked — the crawler-trap signature) fall to the
    * caller's default. Empty graph → empty budget frame. */
  def budgets(prevPages: DataFrame, scale: Long = 19L,
      iters: Int = 2): DataFrame = {
    val spark = prevPages.sparkSession
    import spark.implicits._
    val edges = Frontier.hostGraph(Frontier.extractLinks(prevPages))
      .filter(col("src_host") =!= col("dst_host"))
      .select(col("src_host").as("src"), col("dst_host").as("dst"))
    if (edges.isEmpty) Seq.empty[(String, Long)].toDF("host", "budget")
    else Frontier.pageRankQ(edges, iters)
      .select(col("node").as("host"),
        (lit(1L) + expr(s"(mass * $scale) div 1000000000000")).as("budget"))
  }

  /** Budgeted politeness selection over a candidate frontier: per-host
    * delay slots ([[Frontier.schedule]]), keep the first `budget` slots
    * per host (hosts without a budget row get `defaultBudget` — the
    * squeeze that starves unlinked trap hosts). Returns the selected
    * (url, host, slot). */
  def frontierSelect(candidates: DataFrame, budget: DataFrame,
      defaultBudget: Long = 1L, delaySec: Double = 1.0): DataFrame = {
    val verdicts = candidates.select(col("url"),
      Frontier.hostOf(col("url")).as("host"),
      lit(true).as("allowed"), lit(delaySec).as("crawl_delay"))
    Frontier.schedule(verdicts)
      .join(broadcast(budget), Seq("host"), "left")
      .filter(col("slot") < coalesce(col("budget"), lit(defaultBudget)))
      .select(col("url"), col("host"), col("slot"))
  }

  /** One batch step of the loop: fetched captures (url, warc_date,
    * body[, content_type — defaults to HTML]) → revisit-aware archive →
    * CDX admission → media branch (admitted novel IMAGE, AUDIO, and
    * VIDEO captures are perceptually screened against their per-family
    * stored [[HashIndex]]es — CDX catches byte-identical re-fetches,
    * the hash probes catch re-encodes, near-edits, and gain-scaled
    * re-posts byte dedup can't see; novel media grow the indexes) →
    * curation of novel page captures → corpus dedup →
    * grow the three text indexes + the corpus. Returns the per-stage
    * report (stage_idx, stage, rows, secs) and appends it — plus the
    * stored tables' row counts (parquet footer metadata, no data read)
    * — to the run manifest under [[State.manifestDir]]. */
  def step(fetches: DataFrame, st: State,
      opts: CorpusPipeline.Opts = CorpusPipeline.Opts(),
      evalRef: Option[DataFrame] = None,
      /** Term/gram bucket count for the loop-owned retrieval and
        * decontamination indexes — the probe-pruning fan-out. Size it
        * to the CORPUS the loop will accumulate (64 serves 100 TB-scale
        * listing pruning; test-scale loops use 8 so each grow writes a
        * handful of files instead of hundreds). */
      ixBuckets: Int = 64): DataFrame = {
    val spark = fetches.sparkSession
    import spark.implicits._
    val report = scala.collection.mutable.ArrayBuffer[(String, Long, Double)]()
    // per-stage wall seconds ride the report (the c02 discipline): a
    // wobbling stage must be NAMEABLE without a side probe
    var tPrev = System.nanoTime()
    def stamp(): Double = {
      val t = System.nanoTime(); val s = (t - tPrev) / 1e9; tPrev = t; s
    }

    // freeze the batch: its plan may read paths this step appends to.
    // LAZY checkpoint + immediate count = ONE job doing both (r20: the
    // eager checkpoint paid a materialization job and the count paid a
    // second over the cache; the count IS the materializing action, and
    // it runs before any append, so the freeze discipline holds)
    val batch = (if (fetches.columns.contains("content_type"))
        fetches.select(col("url"), col("warc_date"), col("body"),
          col("content_type"))
      else fetches.select(col("url"), col("warc_date"), col("body"),
        lit("text/html; charset=utf-8").as("content_type")))
      .localCheckpoint(false)
    report += (("fetched", batch.count(), stamp()))

    // 1. revisit-aware archiving against the STORED capture digests:
    // a re-fetched identical payload archives as an ISO 28500 revisit
    // record, novel payloads as full responses. Frozen before cdxAdmit
    // appends to the very index the `stored` side reads.
    val stored =
      if (exists(st.cdxDir))
        // layout-guarded (the r18 StoreGuard discipline extended to the
        // loop's state dirs): a truncated or column-dropped capture
        // index must refuse loudly, not archive every re-fetch as novel
        StoreGuard.table(spark, st.root, "cdx.parquet", "url", "digest")
          .select(col("url"), col("digest"))
      else Seq.empty[(String, String)].toDF("url", "digest")
    val segments = WarcSource.archiveWithRevisits(batch, stored)
      .localCheckpoint(false) // lazy + count below = one job (see `batch`)
    report += (("segments", segments.count(), stamp()))

    // 2. CDX admission: screen vs the stored capture index, append the
    // novel captures (single-writer contract), return verdicts
    // cdxAdmit returns an eager localCheckpoint — already cached; a
    // second persist layer would only duplicate the blocks
    val verdicts = WarcSource.cdxAdmit(segments, st.cdxDir)
    // one aggregation pass for all three verdict counts; the whole
    // admission wall time is attributed to cdx_novel (ONE nameable row),
    // the sibling count rows deliberately read 0 — they share the pass
    val vCounts = verdicts.groupBy(col("verdict")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val admitSecs = stamp()
    report += (("cdx_novel", vCounts.getOrElse("novel", 0L), admitSecs))
    report += (("cdx_url_dup", vCounts.getOrElse("url_dup", 0L), 0.0))
    report += (("cdx_content_dup", vCounts.getOrElse("content_dup", 0L), 0.0))
    val novelKeys = verdicts.filter(col("verdict") === "novel")
      .select(col("urlkey")).distinct()

    // 2b. media branch — the modality half of the admission story:
    // decodable image/audio/video responses among the ADMITTED novel
    // captures fingerprint through their perceptual kernels, screen
    // against their per-family stored fingerprint indexes (re-encodes,
    // near-edits, and gain-scaled re-posts arrive with a novel byte
    // digest, so only the hash probes can catch them), and the
    // survivors grow them — batch k+1's media is screened against every
    // piece batch k admitted. Media doc_ids share the xxhash64(urlkey)
    // namespace with the page pipeline, so [[forget]] addresses both.
    // ONE archive parse for the media branch AND curation (r20): the
    // media legs and crawlCurate's records stage both read the parsed
    // record rows of the same frozen segments — previously each paid
    // its own gunzip + WARC-grammar pass over the whole batch archive
    val recs = graft.sources.WarcSource.records(segments)
      .persist(StorageLevel.MEMORY_AND_DISK)
    locally {
      // both modality legs read the admitted-novel media projection
      val mediaResp = graft.sources.WarcSource.mediaResponses(recs)
        .withColumn("doc_id", xxhash64(Curate.canonicalUrl(col("url"))))
        .join(broadcast(novelKeys
            .select(xxhash64(col("urlkey")).as("doc_id"))),
          Seq("doc_id"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
      // one modality's screen-and-grow: freeze the batch fingerprints
      // (the probe/grow below read and then mutate the index), collapse
      // within-batch perceptual twins (min-id survivor per hash), screen
      // vs the stored index, grow it with the survivors
      def screenAndGrow(sigs0: DataFrame, dir: String, inTag: String,
          dupTag: String, keptTag: String): Unit = {
        val sigs = sigs0.localCheckpoint(false) // lazy + count = one job
        report += ((inTag, sigs.count(), stamp()))
        val collapsed = sigs.groupBy(col("hash"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), col("hash"))
        val hashMeta = exists(s"$dir/meta.parquet")
        if (!hashMeta) {
          val kept = collapsed.localCheckpoint(false)
          val nKept = kept.count() // one job: materialize + count
          report += ((dupTag, 0L, stamp()))
          if (nKept > 0) HashIndex.build(kept, dir)
          report += ((keptTag, nKept, stamp()))
        } else {
          // r20: ONE checkpointed probe-marked frame replaces the former
          // dups.count + kept-checkpoint + kept.count trio (3 driver
          // jobs → 1): `dups` is a DISTINCT id set ⊆ collapsed's unique
          // doc_ids, so the left join is row-preserving and the marked
          // counts equal the old dups.count / kept.count exactly
          val dups = HashIndex.probe(
              HashIndex.load(spark, dir), collapsed)
            .select(col("doc_id")).distinct()
            .withColumn("__dup", lit(true))
          val marked = collapsed
            .join(broadcast(dups), Seq("doc_id"), "left_outer")
            .localCheckpoint(false)
          val cnts = marked
            .groupBy(coalesce(col("__dup"), lit(false)).as("d")).count()
            .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
          val nDup = cnts.getOrElse(true, 0L)
          report += ((dupTag, nDup, stamp()))
          val nKept = cnts.getOrElse(false, 0L)
          if (nKept > 0) HashIndex.grow(
            marked.filter(col("__dup").isNull)
              .select(col("doc_id"), col("hash")), dir)
          report += ((keptTag, nKept, stamp()))
        }
      }
      // ONE family-count pass gates every leg: a batch with no media of
      // a family skips that leg's whole job chain (a text-only crawl
      // batch pays one aggregation, not eight empty-frame jobs per leg)
      val famCounts = mediaResp.groupBy(col("family")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      def leg(family: String, sigs: => DataFrame, dir: String,
          inTag: String, dupTag: String, keptTag: String): Unit =
        if (famCounts.getOrElse(family, 0L) > 0)
          screenAndGrow(sigs, dir, inTag, dupTag, keptTag)
        else {
          report += ((inTag, 0L, stamp()))
          report += ((dupTag, 0L, 0.0))
          report += ((keptTag, 0L, 0.0))
        }
      // image leg: lenient perceptual hashes (undecodable containers
      // skip rows, never fail the batch)
      leg("image",
        Multimodal.crawlImageHashes(
          mediaResp.filter(col("family") === "image")
            .select(col("doc_id"), col("payload"))),
        st.hashDir, "media_images", "media_near_dup", "media_kept")
      // audio leg: amplitude-invariant energy-delta fingerprints — a
      // gain-scaled re-post arrives with a novel byte digest but the
      // SAME fingerprint; decodable WAV AND FLAC fingerprint (FLAC is
      // lossless, a WAV→FLAC re-encode lands on the same fingerprint;
      // lossy MP3/Ogg skip, their decode is loudly out of scope)
      leg("audio",
        Multimodal.crawlAudioFingerprints(
          mediaResp.filter(col("family") === "audio")
            .select(col("doc_id"), col("payload"))),
        st.audioHashDir, "media_audio", "media_audio_dup",
        "media_audio_kept")
      // video leg: temporal×spatial cube fingerprints, ratio-form bits
      // so brightness/gain-scaled re-encodes keep the SAME fingerprint;
      // only decodable Y4M fingerprints (lenient — compressed MP4/
      // Matroska bitstreams skip, their decode is loudly out of scope)
      leg("video",
        Multimodal.crawlVideoFingerprints(
          mediaResp.filter(col("family") === "video")
            .select(col("doc_id"), col("payload"))),
        st.videoHashDir, "media_video", "media_video_dup",
        "media_video_kept")
      mediaResp.unpersist(blocking = false)
    }

    // 3. curate ONLY the admitted novel captures (dup captures never
    // pay extraction or dedup); revisit records carry no payload and
    // never reach the page table at all
    val (fin, cReport) = CorpusPipeline.crawlCurate(
      segments, evalRef, opts, admitKeys = Some(novelKeys),
      preParsed = Some(recs))
    report ++= cReport.orderBy(col("stage_idx")).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    tPrev = System.nanoTime()

    // 4. incremental dedup against the published corpus, then grow all
    // three index families + the corpus with the survivors
    val first = !exists(s"${st.dedupDir}/meta.parquet")
    // freeze the curated batch as a lineage-free leaf: fin's plan
    // CONTAINS the whole curate DAG, and dedupAgainst + the three grows
    // below fire many actions over it — Catalyst would re-analyze the
    // full tree per action (the c01 driver-planning lesson)
    val curated = fin.select(col("doc_id"), col("text"))
      .localCheckpoint(false) // lazy: materialized by the next action,
                              // which always precedes the grows/appends
    val (survivors, keptN) =
      if (first) {
        val sv = curated
        val n = sv.count()
        require(n > 0, "crawl loop: seed batch left no survivors")
        report += (("corpus_kept", n, stamp()))
        report += (("corpus_exact_dup", 0L, stamp()))
        report += (("corpus_near_dup", 0L, stamp()))
        (sv, n)
      } else {
        val corpusText = StoreGuard.table(spark, st.root, "corpus.parquet",
            "doc_id", "text")
          .select(col("doc_id"), col("text"))
        // dedupAgainst returns an eager localCheckpoint — already cached
        val v = DedupIndex.dedupAgainst(curated, corpusText,
            DedupIndex.load(spark, st.dedupDir), opts.nearDupTau)
        val kept = v.filter(col("status") === "kept").select(col("doc_id"))
        // freeze BEFORE the grows/appends below mutate the dedup index
        // and corpus files this plan reads (lazy + count = one job)
        val sv = curated.join(broadcast(kept), Seq("doc_id"), "left_semi")
          .localCheckpoint(false)
        val n = sv.count()
        val sCounts = v.groupBy(col("status")).count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        report += (("corpus_kept", n, stamp()))
        report += (("corpus_exact_dup",
          sCounts.filter(_._1.startsWith("exact")).values.sum, stamp()))
        report += (("corpus_near_dup",
          sCounts.filter(_._1.startsWith("near")).values.sum, stamp()))
        v.unpersist(blocking = false)
        (sv, n)
      }
    // batch-shaped writes: without this every grow/append emits one
    // file per shuffle partition per bucket dir (measured: hundreds of
    // KB-sized files and a compaction rewrite per batch); ~100k rows
    // per written partition keeps the three grows and the corpus append
    // proportional to the BATCH, at any batch size
    val sized = survivors.coalesce(((keptN - 1) / 100000L + 1L).toInt)
    // the four maintenance writes are independent (distinct dirs, one
    // frozen input leaf) — submit them as CONCURRENT Spark jobs; the
    // scheduler interleaves their small stages instead of paying four
    // sequential job latencies per batch
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val writes =
        if (first) Seq(
          // the dedup index follows the composition's hash family (the
          // c13/c14 Signer discipline): the c15 oracle twin builds md5
          // so the cross-batch verdicts replay; production stays fnv
          Future(DedupIndex.build(sized, st.dedupDir,
            family = if (opts.md5Family) "md5" else "fnv")),
          Future(RetrievalIndex.build(sized, st.retrievalDir,
            nBuckets = ixBuckets)),
          Future(DecontamIndex.build(sized, st.decontamDir,
            nBuckets = ixBuckets)),
          Future(sized.write.mode("append").parquet(st.corpusDir)))
        else Seq(
          Future(DedupIndex.grow(sized, st.dedupDir)),
          Future(RetrievalIndex.grow(sized, st.retrievalDir)),
          Future(DecontamIndex.grow(sized, st.decontamDir)),
          Future(sized.write.mode("append").parquet(st.corpusDir)))
      // await EVERY write before propagating the first failure: a caller
      // retrying step() after an exception must never race a still-running
      // sibling grow against the same index dirs (single-writer contract)
      val done = writes.map(w => scala.util.Try(Await.result(w, Duration.Inf)))
      done.foreach(_.get)
    }
    report += (("corpus_total", footerRows(st.corpusDir), stamp()))

    val rep = report.toSeq.zipWithIndex
      .map { case ((stage, n, secs), i) => (i, stage, n, secs) }
      .toDF("stage_idx", "stage", "rows", "secs")

    // run ledger: append this batch's report + the stored tables' row
    // counts to the manifest, so a restarted loop serves per-batch
    // history without re-running anything. Counts come from parquet
    // footers read DRIVER-SIDE ([[footerRows]]) — previously six Spark
    // count() jobs, the batch's only non-batch-shaped work. ONE file
    // per batch (the report is tiny); batch_ord continues from the
    // stored ledger.
    // max(batch_ord) comes from the parquet FOOTER column statistics
    // (the footerRows discipline): the ledger is one tiny file per
    // batch, and reading its max as a Spark job was one more driver
    // round trip per batch. Files with missing stats fall back to the
    // layout-guarded Spark read.
    val batchOrd =
      if (!exists(st.manifestDir)) 0L
      else footerMaxLong(st.manifestDir, "batch_ord")
        .map(_ + 1L)
        .getOrElse(Option(StoreGuard.table(spark, st.root, "manifest.parquet",
            "stage_idx", "stage", "rows", "secs", "batch_ord")
          .agg(max(col("batch_ord"))).head().get(0))
        .map(_.asInstanceOf[Long] + 1L).getOrElse(0L))
    val ixRows = Seq(
      ("ix_dedup_docs", footerRows(s"${st.dedupDir}/exact.parquet")),
      ("ix_retrieval_docs", footerRows(s"${st.retrievalDir}/doclens.parquet")),
      ("ix_decontam_grams", footerRows(s"${st.decontamDir}/grams.parquet")),
      ("ix_hash_sigs", footerRows(s"${st.hashDir}/hashes.parquet")),
      ("ix_audio_hash_sigs", footerRows(s"${st.audioHashDir}/hashes.parquet")),
      ("ix_video_hash_sigs", footerRows(s"${st.videoHashDir}/hashes.parquet")))
      .zipWithIndex
      .map { case ((stage, n), i) => (report.size + i, stage, n, 0.0) }
      .toDF("stage_idx", "stage", "rows", "secs")
    rep.unionByName(ixRows)
      .withColumn("batch_ord", lit(batchOrd))
      .coalesce(1)
      .write.mode("append").parquet(st.manifestDir)

    rep
  }

  /** Takedown across EVERY stored artifact the loop maintains — the
    * right-to-be-forgotten pass a production corpus owes its sources,
    * in one call: the documents stop matching retrieval, stop
    * attributing contamination, stop deduping future batches, leave
    * the published corpus, and their capture rows leave the CDX index
    * (so a later legitimate re-submission of the SAME url is
    * re-admitted as novel rather than silently url_dup'd against a
    * purged capture).
    *
    * Physical, not masked: each index family runs forget + vacuum, so
    * no tombstone survives — which also makes re-admission after a
    * takedown work (tombstones are id-level; a masked id would keep a
    * re-grown duplicate invisible forever). Corpus and CDX rewrite
    * left-anti with the checkpoint-before-overwrite discipline. CDX
    * rows key by xxhash64(urlkey) — exactly how crawlCurate mints
    * doc_ids, so the same id namespace addresses both. */
  def forget(ids: DataFrame, st: State): Unit = {
    val spark = ids.sparkSession
    val frozen = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    DedupIndex.forget(frozen, st.dedupDir)
    DedupIndex.vacuum(spark, st.dedupDir)
    RetrievalIndex.forget(frozen, st.retrievalDir)
    RetrievalIndex.vacuum(spark, st.retrievalDir)
    DecontamIndex.forget(frozen, st.decontamDir)
    DecontamIndex.vacuum(spark, st.decontamDir)
    // media fingerprints share the xxhash64(urlkey) id namespace — a
    // forgotten media url stops attracting near-dup matches physically
    for (dir <- Seq(st.hashDir, st.audioHashDir, st.videoHashDir)
        if exists(s"$dir/meta.parquet")) {
      HashIndex.forget(frozen, dir)
      HashIndex.vacuum(spark, dir)
    }
    val corpus = StoreGuard.table(spark, st.root, "corpus.parquet", "doc_id")
      .join(broadcast(frozen), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    corpus.write.mode("overwrite").parquet(st.corpusDir)
    val cdx = StoreGuard.table(spark, st.root, "cdx.parquet", "urlkey")
      .withColumn("__did", xxhash64(col("urlkey")))
      .join(broadcast(frozen.withColumnRenamed("doc_id", "__did")),
        Seq("__did"), "left_anti")
      .drop("__did")
      .localCheckpoint(true)
    cdx.write.mode("overwrite").parquet(st.cdxDir)
  }

  /** The c15 fixture: two [[step]] batches under the md5 family into
    * `stateRoot` — batch 0 seeds with the odd documents, batch 1 brings
    * the even documents with planted cross-batch events by congruence
    * precedence (10 → 14 → 22 → 6 → real). Shared by the registered
    * query (IxScratch-cached) and CrawlLoopSpec's cached ≡ live gate. */
  private[graft] def md5FamilyLoop(s: SparkSession, d: String,
      stateRoot: String): Unit = {
    val st = State(stateRoot)
    val opts = CorpusPipeline.Opts(lineGate = false, hashGrams = false,
      md5Family = true)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    def page(text: org.apache.spark.sql.Column) =
      concat(lit("<html><body><p>"), text, lit("</p></body></html>"))
    val b0 = docs.filter(col("doc_id") % 2 === 1)
      .select(
        concat(lit("https://example.com/doc/"), col("doc_id")).as("url"),
        lit("2025-05-01T00:00:00Z").as("warc_date"),
        page(col("text")).cast("binary").as("body"))
    val tgt = docs.select(col("doc_id").as("tid"), col("text").as("ttext"))
    val pre = docs.filter(col("doc_id") % 2 === 0)
      .withColumn("tid",
        when(col("doc_id") % 10 === 0, col("doc_id") - 1)
          .when(col("doc_id") % 14 === 0, col("doc_id") - 7)
          .when(col("doc_id") % 22 === 0, col("doc_id") - 11)
          .when(col("doc_id") % 6 === 0, col("doc_id") - 3))
      .join(tgt, Seq("tid"), "left")
    val ttext = coalesce(col("ttext"), col("text"))
    val b1 = pre.select(
      when(col("doc_id") % 10 === 0,
          concat(lit("https://example.com/doc/"), col("tid")))
        .when(col("doc_id") % 14 === 0,
          concat(lit("https://example.com/copy/"), col("doc_id")))
        .otherwise(concat(lit("https://example.com/doc/"), col("doc_id")))
        .as("url"),
      lit("2025-05-02T00:00:00Z").as("warc_date"),
      when(col("doc_id") % 10 === 0, page(ttext))
        .when(col("doc_id") % 14 === 0, page(ttext))
        .when(col("doc_id") % 22 === 0, page(concat(
          lit("edited"), col("doc_id").cast("string"), lit(" "), ttext)))
        .when(col("doc_id") % 6 === 0, page(concat(ttext, lit("  "))))
        .otherwise(page(col("text")))
        .cast("binary").as("body"))
    step(b0, st, opts, ixBuckets = 8)
    step(b1, st, opts, ixBuckets = 8)
    ()
  }

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Two batches of a continuous crawl over the documents table:
    // 5 cross-linked hosts (the c07 shape) plus an unlinked trap host.
    // Batch 0 seeds; batch 1 is budget-selected by the seed batch's
    // link graph (the trap host starves at the default budget).
    // Planted cross-batch events ride the loop: identical re-fetches
    // (revisit records + cdx url_dup), mirrors of earlier bodies on a
    // new URL (content_dup), whitespace-variant re-posts (novel digest
    // but exact_corpus at dedup), near-dup edits (near_corpus via
    // the grown DedupIndex), GIF re-encodes of earlier PNGs (image
    // HashIndex), and gain-doubled re-posts of earlier clips (video
    // HashIndex). Not SQL-expressible (LSH + stored-index
    // lifecycle); CrawlLoopSpec gates every stage count exactly on a
    // witness crawl and pins batch parity with the streamed form.
    ("c08_crawl_loop", (s: SparkSession, d: String) => {
      import s.implicits._
      // absolute doc cap (the d02 exact-baseline pattern): the loop's
      // cost is per-batch FIXED scheduling (19 composed stages + three
      // index grows), which amortizes with batch size at 100 TB but
      // would dominate a local bench at any sf — the fixture verifies
      // loop SEMANTICS, the plan shapes carry the scale argument
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 2 === 0 && col("doc_id") < 2000)
      def urlOf(id: Column): Column = concat(lit("https://h"),
        pmod(id, lit(5)), lit(".example.com/doc/"), id)
      def htmlOf(id: Column, text: Column): Column = concat(
        lit("<html><body><h1>Doc "), id, lit("</h1><p>"), text,
        lit("</p><p><a href=\"https://h"), pmod(id + 1, lit(5)),
        lit(".example.com/x\">a</a> <a href=\"https://h"),
        pmod(id * 3 + 1, lit(5)),
        lit(".example.com/y\">b</a></p></body></html>"))
      // tile-congruence PNG/GIF payloads (the m36 fixture scheme): each
      // id's image is unique; a GIF re-encode of a PREVIOUS batch's PNG
      // arrives with a novel byte digest but identical pixels — only
      // the loop's HashIndex screen can catch it
      def imgFetches(ids: DataFrame, pathTag: String,
          gif: Boolean): DataFrame = {
        val out = ids.select(col("doc_id")).as[Long].mapPartitions { it =>
          it.map { id =>
            val w = 64; val h = 64
            val m1 = (id * 2654435761L) % 251L + 2L
            val m2 = (id * 40503L) % 239L + 3L
            val px = Array.tabulate(w * h) { i =>
              val bx = (i % w) / 8; val by = (i / w) / 8
              ((bx * m1 + by * m2 + id) % 256L).toInt
            }
            if (gif)
              (s"https://h${id % 5}.example.com/$pathTag/$id.gif",
                graft.kernel.Gif.encode(graft.kernel.Gif.Image(w, h, 1, px)),
                "image/gif")
            else
              (s"https://h${id % 5}.example.com/$pathTag/$id.png",
                graft.kernel.Png.encode(
                  graft.kernel.Png.Image(w, h, 1, 8, px)),
                "image/png")
          }
        }
        out.toDF("url", "body", "content_type")
      }
      // tiny per-id-unique Y4M clips (8×8 Cmono, 4 frames — the video
      // cube's minimum shape); `gain` scales every luma byte, so a
      // gain-2 re-post of a PREVIOUS batch's clip arrives with a novel
      // byte digest but the SAME ratio-form cube — only the loop's
      // video HashIndex screen can catch it
      def vidFetches(ids: DataFrame, pathTag: String,
          gain: Int): DataFrame = {
        val out = ids.select(col("doc_id")).as[Long].mapPartitions { it =>
          it.map { id =>
            // per-cell luma via a splitmix finalizer — the m11 lesson:
            // a linear residue in (cell, id) collapses to ~10 distinct
            // cubes once ids share a stride, and "unique" clips collide
            // (measured at sf0.1: 19 within-batch + 29 cross-batch
            // spurious hamming-0 hits). Values ≤ 63 so gain ≤ 3 never
            // clips; exact scaling keeps the ratio-form bits identical.
            def mix(z0: Long): Long = {
              var z = z0 + 0x9e3779b97f4a7c15L
              z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
              z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
              z ^ (z >>> 31)
            }
            val frames = Vector.tabulate(4) { t =>
              Array.tabulate[Byte](64) { i =>
                val c = ((i / 8) / 2) * 4 + (i % 8) / 2
                (((mix(id * 8191L + t * 64L + c) & 0x3fL) + 1L).toInt
                  * gain).toByte
              }
            }
            (s"https://h${id % 5}.example.com/$pathTag/$id-g$gain.y4m",
              graft.kernel.Y4m.encode(
                graft.kernel.Y4m.Video(8, 8, "Cmono", frames)),
              "video/x-yuv4mpeg")
          }
        }
        out.toDF("url", "body", "content_type")
      }
      val st = freshState()
      var prevPages: DataFrame = null
      val reports = (0 until 2).map { k =>
        val none = docs.limit(0).select(lit("").as("url"), lit("").as("html"))
        val base = docs.filter(col("doc_id") % 3 === k)
          .select(urlOf(col("doc_id")).as("url"),
            htmlOf(col("doc_id"), col("text")).as("html"))
        val prev = docs.filter(col("doc_id") % 3 === (k + 2) % 3)
        // identical re-fetch of the previous batch → revisit + url_dup
        val refetch = if (k == 0) none else prev
          .filter(col("doc_id") % 17 === 0)
          .select(urlOf(col("doc_id")).as("url"),
            htmlOf(col("doc_id"), col("text")).as("html"))
        // same body on a NEW url → content_dup (archived as revisit)
        val mirror = if (k != 1) none else prev
          .filter(col("doc_id") % 23 === 0)
          .select(concat(lit("https://h1.example.com/mirror/"),
              col("doc_id")).as("url"),
            htmlOf(col("doc_id"), col("text")).as("html"))
        // whitespace-variant re-post: novel digest, exact_corpus text
        val copy = if (k != 1) none else docs
          .filter(col("doc_id") % 3 === 0 && col("doc_id") % 31 === 0)
          .select(concat(lit("https://h2.example.com/copy/"),
              col("doc_id")).as("url"),
            htmlOf(col("doc_id"), concat(col("text"), lit("  "))).as("html"))
        // edited tail on a new url: novel digest, near_corpus text
        val nearEdit = if (k != 1) none else docs
          .filter(col("doc_id") % 3 === 0 && col("doc_id") % 19 === 0)
          .select(concat(lit("https://h0.example.com/v2/"),
              col("doc_id")).as("url"),
            htmlOf(col("doc_id"),
              concat(col("text"), lit(" freshly edited tail"))).as("html"))
        // an unlinked generator host: no inbound links → default budget
        val trap = if (k == 0) none else s.range(30)
          .select(concat(lit("https://trap.example.net/gen/"), col("id"),
              lit(s"-b$k")).as("url"),
            lit("<html><body><p>generated trap page stub</p></body></html>")
              .as("html"))
        // media plants: each batch carries unique PNGs (ids ≡ 0 mod 11
        // within the batch's residue class); batch 1 additionally
        // re-encodes HALF of batch 0's images as GIFs on new urls —
        // novel digests at CDX, hamming-0 at the GROWN HashIndex
        val imgs = imgFetches(
          docs.filter(col("doc_id") % 3 === k && col("doc_id") % 11 === 0),
          "img", gif = false)
        val reenc = if (k != 1) imgs.limit(0) else imgFetches(
          docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 11 === 0
            && col("doc_id") % 4 === 0),
          "img2", gif = true)
        // video plants (the image scheme, third modality): each batch
        // carries unique clips (ids ≡ 0 mod 13 within the batch's
        // residue class); batch 1 re-posts HALF of batch 0's clips
        // gain-doubled on new urls — novel digests at CDX, hamming-0 at
        // the GROWN video HashIndex
        val vids = vidFetches(
          docs.filter(col("doc_id") % 3 === k && col("doc_id") % 13 === 0),
          "vid", gain = 1)
        val regain = if (k != 1) vids.limit(0) else vidFetches(
          docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 13 === 0
            && col("doc_id") % 4 === 0),
          "vid2", gain = 2)
        val candidates = base.unionByName(refetch).unionByName(mirror)
          .unionByName(copy).unionByName(nearEdit).unionByName(trap)
          .select(col("url"), col("html").cast("binary").as("body"),
            lit("text/html; charset=utf-8").as("content_type"))
          .unionByName(imgs).unionByName(reenc)
          .unionByName(vids).unionByName(regain)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val nCand = candidates.count()
        val fetchSet =
          if (k == 0) candidates
          else {
            // budget scale ≈ 6× the candidate count: linked hosts get
            // generous budgets, the unlinked trap host starves at 1
            val b = budgets(prevPages, scale = 6L * nCand, iters = 2)
            frontierSelect(candidates.select(col("url")), b)
              .select(col("url"))
              .join(candidates, Seq("url"))
          }
        val fetches = fetchSet
          .withColumn("warc_date", lit(s"2025-01-0${k + 1}T00:00:00Z"))
          .select(col("url"), col("warc_date"), col("body"),
            col("content_type"))
        prevPages = base
        // per-batch eval decontamination rides the loop: pages sharing
        // an 8-gram with the eval reference (a fixed slice of the
        // documents table that IS crawled) die at the decontaminate
        // stage every batch — eval text never reaches the corpus or
        // the stored indexes
        val evalRef = docs.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"), col("text"))
        val rep = step(fetches, st,
            CorpusPipeline.Opts(lineGate = false),
            evalRef = Some(evalRef), ixBuckets = 8)
          .withColumn("batch_id", lit(k))
        val pre = Seq((0, "frontier_candidates", nCand, 0.0),
            (1, "frontier_selected", fetches.count(), 0.0))
          .toDF("stage_idx", "stage", "rows", "secs")
          .withColumn("batch_id", lit(k))
        val out = pre.unionByName(
          rep.withColumn("stage_idx", col("stage_idx") + 2))
        candidates.unpersist(blocking = false)
        out
      }
      reports.reduce(_.unionByName(_))
        .select(col("batch_id"), col("stage_idx"), col("stage"),
          col("rows"), col("secs"))
        .orderBy(col("batch_id"), col("stage_idx"))
    }, None),

    // The loop's CONTINUOUS mode, registered: fetch batches arrive as a
    // FILE-SOURCE STREAM (one batch per trigger, the B6–B8 shape) and
    // foreachBatch runs the same step() the batch form runs —
    // CrawlLoopSpec pins foreachBatch ≡ batch parity, so the streamed
    // loop inherits every batch-form gate. The registered query serves
    // the RUN MANIFEST the streamed loop persisted: per-batch stage
    // rows and index row counts, readable across restarts without
    // re-running anything (the loop is maintenance; the ledger is the
    // servable artifact — the r04/r08 index-serving discipline).
    // Fixture: a 2-batch crawl with planted cross-batch events — an
    // identical re-fetch (url_dup), a GIF re-encode of a batch-0 PNG
    // (media near-dup via the GROWN HashIndex), a whitespace re-post
    // (exact_corpus) — all visible as manifest rows. Not
    // SQL-expressible (stored-index lifecycle); rows-only + specs.
    ("c11_crawl_loop_stream", (s: SparkSession, d: String) => {
      import s.implicits._
      val root = IxScratch.cached(
          "crawlloop-stream:" + IxScratch.fingerprint(d),
          "graft_loop_stream") { p =>
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 2 === 0 && col("doc_id") < 1000)
        def urlOf(id: Column): Column = concat(lit("https://h"),
          pmod(id, lit(5)), lit(".example.com/doc/"), id)
        def htmlOf(id: Column, text: Column): Column = concat(
          lit("<html><body><h1>Doc "), id, lit("</h1><p>"), text,
          lit("</p></body></html>"))
        def pngGif(ids: DataFrame, tag: String, gif: Boolean): DataFrame =
          ids.select(col("doc_id")).as[Long].mapPartitions { it =>
            it.map { id =>
              val w = 64; val h = 64
              val m1 = (id * 2654435761L) % 251L + 2L
              val m2 = (id * 40503L) % 239L + 3L
              val px = Array.tabulate(w * h) { i =>
                val bx = (i % w) / 8; val by = (i / w) / 8
                ((bx * m1 + by * m2 + id) % 256L).toInt
              }
              if (gif)
                (s"https://h${id % 5}.example.com/$tag/$id.gif",
                  graft.kernel.Gif.encode(
                    graft.kernel.Gif.Image(w, h, 1, px)), "image/gif")
              else
                (s"https://h${id % 5}.example.com/$tag/$id.png",
                  graft.kernel.Png.encode(
                    graft.kernel.Png.Image(w, h, 1, 8, px)), "image/png")
            }
          }.toDF("url", "body", "content_type")
        def batchOf(k: Int): DataFrame = {
          val pages = docs.filter(col("doc_id") % 3 === k)
            .select(urlOf(col("doc_id")).as("url"),
              htmlOf(col("doc_id"), col("text")).cast("binary").as("body"),
              lit("text/html; charset=utf-8").as("content_type"))
          val refetch = if (k == 0) pages.limit(0)
            else docs.filter(col("doc_id") % 3 === 0
                && col("doc_id") % 17 === 0)
              .select(urlOf(col("doc_id")).as("url"),
                htmlOf(col("doc_id"), col("text")).cast("binary").as("body"),
                lit("text/html; charset=utf-8").as("content_type"))
          val copy = if (k == 0) pages.limit(0)
            else docs.filter(col("doc_id") % 3 === 0
                && col("doc_id") % 31 === 0)
              .select(concat(lit("https://h2.example.com/copy/"),
                  col("doc_id")).as("url"),
                htmlOf(col("doc_id"), concat(col("text"), lit("  ")))
                  .cast("binary").as("body"),
                lit("text/html; charset=utf-8").as("content_type"))
          val imgs = pngGif(
            docs.filter(col("doc_id") % 3 === k && col("doc_id") % 11 === 0),
            "img", gif = false)
          val reenc = if (k == 0) imgs.limit(0) else pngGif(
            docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 11 === 0
              && col("doc_id") % 4 === 0),
            "img2", gif = true)
          // audio + video plants so the streamed loop exercises ALL
          // THREE media legs: unique splitmix media per id; batch 1
          // re-posts batch 0's at double gain — novel byte digests,
          // identical amplitude/ratio-invariant fingerprints, caught
          // only by the GROWN per-family indexes
          def mixv(z0: Long): Long = {
            var z = z0 + 0x9e3779b97f4a7c15L
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            z ^ (z >>> 31)
          }
          def wavOf(ids: DataFrame, tag: String, gain: Int): DataFrame =
            ids.select(col("doc_id")).as[Long].mapPartitions { it =>
              it.map { id =>
                val samples = Array.tabulate(200)(i =>
                  ((mixv(id * 1000L + i) % 100L).toInt - 50) * gain)
                (s"https://h${id % 5}.example.com/$tag/$id-g$gain.wav",
                  graft.kernel.Wav.encode(
                    graft.kernel.Wav.Audio(8000, 1, 16, samples)),
                  "audio/wav")
              }
            }.toDF("url", "body", "content_type")
          def y4mOf(ids: DataFrame, tag: String, gain: Int): DataFrame =
            ids.select(col("doc_id")).as[Long].mapPartitions { it =>
              it.map { id =>
                val frames = Vector.tabulate(4) { t =>
                  Array.tabulate[Byte](64) { i =>
                    val c = ((i / 8) / 2) * 4 + (i % 8) / 2
                    (((mixv(id * 8191L + t * 64L + c) & 0x3fL) + 1L).toInt
                      * gain).toByte
                  }
                }
                (s"https://h${id % 5}.example.com/$tag/$id-g$gain.y4m",
                  graft.kernel.Y4m.encode(
                    graft.kernel.Y4m.Video(8, 8, "Cmono", frames)),
                  "video/x-yuv4mpeg")
              }
            }.toDF("url", "body", "content_type")
          val aIds = docs.filter(col("doc_id") % 3 === k
            && col("doc_id") % 13 === 0)
          val vIds = docs.filter(col("doc_id") % 3 === k
            && col("doc_id") % 17 === 0)
          val wavs = wavOf(aIds, "au", gain = 1)
          val vids = y4mOf(vIds, "vid", gain = 1)
          val rePost = if (k == 0) wavs.limit(0) else
            wavOf(docs.filter(col("doc_id") % 3 === 0
              && col("doc_id") % 13 === 0), "au2", gain = 2)
          val reGain = if (k == 0) vids.limit(0) else
            y4mOf(docs.filter(col("doc_id") % 3 === 0
              && col("doc_id") % 17 === 0), "vid2", gain = 2)
          pages.unionByName(refetch).unionByName(copy)
            .unionByName(imgs).unionByName(reenc)
            .unionByName(wavs).unionByName(rePost)
            .unionByName(vids).unionByName(reGain)
            .withColumn("warc_date", lit(s"2025-02-0${k + 1}T00:00:00Z"))
            .select(col("url"), col("warc_date"), col("body"),
              col("content_type"))
        }
        // stage each batch as ONE parquet file; the file source triggers
        // them in mtime order, one batch per micro-batch
        val inDir = new java.io.File(p, "in"); inDir.mkdirs()
        (0 until 2).foreach { k =>
          val tmp = java.nio.file.Files
            .createTempDirectory("graft_c11_stage").toFile
          batchOf(k).coalesce(1)
            .write.mode("overwrite").parquet(tmp.getAbsolutePath)
          val part = tmp.listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dst = new java.io.File(inDir, s"b$k.parquet")
          java.nio.file.Files.copy(part.toPath, dst.toPath)
          dst.setLastModified(1000000L * (k + 1))
        }
        val st = State(s"$p/state")
        val stream = s.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "url STRING, warc_date STRING, body BINARY, content_type STRING"))
          .option("maxFilesPerTrigger", 1)
          .parquet(inDir.getAbsolutePath)
        // the same per-batch eval screen the batch form runs — every
        // trigger's admissions are decontaminated before they grow
        // anything stored
        val evalRef = docs.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"), col("text"))
          .localCheckpoint(true)
        val q = stream.writeStream.foreachBatch {
          (df: DataFrame, _: Long) =>
            step(df, st, CorpusPipeline.Opts(lineGate = false),
              evalRef = Some(evalRef), ixBuckets = 8)
            ()
        }.start()
        try q.processAllAvailable() finally q.stop()
      }
      StoreGuard.table(s, s"$root/state", "manifest.parquet",
          "batch_ord", "stage_idx", "stage", "rows")
        .select(col("batch_ord"), col("stage_idx"), col("stage"),
          col("rows"))
        .orderBy(col("batch_ord"), col("stage_idx"))
    }, None),

    // TAKEDOWN, registered: the right-to-be-forgotten pass under the
    // driver's rows gate. A three-batch plants-only loop (fixed
    // fixtures, sf-independent): batch 0 admits two unique pages and
    // two unique WAVs; batch 1 re-posts all four (whitespace-variant
    // text, gain-scaled audio — novel bytes everywhere) and every
    // re-post dies on the grown indexes; then forget() purges ONE page
    // and ONE wav across all stored artifacts (dedup index, audio
    // fingerprints, corpus, CDX — physical vacuum, no tombstone
    // masking); batch 2 re-posts all four again — the forgotten pair is
    // RE-ADMITTED (kept), the control pair still dies. The served frame
    // is the loop's manifest plus before/after/re-admit artifact row
    // counts (parquet footers). Not SQL-expressible (stored-index
    // lifecycle); CrawlLoopSpec asserts the batch-2 verdicts and the
    // physical count deltas on this exact query. Runs once per dataset
    // (the c11 IxScratch discipline) — re-serves the ledger after.
    ("c12_crawl_takedown", (s: SparkSession, d: String) => {
      import s.implicits._
      val root = IxScratch.cached(
          "crawlloop-takedown:" + IxScratch.fingerprint(d),
          "graft_loop_takedown") { p =>
        val st = State(s"$p/state")
        val opts = CorpusPipeline.Opts(lineGate = false)
        def mixv(z0: Long): Long = {
          var z = z0 + 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^ (z >>> 31)
        }
        def pageRow(url: String, text: String): (String, Array[Byte], String) =
          (url, s"<html><body><p>$text</p></body></html>".getBytes("UTF-8"),
            "text/html; charset=utf-8")
        def wavRow(url: String, seed: Long,
            gain: Int): (String, Array[Byte], String) =
          (url, graft.kernel.Wav.encode(graft.kernel.Wav.Audio(8000, 1, 16,
            Array.tabulate(200)(i =>
              ((mixv(seed * 1000L + i) % 100L).toInt - 50) * gain))),
            "audio/wav")
        def fetches(rows: Seq[(String, Array[Byte], String)],
            date: String): DataFrame =
          rows.toDF("url", "body", "content_type")
            .withColumn("warc_date", lit(date))
            .select(col("url"), col("warc_date"), col("body"),
              col("content_type"))
        val textF = "zq alpha reactor manual describes the cooling " +
          "assembly in exhaustive detail across eleven numbered sections"
        val textC = "willow orchard almanac records seasonal pruning " +
          "grafting and harvest schedules for heritage apple cultivars"
        val urlF = "https://h0.example.com/take/f"
        val urlC = "https://h0.example.com/keep/c"
        val urlWavF = "https://h1.example.com/take/f.wav"
        val urlWavC = "https://h1.example.com/keep/c.wav"
        step(fetches(Seq(
            pageRow(urlF, textF), pageRow(urlC, textC),
            wavRow(urlWavF, 101L, 1), wavRow(urlWavC, 202L, 1)),
          "2025-03-01T00:00:00Z"), st, opts, ixBuckets = 8)
        step(fetches(Seq(
            pageRow("https://h2.example.com/copy1/f", textF + "  "),
            pageRow("https://h2.example.com/copy1/c", textC + "  "),
            wavRow("https://h3.example.com/re1/f.wav", 101L, 2),
            wavRow("https://h3.example.com/re1/c.wav", 202L, 2)),
          "2025-03-02T00:00:00Z"), st, opts, ixBuckets = 8)
        def snap(phase: String): Seq[(String, String, Long)] = Seq(
          (phase, "ix_dedup_docs", footerRows(s"${st.dedupDir}/exact.parquet")),
          (phase, "ix_audio_hash_sigs",
            footerRows(s"${st.audioHashDir}/hashes.parquet")),
          (phase, "corpus_docs", footerRows(st.corpusDir)),
          (phase, "cdx_rows", footerRows(st.cdxDir)))
        val pre = snap("pre_forget")
        forget(Seq(urlF, urlWavF).toDF("url")
          .select(xxhash64(Curate.canonicalUrl(col("url"))).as("doc_id")), st)
        val post = snap("post_forget")
        step(fetches(Seq(
            pageRow("https://h4.example.com/copy2/f", textF + "   "),
            pageRow("https://h4.example.com/copy2/c", textC + "   "),
            wavRow("https://h0.example.com/re2/f.wav", 101L, 4),
            wavRow("https://h0.example.com/re2/c.wav", 202L, 4)),
          "2025-03-03T00:00:00Z"), st, opts, ixBuckets = 8)
        val fin = snap("post_readmit")
        (pre ++ post ++ fin).zipWithIndex
          .map { case ((ph, stage, n), i) => (ph, i, stage, n) }
          .toDF("phase", "stage_idx", "stage", "rows")
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$p/takedown.parquet")
      }
      val manifest = StoreGuard.table(s, s"$root/state", "manifest.parquet",
          "batch_ord", "stage_idx", "stage", "rows")
        .select(lit("loop").as("phase"), col("batch_ord"),
          col("stage_idx"), col("stage"), col("rows"))
      val takedown = StoreGuard.table(s, root, "takedown.parquet",
          "phase", "stage_idx", "stage", "rows")
        .select(col("phase"), lit(-1L).as("batch_ord"),
          col("stage_idx").cast("int").as("stage_idx"), col("stage"),
          col("rows"))
      manifest.unionByName(takedown)
        .orderBy(col("phase"), col("batch_ord"), col("stage_idx"))
    }, None),

    // The FULL LOOP under the oracle — the composition twin c13/c14
    // built toward: TWO real CrawlLoop.step batches (archive → revisit
    // screen → CDX admission → curation → incremental dedup against
    // the GROWN index → index/corpus maintenance) under Opts.md5Family,
    // with the complete two-batch run MANIFEST hash-gated. Batch 0
    // seeds with the odd documents; batch 1 brings the even documents
    // with planted cross-batch events by congruence precedence
    // (10 → 14 → 22 → 6 → real): exact re-fetches of batch-0 urls
    // (revisit records + cdx url_dup), mirrors of batch-0 bodies on
    // new urls (content_dup), one-token edits of batch-0 docs
    // (near_corpus via the grown md5 dedup index), and whitespace
    // variants (novel digest, exact_corpus at dedup). The oracle
    // replays EVERY manifest row: record/page/verdict counts off the
    // url+body key joins, both batches' full curation chains (the c14
    // SQL), the d16-style dedupAgainst with the stored-bucket probe,
    // and the maintenance ledger (corpus totals and the decontam gram
    // census; media families are absent so their index rows pin 0).
    // `segments` is the one literal: archiveWithRevisits shards by
    // MurmurHash3(url) mod 16, and with hundreds of urls per batch at
    // every driver SF all 16 shards are occupied — a regeneration
    // small enough to empty a shard flags red loudly, never silently
    // passes. c08/c11/c12 stay the live fnv-family anchors.
    ("c15_crawl_loop_md5", (s: SparkSession, d: String) => {
      val root = IxScratch.cached(
          "crawlloop-md5:" + IxScratch.fingerprint(d),
          "graft_loop_md5") { p =>
        md5FamilyLoop(s, d, s"$p/state")
      }
      StoreGuard.table(s, s"$root/state", "manifest.parquet",
          "batch_ord", "stage_idx", "stage", "rows")
        .select(col("batch_ord"), col("stage_idx"), col("stage"),
          col("rows"))
        .orderBy(col("batch_ord"), col("stage_idx"))
    },
    Some("""WITH RECURSIVE
  docs AS MATERIALIZED (SELECT doc_id, text FROM documents),
  b0f AS MATERIALIZED (
    SELECT doc_id,
      'https://example.com/doc/' || doc_id AS url,
      '<html><body><p>' || text || '</p></body></html>' AS body
    FROM docs WHERE doc_id % 2 = 1),
  tgt AS (SELECT doc_id AS tid, text AS ttext FROM docs),
  b1p AS (
    SELECT d.doc_id, d.text,
      CASE WHEN d.doc_id % 10 = 0 THEN d.doc_id - 1
           WHEN d.doc_id % 14 = 0 THEN d.doc_id - 7
           WHEN d.doc_id % 22 = 0 THEN d.doc_id - 11
           WHEN d.doc_id % 6 = 0 THEN d.doc_id - 3 END AS tid
    FROM docs d WHERE d.doc_id % 2 = 0),
  b1f AS MATERIALIZED (
    SELECT p.doc_id,
      CASE WHEN p.doc_id % 10 = 0 THEN 'https://example.com/doc/' || p.tid
           WHEN p.doc_id % 14 = 0 THEN 'https://example.com/copy/' || p.doc_id
           ELSE 'https://example.com/doc/' || p.doc_id END AS url,
      '<html><body><p>' ||
        CASE WHEN p.doc_id % 10 = 0 THEN coalesce(t.ttext, p.text)
             WHEN p.doc_id % 14 = 0 THEN coalesce(t.ttext, p.text)
             WHEN p.doc_id % 22 = 0 THEN 'edited' || p.doc_id || ' ' ||
               coalesce(t.ttext, p.text)
             WHEN p.doc_id % 6 = 0 THEN coalesce(t.ttext, p.text) || '  '
             ELSE p.text END ||
        '</p></body></html>' AS body
    FROM b1p p LEFT JOIN tgt t ON t.tid = p.tid),
  b0urls AS MATERIALIZED (SELECT DISTINCT url FROM b0f),
  b0bodies AS MATERIALIZED (SELECT DISTINCT body FROM b0f),
  v1 AS MATERIALIZED (
    SELECT f.doc_id, f.url, f.body,
      CASE WHEN u.url IS NOT NULL THEN 'url_dup'
           WHEN b.body IS NOT NULL THEN 'content_dup'
           ELSE 'novel' END AS verdict,
      (b.body IS NOT NULL) AS revisit
    FROM b1f f
    LEFT JOIN b0urls u ON u.url = f.url
    LEFT JOIN b0bodies b ON b.body = f.body),
  b1adm AS MATERIALIZED (
    SELECT url, body FROM v1 WHERE verdict = 'novel'),

  b0_strip AS (
    SELECT url,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(body,
          '(?is)<script[^>]*>.*?</script>', '', 'g'),
          '(?is)<style[^>]*>.*?</style>', '', 'g'),
          '(?s)<!--.*?-->', '', 'g'),
          '(?i)</?(?:p|div|br|h[1-6]|li|tr|table|ul|ol)[^>]*>',
            chr(10), 'g'),
          '<[^>]*>', '', 'g') AS t
    FROM b0f),
  b0_dec AS (
    SELECT url,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(t,
          '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
          '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t
    FROM b0_strip),
  b0_src AS MATERIALIZED (
    SELECT CAST(concat('0x', substr(md5(url), 1, 15)) AS BIGINT) AS doc_id,
      trim(regexp_replace(regexp_replace(regexp_replace(t,
        '[ \t]+', ' ', 'g'),
        '\s*\n\s*', chr(10), 'g'),
        '^\n|\n$', '', 'g')) AS text
    FROM b0_dec),
  b0_gate AS MATERIALIZED (
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')
        AS text
    FROM b0_src),
  b0_kept AS MATERIALIZED (
    SELECT doc_id, text FROM b0_gate
    WHERE len(string_split_regex(trim(text), '\s+')) >= 5),
  b0_ex AS MATERIALIZED (
    SELECT doc_id, text FROM (
      SELECT doc_id, text, row_number() OVER (
        PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        ORDER BY doc_id) AS rn
      FROM b0_kept) z WHERE rn = 1),
  b0_sh AS MATERIALIZED (
    SELECT doc_id, text,
      CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
           THEN list_distinct(list_transform(
             range(0, len(string_split_regex(trim(text), '\s+')) - 2),
             i -> concat_ws(' ',
               string_split_regex(trim(text), '\s+')[i+1],
               string_split_regex(trim(text), '\s+')[i+2],
               string_split_regex(trim(text), '\s+')[i+3])))
           ELSE [text] END AS sh
    FROM b0_ex),
  b0_g3 AS (SELECT doc_id, unnest(sh) AS g FROM b0_sh),
  b0_sig AS MATERIALIZED (
    SELECT doc_id, i.range AS i,
      min(CAST(concat('0x', substr(
        md5(concat(CAST(i.range AS VARCHAR), ':', g)), 1, 15))
        AS BIGINT)) AS s
    FROM b0_g3 CROSS JOIN range(12) i
    GROUP BY doc_id, i.range),
  b0_band AS MATERIALIZED (
    SELECT doc_id, CAST(i // 3 AS INTEGER) AS band,
      md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY i)) AS key
    FROM b0_sig GROUP BY doc_id, i // 3),
  b0_hot AS (
    SELECT band, key FROM b0_band GROUP BY band, key
    HAVING count(*) > 100),
  b0_cap AS MATERIALIZED (
    SELECT b.* FROM b0_band b
    LEFT JOIN b0_hot h ON b.band = h.band AND b.key = h.key
    WHERE h.band IS NULL),
  b0_prs AS (
    SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
    FROM b0_cap x JOIN b0_cap y
      ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
  b0_ver AS MATERIALIZED (
    SELECT u, v FROM b0_prs pp
    JOIN b0_sh a ON a.doc_id = pp.u
    JOIN b0_sh b ON b.doc_id = pp.v
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.5),
  b0_edge AS (
    SELECT u, v FROM b0_ver UNION SELECT v AS u, u AS v FROM b0_ver),
  b0_node AS (SELECT DISTINCT u AS node FROM b0_edge),
  b0_reach(u, v) AS (
    SELECT node AS u, node AS v FROM b0_node
    UNION
    SELECT r.u, e.v FROM b0_reach r JOIN b0_edge e ON r.v = e.u),
  b0_comp AS (
    SELECT u AS doc_id, min(v) AS component FROM b0_reach GROUP BY u),
  b0_plan AS MATERIALIZED (
    SELECT c.doc_id,
      first_value(c.doc_id) OVER (PARTITION BY c.component
        ORDER BY length(e.text) DESC, c.doc_id ASC) AS canonical_id
    FROM b0_comp c JOIN b0_ex e ON e.doc_id = c.doc_id),
  b0_nd AS MATERIALIZED (
    SELECT e.doc_id, e.text FROM b0_ex e
    WHERE NOT EXISTS (SELECT 1 FROM b0_plan pl
      WHERE pl.doc_id = e.doc_id AND pl.doc_id <> pl.canonical_id)),
  b0_tok AS MATERIALIZED (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
    FROM b0_nd),
  b0_g8 AS MATERIALIZED (
    SELECT doc_id, CAST(r.i AS INTEGER) AS pos,
      array_to_string(tk[r.i+1 : r.i+8], ' ') AS gram
    FROM b0_tok, unnest(range(0, greatest(len(tk) - 7, 0))) AS r(i)),
  b0_dupg AS (SELECT gram FROM b0_g8 GROUP BY gram HAVING count(*) >= 2),
  b0_dpos AS (
    SELECT doc_id, pos, pos + 7 AS e FROM b0_g8
    WHERE gram IN (SELECT gram FROM b0_dupg)),
  b0_runs AS (
    SELECT doc_id, pos, e,
      max(e) OVER (PARTITION BY doc_id ORDER BY pos
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_end
    FROM b0_dpos),
  b0_mark AS (
    SELECT doc_id, pos, e,
      lag(run_end) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_end
    FROM b0_runs),
  b0_flag AS (
    SELECT doc_id, pos, e,
      sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
               THEN 1 ELSE 0 END)
        OVER (PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
    FROM b0_mark),
  b0_sp AS MATERIALIZED (
    SELECT doc_id, span_id, min(pos) AS s, max(e) AS e
    FROM b0_flag GROUP BY doc_id, span_id),
  b0_tkn AS (
    SELECT doc_id, CAST(r.i - 1 AS INTEGER) AS pos, tk[r.i] AS tok
    FROM b0_tok, unnest(range(1, len(tk) + 1)) AS r(i)),
  b0_keep AS MATERIALIZED (
    SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS text
    FROM b0_tkn t
    WHERE NOT EXISTS (SELECT 1 FROM b0_sp sp
      WHERE sp.doc_id = t.doc_id AND t.pos BETWEEN sp.s AND sp.e)
    GROUP BY t.doc_id),
  b0_ss AS MATERIALIZED (
    SELECT doc_id, text FROM b0_keep
    WHERE len(string_split_regex(trim(text), '\s+')) >= 5),

  b1_strip AS (
    SELECT url,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(body,
          '(?is)<script[^>]*>.*?</script>', '', 'g'),
          '(?is)<style[^>]*>.*?</style>', '', 'g'),
          '(?s)<!--.*?-->', '', 'g'),
          '(?i)</?(?:p|div|br|h[1-6]|li|tr|table|ul|ol)[^>]*>',
            chr(10), 'g'),
          '<[^>]*>', '', 'g') AS t
    FROM b1adm),
  b1_dec AS (
    SELECT url,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(t,
          '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
          '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t
    FROM b1_strip),
  b1_src AS MATERIALIZED (
    SELECT CAST(concat('0x', substr(md5(url), 1, 15)) AS BIGINT) AS doc_id,
      trim(regexp_replace(regexp_replace(regexp_replace(t,
        '[ \t]+', ' ', 'g'),
        '\s*\n\s*', chr(10), 'g'),
        '^\n|\n$', '', 'g')) AS text
    FROM b1_dec),
  b1_gate AS MATERIALIZED (
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g')
        AS text
    FROM b1_src),
  b1_kept AS MATERIALIZED (
    SELECT doc_id, text FROM b1_gate
    WHERE len(string_split_regex(trim(text), '\s+')) >= 5),
  b1_ex AS MATERIALIZED (
    SELECT doc_id, text FROM (
      SELECT doc_id, text, row_number() OVER (
        PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        ORDER BY doc_id) AS rn
      FROM b1_kept) z WHERE rn = 1),
  b1_sh AS MATERIALIZED (
    SELECT doc_id, text,
      CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
           THEN list_distinct(list_transform(
             range(0, len(string_split_regex(trim(text), '\s+')) - 2),
             i -> concat_ws(' ',
               string_split_regex(trim(text), '\s+')[i+1],
               string_split_regex(trim(text), '\s+')[i+2],
               string_split_regex(trim(text), '\s+')[i+3])))
           ELSE [text] END AS sh
    FROM b1_ex),
  b1_g3 AS (SELECT doc_id, unnest(sh) AS g FROM b1_sh),
  b1_sig AS MATERIALIZED (
    SELECT doc_id, i.range AS i,
      min(CAST(concat('0x', substr(
        md5(concat(CAST(i.range AS VARCHAR), ':', g)), 1, 15))
        AS BIGINT)) AS s
    FROM b1_g3 CROSS JOIN range(12) i
    GROUP BY doc_id, i.range),
  b1_band AS MATERIALIZED (
    SELECT doc_id, CAST(i // 3 AS INTEGER) AS band,
      md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY i)) AS key
    FROM b1_sig GROUP BY doc_id, i // 3),
  b1_hot AS (
    SELECT band, key FROM b1_band GROUP BY band, key
    HAVING count(*) > 100),
  b1_cap AS MATERIALIZED (
    SELECT b.* FROM b1_band b
    LEFT JOIN b1_hot h ON b.band = h.band AND b.key = h.key
    WHERE h.band IS NULL),
  b1_prs AS (
    SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
    FROM b1_cap x JOIN b1_cap y
      ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
  b1_ver AS MATERIALIZED (
    SELECT u, v FROM b1_prs pp
    JOIN b1_sh a ON a.doc_id = pp.u
    JOIN b1_sh b ON b.doc_id = pp.v
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        >= 0.5),
  b1_edge AS (
    SELECT u, v FROM b1_ver UNION SELECT v AS u, u AS v FROM b1_ver),
  b1_node AS (SELECT DISTINCT u AS node FROM b1_edge),
  b1_reach(u, v) AS (
    SELECT node AS u, node AS v FROM b1_node
    UNION
    SELECT r.u, e.v FROM b1_reach r JOIN b1_edge e ON r.v = e.u),
  b1_comp AS (
    SELECT u AS doc_id, min(v) AS component FROM b1_reach GROUP BY u),
  b1_plan AS MATERIALIZED (
    SELECT c.doc_id,
      first_value(c.doc_id) OVER (PARTITION BY c.component
        ORDER BY length(e.text) DESC, c.doc_id ASC) AS canonical_id
    FROM b1_comp c JOIN b1_ex e ON e.doc_id = c.doc_id),
  b1_nd AS MATERIALIZED (
    SELECT e.doc_id, e.text FROM b1_ex e
    WHERE NOT EXISTS (SELECT 1 FROM b1_plan pl
      WHERE pl.doc_id = e.doc_id AND pl.doc_id <> pl.canonical_id)),
  b1_tok AS MATERIALIZED (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
    FROM b1_nd),
  b1_g8 AS MATERIALIZED (
    SELECT doc_id, CAST(r.i AS INTEGER) AS pos,
      array_to_string(tk[r.i+1 : r.i+8], ' ') AS gram
    FROM b1_tok, unnest(range(0, greatest(len(tk) - 7, 0))) AS r(i)),
  b1_dupg AS (SELECT gram FROM b1_g8 GROUP BY gram HAVING count(*) >= 2),
  b1_dpos AS (
    SELECT doc_id, pos, pos + 7 AS e FROM b1_g8
    WHERE gram IN (SELECT gram FROM b1_dupg)),
  b1_runs AS (
    SELECT doc_id, pos, e,
      max(e) OVER (PARTITION BY doc_id ORDER BY pos
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_end
    FROM b1_dpos),
  b1_mark AS (
    SELECT doc_id, pos, e,
      lag(run_end) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_end
    FROM b1_runs),
  b1_flag AS (
    SELECT doc_id, pos, e,
      sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
               THEN 1 ELSE 0 END)
        OVER (PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
    FROM b1_mark),
  b1_sp AS MATERIALIZED (
    SELECT doc_id, span_id, min(pos) AS s, max(e) AS e
    FROM b1_flag GROUP BY doc_id, span_id),
  b1_tkn AS (
    SELECT doc_id, CAST(r.i - 1 AS INTEGER) AS pos, tk[r.i] AS tok
    FROM b1_tok, unnest(range(1, len(tk) + 1)) AS r(i)),
  b1_keep AS MATERIALIZED (
    SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS text
    FROM b1_tkn t
    WHERE NOT EXISTS (SELECT 1 FROM b1_sp sp
      WHERE sp.doc_id = t.doc_id AND t.pos BETWEEN sp.s AND sp.e)
    GROUP BY t.doc_id),
  b1_ss AS MATERIALIZED (
    SELECT doc_id, text FROM b1_keep
    WHERE len(string_split_regex(trim(text), '\s+')) >= 5),
  da_corpus AS MATERIALIZED (SELECT doc_id, text FROM b0_ss),
  da_cmin AS (
    SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS doc_md5,
      min(doc_id) AS c_min
    FROM da_corpus GROUP BY 1),
  da_bmd5 AS (
    SELECT doc_id,
      md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS doc_md5
    FROM b1_ss),
  da_bmin AS (SELECT doc_md5, min(doc_id) AS b_min FROM da_bmd5 GROUP BY 1),
  da_exact AS MATERIALIZED (
    SELECT b.doc_id,
      CASE WHEN c.c_min IS NOT NULL THEN 'exact_corpus'
           WHEN b.doc_id <> m.b_min THEN 'exact_batch' END AS status
    FROM da_bmd5 b
    JOIN da_bmin m ON b.doc_md5 = m.doc_md5
    LEFT JOIN da_cmin c ON b.doc_md5 = c.doc_md5),
  da_surv AS (SELECT doc_id FROM da_exact WHERE status IS NULL),
  da_text AS MATERIALIZED (
    SELECT doc_id, text FROM da_corpus
    UNION ALL
    SELECT b.doc_id, b.text FROM b1_ss b
    JOIN da_surv s ON b.doc_id = s.doc_id),
  da_sh AS MATERIALIZED (
    SELECT doc_id,
      CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
           THEN list_distinct(list_transform(
             range(0, len(string_split_regex(trim(text), '\s+')) - 2),
             i -> concat_ws(' ',
               string_split_regex(trim(text), '\s+')[i+1],
               string_split_regex(trim(text), '\s+')[i+2],
               string_split_regex(trim(text), '\s+')[i+3])))
           ELSE [text] END AS sh
    FROM da_text),
  da_g AS (SELECT doc_id, unnest(sh) AS g FROM da_sh),
  da_sig AS MATERIALIZED (
    SELECT doc_id, i.range AS i,
      min(CAST(concat('0x', substr(
        md5(concat(CAST(i.range AS VARCHAR), ':', g)), 1, 15))
        AS BIGINT)) AS s
    FROM da_g CROSS JOIN range(12) i
    GROUP BY doc_id, i.range),
  da_band AS MATERIALIZED (
    SELECT doc_id, CAST(i // 3 AS INTEGER) AS band,
      md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY i)) AS key
    FROM da_sig GROUP BY doc_id, i // 3),
  da_cband AS (
    SELECT b.* FROM da_band b JOIN da_corpus c ON b.doc_id = c.doc_id),
  da_bband AS (
    SELECT b.* FROM da_band b JOIN da_surv s ON b.doc_id = s.doc_id),
  da_cross AS (
    SELECT DISTINCT bb.doc_id, cb.doc_id AS c_id
    FROM da_bband bb JOIN da_cband cb
      ON bb.band = cb.band AND bb.key = cb.key),
  da_cver AS (
    SELECT cc.doc_id, cc.c_id
    FROM da_cross cc
    JOIN da_sh sa ON sa.doc_id = cc.doc_id
    JOIN da_sh sb ON sb.doc_id = cc.c_id
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
      >= 0.5),
  da_clink AS (
    SELECT doc_id, min(c_id) AS direct_of FROM da_cver GROUP BY doc_id),
  da_hot AS (
    SELECT band, key FROM da_bband GROUP BY band, key
    HAVING count(*) > 100),
  da_cap AS (
    SELECT bb.* FROM da_bband bb
    LEFT JOIN da_hot h ON bb.band = h.band AND bb.key = h.key
    WHERE h.band IS NULL),
  da_prs AS (
    SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
    FROM da_cap x JOIN da_cap y
      ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
  da_vprs AS (
    SELECT pp.u, pp.v FROM da_prs pp
    JOIN da_sh sa ON sa.doc_id = pp.u
    JOIN da_sh sb ON sb.doc_id = pp.v
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
      >= 0.5),
  da_edge AS (
    SELECT u, v FROM da_vprs UNION ALL SELECT v AS u, u AS v FROM da_vprs),
  da_reach AS (
    SELECT doc_id AS node, doc_id AS lbl FROM da_surv
    UNION
    SELECT e.v AS node, r.lbl
    FROM da_reach r JOIN da_edge e ON e.u = r.node
    WHERE r.lbl < e.v),
  da_comp AS (
    SELECT node AS doc_id, min(lbl) AS component FROM da_reach GROUP BY node),
  da_plan AS (
    SELECT c.doc_id, c.component,
      first_value(c.doc_id) OVER (PARTITION BY c.component
        ORDER BY length(a.text) DESC, c.doc_id ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS canonical_id
    FROM da_comp c JOIN b1_ss a ON a.doc_id = c.doc_id),
  da_enr AS (
    SELECT p.doc_id, p.canonical_id, cl.direct_of,
      min(cl.direct_of) OVER (PARTITION BY p.component) AS comp_of
    FROM da_plan p LEFT JOIN da_clink cl ON cl.doc_id = p.doc_id),
  da_nearv AS (
    SELECT doc_id,
      CASE WHEN comp_of IS NOT NULL THEN 'near_corpus'
           WHEN doc_id <> canonical_id THEN 'near_batch'
           ELSE 'kept' END AS status
    FROM da_enr),
  da_all AS MATERIALIZED (
    SELECT doc_id, status FROM da_exact WHERE status IS NOT NULL
    UNION ALL SELECT doc_id, status FROM da_nearv),
  b1_fin AS MATERIALIZED (
    SELECT b.doc_id, b.text FROM b1_ss b
    JOIN da_all v ON v.doc_id = b.doc_id AND v.status = 'kept'),
  gr0 AS MATERIALIZED (
    SELECT CAST(sum(CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 8
      THEN len(list_distinct(list_transform(
        range(0, len(string_split_regex(trim(text), '\s+')) - 7),
        i -> array_to_string(
          string_split_regex(trim(text), '\s+')[i+1:i+8], ' '))))
      ELSE 1 END) AS BIGINT) AS n
    FROM b0_ss),
  gr1 AS MATERIALIZED (
    SELECT CAST(sum(CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 8
      THEN len(list_distinct(list_transform(
        range(0, len(string_split_regex(trim(text), '\s+')) - 7),
        i -> array_to_string(
          string_split_regex(trim(text), '\s+')[i+1:i+8], ' '))))
      ELSE 1 END) AS BIGINT) AS n
    FROM b1_fin)
  SELECT CAST(batch_ord AS BIGINT) AS batch_ord,
    CAST(stage_idx AS INTEGER) AS stage_idx, stage,
    CAST("rows" AS BIGINT) AS "rows"
  FROM (VALUES
    (0, 0, 'fetched', (SELECT count(*) FROM b0f)),
    (0, 1, 'segments', 16),
    (0, 2, 'cdx_novel', (SELECT count(*) FROM b0f)),
    (0, 3, 'cdx_url_dup', 0),
    (0, 4, 'cdx_content_dup', 0),
    (0, 5, 'media_images', 0),
    (0, 6, 'media_near_dup', 0),
    (0, 7, 'media_kept', 0),
    (0, 8, 'media_audio', 0),
    (0, 9, 'media_audio_dup', 0),
    (0, 10, 'media_audio_kept', 0),
    (0, 11, 'media_video', 0),
    (0, 12, 'media_video_dup', 0),
    (0, 13, 'media_video_kept', 0),
    (0, 14, 'records', (SELECT count(*) FROM b0f)),
    (0, 15, 'html_pages', (SELECT count(*) FROM b0f)),
    (0, 16, 'http_ok', (SELECT count(*) FROM b0f)),
    (0, 17, 'admitted', (SELECT count(*) FROM b0f)),
    (0, 18, 'url_dedup', (SELECT count(*) FROM b0f)),
    (0, 19, 'extract', (SELECT count(*) FROM b0_src)),
    (0, 20, 'gate_scrub', (SELECT count(*) FROM b0_kept)),
    (0, 21, 'exact_dedup', (SELECT count(*) FROM b0_ex)),
    (0, 22, 'near_dedup', (SELECT count(*) FROM b0_nd)),
    (0, 23, 'substring_dedup', (SELECT count(*) FROM b0_ss)),
    (0, 24, 'corpus_kept', (SELECT count(*) FROM b0_ss)),
    (0, 25, 'corpus_exact_dup', 0),
    (0, 26, 'corpus_near_dup', 0),
    (0, 27, 'corpus_total', (SELECT count(*) FROM b0_ss)),
    (0, 28, 'ix_dedup_docs', (SELECT count(*) FROM b0_ss)),
    (0, 29, 'ix_retrieval_docs', (SELECT count(*) FROM b0_ss)),
    (0, 30, 'ix_decontam_grams', (SELECT n FROM gr0)),
    (0, 31, 'ix_hash_sigs', 0),
    (0, 32, 'ix_audio_hash_sigs', 0),
    (0, 33, 'ix_video_hash_sigs', 0),
    (1, 0, 'fetched', (SELECT count(*) FROM b1f)),
    (1, 1, 'segments', 16),
    (1, 2, 'cdx_novel', (SELECT count(*) FROM v1 WHERE verdict = 'novel')),
    (1, 3, 'cdx_url_dup', (SELECT count(*) FROM v1 WHERE verdict = 'url_dup')),
    (1, 4, 'cdx_content_dup',
      (SELECT count(*) FROM v1 WHERE verdict = 'content_dup')),
    (1, 5, 'media_images', 0),
    (1, 6, 'media_near_dup', 0),
    (1, 7, 'media_kept', 0),
    (1, 8, 'media_audio', 0),
    (1, 9, 'media_audio_dup', 0),
    (1, 10, 'media_audio_kept', 0),
    (1, 11, 'media_video', 0),
    (1, 12, 'media_video_dup', 0),
    (1, 13, 'media_video_kept', 0),
    (1, 14, 'records', (SELECT count(*) FROM b1f)),
    (1, 15, 'html_pages', (SELECT count(*) FROM v1 WHERE NOT revisit)),
    (1, 16, 'http_ok', (SELECT count(*) FROM v1 WHERE NOT revisit)),
    (1, 17, 'admitted', (SELECT count(*) FROM b1adm)),
    (1, 18, 'url_dedup', (SELECT count(*) FROM b1adm)),
    (1, 19, 'extract', (SELECT count(*) FROM b1_src)),
    (1, 20, 'gate_scrub', (SELECT count(*) FROM b1_kept)),
    (1, 21, 'exact_dedup', (SELECT count(*) FROM b1_ex)),
    (1, 22, 'near_dedup', (SELECT count(*) FROM b1_nd)),
    (1, 23, 'substring_dedup', (SELECT count(*) FROM b1_ss)),
    (1, 24, 'corpus_kept', (SELECT count(*) FROM b1_fin)),
    (1, 25, 'corpus_exact_dup',
      (SELECT count(*) FROM da_all WHERE status LIKE 'exact%')),
    (1, 26, 'corpus_near_dup',
      (SELECT count(*) FROM da_all WHERE status LIKE 'near%')),
    (1, 27, 'corpus_total',
      (SELECT (SELECT count(*) FROM b0_ss) + (SELECT count(*) FROM b1_fin))),
    (1, 28, 'ix_dedup_docs',
      (SELECT (SELECT count(*) FROM b0_ss) + (SELECT count(*) FROM b1_fin))),
    (1, 29, 'ix_retrieval_docs',
      (SELECT (SELECT count(*) FROM b0_ss) + (SELECT count(*) FROM b1_fin))),
    (1, 30, 'ix_decontam_grams',
      (SELECT (SELECT n FROM gr0) + (SELECT n FROM gr1))),
    (1, 31, 'ix_hash_sigs', 0),
    (1, 32, 'ix_audio_hash_sigs', 0),
    (1, 33, 'ix_video_hash_sigs', 0))
    AS t(batch_ord, stage_idx, stage, "rows")
  ORDER BY batch_ord, stage_idx"""))
  )
}
