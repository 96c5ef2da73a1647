package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Persistent dedup index — snapshot-over-snapshot deduplication.
  *
  * A curated 100 TB corpus is immutable once published; the next crawl
  * snapshot must dedup AGAINST it without reprocessing it. This is the
  * stored form of the d01+d03+d06 chain: the corpus's exact content
  * hashes and LSH band buckets persist once (KB-per-million-docs scale
  * rows, not text), and each arriving batch pays
  *
  *   - one hash join against the exact table,
  *   - one (band, key) join against the bucket table — the probe only
  *     shuffles the BATCH side's keys; candidate verification then
  *     touches corpus text only for the candidate ids (left-semi prune,
  *     the [[Dedup.minhashNearDups]] discipline),
  *   - the ordinary within-batch dedup on what remains.
  *
  * Unlike [[Dedup.nearDupAdmission]] (Bloom screen, false positives by
  * design), this is the EXACT operator: the same band keys and the same
  * Jaccard-≥-τ verification the full-corpus run uses, so the incremental
  * result provably matches a from-scratch run over corpus ∪ batch
  * restricted to the batch (DedupIndexSpec pins that parity).
  *
  * Cross-linked components drop entirely — corpus docs always win, no
  * matter what a from-scratch canonical rule would prefer, because the
  * corpus side is already published. Pure-batch components resolve by
  * the standard [[Clusters.dedupPlan]] canonical (longest text, then
  * min id).
  *
  * On-disk layout under `dir`:
  *  - `meta.parquet`    — one row: k, b, r (the LSH shape the buckets
  *    were keyed with; probes MUST use the same shape, so `dedupAgainst`
  *    reads it from here rather than trusting the caller)
  *  - `exact.parquet`   — (doc_id, doc_md5) normalized content hashes
  *  - `buckets.parquet/band=N/` — (doc_id, key) LSH band buckets,
  *    partitioned by band: a probe of band i prunes to one directory,
  *    and within a band the join is an ordinary shuffle on `key`
  */
object DedupIndex {

  final case class Loaded(k: Int, b: Int, r: Int, family: String,
      exact: DataFrame, buckets: DataFrame)

  /** The d01 normalization: case-folded, whitespace-collapsed md5. */
  def normMd5(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** The production band-key family: native FNV-1a64 minhash
    * ([[graft.functions.MinHashSig]], row-local codegen) banded by
    * xxhash64 — fast, but neither hash is replayable in an external
    * SQL engine. */
  private def keyedBandsFnv(docs: DataFrame, k: Int, b: Int, r: Int): DataFrame =
    docs
      .withColumn("bands", Dedup.bandKeys(
        Dedup.minhashSignature(split(trim(col("text")), "\\s+"), k), b, r))
      .select(col("doc_id"), explode(col("bands")).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      // key stays the raw xxhash64 LONG: probes only ever join a family
      // against its own stored buckets, so the md5 family's string keys
      // never meet these — and 8-byte keys beat 32-char strings in
      // every shuffle/broadcast this index pays

  /** The ORACLE-expressible band-key family: the same minhash-LSH
    * construction with every hash an md5 derivation both Spark and
    * DuckDB compute bit-identically — hash_i(gram) = the first 15 hex
    * chars of md5("i:gram") as a 60-bit integer, signature_i = min over
    * the doc's word-3-gram shingles, band key = md5 of the
    * comma-joined r-slice. Slower than the native family (k md5 calls
    * per shingle, interpreted HOFs) but exactly replayable, which puts
    * the ENTIRE incremental-dedup verdict chain under a DuckDB oracle
    * (d13); the fnv family stays the production default (d11). */
  private[operators] def keyedBandsMd5(docs: DataFrame, k: Int, b: Int,
      r: Int): DataFrame =
    // the k signature mins come from ONE codegen'd pass over the shingle
    // array ([[graft.functions.Md5MinHashSig]] — bit-identical to the k
    // interpreted `array_min(transform(...))` HOFs this replaced, which
    // re-walked the grams k times outside whole-stage codegen); band
    // keys stay the same md5-of-comma-joined-slice built-ins
    docs.select(col("doc_id"),
        graft.functions.GraftFunctions.md5_minhash_sig(
          Dedup.shingles(col("text")), k).as("sig"))
      .select(col("doc_id"), explode(array((0 until b).map { j =>
        struct(lit(j).as("band"),
          md5(concat_ws(",",
            (0 until r).map(x => element_at(col("sig"), j * r + x + 1)): _*))
            .as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))

  /** Test access ([[graft.functions.Md5MinHashSigSpec]] parity gate). */
  private[graft] def testKeyedBandsMd5(docs: DataFrame, k: Int, b: Int,
      r: Int): DataFrame = keyedBandsMd5(docs, k, b, r)

  private def keyedBands(docs: DataFrame, k: Int, b: Int, r: Int,
      family: String): DataFrame = family match {
    case "fnv" => keyedBandsFnv(docs, k, b, r)
    case "md5" => keyedBandsMd5(docs, k, b, r)
    case other => throw new IllegalArgumentException(
      s"dedup index family '$other' (fnv/md5)")
  }

  /** Persist the corpus's dedup index. One pass over the corpus text;
    * everything written is id/hash-shaped (b+1 rows of a few longs per
    * document). */
  def build(corpus: DataFrame, dir: String,
      k: Int = 12, b: Int = 4, r: Int = 3,
      family: String = "fnv"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((k, b, r, family)).toDF("k", "b", "r", "family")
      .write.mode("overwrite").parquet(s"$dir/meta.parquet")
    corpus.select(col("doc_id"), normMd5(col("text")).as("doc_md5"))
      .write.mode("overwrite").parquet(s"$dir/exact.parquet")
    keyedBands(corpus, k, b, r, family)
      .write.mode("overwrite").partitionBy("band")
      .parquet(s"$dir/buckets.parquet")
  }

  /** Append a deduped batch's SURVIVORS to the stored index — the crawl
    * loop's maintenance step (probe batch i, admit, grow, probe batch
    * i+1). Parquet append of id/hash rows; the corpus is never re-read,
    * and a grown index answers exactly like one rebuilt from
    * corpus ∪ survivors (same rows, set semantics — spec-pinned).
    *
    * Feed it only docs that SURVIVED `dedupAgainst` (status `kept`):
    * appending dropped duplicates would make the index attribute future
    * dups to docs that aren't in the corpus.
    *
    * `survivors` is frozen with an eager `localCheckpoint` before any
    * write. Persist-and-count by the caller is NOT enough when the plan
    * derives from `dedupAgainst` over this same `dir`: the first append
    * fires Spark's path refresh, which cascades cache invalidation
    * through every cached plan reading the index files — the bucket
    * append would then RECOMPUTE survivors against the half-grown index,
    * every doc would self-match as exact_corpus, and the band keys would
    * append empty (silent index corruption: exact rows present, bucket
    * rows missing). A checkpoint is a lineage-free leaf, so the path
    * refresh cannot reach it and both appends see the same frozen rows.
    *
    * Each append adds one-file-per-task; over a long crawl loop that is
    * unbounded small-file accumulation, so grow finishes with a
    * rewrite-when-fragmented pass ([[Scale.compactTable]]): once either
    * table exceeds `compactAbove` data files it is rewritten
    * size-targeted (content identical, layout rebuilt — buckets keep
    * their band partitioning). `compactAbove <= 0` disables. After a
    * compacting grow, previously-loaded index frames hold stale file
    * listings — re-[[load]] per batch, as the crawl loop already does. */
  def grow(survivors: DataFrame, dir: String,
      compactAbove: Int = 64): Unit = {
    val spark = survivors.sparkSession
    // memoized driver-side meta read (StoreGuard) — was one Spark job
    // per grow on the crawl loop's per-batch maintenance path
    val m = StoreGuard.metaRow(spark, dir, "k", "b", "r")
    val (k, b, r) =
      (m.getAs[Int]("k"), m.getAs[Int]("b"), m.getAs[Int]("r"))
    val family = metaFamily(m)
    val frozen = survivors.select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    frozen.select(col("doc_id"), normMd5(col("text")).as("doc_md5"))
      .write.mode("append").parquet(s"$dir/exact.parquet")
    keyedBands(frozen, k, b, r, family)
      .write.mode("append").partitionBy("band")
      .parquet(s"$dir/buckets.parquet")
    if (compactAbove > 0) {
      Scale.compactTable(spark, s"$dir/exact.parquet",
        maxFiles = compactAbove)
      Scale.compactTable(spark, s"$dir/buckets.parquet",
        partitionCols = Seq("band"), maxFiles = compactAbove)
    }
  }

  /** Remove documents from the stored index WITHOUT rewriting it — the
    * takedown step (right-to-be-forgotten, dedup-driven eviction):
    * tombstoned ids land in an append-only table and [[load]] masks
    * them out of BOTH the exact and bucket tables, so a forgotten
    * document stops matching future re-crawls of its own content and
    * its band keys stop attracting near-dup candidates — the exact
    * symmetry of [[AnnIndex.delete]]. Same checkpoint-before-append
    * discipline (ids may derive from a probe of this very index);
    * physical rows leave at [[vacuum]]. */
  def forget(ids: DataFrame, dir: String): Unit =
    ids.select(col("doc_id")).distinct().localCheckpoint(true)
      .write.mode("append").parquet(s"$dir/tombstones.parquet")

  /** Physically drop tombstoned rows from both tables and clear the
    * tombstone table. Survivors are materialized (eager localCheckpoint)
    * before each overwrite — the rewrite reads the files it deletes.
    * Re-[[load]] after (stale listings). */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    tombstones(spark, dir).foreach { t =>
      val exact = spark.read.parquet(s"$dir/exact.parquet")
        .join(broadcast(t), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      exact.write.mode("overwrite").parquet(s"$dir/exact.parquet")
      val buckets = spark.read.parquet(s"$dir/buckets.parquet")
        .join(broadcast(t), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      buckets.repartition(col("band"))
        .write.mode("overwrite").partitionBy("band")
        .parquet(s"$dir/buckets.parquet")
      t.limit(0).write.mode("overwrite")
        .parquet(s"$dir/tombstones.parquet")
    }
  }

  private def tombstones(spark: SparkSession, dir: String): Option[DataFrame] =
    StoreGuard.tombstoneIds(spark, dir) // footer-count emptiness, no job

  /** Load the index; tombstoned ids ([[forget]]) are masked out of both
    * tables here, so every consumer honors takedowns. */
  /** Pre-family indexes wrote no family column; they are all fnv. */
  private def metaFamily(m: org.apache.spark.sql.Row): String =
    if (m.schema.fieldNames.contains("family")) m.getAs[String]("family")
    else "fnv"

  def load(spark: SparkSession, dir: String): Loaded = {
    val m = StoreGuard.metaRow(spark, dir, "k", "b", "r")
    val mask: DataFrame => DataFrame = tombstones(spark, dir) match {
      case Some(t) => df => df.join(broadcast(t), Seq("doc_id"), "left_anti")
      case None => identity
    }
    Loaded(m.getAs[Int]("k"), m.getAs[Int]("b"), m.getAs[Int]("r"),
      metaFamily(m),
      mask(StoreGuard.table(spark, dir, "exact.parquet",
        "doc_id", "doc_md5")),
      mask(StoreGuard.table(spark, dir, "buckets.parquet",
        "doc_id", "band", "key")))
  }

  /** Dedup `batch` against a loaded index (and itself), returning one
    * verdict row per batch document:
    *
    *   (doc_id, status, dup_of) with status ∈
    *     exact_corpus — content-hash match to a corpus doc (min id)
    *     exact_batch  — content-hash match to an earlier batch doc
    *     near_corpus  — in a near-dup component containing a corpus doc
    *                    (directly, or transitively through batch docs)
    *     near_batch   — non-canonical member of a pure-batch component
    *     kept         — survives
    *
    * `corpusText` is the corpus's (doc_id, text) — read lazily and only
    * for candidate ids (the index never stores text). Near-dup semantics
    * are exactly [[Dedup.minhashNearDups]]'s: banded-LSH candidates
    * verified at word-3-gram Jaccard ≥ `tau`.
    *
    * The returned frame is EAGER (computed and persisted before the call
    * returns): materializing the verdicts lets the call release its five
    * intermediate caches immediately, so the crawl loop (probe, grow,
    * probe…) cannot accumulate cached partitions across snapshots.
    * Callers may `unpersist()` the result when done with it.
    *
    * `broadcastKeys` (default true) broadcasts every batch-derived probe
    * frame — md5 set, band keys — so the INDEX side (corpus-sized exact
    * and bucket tables) streams map-side and never shuffles: the right
    * plan when a snapshot ≪ corpus. A backfill-sized batch (10⁹ docs × b
    * band keys) would OOM those broadcasts; set false and the probes
    * become ordinary shuffle joins on `doc_md5` / `(band, key)` instead —
    * the twin of [[Clusters.applyDedup]]'s `broadcastDrop` hatch. */
  def dedupAgainst(batch: DataFrame, corpusText: DataFrame, ix: Loaded,
      tau: Double = 0.5, maxBucket: Int = 100,
      broadcastKeys: Boolean = true): DataFrame = {
    def probe(df: DataFrame): DataFrame =
      if (broadcastKeys) broadcast(df) else df

    val hashed = batch
      .select(col("doc_id"), col("text"), normMd5(col("text")).as("doc_md5"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 1. ONE folded exact pass (was two chained joins + an anti-join):
    // the corpus contributes min matching id per batch md5 (index side
    // streams past the broadcast batch-md5 set), the batch contributes
    // its own min id per md5 via a partial aggregate joined back through
    // `probe` — NOT a window over `hashed`: a window would exchange the
    // full text-bearing batch by doc_md5, where the aggregate shuffles
    // only (md5, id) pairs and the join-back broadcasts under the
    // default — and one projection decides all three exact outcomes:
    // corpus match wins, else earlier batch doc wins, else the doc
    // survives to the near-dup stages (status NULL)
    import org.apache.spark.sql.expressions.Window
    val cMin = probe(hashed.select(col("doc_md5")).distinct())
      .join(ix.exact, "doc_md5")
      .groupBy(col("doc_md5")).agg(min(col("doc_id")).as("c_min"))
    val bMin = hashed.groupBy(col("doc_md5"))
      .agg(min(col("doc_id")).as("b_min"))
    val exact = hashed
      .join(probe(bMin), "doc_md5")
      .join(probe(cMin), Seq("doc_md5"), "left_outer")
      .select(col("doc_id"), col("text"),
        when(col("c_min").isNotNull, lit("exact_corpus"))
          .when(col("doc_id") =!= col("b_min"), lit("exact_batch"))
          .as("status"),
        when(col("c_min").isNotNull, col("c_min"))
          .when(col("doc_id") =!= col("b_min"), col("b_min")).as("dup_of"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val exSurv = exact.filter(col("status").isNull)
      .select(col("doc_id"), col("text"))

    // 2. cross near-dup candidates: batch band keys probed against the
    // stored buckets; only then do shingle arrays exist, and only for
    // candidate ids on both sides. The keyed frame persists because the
    // within-batch self-join (stage 3) reuses it — one signature pass
    // over the batch, two consumers.
    val keyed = keyedBands(exSurv, ix.k, ix.b, ix.r, ix.family)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val crossCand = probe(keyed)
      .join(ix.buckets.select(col("band"), col("key"), col("doc_id").as("c_id")),
        Seq("band", "key"))
      .select(col("doc_id"), col("c_id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bSh = exSurv
      .join(crossCand.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh_b"))
    val cSh = corpusText
      .join(crossCand.select(col("c_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("c_id"), Dedup.shingles(col("text")).as("sh_c"))
    val crossLinks = crossCand
      .join(bSh, "doc_id").join(cSh, "c_id")
      .withColumn("inter",
        size(array_intersect(col("sh_b"), col("sh_c"))).cast("double"))
      .filter(col("inter") / (size(col("sh_b")) + size(col("sh_c")) - col("inter")) >= tau)
      .groupBy(col("doc_id")).agg(min(col("c_id")).as("direct_of"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 3. within-batch near-dup pairs + components. A component is
    // "infected" when any member links to the corpus; infected
    // components drop whole (transitive closure over batch edges — the
    // from-scratch run would merge them into the corpus doc's component).
    // The pairs come from the SAME cached keyed frame the probe used.
    val pairs = Dedup.minhashNearDupsKeyed(exSurv, keyed, tau, maxBucket)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val labeled = Clusters.labelAll(
      exSurv.select(col("doc_id").as("node")), pairs)
    val plan = Clusters.dedupPlan(labeled, exSurv)
    // component infection folded into the plan's own partitioning: join
    // each member's direct corpus link once (through `probe`, so the
    // hatch governs whether the link set broadcasts), then min it per
    // component as a WINDOW — when the join broadcasts, dedupPlan's
    // component partitioning survives it and the window adds no
    // exchange; under the shuffle hatch the window re-exchanges id-sized
    // rows, still cheaper than the former groupBy(component) aggregate
    // joined back (which re-derived the per-component pass twice)
    val enriched = plan
      .join(probe(crossLinks), Seq("doc_id"), "left_outer")
      .withColumn("comp_of",
        min(col("direct_of")).over(Window.partitionBy(col("component"))))

    val nearVerdicts = enriched
      .select(col("doc_id"),
        when(col("comp_of").isNotNull, lit("near_corpus"))
          .when(!col("keep"), lit("near_batch"))
          .otherwise(lit("kept")).as("status"),
        when(col("comp_of").isNotNull, coalesce(col("direct_of"), col("comp_of")))
          .when(!col("keep"), col("canonical_id")).as("dup_of"))

    // Materialize the verdicts as an eager LINEAGE-FREE checkpoint, then
    // drop every intermediate cache: in the documented crawl loop (probe
    // batch i, grow, probe batch i+1) a long-lived session would
    // otherwise accumulate persisted partitions across calls until an
    // external clearCache. A plain persist would not survive the loop
    // either — `grow`'s appends refresh the index paths and that
    // invalidation cascades through any cached plan reading them, which
    // would silently recompute these verdicts against the grown index.
    // The checkpoint is a leaf (verdict-sized — one id/status row per
    // batch doc); callers may unpersist it when done.
    val verdicts = exact.filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"), col("dup_of"))
      .unionByName(nearVerdicts)
      .localCheckpoint(true) // eager: the cleanup below must not starve the plan
    Seq(hashed, exact, keyed, crossCand, crossLinks)
      .foreach(_.unpersist(false))
    verdicts
  }

  type Q = (SparkSession, String) => DataFrame

  // the production lifecycle is build-once / probe-per-snapshot, so the
  // registered query memoizes the built index per corpus dir: the first
  // call pays the one-time build, every later call measures what the
  // operator exists for — deduping a new batch WITHOUT reprocessing the
  // corpus
  val defs: Seq[(String, Q, Option[String])] = Seq(
    // Incremental dedup: every 5th document arrives as the "new
    // snapshot" and dedups against an index of the other 80% — planted
    // near-dup pairs straddle the split, so cross-snapshot duplicate
    // statuses occur organically. Rows-only (banded LSH is not
    // SQL-expressible); the restricted-to-batch parity with a
    // from-scratch corpus∪batch run, plus every status's witness, is
    // spec-gated in DedupIndexSpec.
    ("d11_incremental_dedup", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val dir = IxScratch.cached("d11:" + IxScratch.fingerprint(d),
          "graft_d11_ix") { p =>
        build(corpus, p)
      }
      dedupAgainst(batch, corpus, load(s, dir))
        .orderBy(col("doc_id"))
    }, None),

    // d11's ORACLE TWIN: the IDENTICAL dedupAgainst code path — exact
    // legs, stored-bucket probe, Jaccard verification, component
    // infection, canonical resolution — under the md5 hash family
    // (build(family = "md5")), whose minhash signatures and band keys
    // DuckDB computes bit-identically. This puts the ENTIRE
    // incremental-dedup verdict chain (including LSH banding, the
    // bucket cap, and the transitive component closure as a recursive
    // CTE) under a full oracle; d11 keeps the faster native FNV+xxhash
    // family, whose per-byte stream hashes are not reasonably
    // replayable in SQL — that family difference is the ONLY thing the
    // oracle does not pin, and DedupIndexSpec's from-scratch parity
    // covers d11 itself.
    ("d13_incremental_dedup_md5", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val dir = IxScratch.cached("d13:" + IxScratch.fingerprint(d),
          "graft_d13_ix") { p =>
        build(corpus, p, family = "md5")
      }
      dedupAgainst(batch, corpus, load(s, dir))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE
      alldocs AS (SELECT doc_id, text FROM documents),
      cmin AS (
        SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS doc_md5,
          min(doc_id) AS c_min
        FROM alldocs WHERE doc_id % 5 <> 0 GROUP BY 1),
      bmd5 AS (
        SELECT doc_id,
          md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS doc_md5
        FROM alldocs WHERE doc_id % 5 = 0),
      bmin AS (SELECT doc_md5, min(doc_id) AS b_min FROM bmd5 GROUP BY 1),
      exact AS (
        SELECT b.doc_id,
          CASE WHEN c.c_min IS NOT NULL THEN 'exact_corpus'
               WHEN b.doc_id <> m.b_min THEN 'exact_batch' END AS status,
          CASE WHEN c.c_min IS NOT NULL THEN c.c_min
               WHEN b.doc_id <> m.b_min THEN m.b_min END AS dup_of
        FROM bmd5 b
        JOIN bmin m ON b.doc_md5 = m.doc_md5
        LEFT JOIN cmin c ON b.doc_md5 = c.doc_md5),
      surv AS (SELECT doc_id FROM exact WHERE status IS NULL),
      sh AS (
        SELECT doc_id,
          CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
               THEN list_distinct(list_transform(
                 range(0, len(string_split_regex(trim(text), '\s+')) - 2),
                 i -> concat_ws(' ',
                   string_split_regex(trim(text), '\s+')[i+1],
                   string_split_regex(trim(text), '\s+')[i+2],
                   string_split_regex(trim(text), '\s+')[i+3])))
               ELSE [text] END AS sh
        FROM alldocs
        WHERE doc_id % 5 <> 0 OR doc_id IN (SELECT doc_id FROM surv)),
      grams AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      sig AS (
        SELECT doc_id, i.range AS i,
          min(CAST(concat('0x', substr(
            md5(concat(CAST(i.range AS VARCHAR), ':', g)), 1, 15))
            AS BIGINT)) AS s
        FROM grams CROSS JOIN range(12) i
        GROUP BY doc_id, i.range),
      bands AS (
        SELECT doc_id, CAST(i // 3 AS INTEGER) AS band,
          md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY i)) AS key
        FROM sig GROUP BY doc_id, i // 3),
      cband AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
      bband AS (
        SELECT b.* FROM bands b JOIN surv s ON b.doc_id = s.doc_id),
      crosscand AS (
        SELECT DISTINCT bb.doc_id, cb.doc_id AS c_id
        FROM bband bb JOIN cband cb
          ON bb.band = cb.band AND bb.key = cb.key),
      crossver AS (
        SELECT cc.doc_id, cc.c_id
        FROM crosscand cc
        JOIN sh sa ON sa.doc_id = cc.doc_id
        JOIN sh sb ON sb.doc_id = cc.c_id
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          >= 0.5),
      crosslink AS (
        SELECT doc_id, min(c_id) AS direct_of FROM crossver GROUP BY doc_id),
      hot AS (
        SELECT band, key FROM bband GROUP BY band, key
        HAVING count(*) > 100),
      capped AS (
        SELECT bb.* FROM bband bb
        LEFT JOIN hot h ON bb.band = h.band AND bb.key = h.key
        WHERE h.band IS NULL),
      pairs AS (
        SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
        FROM capped x JOIN capped y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
      vpairs AS (
        SELECT p.u, p.v FROM pairs p
        JOIN sh sa ON sa.doc_id = p.u
        JOIN sh sb ON sb.doc_id = p.v
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          >= 0.5),
      edges AS (
        SELECT u, v FROM vpairs UNION ALL SELECT v AS u, u AS v FROM vpairs),
      reach AS (
        SELECT doc_id AS node, doc_id AS lbl FROM surv
        UNION
        SELECT e.v AS node, r.lbl
        FROM reach r JOIN edges e ON e.u = r.node
        WHERE r.lbl < e.v),
      comp AS (
        SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node),
      plan AS (
        SELECT c.doc_id, c.component,
          first_value(c.doc_id) OVER (PARTITION BY c.component
            ORDER BY length(a.text) DESC, c.doc_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS canonical_id
        FROM comp c JOIN alldocs a ON a.doc_id = c.doc_id),
      enriched AS (
        SELECT p.doc_id, p.canonical_id, cl.direct_of,
          min(cl.direct_of) OVER (PARTITION BY p.component) AS comp_of
        FROM plan p LEFT JOIN crosslink cl ON cl.doc_id = p.doc_id),
      nearv AS (
        SELECT doc_id,
          CASE WHEN comp_of IS NOT NULL THEN 'near_corpus'
               WHEN doc_id <> canonical_id THEN 'near_batch'
               ELSE 'kept' END AS status,
          CASE WHEN comp_of IS NOT NULL THEN COALESCE(direct_of, comp_of)
               WHEN doc_id <> canonical_id THEN canonical_id END AS dup_of
        FROM enriched)
      SELECT doc_id, status, CAST(dup_of AS BIGINT) AS dup_of
      FROM (SELECT doc_id, status, dup_of FROM exact WHERE status IS NOT NULL
            UNION ALL SELECT doc_id, status, dup_of FROM nearv) z
      ORDER BY doc_id""")),

    // The FORGET LIFECYCLE under the oracle (the s22 treatment applied
    // to DedupIndex — d13 pins dedupAgainst over a built index; this
    // pins build → grow → forget → re-probe): build(60%, md5 family) →
    // grow(20%) → forget every 17th indexed doc → dedupAgainst a batch
    // containing the LAST 20%, re-posts of FORGOTTEN content
    // (id + 2^30), and re-posts of RETAINED content (id + 2^31). The
    // stored index load masks tombstones out of BOTH the exact and
    // bucket tables, so DuckDB replays the whole verdict chain against
    // the RETAINED corpus only: forgotten docs stop claiming re-crawls
    // of their own text (the tombstone re-admission property) and their
    // band keys stop attracting near-dup candidates, while retained
    // re-posts still resolve exact_corpus to their originals. Same
    // machinery as d13 end to end; the only delta is the lifecycle and
    // the masked corpus predicate. DedupIndexSpec pins the fnv-family
    // forget parity; the spec here asserts no verdict ever points at a
    // forgotten id.
    ("d16_dedup_forget_md5", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .unionByName(docs
          .filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 17 === 0)
          .select((col("doc_id") + lit(1073741824L)).as("doc_id"),
            col("text")))
        .unionByName(docs
          .filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 17 =!= 0 &&
            col("doc_id") % 19 === 0)
          .select((col("doc_id") + lit(2147483648L)).as("doc_id"),
            col("text")))
      val dir = IxScratch.cached("d16:" + IxScratch.fingerprint(d),
          "graft_d16_ix") { p =>
        build(docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 4),
          p, family = "md5")
        grow(docs.filter(col("doc_id") % 5 === 4), p)
        forget(docs
          .filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 17 === 0)
          .select(col("doc_id")), p)
      }
      dedupAgainst(batch, corpus, load(s, dir))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE
      alldocs AS (SELECT doc_id, text FROM documents),
      corpus AS MATERIALIZED (
        SELECT doc_id, text FROM alldocs
        WHERE doc_id % 5 <> 0 AND doc_id % 17 <> 0),
      batch AS MATERIALIZED (
        SELECT doc_id, text FROM alldocs WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 1073741824 AS doc_id, text FROM alldocs
        WHERE doc_id % 5 <> 0 AND doc_id % 17 = 0
        UNION ALL
        SELECT doc_id + 2147483648 AS doc_id, text FROM alldocs
        WHERE doc_id % 5 <> 0 AND doc_id % 17 <> 0 AND doc_id % 19 = 0),
      cmin AS (
        SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS doc_md5,
          min(doc_id) AS c_min
        FROM corpus GROUP BY 1),
      bmd5 AS (
        SELECT doc_id,
          md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS doc_md5
        FROM batch),
      bmin AS (SELECT doc_md5, min(doc_id) AS b_min FROM bmd5 GROUP BY 1),
      exact AS (
        SELECT b.doc_id,
          CASE WHEN c.c_min IS NOT NULL THEN 'exact_corpus'
               WHEN b.doc_id <> m.b_min THEN 'exact_batch' END AS status,
          CASE WHEN c.c_min IS NOT NULL THEN c.c_min
               WHEN b.doc_id <> m.b_min THEN m.b_min END AS dup_of
        FROM bmd5 b
        JOIN bmin m ON b.doc_md5 = m.doc_md5
        LEFT JOIN cmin c ON b.doc_md5 = c.doc_md5),
      surv AS (SELECT doc_id FROM exact WHERE status IS NULL),
      textsrc AS MATERIALIZED (
        SELECT doc_id, text FROM corpus
        UNION ALL
        SELECT b.doc_id, b.text FROM batch b
        JOIN surv s ON b.doc_id = s.doc_id),
      sh AS (
        SELECT doc_id,
          CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
               THEN list_distinct(list_transform(
                 range(0, len(string_split_regex(trim(text), '\s+')) - 2),
                 i -> concat_ws(' ',
                   string_split_regex(trim(text), '\s+')[i+1],
                   string_split_regex(trim(text), '\s+')[i+2],
                   string_split_regex(trim(text), '\s+')[i+3])))
               ELSE [text] END AS sh
        FROM textsrc),
      grams AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      sig AS (
        SELECT doc_id, i.range AS i,
          min(CAST(concat('0x', substr(
            md5(concat(CAST(i.range AS VARCHAR), ':', g)), 1, 15))
            AS BIGINT)) AS s
        FROM grams CROSS JOIN range(12) i
        GROUP BY doc_id, i.range),
      bands AS (
        SELECT doc_id, CAST(i // 3 AS INTEGER) AS band,
          md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY i)) AS key
        FROM sig GROUP BY doc_id, i // 3),
      cband AS (
        SELECT b.* FROM bands b
        JOIN corpus c ON b.doc_id = c.doc_id),
      bband AS (
        SELECT b.* FROM bands b JOIN surv s ON b.doc_id = s.doc_id),
      crosscand AS (
        SELECT DISTINCT bb.doc_id, cb.doc_id AS c_id
        FROM bband bb JOIN cband cb
          ON bb.band = cb.band AND bb.key = cb.key),
      crossver AS (
        SELECT cc.doc_id, cc.c_id
        FROM crosscand cc
        JOIN sh sa ON sa.doc_id = cc.doc_id
        JOIN sh sb ON sb.doc_id = cc.c_id
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          >= 0.5),
      crosslink AS (
        SELECT doc_id, min(c_id) AS direct_of FROM crossver GROUP BY doc_id),
      hot AS (
        SELECT band, key FROM bband GROUP BY band, key
        HAVING count(*) > 100),
      capped AS (
        SELECT bb.* FROM bband bb
        LEFT JOIN hot h ON bb.band = h.band AND bb.key = h.key
        WHERE h.band IS NULL),
      pairs AS (
        SELECT DISTINCT x.doc_id AS u, y.doc_id AS v
        FROM capped x JOIN capped y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
      vpairs AS (
        SELECT p.u, p.v FROM pairs p
        JOIN sh sa ON sa.doc_id = p.u
        JOIN sh sb ON sb.doc_id = p.v
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          >= 0.5),
      edges AS (
        SELECT u, v FROM vpairs UNION ALL SELECT v AS u, u AS v FROM vpairs),
      reach AS (
        SELECT doc_id AS node, doc_id AS lbl FROM surv
        UNION
        SELECT e.v AS node, r.lbl
        FROM reach r JOIN edges e ON e.u = r.node
        WHERE r.lbl < e.v),
      comp AS (
        SELECT node AS doc_id, min(lbl) AS component FROM reach GROUP BY node),
      plan AS (
        SELECT c.doc_id, c.component,
          first_value(c.doc_id) OVER (PARTITION BY c.component
            ORDER BY length(a.text) DESC, c.doc_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS canonical_id
        FROM comp c JOIN batch a ON a.doc_id = c.doc_id),
      enriched AS (
        SELECT p.doc_id, p.canonical_id, cl.direct_of,
          min(cl.direct_of) OVER (PARTITION BY p.component) AS comp_of
        FROM plan p LEFT JOIN crosslink cl ON cl.doc_id = p.doc_id),
      nearv AS (
        SELECT doc_id,
          CASE WHEN comp_of IS NOT NULL THEN 'near_corpus'
               WHEN doc_id <> canonical_id THEN 'near_batch'
               ELSE 'kept' END AS status,
          CASE WHEN comp_of IS NOT NULL THEN COALESCE(direct_of, comp_of)
               WHEN doc_id <> canonical_id THEN canonical_id END AS dup_of
        FROM enriched)
      SELECT doc_id, status, CAST(dup_of AS BIGINT) AS dup_of
      FROM (SELECT doc_id, status, dup_of FROM exact WHERE status IS NOT NULL
            UNION ALL SELECT doc_id, status, dup_of FROM nearv) z
      ORDER BY doc_id""")))
}
