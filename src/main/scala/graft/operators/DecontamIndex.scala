package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Persistent gram-level contamination index — the stored, servable
  * form of d08's word-8-gram decontamination screen (the
  * [[RetrievalIndex]] treatment applied to the gram census).
  *
  * Eval suites arrive batch after batch; the training corpus is the
  * STABLE side. The live screen ([[Training.contamination]]) re-explodes
  * the train corpus into 8-grams on every eval batch — at 100 TB that
  * pays the full corpus scan per batch. Build the census once, store
  * (gram, doc_id) rows, and each eval batch pays only a pruned probe.
  *
  * On-disk layout under `dir`:
  *  - `meta.parquet` — one row: n (gram width — probes MUST shingle
  *    with the same n, so [[screen]] reads it from here) and nBuckets
  *    (the gram-hash partition count, the RetrievalIndex discipline)
  *  - `grams.parquet/bucket=N/` — (gram, doc_id) distinct word-n-gram
  *    attributions, partitioned by `bucket` = xxhash64(gram) mod
  *    nBuckets: an eval batch's grams map to a bounded bucket set, so
  *    the probe prunes at the parquet-listing level. Grams store as
  *    STRINGS (not hashes) so the DuckDB oracle matches exactly;
  *    doc_id attribution is what lets [[forget]] honor takedowns.
  *  - `tombstones.parquet` — append-only forgotten train doc_ids;
  *    [[load]] masks them, so a forgotten document stops contaminating
  *    eval docs that only overlapped IT — the d11/RetrievalIndex
  *    takedown symmetry. [[vacuum]] drops the rows physically.
  *
  * Scale posture: the probe collects only the eval grams' bucket ids
  * (≤ nBuckets, driver-bounded), prunes the stored scan to those
  * directories, then broadcasts the eval gram set into a semi-join —
  * the stored side streams map-side; the hit-gram set that comes back
  * is bounded by the EVAL gram count and broadcasts back into the eval
  * explode. No train-sized exchange exists in any screen plan.
  * c09 runs build(80%)→grow(20%)→screen so the lifecycle sits under the
  * DuckDB oracle, which recomputes the census from raw text.
  */
object DecontamIndex {

  final case class Loaded(n: Int, nBuckets: Int, grams: DataFrame)

  /** The gram→bucket map (xxhash64 mod nBuckets, pmod non-negative). */
  def bucketOf(gram: Column, nBuckets: Int): Column =
    pmod(xxhash64(gram), lit(nBuckets.toLong)).cast("int")

  /** Distinct (doc_id, gram) attributions — [[Dedup.shingles]] is
    * already per-doc distinct, and short docs (< n tokens) contribute
    * their whole text as one gram, matching the live screen. */
  private def gramsOf(docs: DataFrame, n: Int, nBuckets: Int,
      textCol: String): DataFrame =
    docs.select(col("doc_id"),
        explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .withColumn("bucket", bucketOf(col("gram"), nBuckets))

  /** Persist the train corpus's gram census: one corpus explode, rows
    * are gram strings + ids (no text payload). */
  def build(train: DataFrame, dir: String, n: Int = 8,
      nBuckets: Int = 64, textCol: String = "text"): Unit = {
    require(n >= 1, s"gram width $n must be >= 1")
    require(nBuckets >= 1, s"nBuckets $nBuckets must be >= 1")
    val spark = train.sparkSession
    import spark.implicits._
    Seq((n, nBuckets)).toDF("n", "nBuckets")
      .write.mode("overwrite").parquet(s"$dir/meta.parquet")
    gramsOf(train, n, nBuckets, textCol)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/grams.parquet")
  }

  /** Append a new train snapshot's grams. `batch` doc_ids must be NEW
    * (the DedupIndex survivors rule — a re-appended id would not change
    * screen verdicts, grams are set-semantics, but it would double
    * attribution rows). Frozen with an eager localCheckpoint before the
    * append so a batch derived from a probe of this index cannot be
    * recomputed against half-grown files; ends with the
    * rewrite-when-fragmented compaction pass. */
  def grow(batch: DataFrame, dir: String, compactAbove: Int = 64,
      textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    // memoized driver-side meta read (StoreGuard) — was one Spark job
    // per grow on the crawl loop's per-batch maintenance path
    val m = StoreGuard.metaRow(spark, dir, "n", "nBuckets")
    val (n, nBuckets) = (m.getAs[Int]("n"), m.getAs[Int]("nBuckets"))
    val frozen = batch.select(col("doc_id"), col(textCol).as("text"))
      .localCheckpoint(true)
    gramsOf(frozen, n, nBuckets, "text")
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$dir/grams.parquet")
    if (compactAbove > 0)
      Scale.compactTable(spark, s"$dir/grams.parquet",
        partitionCols = Seq("bucket"), maxFiles = compactAbove)
  }

  /** Takedown without a rewrite: tombstoned train ids are masked by
    * [[load]], so an eval gram whose ONLY train attribution was a
    * forgotten doc stops counting as a hit. Physical rows leave at
    * [[vacuum]]. */
  def forget(ids: DataFrame, dir: String): Unit =
    ids.select(col("doc_id")).distinct().localCheckpoint(true)
      .write.mode("append").parquet(s"$dir/tombstones.parquet")

  /** Physically drop tombstoned attributions and clear the tombstone
    * table (survivors materialized before each overwrite — the rewrite
    * reads the files it deletes). Re-[[load]] after. */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    tombstones(spark, dir).foreach { t =>
      val g = spark.read.parquet(s"$dir/grams.parquet")
        .join(broadcast(t), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      g.repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$dir/grams.parquet")
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], t.schema)
        .write.mode("overwrite").parquet(s"$dir/tombstones.parquet")
    }
  }

  private def tombstones(spark: SparkSession, dir: String): Option[DataFrame] =
    StoreGuard.tombstoneIds(spark, dir) // footer-count emptiness, no job

  /** Load the index; tombstoned train ids are masked here, so every
    * consumer honors takedowns. */
  def load(spark: SparkSession, dir: String): Loaded = {
    val m = StoreGuard.metaRow(spark, dir, "n", "nBuckets")
    val mask: DataFrame => DataFrame = tombstones(spark, dir) match {
      case Some(t) => df => df.join(broadcast(t), Seq("doc_id"), "left_anti")
      case None => identity
    }
    Loaded(m.getAs[Int]("n"), m.getAs[Int]("nBuckets"),
      mask(StoreGuard.table(spark, dir, "grams.parquet",
        "gram", "doc_id", "bucket")))
  }

  /** The DISTINCT stored grams matching an eval gram set: listing-level
    * bucket pruning (the bucket set is driver-bounded by nBuckets),
    * then a broadcast semi-join on the gram string. The result is
    * bounded by the EVAL gram count — safe to broadcast back. */
  def probe(ix: Loaded, evalGrams: DataFrame): DataFrame = {
    val qb = evalGrams
      .select(bucketOf(col("gram"), ix.nBuckets).as("bucket"))
      .distinct().collect().map(_.getInt(0))
    ix.grams
      .filter(col("bucket").isin(qb: _*))
      .join(broadcast(evalGrams.select(col("gram")).distinct()),
        Seq("gram"), "left_semi")
      .select(col("gram")).distinct()
  }

  /** d08's per-eval-doc contamination report served from the STORED
    * census: (doc_id, n_grams, n_hit, contamination) — identical
    * columns and arithmetic to [[Training.contamination]] over the same
    * train set, but the train corpus is never re-read. */
  def screen(ix: Loaded, evalDocs: DataFrame,
      textCol: String = "text"): DataFrame = {
    // totals AND the hit mark both read the eval explode — freeze it as
    // an eager localCheckpoint leaf rather than persist: checkpointed
    // blocks are AUTO-RELEASED by the ContextCleaner when the frame is
    // unreferenced (the round-13 cache-hygiene pattern), so a standing
    // service invoked per eval batch cannot accumulate cached blocks,
    // and the result stays LAZY (no extra materialization per call)
    val evalG = evalDocs.select(col("doc_id"),
        explode(Dedup.shingles(col(textCol), ix.n)).as("gram"))
      .localCheckpoint(true)
    val hitGrams = probe(ix, evalG)
    val hits = evalG
      .join(broadcast(hitGrams), Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    evalG.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_grams"))
          .as("contamination"))
  }

  /** d08's FULL report (gram leg) + r02's phrase leg, both served from
    * STORED indexes — the c06 composition as a standing service: eval
    * batches arrive repeatedly, the train corpus is stable, so the
    * phrase leg probes the persisted [[RetrievalIndex]] and the gram
    * leg probes this census; neither leg re-reads train text. Output
    * columns and arithmetic identical to the live c06 report. */
  def decontaminationReport(rix: RetrievalIndex.Loaded, dcix: Loaded,
      evalDocs: DataFrame, phraseLen: Int = 6): DataFrame = {
    val phrases = evalDocs.select(col("doc_id").as("query_id"),
      concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, phraseLen))
        .as("phrase"))
    val pm = RetrievalIndex.phraseSearch(rix, phrases)
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("phrase_docs"),
        sum(col("n_matches")).as("phrase_hits"))
    val gram = screen(dcix, evalDocs)
    // pm is bounded by the eval batch — broadcast, no added exchange
    gram.join(broadcast(pm), gram("doc_id") === pm("query_id"), "left")
      .select(gram("doc_id"), col("n_grams"), col("n_hit"),
        col("contamination"),
        coalesce(col("phrase_docs"), lit(0L)).as("phrase_docs"),
        coalesce(col("phrase_hits"), lit(0L)).as("phrase_hits"),
        (coalesce(col("phrase_docs"), lit(0L)) > 0 || col("n_hit") > 0)
          .as("flagged"))
  }

  /** Per-dataset stored retrieval index over the TRAIN split (the c10
    * phrase leg), 80/20 build→grow like the census. */
  private def trainRetrievalIndex(s: SparkSession, d: String): String =
    IxScratch.cached("retrieval-train:" + IxScratch.fingerprint(d),
        "graft_rtrain_ix") { p =>
      val train = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 10 =!= 0)
      RetrievalIndex.build(train.filter(col("doc_id") % 7 =!= 0), p)
      RetrievalIndex.grow(train.filter(col("doc_id") % 7 === 0), p)
    }

  /** Per-dataset stored census for the registered query — train side =
    * doc_id ≢ 0 mod 10 (c06/d08's split), built 80/20 so grow parity
    * sits under the oracle. */
  private def builtIndex(s: SparkSession, d: String): String =
    IxScratch.cached("decontam:" + IxScratch.fingerprint(d),
        "graft_decontam_ix") { p =>
      val train = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 10 =!= 0)
      build(train.filter(col("doc_id") % 7 =!= 0), p)
      grow(train.filter(col("doc_id") % 7 === 0), p)
    }

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // d08's decontamination screen served from the stored gram census
    // (build 80% of train → grow 20% → screen the eval split): the
    // oracle recomputes the census from raw text, so an attribution row
    // lost (or doubled) by grow, a stale bucket, or a probe pruning a
    // real directory all hash-mismatch.
    ("c09_decontam_index", (s: SparkSession, d: String) => {
      val evalDocs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 10 === 0)
      screen(load(s, builtIndex(s, d)), evalDocs)
        .orderBy(col("doc_id"))
    },
    Some("""WITH docs AS (
        SELECT doc_id, text,
          string_split_regex(trim(text), '\s+') AS arr
        FROM documents),
      grams AS (
        SELECT doc_id, unnest(
          CASE WHEN len(arr) >= 8
          THEN list_distinct(list_transform(
            range(0, len(arr) - 7),
            i -> array_to_string(arr[i+1:i+8], ' ')))
          ELSE [text] END) AS gram
        FROM docs),
      tot AS (SELECT doc_id, count(*) AS n_grams FROM grams
              WHERE doc_id % 10 = 0 GROUP BY 1),
      hit AS (SELECT doc_id, count(*) AS n_hit FROM grams g
              WHERE doc_id % 10 = 0 AND gram IN
                (SELECT gram FROM grams WHERE doc_id % 10 <> 0)
              GROUP BY 1)
      SELECT tot.doc_id, n_grams,
        coalesce(hit.n_hit, 0) AS n_hit,
        CAST(coalesce(hit.n_hit, 0) AS DOUBLE) / n_grams AS contamination
      FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
      ORDER BY tot.doc_id""")),

    // c06's FULL two-leg decontamination report as a standing SERVICE:
    // phrase leg from the stored train RetrievalIndex, gram leg from
    // the stored census — both under build(80%)→grow(20%) lifecycles,
    // all replayed from raw text by the oracle (c06's SQL verbatim: the
    // serving path changed, the answer must not).
    ("c10_decontam_service", (s: SparkSession, d: String) => {
      val evalDocs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 10 === 0)
      decontaminationReport(
        RetrievalIndex.load(s, trainRetrievalIndex(s, d)),
        load(s, builtIndex(s, d)), evalDocs)
        .orderBy(col("doc_id"))
    },
    Some("""WITH docs AS (
        SELECT doc_id, text,
          string_split_regex(trim(text), '\s+') AS arr
        FROM documents),
      p AS (
        SELECT doc_id, unnest(arr) AS term,
          unnest(range(0, len(arr))) AS pos
        FROM docs WHERE doc_id % 10 <> 0),
      q AS (
        SELECT doc_id AS query_id, arr[1:6] AS qarr
        FROM docs WHERE doc_id % 10 = 0),
      qt AS (
        SELECT query_id, unnest(qarr) AS term,
          unnest(range(0, len(qarr))) AS qpos
        FROM q),
      qlen AS (SELECT query_id, count(*) AS qlen FROM qt GROUP BY 1),
      cand AS (
        SELECT qt.query_id, p.doc_id, p.pos - qt.qpos AS start, qt.qpos
        FROM p JOIN qt ON p.term = qt.term
        WHERE p.pos - qt.qpos >= 0),
      hits AS (
        SELECT c.query_id, c.doc_id, c.start
        FROM cand c JOIN qlen l ON c.query_id = l.query_id
        GROUP BY c.query_id, c.doc_id, c.start, l.qlen
        HAVING count(DISTINCT c.qpos) = l.qlen),
      pm0 AS (
        SELECT query_id, doc_id, count(*) AS n_matches
        FROM hits GROUP BY query_id, doc_id),
      pm AS (
        SELECT query_id, CAST(count(*) AS BIGINT) AS phrase_docs,
          CAST(sum(n_matches) AS BIGINT) AS phrase_hits
        FROM pm0 GROUP BY query_id),
      grams AS (
        SELECT doc_id, unnest(
          CASE WHEN len(arr) >= 8
          THEN list_distinct(list_transform(
            range(0, len(arr) - 7),
            i -> array_to_string(arr[i+1:i+8], ' ')))
          ELSE [text] END) AS gram
        FROM docs),
      tot AS (SELECT doc_id, count(*) AS n_grams FROM grams
              WHERE doc_id % 10 = 0 GROUP BY 1),
      hit AS (SELECT doc_id, count(*) AS n_hit FROM grams g
              WHERE doc_id % 10 = 0 AND gram IN
                (SELECT gram FROM grams WHERE doc_id % 10 <> 0)
              GROUP BY 1)
      SELECT tot.doc_id, n_grams,
        coalesce(hit.n_hit, 0) AS n_hit,
        CAST(coalesce(hit.n_hit, 0) AS DOUBLE) / n_grams AS contamination,
        coalesce(pm.phrase_docs, 0) AS phrase_docs,
        coalesce(pm.phrase_hits, 0) AS phrase_hits,
        (coalesce(pm.phrase_docs, 0) > 0 OR coalesce(hit.n_hit, 0) > 0)
          AS flagged
      FROM tot
      LEFT JOIN hit ON tot.doc_id = hit.doc_id
      LEFT JOIN pm ON tot.doc_id = pm.query_id
      ORDER BY tot.doc_id""")),

    // The FORGET lifecycle under the oracle (the d16/r13/m43 treatment,
    // completing the set: every persistent index family's takedown path
    // is now oracle-gated): c09's census is built 80/20, every 17th
    // train doc is tombstoned, and the masked load drops its gram
    // attributions — a forgotten doc's grams stop flagging eval docs
    // UNLESS a retained doc also carries them (the shared-gram takedown
    // semantics DecontamIndexSpec pins on the live path). The census
    // stores raw gram strings, so no hash-family swap is needed: the
    // oracle is c09's replay with the train side restricted to
    // RETAINED ids — a tombstone that failed to mask the gram table
    // hash-mismatches.
    ("c16_decontam_forget", (s: SparkSession, d: String) => {
      val dir = IxScratch.cached("c16:" + IxScratch.fingerprint(d),
          "graft_c16_ix") { p =>
        val train = Tables.documents(s, d).select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 10 =!= 0)
        build(train.filter(col("doc_id") % 7 =!= 0), p)
        grow(train.filter(col("doc_id") % 7 === 0), p)
        forget(train.filter(col("doc_id") % 17 === 0)
          .select(col("doc_id")), p)
      }
      val evalDocs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 10 === 0)
      screen(load(s, dir), evalDocs)
        .orderBy(col("doc_id"))
    },
    Some("""WITH docs AS (
        SELECT doc_id, text,
          string_split_regex(trim(text), '\s+') AS arr
        FROM documents),
      grams AS (
        SELECT doc_id, unnest(
          CASE WHEN len(arr) >= 8
          THEN list_distinct(list_transform(
            range(0, len(arr) - 7),
            i -> array_to_string(arr[i+1:i+8], ' ')))
          ELSE [text] END) AS gram
        FROM docs),
      tot AS (SELECT doc_id, count(*) AS n_grams FROM grams
              WHERE doc_id % 10 = 0 GROUP BY 1),
      hit AS (SELECT doc_id, count(*) AS n_hit FROM grams g
              WHERE doc_id % 10 = 0 AND gram IN
                (SELECT gram FROM grams
                 WHERE doc_id % 10 <> 0 AND doc_id % 17 <> 0)
              GROUP BY 1)
      SELECT tot.doc_id, n_grams,
        coalesce(hit.n_hit, 0) AS n_hit,
        CAST(coalesce(hit.n_hit, 0) AS DOUBLE) / n_grams AS contamination
      FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
      ORDER BY tot.doc_id"""))
  )
}
