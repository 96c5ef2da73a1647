package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Persistent inverted index — the stored, servable form of the
  * [[Retrieval]] surface (the AnnIndex/DedupIndex treatment applied to
  * retrieval, closing the one index family that rebuilt per call).
  *
  * A decontamination service answers "which training docs contain this
  * eval phrase?" for query batch after query batch; rebuilding the
  * postings from 100 TB of corpus text per batch pays the corpus scan
  * every time. Build once, store id/term/position rows (a few longs +
  * the term per posting — KB-per-document scale, not text), and each
  * query batch pays only a pruned index probe.
  *
  * On-disk layout under `dir`:
  *  - `meta.parquet` — one row: nBuckets (the term-hash partition count
  *    probes MUST reproduce, so queries read it from here rather than
  *    trusting the caller — the DedupIndex meta discipline)
  *  - `postings.parquet/bucket=N/` — (term, doc_id, tf, positions:
  *    array<int> ascending), partitioned by `bucket` = xxhash64(term)
  *    mod nBuckets: a query's terms map to a bounded bucket set, so the
  *    probe prunes to those directories at the parquet-listing level
  *    and the corpus-sized remainder is never even opened.
  *  - `doclens.parquet` — (doc_id, dl) whitespace-token lengths; N and
  *    avgdl for BM25 derive from it exactly (one agg over an id+length
  *    table), so stats stay correct under grow/forget without a
  *    stored-aggregate drift problem.
  *  - `tombstones.parquet` — append-only takedown ids ([[forget]]);
  *    [[load]] masks them from BOTH tables, [[vacuum]] drops them.
  *
  * Scale posture: the probe broadcasts the (tiny) query vocabulary and
  * prunes with a ≤ nBuckets-element partition filter — the index side
  * streams map-side off a pruned scan; no corpus-sized exchange exists
  * in any query plan. Grow appends per-snapshot postings (disjoint
  * doc_ids by contract, the DedupIndex survivors rule) and compacts
  * when fragmented. The stored-index results are provably identical to
  * a from-scratch [[Retrieval]] run: r04/r05 gate that equivalence with
  * a full DuckDB oracle that recomputes from raw text, and
  * RetrievalIndexSpec pins build-vs-load, grow, forget and vacuum
  * parity theorems.
  */
object RetrievalIndex {

  final case class Loaded(nBuckets: Int, postings: DataFrame,
      doclens: DataFrame)

  /** The term→bucket map. xxhash64 (stable across sessions/engines —
    * already the repo-wide id hash) mod nBuckets; pmod keeps it
    * non-negative. */
  def bucketOf(term: Column, nBuckets: Int): Column =
    pmod(xxhash64(term), lit(nBuckets.toLong)).cast("int")

  private def postingsOf(docs: DataFrame, nBuckets: Int): DataFrame =
    Retrieval.postings(docs)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("bucket", bucketOf(col("term"), nBuckets))

  private def doclensOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("dl"))

  /** Persist the corpus's inverted index: one corpus explode + one
    * (term, doc) partial aggregation — the same single-scan cost class
    * as the live r01 build, paid ONCE. */
  def build(corpus: DataFrame, dir: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets $nBuckets must be >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq(nBuckets).toDF("nBuckets")
      .write.mode("overwrite").parquet(s"$dir/meta.parquet")
    postingsOf(corpus, nBuckets)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings.parquet")
    doclensOf(corpus)
      .write.mode("overwrite").parquet(s"$dir/doclens.parquet")
  }

  /** Append a new snapshot's postings — the crawl-loop maintenance step.
    * `batch` doc_ids must be NEW (the DedupIndex survivors rule: an
    * already-indexed id would double its postings and corrupt df/tf).
    * Postings rows are per (term, doc), so per-snapshot postings of
    * disjoint doc sets union to exactly the from-scratch postings of
    * the union — the grow parity theorem RetrievalIndexSpec pins.
    *
    * Same lineage discipline as [[DedupIndex.grow]]: the batch is
    * frozen with an eager localCheckpoint BEFORE the first append, so a
    * batch derived from a probe of this very index cannot be recomputed
    * against the half-grown files mid-write. Finishes with a
    * rewrite-when-fragmented compaction pass (`compactAbove` data
    * files; <= 0 disables); re-[[load]] after a compacting grow. */
  def grow(batch: DataFrame, dir: String, compactAbove: Int = 64): Unit = {
    val spark = batch.sparkSession
    // memoized driver-side meta read (StoreGuard) — was one Spark job
    // per grow on the crawl loop's per-batch maintenance path
    val nBuckets =
      StoreGuard.metaRow(spark, dir, "nBuckets").getAs[Int]("nBuckets")
    val frozen = batch.select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    postingsOf(frozen, nBuckets)
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$dir/postings.parquet")
    doclensOf(frozen)
      .write.mode("append").parquet(s"$dir/doclens.parquet")
    if (compactAbove > 0) {
      Scale.compactTable(spark, s"$dir/postings.parquet",
        partitionCols = Seq("bucket"), maxFiles = compactAbove)
      Scale.compactTable(spark, s"$dir/doclens.parquet",
        maxFiles = compactAbove)
    }
  }

  /** Takedown WITHOUT a rewrite: tombstoned ids land in an append-only
    * table and [[load]] masks them from postings AND doclens, so a
    * forgotten document stops matching phrases, stops contributing tf,
    * and leaves N/avgdl/df exactly as if it were never indexed — the
    * [[DedupIndex.forget]] symmetry. Physical rows leave at
    * [[vacuum]]. */
  def forget(ids: DataFrame, dir: String): Unit =
    ids.select(col("doc_id")).distinct().localCheckpoint(true)
      .write.mode("append").parquet(s"$dir/tombstones.parquet")

  /** Physically drop tombstoned rows from both tables and clear the
    * tombstone table. Survivors are materialized (eager localCheckpoint)
    * before each overwrite — the rewrite reads the files it deletes.
    * Re-[[load]] after (stale listings). */
  def vacuum(spark: SparkSession, dir: String): Unit = {
    tombstones(spark, dir).foreach { t =>
      val post = spark.read.parquet(s"$dir/postings.parquet")
        .join(broadcast(t), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      post.repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$dir/postings.parquet")
      val dl = spark.read.parquet(s"$dir/doclens.parquet")
        .join(broadcast(t), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      dl.write.mode("overwrite").parquet(s"$dir/doclens.parquet")
      // an explicitly EMPTY frame, not `t.limit(0)`: the latter only
      // dodges Spark's overwrite-while-reading check because the
      // optimizer happens to collapse LIMIT 0 to a LocalRelation —
      // fragile across versions and inconsistent with the
      // checkpoint-before-overwrite discipline above
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], t.schema)
        .write.mode("overwrite").parquet(s"$dir/tombstones.parquet")
    }
  }

  private def tombstones(spark: SparkSession, dir: String): Option[DataFrame] =
    StoreGuard.tombstoneIds(spark, dir) // footer-count emptiness, no job

  /** Load the index; tombstoned ids are masked out of both tables here,
    * so every consumer honors takedowns. */
  def load(spark: SparkSession, dir: String): Loaded = {
    val nBuckets =
      StoreGuard.metaRow(spark, dir, "nBuckets").getAs[Int]("nBuckets")
    val mask: DataFrame => DataFrame = tombstones(spark, dir) match {
      case Some(t) => df => df.join(broadcast(t), Seq("doc_id"), "left_anti")
      case None => identity
    }
    Loaded(nBuckets,
      mask(StoreGuard.table(spark, dir, "postings.parquet",
        "term", "doc_id", "tf", "bucket")),
      mask(StoreGuard.table(spark, dir, "doclens.parquet", "doc_id", "dl")))
  }

  /** The stored postings restricted to a query vocabulary: partition
    * pruning by the (≤ nBuckets, so always driver-bounded) bucket set of
    * the query terms, then a broadcast semi-join on term. Everything a
    * query plan reads downstream of this is candidate-sized. */
  def probe(ix: Loaded, terms: DataFrame): DataFrame = {
    // bounded by nBuckets (bucket values live in [0, nBuckets)), so the
    // driver-side collect can never exceed the configured bucket count
    val qb = terms.select(bucketOf(col("term"), ix.nBuckets).as("bucket"))
      .distinct().collect().map(_.getInt(0))
    ix.postings
      .filter(col("bucket").isin(qb: _*))
      .join(broadcast(terms.select(col("term")).distinct()),
        Seq("term"), "left_semi")
  }

  /** Exact phrase search against the STORED index — [[Retrieval
    * .phraseMatchesFrom]] fed by a pruned probe instead of a corpus
    * explode. Positions re-explode only for candidate (term, doc)
    * rows. */
  def phraseSearch(ix: Loaded, phrases: DataFrame): DataFrame = {
    val qt = phrases.select(
      posexplode(split(trim(col("phrase")), "\\s+")).as(Seq("qpos", "term")))
    val post = probe(ix, qt)
      .select(col("doc_id"), col("term"), explode(col("positions")).as("pos"))
    Retrieval.phraseMatchesFrom(post, phrases)
  }

  /** BM25 top-k against the STORED index — [[Retrieval.bm25From]] fed
    * by stored tf rows (pruned probe) and the stored doc-length table.
    * Scores are bit-identical to a from-scratch [[Retrieval.bm25TopK]]
    * over the same documents (r04's oracle recomputes them from raw
    * text in DuckDB). */
  def bm25TopK(ix: Loaded, queryTerms: DataFrame, k: Int = 10): DataFrame =
    Retrieval.bm25From(
      probe(ix, queryTerms).select(col("term"), col("doc_id"), col("tf")),
      ix.doclens, queryTerms, k)

  /** Phrase-match SITES (query_id, doc_id, start, qlen) from the stored
    * index — the positional postings already hold everything adjacency
    * needs; positions re-explode only for probed (term, doc) rows. */
  def phraseStarts(ix: Loaded, phrases: DataFrame): DataFrame = {
    val qt = phrases.select(
      posexplode(split(trim(col("phrase")), "\\s+")).as(Seq("qpos", "term")))
    val post = probe(ix, qt)
      .select(col("doc_id"), col("term"), explode(col("positions")).as("pos"))
    Retrieval.phraseStartsFrom(post, phrases)
  }

  /** Snippet extraction served from the STORED index — a real snippet
    * service queries the index it already built, it does not re-explode
    * the corpus into postings per call (the r06 amortization gap this
    * closes). Match sites come from [[phraseStarts]] (pruned probe);
    * `docs` is read ONCE, only for matched rows' text, because the
    * index stores positions, not text — that single matched-doc slice
    * is the irreducible part. Output is bit-identical to the live
    * [[Retrieval.phraseSnippets]] over the same documents. */
  def snippets(ix: Loaded, docs: DataFrame, phrases: DataFrame,
      window: Int = 3): DataFrame =
    Retrieval.snippetsFromStarts(docs, phraseStarts(ix, phrases), window)

  /** Per-document TF-IDF keywords served from the STORED index: tf is a
    * stored column and df/N aggregate off the stored tables, so NO
    * corpus text is touched at all — the whole-corpus keyword pass
    * costs one index scan instead of a corpus re-tokenization. Masked
    * tombstones drop a forgotten doc from tf, df AND N, so the output
    * equals a from-scratch [[Retrieval.tfidfKeywords]] over the
    * surviving documents (RetrievalIndexSpec pins both parities). */
  def keywordsFrom(ix: Loaded, k: Int = 3): DataFrame =
    Retrieval.tfidfFrom(
      ix.postings.select(col("doc_id"), col("term"), col("tf")),
      ix.doclens.count(), k)

  // ---------------------------------------------------------------
  // Registered queries. Both run build(80%) → grow(20%) → query, so the
  // full lifecycle sits under the oracle: DuckDB recomputes the answers
  // from raw text, so a postings row lost (or doubled) by grow, a stale
  // stat, or a probe pruning a real bucket all hash-mismatch.
  // ---------------------------------------------------------------

  /** Per-dataset stored index for the registered queries — fingerprint
    * keyed and shutdown-cleaned via [[IxScratch]]. */
  private[operators] def builtIndex(s: SparkSession, d: String): String =
    IxScratch.cached("retrieval:" + IxScratch.fingerprint(d),
        "graft_retrieval_ix") { p =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      build(docs.filter(col("doc_id") % 5 =!= 0), p)
      grow(docs.filter(col("doc_id") % 5 === 0), p)
    }

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // BM25 top-5 served from the stored (built-then-grown) index; query
    // vocabularies are the distinct first-four tokens of every doc_id ≡
    // 0 mod 89. The oracle recomputes BM25 from raw text — the
    // stored-index path must agree bit-for-bit.
    ("r04_index_bm25", (s: SparkSession, d: String) => {
      val qterms = Tables.documents(s, d).filter(col("doc_id") % 89 === 0)
        .select(col("doc_id").as("query_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("qpos", "term")))
        .filter(col("qpos") < 4)
        .select(col("query_id"), col("term")).distinct()
      bm25TopK(load(s, builtIndex(s, d)), qterms, k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS arr
        FROM documents),
      dl AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS dl FROM base),
      stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
          CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) /
            CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS avgdl
        FROM dl),
      p AS (SELECT doc_id, unnest(arr) AS term FROM base),
      qt AS (
        SELECT DISTINCT query_id, term FROM (
          SELECT doc_id AS query_id, unnest(arr[1:4]) AS term
          FROM base WHERE doc_id % 89 = 0) z),
      tf AS (
        SELECT p.term, p.doc_id, count(*) AS tf
        FROM p JOIN (SELECT DISTINCT term FROM qt) s ON p.term = s.term
        GROUP BY p.term, p.doc_id),
      idf AS (
        SELECT term, CAST(floor(1048576.0 *
            ((CAST(n_docs - df AS DOUBLE) + 0.5) /
             (CAST(df AS DOUBLE) + 0.5))) AS BIGINT) AS idf_q
        FROM (SELECT term, count(*) AS df FROM tf GROUP BY term), stats),
      contrib AS (
        SELECT qt.query_id, tf.doc_id,
          CAST(floor(CAST(idf.idf_q AS DOUBLE) *
            ((CAST(tf.tf AS DOUBLE) * 2.25) /
             (CAST(tf.tf AS DOUBLE) + 1.25 *
              (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl)))))
            AS BIGINT) AS contrib
        FROM tf
        JOIN idf ON tf.term = idf.term
        JOIN qt ON tf.term = qt.term
        JOIN dl ON tf.doc_id = dl.doc_id, stats),
      scored AS (
        SELECT query_id, doc_id, SUM(contrib) AS score
        FROM contrib GROUP BY query_id, doc_id),
      ranked AS (
        SELECT query_id, doc_id, CAST(score AS BIGINT) AS score,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS INTEGER) AS rank
        FROM scored)
      SELECT query_id, rank, doc_id, score
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank""")),

    // Exact phrase search served from the stored index: phrases are the
    // first three tokens of every doc_id ≡ 0 mod 89 (disjoint modulus
    // from r02's live-path query set). Oracle recomputes adjacency from
    // raw text.
    ("r05_index_phrase", (s: SparkSession, d: String) => {
      val phrases = Tables.documents(s, d).filter(col("doc_id") % 89 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 3))
            .as("phrase"))
      phraseSearch(load(s, builtIndex(s, d)), phrases)
        .orderBy(col("query_id"), col("doc_id"))
    },
    Some("""WITH base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS arr
        FROM documents),
      p AS (
        SELECT doc_id, unnest(arr) AS term,
          unnest(range(0, len(arr))) AS pos
        FROM base),
      q AS (
        SELECT doc_id AS query_id, arr[1:3] AS qarr
        FROM base WHERE doc_id % 89 = 0),
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
        HAVING count(DISTINCT c.qpos) = l.qlen)
      SELECT query_id, doc_id, count(*) AS n_matches
      FROM hits GROUP BY query_id, doc_id
      ORDER BY query_id, doc_id""")),

    // Snippets served from the stored (built-then-grown) index: match
    // sites from the pruned probe, one matched-doc text slice. Queries
    // are the 4-token prefixes of doc_id ≡ 0 mod 103 (disjoint modulus
    // from r06's live path), window 3. The oracle recomputes adjacency
    // AND the clamped slice from raw text — a postings row lost by
    // grow, a stale position list, or a probe pruning a real bucket
    // all hash-mismatch.
    ("r08_index_snippets", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val phrases = docs.filter(col("doc_id") % 103 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 1, 4))
            .as("phrase"))
      snippets(load(s, builtIndex(s, d)), docs, phrases, window = 3)
        .orderBy(col("query_id"), col("doc_id"), col("start"))
    },
    Some("""WITH base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS arr
        FROM documents),
      p AS (
        SELECT doc_id, unnest(arr) AS term,
          unnest(range(0, len(arr))) AS pos
        FROM base),
      q AS (
        SELECT doc_id AS query_id, arr[1:4] AS qarr
        FROM base WHERE doc_id % 103 = 0),
      qt AS (
        SELECT query_id, unnest(qarr) AS term,
          unnest(range(0, len(qarr))) AS qpos
        FROM q),
      qlen AS (SELECT query_id, count(*) AS qlen FROM qt GROUP BY 1),
      cand AS (
        SELECT qt.query_id, p.doc_id, p.pos - qt.qpos AS start, qt.qpos
        FROM p JOIN qt ON p.term = qt.term
        WHERE p.pos - qt.qpos >= 0),
      sites AS (
        SELECT c.query_id, c.doc_id, c.start, l.qlen
        FROM cand c JOIN qlen l ON c.query_id = l.query_id
        GROUP BY c.query_id, c.doc_id, c.start, l.qlen
        HAVING count(DISTINCT c.qpos) = l.qlen),
      sn AS (
        SELECT s.query_id, s.doc_id, s.start,
          array_to_string(b.arr[
            (CASE WHEN s.start - 3 > 0 THEN s.start - 3 ELSE 0 END) + 1 :
            (CASE WHEN s.start + s.qlen - 1 + 3 < len(b.arr) - 1
              THEN s.start + s.qlen - 1 + 3 ELSE len(b.arr) - 1 END) + 1],
            ' ') AS snippet
        FROM sites s JOIN base b ON s.doc_id = b.doc_id)
      SELECT query_id, doc_id, start, snippet
      FROM sn ORDER BY query_id, doc_id, start""")),

    // Whole-corpus TF-IDF keywords served from the stored index — tf is
    // a stored column, df/N aggregate off the stored tables, zero text
    // re-tokenization. Must agree bit-for-bit with r07's live path (and
    // the oracle recomputes everything from raw text).
    ("r09_index_keywords", (s: SparkSession, d: String) =>
      keywordsFrom(load(s, builtIndex(s, d)), k = 3)
        .orderBy(col("doc_id"), col("rank")),
    Some("""WITH base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS arr
        FROM documents),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM base),
      p AS (SELECT doc_id, unnest(arr) AS term FROM base),
      tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM p GROUP BY doc_id, term),
      idf AS (
        SELECT term, CAST(floor(1048576.0 *
            ((CAST(n_docs - df AS DOUBLE) + 0.5) /
             (CAST(df AS DOUBLE) + 0.5))) AS BIGINT) AS idf_q
        FROM (SELECT term, count(*) AS df FROM tf GROUP BY term), n),
      scored AS (
        SELECT tf.doc_id, tf.term,
          CAST(tf.tf AS BIGINT) * idf.idf_q AS score
        FROM tf JOIN idf ON tf.term = idf.term),
      ranked AS (
        SELECT doc_id, term, score,
          CAST(row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS INTEGER) AS rank
        FROM scored)
      SELECT doc_id, rank, term, score
      FROM ranked WHERE rank <= 3
      ORDER BY doc_id, rank""")),

    // The FORGET lifecycle under the oracle (the s22/d16 treatment for
    // RetrievalIndex — r04 pins build→grow; this pins build → grow →
    // forget → re-serve): every 17th doc is tombstoned after the grow,
    // and the masked load drops it from postings AND doclens, so
    // N/avgdl/df/tf ALL shift exactly as if the doc were never indexed.
    // The oracle recomputes BM25 from the RETAINED corpus only — a
    // tombstone that failed to mask either table (stale N, ghost df, a
    // forgotten doc still ranked) hash-mismatches. Queries stay the
    // r04 vocabulary (including queries derived from forgotten docs —
    // takedown removes a doc from the INDEX, not from the query
    // stream). RetrievalIndexSpec keeps the forget/vacuum parity
    // theorems on the live path.
    ("r13_index_forget_bm25", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val dir = IxScratch.cached("r13:" + IxScratch.fingerprint(d),
          "graft_r13_ix") { p =>
        build(docs.filter(col("doc_id") % 5 =!= 0), p)
        grow(docs.filter(col("doc_id") % 5 === 0), p)
        forget(docs.filter(col("doc_id") % 17 === 0)
          .select(col("doc_id")), p)
      }
      val qterms = Tables.documents(s, d).filter(col("doc_id") % 89 === 0)
        .select(col("doc_id").as("query_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("qpos", "term")))
        .filter(col("qpos") < 4)
        .select(col("query_id"), col("term")).distinct()
      bm25TopK(load(s, dir), qterms, k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH rawbase AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS arr
        FROM documents),
      base AS (SELECT doc_id, arr FROM rawbase WHERE doc_id % 17 <> 0),
      dl AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS dl FROM base),
      stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
          CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) /
            CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS avgdl
        FROM dl),
      p AS (SELECT doc_id, unnest(arr) AS term FROM base),
      qt AS (
        SELECT DISTINCT query_id, term FROM (
          SELECT doc_id AS query_id, unnest(arr[1:4]) AS term
          FROM rawbase WHERE doc_id % 89 = 0) z),
      tf AS (
        SELECT p.term, p.doc_id, count(*) AS tf
        FROM p JOIN (SELECT DISTINCT term FROM qt) s ON p.term = s.term
        GROUP BY p.term, p.doc_id),
      idf AS (
        SELECT term, CAST(floor(1048576.0 *
            ((CAST(n_docs - df AS DOUBLE) + 0.5) /
             (CAST(df AS DOUBLE) + 0.5))) AS BIGINT) AS idf_q
        FROM (SELECT term, count(*) AS df FROM tf GROUP BY term), stats),
      contrib AS (
        SELECT qt.query_id, tf.doc_id,
          CAST(floor(CAST(idf.idf_q AS DOUBLE) *
            ((CAST(tf.tf AS DOUBLE) * 2.25) /
             (CAST(tf.tf AS DOUBLE) + 1.25 *
              (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl)))))
            AS BIGINT) AS contrib
        FROM tf
        JOIN idf ON tf.term = idf.term
        JOIN qt ON tf.term = qt.term
        JOIN dl ON tf.doc_id = dl.doc_id, stats),
      scored AS (
        SELECT query_id, doc_id, SUM(contrib) AS score
        FROM contrib GROUP BY query_id, doc_id),
      ranked AS (
        SELECT query_id, doc_id, CAST(score AS BIGINT) AS score,
          CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS INTEGER) AS rank
        FROM scored)
      SELECT query_id, rank, doc_id, score
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank""")),

    // r10's hybrid RRF with the LEXICAL leg served from the STORED
    // index (the r04/r08 amortization applied to hybrid retrieval): the
    // BM25 leg reads postings/doclens off the built-then-grown index —
    // no corpus text touched on that leg — while the embedding leg and
    // the integer fusion are unchanged. The oracle is r10's VERBATIM:
    // the serving path changed, the fused ranking must not (the c10
    // discipline; stored ≡ live BM25 parity is RetrievalIndexSpec's).
    ("r11_hybrid_rrf_served", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val qterms = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("qpos", "term")))
        .filter(col("qpos") < 5)
        .select(col("query_id"), col("term")).distinct()
      val textLeg = bm25TopK(load(s, builtIndex(s, d)), qterms, k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val vecLeg = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 97 === 0), emb, 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      Retrieval.rrfFuse(Seq(textLeg, vecLeg), k = 10)
        .orderBy(col("query_id"), col("rank"))
    },
    Some(Retrieval.hybridRrfOracleSql)),

    // r11's 100 TB twin: BOTH legs served from stored indexes — lexical
    // from the RetrievalIndex, vector from the persistent IVFPQ
    // AnnIndex (s12's machinery: list-pruned probes, norm-aware ADC,
    // exact re-rank). The vector leg is APPROXIMATE, so this is
    // rows-only with a spec gate (the t40/t41 scale-twin discipline):
    // RetrievalIndexSpec pins per-query fused-top-10 overlap with the
    // exact r10 form plus determinism. The exact forms (r10/r11) stay
    // the oracle anchors; this is the shape a 100 TB corpus actually
    // serves.
    ("r12_hybrid_rrf_ann", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val qterms = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("qpos", "term")))
        .filter(col("qpos") < 5)
        .select(col("query_id"), col("term")).distinct()
      val textLeg = bm25TopK(load(s, builtIndex(s, d)), qterms, k = 10)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val annDir = IxScratch.cached(
          "r12:" + IxScratch.fingerprint(d, "embeddings.parquet"),
          "graft_r12_ix") { p =>
        AnnIndex.build(emb, p)
      }
      val vecLeg = AnnIndex.topK(AnnIndex.load(s, annDir),
          emb.filter(col("vec_id") % 97 === 0), emb, 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      Retrieval.rrfFuse(Seq(textLeg, vecLeg), k = 10)
        .orderBy(col("query_id"), col("rank"))
    }, None)
  )
}
