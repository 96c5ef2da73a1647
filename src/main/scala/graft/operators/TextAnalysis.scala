package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json north-star): token counting, quality scoring, document
  * fingerprinting, language-ID. All row-local (no shuffle except final
  * ordering) and codegen-friendly — at 100 TB these run as a single map
  * stage over the corpus.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish lexical pieces: word runs or single non-space symbols. */
  def lexPieces(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0))

  private val Stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Quality features: lengths, token stats, stopword/punct ratios —
    * exact-arithmetic so the oracle hash-matches. The stopword count is
    * the native [[graft.functions.MarkerCount]] expression: the HOF form
    * (`filter` + `isInCollection`) evaluates interpreted, outside
    * whole-stage codegen, on what is a plain map stage over the full
    * corpus at 100 TB. */
  def qualityColumns(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val nTok = size(toks).cast(DoubleType)
    val stopHits = graft.functions.GraftFunctions
      .marker_count(toks, Stopwords, lowercase = true)
    val punct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    Seq(
      length(text).as("n_chars"),
      size(toks).as("n_tokens"),
      (length(text).cast(DoubleType) / nTok).as("avg_token_len"),
      (stopHits.cast(DoubleType) / nTok).as("stopword_ratio"),
      (punct.cast(DoubleType) / length(text).cast(DoubleType)).as("punct_ratio"))
  }

  /** Normalized-document fingerprint: md5 of lowercase
    * whitespace-collapsed text (exact-dup key), plus a winnowing-style
    * min-hash over word 3-grams (robust to reordering of distant
    * content). Both deterministic across engines.
    */
  def fingerprintColumns(text: Column): Seq[Column] = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    Seq(md5(norm).as("doc_md5"))
  }

  /** Language-ID by marker-token scoring: per language a small set of
    * high-frequency function words; the document is classified to the
    * highest-scoring language (ties → lexicographically-last language,
    * the natural struct-max order in both Spark and DuckDB), no hits →
    * "und". A pragmatic n-gram-profile stand-in that stays row-local
    * (broadcastable marker table, no shuffle).
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "que", "de", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    // per-language marker scoring via the native MarkerCount expression
    // (not filter+isInCollection HOFs) — langid stays in codegen
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(graft.functions.GraftFunctions.marker_count(toks, markers).as("score"),
        lit(lang).as("lang"))
    }
    // struct max = argmax by (score, lang)
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Trained language-ID — the t19 classifier shape instead of marker
    * counting (whose known weakness is short/mixed documents: a doc
    * with no marker hits or one stray "the" misroutes). Per-language
    * hashed naive-Bayes unigram models over `buckets` md5 buckets,
    * trained on the corpus's own labels: weight(ℓ, b) = the Q30-
    * quantized smoothed probability floor((count+1)/(totalℓ+buckets)
    * ·2^30) — one correctly-rounded double op per weight, so the
    * TRAINED MODEL is engine-bit-stable (the t19/t25 fixed-point
    * discipline) and per-doc scores are integer sums. Prediction =
    * argmax language of the score sum (lexicographic tie-break),
    * 'und' for token-free documents.
    *
    * Scale shape: ONE token explode collapses (partial aggregation
    * map-side) into the compressed (doc, lang, bucket, n) profile,
    * which is eagerly checkpointed (numbers-only columns — far smaller
    * than the text it summarizes, and auto-GC'd unlike a persist);
    * model counts and the per-doc scoring profile are both cheap
    * re-aggregations of that frame, so the corpus text is scanned and
    * tokenized exactly once and the token table crosses exactly one
    * exchange. The model is languages×buckets — tiny — and rides a
    * broadcast join; the per-doc argmax window partitions BY doc_id
    * (languages-many rows each, never a global window). */
  /** The per-(document, language) score table behind [[langIdModel]]
    * and [[langIdMargin]]: one row per (doc_id, model_lang) with the
    * exact Q30 integer score sum. */
  def langIdScores(docs: DataFrame, buckets: Int = 2048): DataFrame = {
    val Q = 1073741824L // 2^30
    val spark = docs.sparkSession
    val profile = docs.select(col("doc_id"), col("lang"),
        explode(tokens(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val counts = profile.groupBy(col("lang"), col("bucket"))
      .agg(sum(col("n")).as("c"))
    val totals = counts.groupBy(col("lang")).agg(sum(col("c")).as("tot"))
      .select(col("lang").as("model_lang"), col("tot"))
    // densify so every (language, bucket) has a weight — the smoothed
    // floor for unseen buckets is part of the model, not a join miss
    val allBuckets = spark.range(buckets).select(col("id").as("bucket"))
    val dense = totals.crossJoin(allBuckets)
      .join(counts.select(col("lang").as("model_lang"), col("bucket"), col("c")),
        Seq("model_lang", "bucket"), "left")
      .select(col("model_lang"), col("bucket"),
        floor((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("tot") + buckets).cast("double") * Q).cast("long").as("wq"))
    // the scoring side is the same checkpointed profile re-keyed to
    // (doc, bucket) — the ×languages fan-out expands the compressed
    // per-doc bucket profile, not token occurrences
    val docBuckets = profile.groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("n")).as("n"))
    docBuckets.join(broadcast(dense), Seq("bucket"))
      .groupBy(col("doc_id"), col("model_lang"))
      .agg(sum(col("n")).as("n_tokens"), sum(col("wq") * col("n")).as("sum_wq"))
  }

  def langIdModel(docs: DataFrame, buckets: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scores = langIdScores(docs, buckets)
    val best = scores.withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("sum_wq").desc, col("model_lang"))))
      .filter(col("rk") === 1)
    docs.select(col("doc_id"), col("lang").as("label"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("label"),
        coalesce(col("model_lang"), lit("und")).as("pred_lang"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_wq"), lit(0L)).as("sum_wq"))
  }

  /** CCNet-style confidence for the trained langid: the Q30 score gap
    * between the winning and runner-up languages — the gate real
    * pipelines threshold before trusting a prediction (a short or
    * code-switched document wins by a sliver; a clean monolingual one
    * by a mile). Exact integer arithmetic end to end, so the margin —
    * and transitively both models — is oracle-comparable. Same plan
    * shape as [[langIdModel]] plus one conditional aggregation pivoting
    * winner and runner-up out of the ranked frame in a single pass —
    * no self-join, no cached intermediate (the groupBy rides the
    * window's doc_id partitioning, so no extra exchange either). */
  def langIdMargin(docs: DataFrame, buckets: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = langIdScores(docs, buckets)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("sum_wq").desc, col("model_lang"))))
      .filter(col("rk") <= 2)
    ranked.groupBy(col("doc_id")).agg(
      max(when(col("rk") === 1, col("model_lang"))).as("pred_lang"),
      coalesce(max(when(col("rk") === 2, col("model_lang"))), lit(""))
        .as("second_lang"),
      max(when(col("rk") === 1, col("n_tokens"))).as("n_tokens"),
      (max(when(col("rk") === 1, col("sum_wq"))) -
        coalesce(max(when(col("rk") === 2, col("sum_wq"))), lit(0L)))
        .as("margin_q30"))
  }

  /** [[langIdMargin]] materialized ONCE per dataset fingerprint (the
    * c12/t50 IxScratch discipline): the margin frame is a per-dataset
    * artifact — t43 and t48 both need it, and each live derivation
    * rides the full 2048-bucket model build. The first caller builds
    * and writes it; every later read is one parquet scan. All columns
    * are long/string, so the round-trip is bit-exact and the oracle
    * gates are unchanged. */
  private def langIdMarginCached(s: SparkSession, d: String): DataFrame = {
    val dir = IxScratch.cached(
        IxScratch.fingerprint(d) + "|langid-margin", "graft-langid-") { p =>
      langIdMargin(Tables.documents(s, d))
        .coalesce(1)
        .write.parquet(p + "/margin.parquet")
    }
    s.read.parquet(dir + "/margin.parquet")
  }

  /** (doc_id, w1, w2) bigram rows — `slice` + `arrays_zip` (codegen'd
    * collection ops, no HOF lambda) then one explode. */
  def bigrams(docs: DataFrame): DataFrame = {
    val toks = tokens(lower(col("text")))
    docs.select(col("doc_id"),
        explode(arrays_zip(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))).as("bg"))
      .select(col("doc_id"), col("bg.0").as("w1"), col("bg.1").as("w2"))
  }

  /** Bigram novelty profile against a reference-corpus model — the
    * language-model quality-filter shape of training-data pipelines,
    * count-based so it is fully deterministic (and oracle-gated, unlike
    * a float log-likelihood whose per-doc sum is partition-order
    * sensitive): each scored document reports how many of its bigram
    * transitions were never seen in the reference corpus, and how many
    * start from an out-of-vocabulary token. Gibberish scores
    * unseen_ratio → 1, reference-like text → 0.
    *
    * Scale: the model is vocabulary-bounded (|V|² worst case — tiny
    * next to the corpus) and broadcast into the scoring joins; the
    * corpus-side work is one bigram explode + one per-document
    * aggregation.
    */
  def bigramNovelty(score: DataFrame, train: DataFrame): DataFrame = {
    val sbg = bigrams(score)
    val model = bigrams(train).select(col("w1"), col("w2")).distinct()
      .withColumn("__seen", lit(1))
    val known = model.select(col("w1")).distinct().withColumn("__known", lit(1))
    sbg
      .join(broadcast(model), Seq("w1", "w2"), "left")
      .join(broadcast(known), Seq("w1"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        count_if(col("__seen").isNull).as("n_unseen"),
        count_if(col("__known").isNull).as("n_oov"))
      .withColumn("unseen_ratio",
        col("n_unseen").cast(DoubleType) / col("n_bigrams").cast(DoubleType))
      .orderBy(col("doc_id"))
  }

  /** The Gopher repetition signals (Rae et al. 2021, arXiv 2112.11446
    * Table A1): per document, the character fraction covered by the MOST
    * FREQUENT 2/3/4-gram and by DUPLICATED 5..10-grams, thresholded into
    * one repetitive/clean verdict at the paper's cutoffs (0.20/0.18/0.16
    * and 0.15 down to 0.10). Character mass is occurrences × gram length
    * over the whitespace-normalized doc length; overlapping occurrences
    * each count (documented divergence from the paper's span union —
    * deterministic, and mirrored exactly by the oracle). A most-frequent
    * gram that occurs only ONCE contributes zero: a singleton is not
    * repetition, and would otherwise flag every short document via its
    * whole-text 4-gram.
    *
    * Gram expansion is the non-distinct native [[graft.functions.WordGrams]]
    * (occurrence counts ARE the signal; a distinct list would erase it);
    * all nine n's ride ONE explode into one (doc, n, gram) aggregation.
    * Everything partitions by document — no corpus-wide state, so a
    * 100 TB corpus spreads by doc_id with per-doc-sized windows only.
    */
  /** Gopher quality rules (Rae et al. 2021 Table A1 — the QUALITY half;
    * the repetition half is [[gopherRepetition]]): word-count bounds,
    * mean word length, symbol-to-word ratio (`#` and `...`), bullet- and
    * ellipsis-line fractions, alphabetic-word fraction, and the
    * two-of-eight stop-word floor. First failing rule (in the paper's
    * order) names the verdict, `pass` otherwise. Everything is one
    * row-local projection (split + per-doc-bounded HOF filters + single
    * integer-ratio divisions), so the filter is a map stage at any
    * scale and every ratio is bit-stable across engines. */
  def gopherQuality(docs: DataFrame): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    docs.select(col("doc_id"), col("text"))
      .withColumn("tk", split(trim(col("text")), "\\s+"))
      .withColumn("ln", split(col("text"), "\n", -1))
      .withColumn("n_words", size(col("tk")).cast("long"))
      .withColumn("mean_word_len",
        length(regexp_replace(col("text"), "\\s+", "")).cast("double")
          / size(col("tk")).cast("double"))
      .withColumn("symbol_ratio",
        ((length(col("text")) - length(regexp_replace(col("text"), "#", "")))
          + size(regexp_extract_all(col("text"), lit("\\.\\.\\."), lit(0))))
          .cast("double") / size(col("tk")).cast("double"))
      .withColumn("frac_bullet",
        size(filter(col("ln"), l => l.rlike("^[-*]"))).cast("double")
          / size(col("ln")).cast("double"))
      .withColumn("frac_ellipsis",
        size(filter(col("ln"), l => l.rlike("\\.\\.\\.$"))).cast("double")
          / size(col("ln")).cast("double"))
      .withColumn("frac_alpha",
        size(filter(col("tk"), w => w.rlike("[A-Za-z]"))).cast("double")
          / size(col("tk")).cast("double"))
      .withColumn("n_stop",
        stops.map(sw => array_contains(col("tk"), sw).cast("long"))
          .reduce(_ + _))
      .withColumn("verdict",
        when(col("n_words") < 50 || col("n_words") > 100000, "word_count")
          .when(col("mean_word_len") < 3.0 || col("mean_word_len") > 10.0,
            "mean_word_len")
          .when(col("symbol_ratio") > 0.1, "symbol_ratio")
          .when(col("frac_bullet") > 0.9, "bullet_lines")
          .when(col("frac_ellipsis") > 0.3, "ellipsis_lines")
          .when(col("frac_alpha") < 0.8, "alpha_words")
          .when(col("n_stop") < 2, "stop_words")
          .otherwise("pass"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("symbol_ratio"), col("frac_bullet"), col("frac_ellipsis"),
        col("frac_alpha"), col("n_stop"), col("verdict"))
  }

  def gopherRepetition(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fns = graft.functions.GraftFunctions
    val ns = 2 to 10
    val base = docs.select(col("doc_id"), col("text"),
      length(regexp_replace(trim(col("text")), "\\s+", " "))
        .cast("long").as("L"))
    val g = base
      .select(col("doc_id"), col("L"), explode(array(ns.map(n =>
        struct(lit(n).as("n"),
          fns.word_grams(col("text"), n, distinct = false).as("gs"))): _*))
        .as("ng"))
      .select(col("doc_id"), col("L"), col("ng.n").as("n"),
        explode(col("ng.gs")).as("gram"))
    val c = g.groupBy(col("doc_id"), col("L"), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("doc_id"), col("n"))
      .orderBy(col("cnt").desc, col("gram").desc)
    val perN = c.withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"), col("n"))
      .agg(
        // a gram seen once is not repetition: the top-gram rule only
        // counts a most-frequent gram that actually recurs (otherwise a
        // short doc's single whole-text 4-gram would flag it at 1.0)
        max(when(col("rn") === 1 && col("cnt") > 1,
          col("cnt") * length(col("gram")).cast("long"))).as("topc"),
        sum(when(col("cnt") > 1,
          col("cnt") * length(col("gram")).cast("long")).otherwise(0L))
          .as("dupc"))
    val aggs =
      (2 to 4).map(n =>
        max(when(col("n") === n, col("topc"))).as(s"top${n}c")) ++
      (5 to 10).map(n =>
        max(when(col("n") === n, col("dupc"))).as(s"dup${n}c"))
    val m = perN.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    def frac(cn: String) =
      coalesce(col(cn), lit(0L)).cast("double") / col("L").cast("double")
    val thresholds = Seq(
      "top2c" -> 0.20, "top3c" -> 0.18, "top4c" -> 0.16,
      "dup5c" -> 0.15, "dup6c" -> 0.14, "dup7c" -> 0.13,
      "dup8c" -> 0.12, "dup9c" -> 0.11, "dup10c" -> 0.10)
    base.select(col("doc_id"), col("L"))
      .join(m, Seq("doc_id"), "left")
      .select(Seq(col("doc_id"), col("L").as("norm_chars")) ++
        Seq("top2c", "top3c", "top4c").map(cn =>
          frac(cn).as(cn.dropRight(1) + "_frac")) ++
        (5 to 10).map(n => frac(s"dup${n}c").as(s"dup${n}_frac")) ++
        Seq(thresholds.map { case (cn, t) => frac(cn) > t }
          .reduce(_ || _).as("repetitive")): _*)
  }

  /** Per-document n-gram novelty: of the doc's distinct word-`n`-grams
    * (the [[graft.functions.WordGrams]] shingles every dedup operator
    * uses, whole-text fallback included), the count and fraction that
    * occur in no OTHER document. Novelty 1.0 = fully original; low
    * novelty flags boilerplate/copy mass before any dedup decision is
    * taken.
    *
    * Shape: one shingle explode (per-doc distinct, so gram df = plain
    * count), a census aggregation (partial map-side combine shrinks hot
    * grams), and one gram-keyed join back — the d05/d10 census
    * discipline. `hashGrams` sends xxhash64 longs through the
    * census/join instead of gram strings: same output (spec-pinned), a
    * fraction of the shuffle bytes — the 100 TB default. */
  def novelty(docs: DataFrame, n: Int = 8,
      hashGrams: Boolean = true): DataFrame = {
    val fns = graft.functions.GraftFunctions
    val g0 = docs.select(col("doc_id"),
      explode(fns.word_grams(col("text"), n)).as("gram"))
    val grams =
      (if (hashGrams) g0.withColumn("gram", xxhash64(col("gram"))) else g0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val census = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    grams.join(census, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, lit(1L)).otherwise(lit(0L))).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast(DoubleType) / col("n_grams"))
      .orderBy(col("doc_id"))
  }

  type Q = (SparkSession, String) => DataFrame

  /** Bounded common-abbreviation masking for [[sentenceSplit]] (r11
    * VERDICT item 8): "Dr. Smith" must stay one sentence, and without
    * lookbehind (absent from RE2, so unusable in the shared dialect)
    * the only sound move is to MASK abbreviation dots with a sentinel
    * (U+0001 — never in text) before splitting and restore after.
    * Three linear passes: the two dotted latinisms, then one
    * alternation of single-dot titles/markers. The list is a bounded
    * CONTRACT, not NLP: "etc." genuinely ending a sentence will glue to
    * the next one — documented, like the C4 line rules' scope. */
  def maskAbbrev(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, "\\be\\.g\\.", "e\u0001g\u0001"),
        "\\bi\\.e\\.", "i\u0001e\u0001"),
      "\\b(Dr|Mr|Mrs|Ms|Prof|St|Jr|Sr|Fig|Inc|Ltd|No|vs|etc)\\.", "$1\u0001")

  /** Restore masked abbreviation dots (codegen'd 1:1 translate —
    * lengths are unchanged, so char accounting is mask-invariant). */
  def unmaskAbbrev(piece: Column): Column = translate(piece, "\u0001", ".")

  /** Terminal-punctuation sentence segmentation — the unit the packing
    * and quality stages below paragraphs/lines need (sequence packing
    * at sentence boundaries, per-sentence quality stats): maximal runs
    * ending in `.!?`+ plus the unterminated tail, whitespace-only
    * pieces dropped. Deliberately rule-based and dialect-shared (both
    * regex calls exist identically in Java and RE2 — no lookbehind), so
    * the split is engine-reproducible; abbreviation handling lives in
    * [[maskAbbrev]]/[[unmaskAbbrev]] — this function is the pure
    * terminal-punct rule. */
  def sentenceSplit(text: Column): Column = {
    val withT = regexp_extract_all(text, lit("[^.!?]*[.!?]+"), lit(0))
    // only the tail can be whitespace-only (every matched piece carries
    // a terminal char, which trim keeps), so the "drop blank pieces"
    // rule is one guard on the tail — no interpreted array-filter HOF.
    // The tail comes from a SPLIT, not `[^.!?]+$`: an end-anchored
    // negated run backtracks quadratically (measured ~400 µs per
    // 300-char row — every non-terminal start position scans to the
    // next terminal and unwinds char by char); the split is linear
    val tail = element_at(split(text, "[.!?]+", -1), -1)
    concat(withT,
      when(trim(tail) =!= "", array(tail))
        .otherwise(array().cast("array<string>")))
  }

  /** The langid-model CTE chain (hashed naive-Bayes: token buckets →
    * per-language counts → Laplace-smoothed Q30 weights → per-doc
    * scores → ranked), shared VERBATIM by the t04, t43, and t48
    * oracles — any change to the model constants (2048 buckets, +1
    * smoothing, Q30 scale, the (sum_wq DESC, model_lang) tie-break)
    * now edits exactly one string (the r10/r11 discipline). Ends with
    * `rnk` (rk = 1 winner, rk = 2 runner-up); the model total is
    * `mtot` so composers may define their own `tot`. */
  private val langIdOracleCtes: String = """tok AS (
        SELECT doc_id, lang,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tk AS (
        SELECT doc_id, lang,
          CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT) % 2048 AS bucket
        FROM tok WHERE token <> ''),
      cnt AS (
        SELECT lang AS model_lang, bucket, count(*) AS c
        FROM tk GROUP BY 1, 2),
      mtot AS (SELECT model_lang, sum(c) AS tot FROM cnt GROUP BY 1),
      dense AS (
        SELECT t.model_lang, r.range AS bucket,
          CAST(floor(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
            / CAST(t.tot + 2048 AS DOUBLE) * 1073741824) AS BIGINT) AS wq
        FROM mtot t CROSS JOIN range(2048) r
        LEFT JOIN cnt c ON c.model_lang = t.model_lang AND c.bucket = r.range),
      sc AS (
        SELECT tk.doc_id, d.model_lang, count(*) AS n_tokens,
          CAST(sum(d.wq) AS BIGINT) AS sum_wq
        FROM tk JOIN dense d ON tk.bucket = d.bucket
        GROUP BY 1, 2),
      rnk AS (
        SELECT doc_id, model_lang, n_tokens, sum_wq,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY sum_wq DESC, model_lang) AS rk
        FROM sc)"""

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Sentence segmentation over punctuation-augmented documents (the
    // synthetic corpus is unpunctuated word soup, so the plant wraps
    // each doc with known sentence structure — the wrapper now plants
    // "Dr." and "e.g." which must NOT split): per-sentence rows with
    // exact char/terminal accounting, oracle-recomputed by DuckDB in
    // the shared regex dialect through the same mask → split → restore
    // walk (hand boundary cases in CurateSpec guard the shared-formula
    // blind spot).
    ("t38_sentences", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          maskAbbrev(concat(lit("Intro by Dr. Smith e.g. here. "), col("text"),
            lit("! Second? trailing bit"))).as("t"))
        .select(col("doc_id"),
          posexplode(sentenceSplit(col("t"))).as(Seq("sent_idx", "raw")))
        .select(col("doc_id"), col("sent_idx"),
          trim(unmaskAbbrev(col("raw"))).as("sentence"),
          length(trim(col("raw"))).cast("long").as("n_chars"))
        .orderBy(col("doc_id"), col("sent_idx"))
    },
    Some("""WITH aug AS (
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(
            'Intro by Dr. Smith e.g. here. ' || text || '! Second? trailing bit',
            '\be\.g\.', 'e' || chr(1) || 'g' || chr(1), 'g'),
            '\bi\.e\.', 'i' || chr(1) || 'e' || chr(1), 'g'),
            '\b(Dr|Mr|Mrs|Ms|Prof|St|Jr|Sr|Fig|Inc|Ltd|No|vs|etc)\.',
            '\1' || chr(1), 'g') AS t
        FROM documents),
      arrs AS (
        SELECT doc_id,
          list_concat(
            regexp_extract_all(t, '[^.!?]*[.!?]+'),
            CASE WHEN trim(string_split_regex(t, '[.!?]+')[
                len(string_split_regex(t, '[.!?]+'))]) <> ''
              THEN [string_split_regex(t, '[.!?]+')[
                len(string_split_regex(t, '[.!?]+'))]]
              ELSE [] END) AS arr
        FROM aug),
      e AS (
        SELECT doc_id, unnest(arr) AS raw,
          generate_subscripts(arr, 1) - 1 AS sent_idx
        FROM arrs)
      SELECT doc_id, CAST(sent_idx AS INTEGER) AS sent_idx,
        trim(replace(raw, chr(1), '.')) AS sentence,
        CAST(strlen(trim(raw)) AS BIGINT) AS n_chars
      FROM e ORDER BY doc_id, sent_idx""")),

    // token counting: whitespace tokens + BPE-ish lexical pieces
    ("t01_token_count", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(tokens(col("text"))).as("n_tokens"),
          size(lexPieces(col("text"))).as("n_pieces"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
      CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS INTEGER) AS n_pieces
      FROM documents ORDER BY doc_id""")),

    // quality scoring
    ("t02_quality", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(col("doc_id") +: qualityColumns(col("text")): _*)
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      CAST(length(text) AS INTEGER) AS n_chars,
      CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
      CAST(length(text) AS DOUBLE) / len(string_split_regex(trim(text), '\s+')) AS avg_token_len,
      CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
           t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], lower(t)))) AS DOUBLE)
        / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio,
      CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        / length(text) AS punct_ratio
      FROM documents ORDER BY doc_id""")),

    // document fingerprint (normalized md5)
    ("t03_fingerprint", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(col("doc_id") +: fingerprintColumns(col("text")): _*)
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS doc_md5
      FROM documents ORDER BY doc_id""")),

    // per-source top terms after stopword removal — the tf summary shape
    // of corpus profiling (explode → filter → grouped count → windowed
    // top-k per group)
    ("t05_top_terms", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n").desc, col("term").asc)
      Tables.documents(s, d)
        .select(col("source"), explode(tokens(lower(col("text")))).as("term"))
        .filter(col("term") =!= "" && !col("term").isInCollection(Stopwords))
        .groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy(col("source"), col("rank"))
    },
    Some("""WITH terms AS (
        SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents),
      counts AS (
        SELECT source, term, count(*) AS n FROM terms
        WHERE term <> '' AND NOT list_contains(
          ['the','a','an','and','or','of','to','in','is','it'], term)
        GROUP BY source, term)
      SELECT source, term, n,
        CAST(row_number() OVER (PARTITION BY source ORDER BY n DESC, term ASC)
             AS INTEGER) AS rank
      FROM counts
      QUALIFY rank <= 5
      ORDER BY source, rank""")),

    // repetition profile (Gopher-style quality signals, word-based):
    // distinct-token ratio and the most-frequent token's share — the
    // explode → two-level-aggregation shape; partial aggregation keeps
    // the shuffle at (doc, token) cardinality
    ("t06_repetition", (s: SparkSession, d: String) => {
      val counts = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("n"))
      counts.groupBy(col("doc_id"))
        .agg(sum(col("n")).cast("int").as("n_tokens"),
          (count(lit(1)).cast(DoubleType) / sum(col("n")).cast(DoubleType))
            .as("uniq_ratio"),
          (max(col("n")).cast(DoubleType) / sum(col("n")).cast(DoubleType))
            .as("top_share"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents),
      counts AS (SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY doc_id, tok)
      SELECT doc_id, CAST(sum(n) AS INTEGER) AS n_tokens,
        CAST(count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS uniq_ratio,
        CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS top_share
      FROM counts GROUP BY doc_id ORDER BY doc_id""")),

    // longest consecutive same-token run per document (stutter
    // detection): posexplode → gaps-and-islands over (doc, pos) — the
    // window chain partitions by doc_id, so a 100 TB corpus spreads by
    // document with no global ordering anywhere
    ("t07_token_runs", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      val marked = toks.withColumn("brk",
        when(lag(col("tok"), 1).over(w).isNull ||
          lag(col("tok"), 1).over(w) =!= col("tok"), 1).otherwise(0))
      marked.withColumn("grp", sum(col("brk")).over(w))
        .groupBy(col("doc_id"), col("grp"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("doc_id"))
        .agg(max(col("run_len")).cast("int").as("max_run"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS arr FROM documents),
      toks AS (
        SELECT doc_id, unnest(arr) AS tok, unnest(range(1, len(arr) + 1)) AS pos
        FROM base),
      marked AS (
        SELECT doc_id, tok, pos,
          CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                 IS DISTINCT FROM tok THEN 1 ELSE 0 END AS brk
        FROM toks),
      islands AS (
        SELECT doc_id, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM marked),
      runs AS (SELECT doc_id, grp, count(*) AS run_len FROM islands
               GROUP BY doc_id, grp)
      SELECT doc_id, CAST(max(run_len) AS INTEGER) AS max_run
      FROM runs GROUP BY doc_id ORDER BY doc_id""")),

    // The Gopher repetition-rule set — see [[gopherRepetition]]; ties
    // break (count DESC, gram DESC) under row_number in both dialects.
    ("t21_gopher_ngrams", (s: SparkSession, d: String) =>
      gopherRepetition(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some("""WITH base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
          CAST(length(regexp_replace(trim(text), '\s+', ' ', 'g')) AS BIGINT) AS L
        FROM documents),
      g AS (
        SELECT doc_id, n, unnest(CASE WHEN len(tk) >= n
            THEN list_transform(range(0, len(tk) - n + 1),
              i -> array_to_string(tk[i+1:i+n], ' '))
            ELSE [] END) AS gram
        FROM base, unnest([2,3,4,5,6,7,8,9,10]) AS t(n)),
      c AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3),
      ranked AS (SELECT doc_id, n, gram, cnt,
          row_number() OVER (PARTITION BY doc_id, n
            ORDER BY cnt DESC, gram DESC) AS rn
        FROM c),
      pn AS (SELECT doc_id, n,
          max(CASE WHEN rn = 1 AND cnt > 1 THEN cnt * length(gram) END) AS topc,
          CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END)
            AS BIGINT) AS dupc
        FROM ranked GROUP BY 1, 2),
      m AS (SELECT doc_id,
          max(CASE WHEN n = 2 THEN topc END) AS top2c,
          max(CASE WHEN n = 3 THEN topc END) AS top3c,
          max(CASE WHEN n = 4 THEN topc END) AS top4c,
          max(CASE WHEN n = 5 THEN dupc END) AS dup5c,
          max(CASE WHEN n = 6 THEN dupc END) AS dup6c,
          max(CASE WHEN n = 7 THEN dupc END) AS dup7c,
          max(CASE WHEN n = 8 THEN dupc END) AS dup8c,
          max(CASE WHEN n = 9 THEN dupc END) AS dup9c,
          max(CASE WHEN n = 10 THEN dupc END) AS dup10c
        FROM pn GROUP BY doc_id)
      SELECT b.doc_id, b.L AS norm_chars,
        CAST(coalesce(top2c, 0) AS DOUBLE) / b.L AS top2_frac,
        CAST(coalesce(top3c, 0) AS DOUBLE) / b.L AS top3_frac,
        CAST(coalesce(top4c, 0) AS DOUBLE) / b.L AS top4_frac,
        CAST(coalesce(dup5c, 0) AS DOUBLE) / b.L AS dup5_frac,
        CAST(coalesce(dup6c, 0) AS DOUBLE) / b.L AS dup6_frac,
        CAST(coalesce(dup7c, 0) AS DOUBLE) / b.L AS dup7_frac,
        CAST(coalesce(dup8c, 0) AS DOUBLE) / b.L AS dup8_frac,
        CAST(coalesce(dup9c, 0) AS DOUBLE) / b.L AS dup9_frac,
        CAST(coalesce(dup10c, 0) AS DOUBLE) / b.L AS dup10_frac,
        (CAST(coalesce(top2c, 0) AS DOUBLE) / b.L > 0.20 OR
         CAST(coalesce(top3c, 0) AS DOUBLE) / b.L > 0.18 OR
         CAST(coalesce(top4c, 0) AS DOUBLE) / b.L > 0.16 OR
         CAST(coalesce(dup5c, 0) AS DOUBLE) / b.L > 0.15 OR
         CAST(coalesce(dup6c, 0) AS DOUBLE) / b.L > 0.14 OR
         CAST(coalesce(dup7c, 0) AS DOUBLE) / b.L > 0.13 OR
         CAST(coalesce(dup8c, 0) AS DOUBLE) / b.L > 0.12 OR
         CAST(coalesce(dup9c, 0) AS DOUBLE) / b.L > 0.11 OR
         CAST(coalesce(dup10c, 0) AS DOUBLE) / b.L > 0.10) AS repetitive
      FROM base b LEFT JOIN m ON b.doc_id = m.doc_id ORDER BY b.doc_id""")),

    // winnowing fingerprints (MOSS-style rolling hash + sliding-window
    // minimum, the literal "rolling hash" fingerprint): row-local native
    // expression; rows-only (not SQL-expressible) — the selection
    // guarantee is spec-gated in MarkerCountSpec's sibling suite
    ("t08_winnow", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(graft.functions.GraftFunctions.winnow_fingerprint(
            col("text"), 8, 16)).as("n_prints"))
        .orderBy(col("doc_id"))
    }, None),

    // t08's ORACLE TWIN (the d13 family treatment applied to
    // winnowing): the SAME winnow selection — rightmost window minimum,
    // emit when the argmin index moves — in closed form (slice /
    // array_min / reversed array_position / consecutive-dedup) over an
    // md5-derived k-gram hash family both engines compute
    // bit-identically, so the selection ALGORITHM itself sits under a
    // full DuckDB oracle; t08/d05 keep the rolling-hash+splitmix
    // family, whose per-character wrap-around fold is not reasonably
    // SQL-replayable (the closed form ≡ deque-algorithm equivalence is
    // additionally spec-pinned against WinnowEval on shared hashes).
    // Text capped at 200 chars: the selection math is length-invariant
    // and the cap keeps the interpreted HOF chain gate-priced.
    ("t51_winnow_md5", (s: SparkSession, d: String) => {
      val k = 8; val w = 16
      val t = substring(col("text"), 1, 200)
      val hs = when(length(t) >= k,
          transform(sequence(lit(1), length(t) - k + 1), p =>
            conv(substring(md5(t.substr(p, lit(k))), 1, 15), 16, 10)
              .cast("long")))
        .otherwise(array().cast("array<bigint>"))
      Tables.documents(s, d)
        .select(col("doc_id"), hs.as("hs"))
        .select(col("doc_id"), col("hs"),
          least(lit(w), size(col("hs"))).as("win"))
        .select(col("doc_id"), col("hs"),
          when(size(col("hs")) > 0,
            transform(sequence(lit(0), size(col("hs")) - col("win")), i => {
              val sl = slice(col("hs"), i + 1, col("win"))
              i + col("win") - array_position(reverse(sl), array_min(sl)) + 1
            }))
          .otherwise(array().cast("array<bigint>")).as("ga"))
        .select(col("doc_id"), col("hs"), col("ga"),
          when(size(col("ga")) > 0,
            filter(sequence(lit(0), size(col("ga")) - 1), i =>
              (i === 0) ||
                element_at(col("ga"), i + 1) =!= element_at(col("ga"), i)))
          .otherwise(array().cast("array<int>")).as("si"))
        .select(col("doc_id"),
          transform(col("si"), i =>
            element_at(col("hs"),
              element_at(col("ga"), i + 1).cast("int"))).as("fps"))
        .select(col("doc_id"),
          size(col("fps")).as("n_prints"),
          size(array_distinct(col("fps"))).as("n_distinct"),
          array_join(col("fps").cast("array<string>"), "-").as("prints"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
        SELECT doc_id, substr(text, 1, 200) AS t FROM documents),
      h AS (
        SELECT doc_id,
          CASE WHEN length(t) >= 8 THEN
            list_transform(range(1, length(t) - 8 + 2),
              p -> CAST(concat('0x',
                substr(md5(substr(t, CAST(p AS INTEGER), 8)), 1, 15))
                AS BIGINT))
          ELSE CAST([] AS BIGINT[]) END AS hs
        FROM base),
      g AS (SELECT doc_id, hs, least(16, len(hs)) AS win FROM h),
      ga AS (
        SELECT doc_id, hs,
          CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
          ELSE list_transform(range(0, len(hs) - win + 1),
            i -> i + win
              - list_position(list_reverse(hs[CAST(i+1 AS INTEGER):CAST(i+win AS INTEGER)]),
                  list_min(hs[CAST(i+1 AS INTEGER):CAST(i+win AS INTEGER)]))
              + 1)
          END AS ga
        FROM g),
      sels AS (
        SELECT doc_id, hs, ga,
          CASE WHEN len(ga) = 0 THEN CAST([] AS BIGINT[])
          ELSE list_filter(range(0, len(ga)),
            i -> i = 0 OR ga[CAST(i+1 AS INTEGER)] <> ga[CAST(i AS INTEGER)])
          END AS si
        FROM ga),
      fp AS (
        SELECT doc_id,
          list_transform(si, i ->
            hs[CAST(ga[CAST(i+1 AS INTEGER)] AS INTEGER)]) AS fps
        FROM sels)
      SELECT doc_id,
        CAST(len(fps) AS INTEGER) AS n_prints,
        CAST(len(list_distinct(fps)) AS INTEGER) AS n_distinct,
        array_to_string(list_transform(fps, x -> CAST(x AS VARCHAR)), '-')
          AS prints
      FROM fp ORDER BY doc_id""")),

    // bigram-novelty quality score (LM-filter shape, count-based):
    // odd doc_ids scored against the model of even doc_ids
    ("t09_bigram_quality", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      bigramNovelty(docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0))
    },
    Some("""WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS arr
        FROM documents),
      bg AS (
        SELECT doc_id,
          unnest(arr[1:len(arr) - 1]) AS w1,
          unnest(arr[2:len(arr)]) AS w2
        FROM toks),
      model AS (SELECT DISTINCT w1, w2 FROM bg WHERE doc_id % 2 = 0),
      known AS (SELECT DISTINCT w1 FROM model)
      SELECT b.doc_id, count(*) AS n_bigrams,
        count(*) FILTER (m.w1 IS NULL) AS n_unseen,
        count(*) FILTER (k.w1 IS NULL) AS n_oov,
        CAST(count(*) FILTER (m.w1 IS NULL) AS DOUBLE) / count(*) AS unseen_ratio
      FROM bg b
      LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
      LEFT JOIN known k ON b.w1 = k.w1
      WHERE b.doc_id % 2 = 1
      GROUP BY b.doc_id ORDER BY b.doc_id""")),

    // language-ID, upgraded from marker counting to the t19 classifier
    // shape (r11 VERDICT item 6): per-language hashed naive-Bayes
    // models trained on the corpus's labels, argmax prediction.
    // Oracle-gated bit-for-bit INCLUDING the trained models (the
    // winning sum_wq is a pure function of every weight) — see
    // langIdModel. The marker heuristic survives as the langId column
    // function (MarkerCountSpec).
    ("t04_langid", (s: SparkSession, d: String) =>
      langIdModel(Tables.documents(s, d)).orderBy(col("doc_id")),
    Some("WITH " + langIdOracleCtes + """
      SELECT docs.doc_id, docs.lang AS label,
        COALESCE(b.model_lang, 'und') AS pred_lang,
        CAST(COALESCE(b.n_tokens, 0) AS BIGINT) AS n_tokens,
        CAST(COALESCE(b.sum_wq, 0) AS BIGINT) AS sum_wq
      FROM documents docs
      LEFT JOIN (SELECT * FROM rnk WHERE rk = 1) b ON docs.doc_id = b.doc_id
      ORDER BY docs.doc_id""")),

    // Langid confidence margins — the CCNet-style gate on top of t04:
    // the exact Q30 gap between winner and runner-up, oracle-gated
    // (integer sums of the same bit-stable model weights). Token-free
    // docs have no score rows and are absent by contract on both sides.
    // Served from the per-dataset cached frame (langIdMarginCached —
    // built by the live langIdMargin derivation on first touch); the
    // oracle still replays the full model+margin computation, so the
    // cached artifact is hash-gated against the live math at both SFs.
    ("t43_langid_margin", (s: SparkSession, d: String) =>
      langIdMarginCached(s, d).orderBy(col("doc_id")),
    Some("WITH " + langIdOracleCtes + """
      SELECT t.doc_id, t.model_lang AS pred_lang,
        COALESCE(s.model_lang, '') AS second_lang,
        CAST(t.n_tokens AS BIGINT) AS n_tokens,
        CAST(t.sum_wq - COALESCE(s.sum_wq, 0) AS BIGINT) AS margin_q30
      FROM (SELECT * FROM rnk WHERE rk = 1) t
      LEFT JOIN (SELECT * FROM rnk WHERE rk = 2) s ON t.doc_id = s.doc_id
      ORDER BY t.doc_id""")),

    // Gopher Table-A1 quality rules over a planted view: most docs get
    // a stop-word tail (so the two-of-eight floor differentiates), and
    // dedicated schedules trip each remaining rule — 10 bullet lines
    // (%11), a hash-packed token (%17), thirty numeric tokens (%19),
    // and ellipsis-terminated lines (%13). First-hit-wins verdicts,
    // ratios all single integer divisions (engine-bit-stable).
    ("t29_gopher_quality", (s: SparkSession, d: String) => {
      val nums = (1 to 30).map(_ * 11).mkString(" ")
      val planted = Tables.documents(s, d).withColumn("text", concat(
        when(col("doc_id") % 11 === 0,
          lit(Array.fill(10)("- buy").mkString("", "\n", "\n")))
          .otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 4 =!= 0, lit(" of that be with"))
          .otherwise(lit("")),
        when(col("doc_id") % 17 === 0, lit(" x####################"))
          .otherwise(lit("")),
        when(col("doc_id") % 19 === 0, lit(" " + nums)).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          lit("\nwait for it...\nand more...\nstill more..."))
          .otherwise(lit(""))))
      gopherQuality(planted).orderBy(col("doc_id"))
    },
    Some("""WITH planted AS (
        SELECT doc_id,
          CASE WHEN doc_id % 11 = 0
               THEN repeat('- buy' || chr(10), 10) ELSE '' END ||
          text ||
          CASE WHEN doc_id % 4 <> 0 THEN ' of that be with' ELSE '' END ||
          CASE WHEN doc_id % 17 = 0
               THEN ' x####################' ELSE '' END ||
          CASE WHEN doc_id % 19 = 0 THEN ' 11 22 33 44 55 66 77 88 99 110 121 132 143 154 165 176 187 198 209 220 231 242 253 264 275 286 297 308 319 330'
               ELSE '' END ||
          CASE WHEN doc_id % 13 = 0
               THEN chr(10) || 'wait for it...' || chr(10) ||
                    'and more...' || chr(10) || 'still more...'
               ELSE '' END AS ptext
        FROM documents),
      f AS (
        SELECT doc_id,
          string_split_regex(trim(ptext), '\s+') AS tk,
          string_split(ptext, chr(10)) AS ln,
          ptext
        FROM planted),
      g AS (
        SELECT doc_id,
          CAST(len(tk) AS BIGINT) AS n_words,
          CAST(length(regexp_replace(ptext, '\s+', '', 'g')) AS DOUBLE)
            / CAST(len(tk) AS DOUBLE) AS mean_word_len,
          CAST(length(ptext) - length(regexp_replace(ptext, '#', '', 'g'))
               + len(regexp_extract_all(ptext, '\.\.\.')) AS DOUBLE)
            / CAST(len(tk) AS DOUBLE) AS symbol_ratio,
          CAST(len(list_filter(ln, l -> regexp_matches(l, '^[-*]')))
               AS DOUBLE) / CAST(len(ln) AS DOUBLE) AS frac_bullet,
          CAST(len(list_filter(ln, l -> regexp_matches(l, '\.\.\.$')))
               AS DOUBLE) / CAST(len(ln) AS DOUBLE) AS frac_ellipsis,
          CAST(len(list_filter(tk, w -> regexp_matches(w, '[A-Za-z]')))
               AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS frac_alpha,
          CAST(CASE WHEN list_contains(tk, 'the') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(tk, 'be') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(tk, 'to') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(tk, 'of') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(tk, 'and') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(tk, 'that') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(tk, 'have') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(tk, 'with') THEN 1 ELSE 0 END
             AS BIGINT) AS n_stop
        FROM f)
      SELECT doc_id, n_words, mean_word_len, symbol_ratio, frac_bullet,
        frac_ellipsis, frac_alpha, n_stop,
        CASE WHEN n_words < 50 OR n_words > 100000 THEN 'word_count'
             WHEN mean_word_len < 3.0 OR mean_word_len > 10.0
               THEN 'mean_word_len'
             WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
             WHEN frac_bullet > 0.9 THEN 'bullet_lines'
             WHEN frac_ellipsis > 0.3 THEN 'ellipsis_lines'
             WHEN frac_alpha < 0.8 THEN 'alpha_words'
             WHEN n_stop < 2 THEN 'stop_words'
             ELSE 'pass' END AS verdict
      FROM g ORDER BY doc_id""")),

    // Per-document novelty against the whole corpus: the share of a
    // doc's distinct word-8-grams that occur in NO other document — the
    // aggregate signal dedup dashboards track (1 - novelty is the
    // "how much of this doc is boilerplate/copied" mass d05/d10 act
    // on). String grams here for the oracle; production runs
    // hashGrams=true (xxhash64 longs through the census shuffle),
    // spec-pinned identical.
    ("t31_novelty", (s: SparkSession, d: String) =>
      novelty(Tables.documents(s, d), hashGrams = false),
    Some("""WITH grams AS (
        SELECT doc_id, unnest(
          CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 8
          THEN list_distinct(list_transform(
            range(0, len(string_split_regex(trim(text), '\s+')) - 7),
            i -> array_to_string(string_split_regex(trim(text), '\s+')[i+1:i+8], ' ')))
          ELSE [text] END) AS gram
        FROM documents),
      df AS (SELECT gram, count(*) AS df FROM grams GROUP BY 1)
      SELECT g.doc_id, count(*) AS n_grams,
        CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
          AS novelty
      FROM grams g JOIN df USING (gram)
      GROUP BY g.doc_id ORDER BY g.doc_id""")),

    // Blocklist screening via the native Aho-Corasick expression
    // (functions/MultiMatch.scala): one O(text) pass per document
    // regardless of blocklist size, where the composed
    // one-contains-per-term form is O(terms × text) — the difference
    // between a policy list of 10 phrases and one of 50k. The list here
    // mixes multi-word phrases, terms with shared prefixes/suffixes
    // (failure-link coverage on real data), and absent terms; every
    // seventh document gets a planted violation appended, mirrored in
    // SQL. Output is scalar-encoded (count + comma-joined sorted hits)
    // for the driver's frame compare.
    ("t33_blocklist", (s: SparkSession, d: String) => {
      val terms = Seq("customer", "click here", "win a prize",
        "table value", "value table", "spark", "park", "ark",
        "windows", "no-such-term")
      val aug = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" click here to win a prize now")))
          .otherwise(col("text")).as("text"))
      aug.select(col("doc_id"),
          graft.functions.GraftFunctions.multi_match(col("text"), terms).as("m"))
        .select(col("doc_id"),
          size(col("m")).cast("long").as("n_hits"),
          array_join(col("m"), ",").as("hits"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH terms(t) AS (VALUES ('customer'), ('click here'),
        ('win a prize'), ('table value'), ('value table'), ('spark'),
        ('park'), ('ark'), ('windows'), ('no-such-term')),
      aug AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0
            THEN text || ' click here to win a prize now' ELSE text END AS text
        FROM documents),
      hits AS (
        SELECT a.doc_id, t.t FROM aug a
        JOIN terms t ON contains(lower(a.text), t.t)),
      agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
          string_agg(t, ',' ORDER BY t) AS hits
        FROM hits GROUP BY doc_id)
      SELECT a.doc_id,
        coalesce(g.n_hits, 0) AS n_hits,
        coalesce(g.hits, '') AS hits
      FROM aug a LEFT JOIN agg g USING (doc_id) ORDER BY a.doc_id""")),

    // Unicode NFC normalization — normalize-before-hash (dedup and
    // n-gram pipelines double-count wherever sources disagree on
    // composition). The corpus is ASCII, so the fixture APPENDS
    // synthesized decomposed sequences (base letter + combining mark,
    // cycled by doc_id) next to their precomposed forms; the oracle is
    // cross-ENGINE: the JDK's java.text.Normalizer vs DuckDB's
    // utf8proc-backed nfc_normalize must produce identical bytes and
    // identical char-count shrinkage, both SFs. Marks are built from
    // code points in both dialects (no non-ASCII source literals).
    ("t47_nfc_normalize", (s: SparkSession, d: String) => {
      // U+0300 grave, U+0301 acute, U+0302 circumflex, U+0303 tilde;
      // precomposed counterparts with 'e': U+00E8, U+00E9, U+00EA —
      // and U+1EBD (e-tilde), all NFC targets of e + mark
      val marks = array(lit("\u0300"), lit("\u0301"), lit("\u0302"),
        lit("\u0303"))
      val pre = array(lit("\u00e8"), lit("\u00e9"), lit("\u00ea"),
        lit("\u1ebd"))
      val idx = (pmod(col("doc_id"), lit(4)) + 1).cast("int")
      val raw = concat(
        substring(col("text"), 1, 12),
        lit(" e"), element_at(marks, idx), // decomposed: composes
        lit(" "), element_at(pre, idx),    // precomposed: unchanged
        lit(" a"), element_at(marks, idx), // a + mark: composes too
        lit(" x"), element_at(marks, idx)) // x + mark: NO precomposed
                                           // form exists — stays 2 chars
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          length(col("raw")).cast("long").as("n_raw"),
          graft.functions.GraftFunctions.nfc_normalize(col("raw"))
            .as("norm"))
        .withColumn("n_norm", length(col("norm")).cast("long"))
        .select(col("doc_id"), col("n_raw"), col("n_norm"), col("norm"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH raw AS (
        SELECT doc_id,
          substr(text, 1, 12)
            || ' e' || chr(CAST(768 + (doc_id % 4) AS INTEGER))
            || ' ' || chr(CAST(CASE doc_id % 4 WHEN 0 THEN 232
                          WHEN 1 THEN 233 WHEN 2 THEN 234
                          ELSE 7869 END AS INTEGER))
            || ' a' || chr(CAST(768 + (doc_id % 4) AS INTEGER))
            || ' x' || chr(CAST(768 + (doc_id % 4) AS INTEGER)) AS raw
        FROM documents)
      SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_raw,
        CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_norm,
        nfc_normalize(raw) AS norm
      FROM raw ORDER BY doc_id""")),

    // Corpus DATA CARD — the datasheet every published training corpus
    // ships (Gebru et al. 2021, "Datasheets for Datasets"): per-slice
    // composition over explicit GROUPING SETS with grouping() markers,
    // exact doc/token/char masses, the largest document per slice, and
    // each slice's Q20 token SHARE of the grand total (the number
    // mixture weighting consumes). Since r17 the card also slices by
    // the two per-doc SIGNAL dimensions datasheet consumers ask for:
    // a stopword-density QUALITY bucket (t02's signal as the exact
    // integer test stop_cnt·5 >= n_tok) and a langid CONFIDENCE bucket
    // (t43's Q30 margin: >= 2^20 confident / below uncertain / token-
    // free none) — ((source,lang),(source),(lang),(quality),(conf),
    // (quality,conf),()). One Expand + one aggregation pass over one
    // corpus scan plus the bounded langid-model join; the card stays
    // slice-cardinality-sized at 100 TB.
    ("t48_data_card", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val fns = graft.functions.GraftFunctions
      val toks = split(trim(col("text")), "\\s+")
      val slices = docs.select(col("doc_id"), col("source"), col("lang"),
        size(toks).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chr"),
        fns.marker_count(toks, Stopwords, lowercase = true).cast("long")
          .as("stop_cnt"))
      val marg = langIdMarginCached(s, d)
        .select(col("doc_id"), col("margin_q30"))
      slices.join(marg, Seq("doc_id"), "left")
        .select(col("source"), col("lang"),
          when(col("stop_cnt") * 5 >= col("n_tok"), "hi").otherwise("lo")
            .as("quality"),
          when(col("margin_q30").isNull, "none")
            .when(col("margin_q30") >= 1048576L, "confident")
            .otherwise("uncertain").as("conf"),
          col("n_tok"), col("n_chr"))
        .createOrReplaceTempView("doc_slices_v")
      s.sql("""
        WITH tot AS (SELECT sum(n_tok) AS total FROM doc_slices_v)
        SELECT source, lang, quality, conf,
          CAST(grouping(source) AS INT) AS g_source,
          CAST(grouping(lang) AS INT) AS g_lang,
          CAST(grouping(quality) AS INT) AS g_quality,
          CAST(grouping(conf) AS INT) AS g_conf,
          count(*) AS n_docs,
          sum(n_tok) AS n_tokens,
          sum(n_chr) AS n_chars,
          max(n_tok) AS max_doc_tokens,
          CAST(floor(1048576.0 * CAST(sum(n_tok) AS DOUBLE)
            / CAST((SELECT total FROM tot) AS DOUBLE)) AS BIGINT)
            AS token_share_q20
        FROM doc_slices_v
        GROUP BY GROUPING SETS ((source, lang), (source), (lang),
          (quality), (conf), (quality, conf), ())
        ORDER BY g_source, g_lang, g_quality, g_conf,
          source NULLS FIRST, lang NULLS FIRST,
          quality NULLS FIRST, conf NULLS FIRST""")
    },
    Some("WITH " + langIdOracleCtes + """,
      marg AS (
        SELECT t.doc_id,
          CAST(t.sum_wq - COALESCE(s.sum_wq, 0) AS BIGINT) AS margin_q30
        FROM (SELECT * FROM rnk WHERE rk = 1) t
        LEFT JOIN (SELECT * FROM rnk WHERE rk = 2) s ON t.doc_id = s.doc_id),
      slices AS (
        SELECT doc_id, source, lang,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
            AS n_tok,
          CAST(length(text) AS BIGINT) AS n_chr,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
            t -> list_contains(['the','a','an','and','or','of','to','in','is','it'],
              lower(t)))) AS BIGINT) AS stop_cnt
        FROM documents),
      enriched AS (
        SELECT s.source, s.lang,
          CASE WHEN s.stop_cnt * 5 >= s.n_tok THEN 'hi' ELSE 'lo' END
            AS quality,
          CASE WHEN m.margin_q30 IS NULL THEN 'none'
               WHEN m.margin_q30 >= 1048576 THEN 'confident'
               ELSE 'uncertain' END AS conf,
          s.n_tok, s.n_chr
        FROM slices s LEFT JOIN marg m ON s.doc_id = m.doc_id),
      tot AS (SELECT sum(n_tok) AS total FROM enriched)
      SELECT source, lang, quality, conf,
        CAST(grouping(source) AS INTEGER) AS g_source,
        CAST(grouping(lang) AS INTEGER) AS g_lang,
        CAST(grouping(quality) AS INTEGER) AS g_quality,
        CAST(grouping(conf) AS INTEGER) AS g_conf,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        CAST(sum(n_chr) AS BIGINT) AS n_chars,
        CAST(max(n_tok) AS BIGINT) AS max_doc_tokens,
        CAST(floor(1048576.0 * CAST(sum(n_tok) AS DOUBLE)
          / CAST((SELECT total FROM tot) AS DOUBLE)) AS BIGINT)
          AS token_share_q20
      FROM enriched
      GROUP BY GROUPING SETS ((source, lang), (source), (lang),
        (quality), (conf), (quality, conf), ())
      ORDER BY g_source, g_lang, g_quality, g_conf,
        source NULLS FIRST, lang NULLS FIRST,
        quality NULLS FIRST, conf NULLS FIRST"""))
  )
}
