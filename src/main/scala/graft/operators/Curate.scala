package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and tokenization: PII detection/redaction, URL/domain profiling
  * (the input to domain-level boilerplate and blocklist filters),
  * deterministic stratified sampling (reproducible training mixtures),
  * and within-document repetition removal (Gopher/RefinedWeb-style).
  *
  * All four are row-local except the domain rollup's single aggregation —
  * each scales linearly and shuffles at most once. PII/URL patterns stay
  * inside the regex dialect subset shared by Java regex and RE2 (`\b`,
  * `\d`, bounded classes) so the DuckDB oracle runs the same patterns.
  *
  * The synthetic corpus carries no organic PII/URLs; the queries plant
  * them deterministically from doc_id (mirrored exactly in the oracle
  * SQL), so the extraction logic is exercised against known ground truth
  * — the same fixture discipline d01 uses for duplicates.
  */
object Curate {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val UrlRe = "https?://[^\\s]+"
  val DomainRe = "https?://([^/\\s]+)"

  /** Redact emails, then phones, then IPs (order matters and is part of
    * the contract — an email's digits must not be half-eaten by the IP
    * pass). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")

  def piiCounts(text: Column): Seq[Column] = Seq(
    // group 0 = the full match (Spark defaults to group 1, DuckDB to 0)
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"))

  /** Canonical URL form for URL-level dedup — the cheap pass a crawl
    * pipeline runs BEFORE fetching or content-hashing anything, since
    * the same page hides behind scheme/host case, default ports,
    * `www.`, tracking parameters, fragments, and trailing slashes:
    * lowercase scheme+host, strip `:80`/`:443` for their own schemes,
    * strip one leading `www.`, drop the fragment, drop
    * `utm_*`/`gclid`/`fbclid`/`ref` query params (order of survivors
    * preserved — param reordering is a semantic change on some sites),
    * empty path becomes `/`, and a non-root trailing slash drops.
    * Row-local column ops only — at scale this is a map stage feeding
    * one groupBy(canonical) exchange, the d01 shape. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val noPort = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val host = regexp_replace(noPort, "^www\\.", "")
    val rawPath = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val slashed = when(rawPath === "", lit("/")).otherwise(rawPath)
    val path = when(length(slashed) > 1, regexp_replace(slashed, "/$", ""))
      .otherwise(slashed)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&", -1), p =>
      !p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=") && p =!= lit(""))
    val qs = array_join(kept, "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Declared page language off the `<html lang=…>` attribute — the
    * strongest cheap langid PRIOR a crawl pipeline has (CCNet/CC index
    * both record it): primary subtag of the first html tag's lang
    * attribute, lowercased, '' when absent. One row-local regex in the
    * shared Java/RE2 dialect (inline `(?i)`, lazy run bounded by the
    * tag) — a map-stage column at any scale; combine with the trained
    * t04 classifier as prior vs evidence. */
  def htmlLang(html: Column): Column = {
    val tag = regexp_extract(html,
      "(?i)<html\\b[^>]*?\\slang\\s*=\\s*[\"']?([A-Za-z][A-Za-z-]*)", 1)
    lower(element_at(split(tag, "-"), 1))
  }

  /** HTML → text extraction (the step a web-crawl pipeline runs before
    * any other curation — C4 §2.2 operates on extracted text, RefinedWeb
    * §3.2 on trafilatura output): drop script/style/comment subtrees,
    * turn block-level tags into line breaks, strip remaining tags,
    * decode the five ubiquitous entities (`&amp;` LAST so `&amp;lt;`
    * does not double-decode), and normalize whitespace to single spaces
    * and single newlines. Entirely chained `regexp_replace` in the
    * Java-regex/RE2 shared dialect (lazy quantifiers + inline `(?is)`
    * flags are in both), so the DuckDB oracle runs the same patterns —
    * and the whole operator is one codegen'd row-local projection: at
    * 100 TB it is a map stage with zero shuffles, exactly as cheap as
    * the scan itself. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val blocks = regexp_replace(noComment,
      "(?i)</?(?:p|div|br|h[1-6]|li|tr|table|ul|ol)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", "")
    val entities = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&#39;", "'"),
      "&nbsp;", " ")
    val decoded = regexp_replace(entities, "&amp;", "&")
    val hCollapsed = regexp_replace(decoded, "[ \\t]+", " ")
    val vCollapsed = regexp_replace(hCollapsed, "\\s*\\n\\s*", "\n")
    trim(regexp_replace(vCollapsed, "^\\n|\\n$", ""))
  }

  /** Main-content extraction over an HTML corpus — the
    * [[graft.kernel.Boilerplate]] NumWordsRules classifier (Kohlschütter
    * et al., WSDM 2010) as a dataflow stage: per document, segment into
    * text blocks, classify content vs boilerplate on word counts and
    * link density (exact integer rationals), return the surviving text.
    * The step between [[htmlToText]] (keeps nav/footers) and the
    * curation chain: feeding extraction output instead of raw strip
    * output is the single biggest text-quality lever in a crawl
    * pipeline. One row-local map — zero shuffles at any scale. */
  def mainContent(docs: DataFrame, htmlCol: String = "html"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col(htmlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, h) =>
        val (t, nb, nc) = graft.kernel.Boilerplate.mainContent(h)
        (id, t, nb, nc)
      })
      .toDF("doc_id", "main_text", "n_blocks", "n_content_blocks")
  }

  /** Column form of [[mainContent]]'s extracted text — a Scala UDF
    * because the kernel is an imperative per-row parser (the
    * expression>UDF rule yields here: there is no codegen form of a
    * stateful tag walk); still row-local with zero shuffles, and
    * composable inside an existing projection (the curate chain's
    * extraction stage). */
  val mainTextUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((h: String) =>
      if (h == null) "" else graft.kernel.Boilerplate.mainContent(h)._1)

  /** Deterministic content-hash sampling: keep a row iff the first two
    * hex chars of md5(source:doc_id) fall under the source's threshold.
    * Reproducible across runs/engines (no RNG), stable under corpus
    * growth (a doc's fate never depends on other rows), and exact
    * per-source rates in expectation — the way training mixtures are
    * actually drawn at 100 TB. */
  def sampleBucket(source: Column, id: Column): Column =
    substring(md5(concat_ws(":", source, id.cast("string"))), 1, 2)

  /** Model-based quality scoring — the fastText-style hashed linear
    * filter every large curation pipeline runs (CCNet/RefinedWeb
    * lineage), as pure dataflow: tokens hash into `buckets` md5 buckets,
    * the model is the per-bucket smoothed probability that a bucket's
    * tokens come from the GOOD reference, P = (g+1)/(g+b+2), trained
    * with one groupBy over each labeled reference; a document scores
    * the mean bucket weight of its tokens.
    *
    * Training is distributed (two aggregations), the model is ~buckets
    * rows riding a broadcast join, and scoring is one scan — nothing
    * model-sized ever shuffles. Exactness is the design: weights are
    * Q30 FIXED-POINT longs (floor(P·2³⁰)) so per-document totals are
    * integer sums — order-free, partition-independent, and
    * engine-reproducible (a float sum would drift in the last ulp under
    * reordering; the DuckDB oracle hash-matches this bit-for-bit).
    * Unseen buckets score the prior 0.5 (2²⁹).
    */
  def hashedQualityScores(docs: DataFrame, goodRef: DataFrame,
      badRef: DataFrame, buckets: Int = 1024): DataFrame = {
    def toks(df: DataFrame, extra: Column*): DataFrame =
      df.select(extra :+
        explode(split(trim(lower(col("text"))), "\\s+")).as("token"): _*)
        .filter(col("token") =!= "")
    def bucketOf(token: Column): Column =
      pmod(conv(substring(md5(token), 1, 8), 16, 10).cast("long"),
        lit(buckets.toLong))
    val good = toks(goodRef).groupBy(bucketOf(col("token")).as("bucket"))
      .agg(count(lit(1)).as("g"))
    val bad = toks(badRef).groupBy(bucketOf(col("token")).as("bucket"))
      .agg(count(lit(1)).as("b"))
    val weights = good.join(bad, Seq("bucket"), "full")
      .select(col("bucket"),
        floor((coalesce(col("g"), lit(0L)) + 1).cast("double") /
            (coalesce(col("g"), lit(0L)) + coalesce(col("b"), lit(0L)) + 2)
              .cast("double") * lit(1073741824L))
          .cast("long").as("wq"))
    toks(docs, col("doc_id"))
      .select(col("doc_id"), bucketOf(col("token")).as("bucket"))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("wq"), lit(536870912L))).as("sum_wq"))
      .withColumn("quality",
        col("sum_wq").cast("double") / col("n_tokens") / lit(1073741824L))
  }

  /** CCNet-style n-gram language-model quality score (Wenzek et al.
    * 2020: documents ranked by a target-language LM): a word-BIGRAM LM
    * with stupid backoff (Brants et al. 2007, α = 0.4) trained on the
    * target slice, scored as the MEAN per-token probability in Q30 fixed
    * point. True perplexity is the geometric mean and needs `ln` — the
    * one step two engines won't bit-match (t25's lesson) — so the score
    * is the arithmetic mean: the same more-target-like ⇒ higher
    * monotone signal, exactly engine-reproducible.
    *
    * Per token (1-based position i): i = 1 scores the unigram
    * `c(w₁)/T`; i > 1 scores the bigram `c(w₍ᵢ₋₁₎wᵢ)/c(w₍ᵢ₋₁₎)` when
    * the bigram was seen, else backs off to `0.4·c(wᵢ)/T` (computed as
    * the single division `2c/5T` — α itself is not a binary-exact
    * constant), else 0 for OOV. Every probability is ONE
    * correctly-rounded division of two exact integers scaled by 2³⁰ and
    * floored, so per-document sums are integer arithmetic all the way
    * down and the DuckDB oracle hash-matches the trained LM bit-for-bit.
    *
    * Scale: counts are two aggregations over the target; scoring
    * shuffles the exploded corpus by word for three hash joins
    * (bigram, prev-unigram, cur-unigram) then re-aggregates per doc —
    * vocabulary-sized frames never broadcast, nothing corpus².
    *
    * Cache contract: the unigram table stays persisted because the
    * returned frame is LAZY and reads it three times when the caller
    * finally executes — unpersisting here would re-aggregate the target
    * per join. Callers owning a long-lived session should
    * `spark.catalog.clearCache()` (or unpersist) once the score frame is
    * materialized; the Verify harness does this per query. */
  def lmScore(docs: DataFrame, target: DataFrame): DataFrame = {
    val Q = 1073741824L // 2^30
    def tokens(df: DataFrame) =
      df.select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
    val tTok = tokens(target)
      .select(explode(col("toks")).as("w")).filter(col("w") =!= "")
    val uni = tTok.groupBy(col("w")).agg(count(lit(1)).as("cu"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totalRow = uni.agg(sum(col("cu"))).head()
    require(!totalRow.isNullAt(0),
      "lmScore: target slice has no tokens — an LM cannot be trained on " +
        "an empty target; filter/langid upstream produced zero rows or " +
        "all-whitespace text")
    val total = totalRow.getLong(0)
    val bi = tokens(target)
      .select(posexplode(col("toks")).as(Seq("pos", "cur")), col("toks"))
      .filter(col("pos") > 0 && col("cur") =!= "")
      .select(element_at(col("toks"), col("pos")).as("prev"), col("cur"))
      .filter(col("prev") =!= "")
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("cb"))

    val positions = tokens(docs)
      .select(col("doc_id"), col("toks"), posexplode(col("toks")).as(Seq("pos", "cur")))
      .select(col("doc_id"), col("cur"),
        when(col("pos") > 0, element_at(col("toks"), col("pos"))).as("prev"))
    val scored = positions
      .join(bi, Seq("prev", "cur"), "left")
      .join(uni.select(col("w").as("prev"), col("cu").as("cu_prev")), Seq("prev"), "left")
      .join(uni.select(col("w").as("cur"), col("cu").as("cu_cur")), Seq("cur"), "left")
      .select(col("doc_id"),
        when(col("prev").isNull,
            // first token: plain unigram probability
            when(col("cu_cur").isNotNull,
              floor(col("cu_cur").cast("double") / lit(total.toDouble) * Q)
                .cast("long")).otherwise(lit(0L)))
          .when(col("cb").isNotNull,
            floor(col("cb").cast("double") / col("cu_prev").cast("double") * Q)
              .cast("long"))
          .when(col("cu_cur").isNotNull,
            floor((col("cu_cur") * 2).cast("double") / lit((5L * total).toDouble) * Q)
              .cast("long"))
          .otherwise(lit(0L)).as("q"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("q")).as("lm_q30_sum"))
      .withColumn("lm_mean",
        col("lm_q30_sum").cast("double") / (col("n_tokens") * lit(Q)).cast("double"))
  }

  /** CCNet's head/middle/tail corpus partition (Wenzek et al. 2020): rank
    * documents by LM score ([[lmScore]], best first) and cut the corpus
    * at one-third and two-thirds of TOKEN mass — head is the cleanest
    * third by volume, tail the noisiest, and downstream mixtures sample
    * the buckets at different rates. The boundary tests are exact
    * integer comparisons (3·cum vs totals), so bucket membership is
    * engine-reproducible and oracle-checkable.
    *
    * Scale note: the exact global cut orders the per-DOCUMENT score
    * table through one single-partition window — the t25 trade, exact
    * for the gate; the production swap at billions of documents is two
    * approx_percentile thresholds on lm_mean (one aggregation, no
    * global sort) with identical bucket semantics away from the two
    * boundary scores. */
  def perplexityBuckets(docs: DataFrame, target: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = lmScore(docs, target)
    val ordered = Window.orderBy(col("lm_mean").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("cum", sum(col("n_tokens")).over(ordered))
      .withColumn("tot", sum(col("n_tokens")).over(
        Window.partitionBy(Seq.empty[Column]: _*)))
      .withColumn("bucket",
        when(col("cum") * 3 <= col("tot"), lit("head"))
          .when(col("cum") * 3 <= col("tot") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("n_tokens"), col("lm_mean"), col("bucket"))
  }

  /** The 100-TB form of [[perplexityBuckets]] (r11 VERDICT item 3):
    * the exact form moves every per-document score through one
    * single-partition window; this one HISTOGRAMS the scores instead.
    * lm_mean ∈ [0, 1] quantizes to `2^binBits` bins, ONE aggregation
    * collapses the corpus to per-bin token mass (partial aggregation
    * map-side), the two token-mass cut bins come from a bounded driver
    * walk over the sorted bin table (≤ 2^binBits rows — model-sized,
    * never corpus-sized, loud cap), and bucketing is a row-local
    * comparison against two plan literals. The scored frame is
    * checkpointed once; histogram and label both read it back — the
    * corpus never shuffles, sorts, or enters a window.
    *
    * Semantics match the exact cut for every document whose score bin
    * differs from the two crossing bins (within-bin order is the
    * resolution given up — 2^-binBits on lm_mean); spec-gated in
    * CurateSpec. */
  def perplexityBucketsScale(docs: DataFrame, target: DataFrame,
      binBits: Int = 16): DataFrame = {
    require(binBits >= 4 && binBits <= 22, s"binBits $binBits")
    val nBins = 1L << binBits
    // referenced twice (histogram collect + label pass) — eager
    // localCheckpoint, not persist: blocks free on GC instead of leaking
    // across the session (r12 ADVICE)
    val scored = lmScore(docs, target).localCheckpoint(true)
    val binCol = least(floor(col("lm_mean") * nBins), lit(nBins - 1))
      .cast("long")
    val bins = scored.select(binCol.as("bin"), col("n_tokens"))
      .groupBy(col("bin")).agg(sum(col("n_tokens")).as("mass"))
      .orderBy(col("bin").desc)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(bins.length <= nBins, "impossible: more bins than the quantizer emits")
    val tot = bins.map(_._2).sum
    // walking best-score-first, the head cut is the bin where cumulative
    // token mass first reaches a third of the corpus (the exact form's
    // 3·cum vs tot test at bin granularity), the middle cut two thirds
    var cum = 0L
    var headBin = Long.MinValue
    var midBin = Long.MinValue
    for ((b, m) <- bins) {
      cum += m
      if (headBin == Long.MinValue && cum * 3 >= tot) headBin = b
      if (midBin == Long.MinValue && cum * 3 >= tot * 2) midBin = b
    }
    scored.select(col("doc_id"), col("n_tokens"), col("lm_mean"),
      when(binCol >= headBin, lit("head"))
        .when(binCol >= midBin, lit("middle"))
        .otherwise(lit("tail")).as("bucket"))
  }

  /** Corpus-level frequent lines — the CCNet/C4 boilerplate census: a
    * line (nav menu, cookie banner, copyright footer) that recurs across
    * `minDocs`+ DISTINCT documents is boilerplate, not content. One
    * aggregation over the exploded lines (partial aggregation shrinks
    * repeated lines map-side) and a bounded driver collect: the result
    * is at most total_lines / minDocs rows and in practice the small
    * boilerplate vocabulary of the crawl; `cap` turns a degenerate
    * corpus into a loud error instead of a driver OOM. */
  def frequentLines(docs: DataFrame, lines: Column, minDocs: Int,
      cap: Int = 1 << 20): Seq[String] = {
    val freq = docs
      .select(col("doc_id"), explode(lines).as("line"))
      .groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
    val rows = freq.select(col("line")).limit(cap + 1)
      .collect().map(_.getString(0))
    require(rows.length <= cap, s"frequent-line set exceeds cap=$cap")
    rows.toSeq.sorted
  }

  /** Per-document cleanup against a fixed boilerplate set: filter the
    * line array row-locally ([[graft.functions.ArrayExclude]] — O(1)
    * hash probes inside codegen), reassemble in original order. */
  def lineDedupColumns(lines: Column, boiler: Seq[String],
      sep: String = " ~ "): Seq[Column] = {
    val kept = graft.functions.GraftFunctions.array_exclude(lines, boiler)
    val cleaned = concat_ws(sep, kept)
    Seq(
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      md5(cleaned).as("cleaned_md5"),
      length(cleaned).cast("long").as("cleaned_len"))
  }

  /** Corpus-level line deduplication (CCNet-style): census then cleanup.
    * The census is the ONLY corpus-wide aggregation; the cleanup is a
    * row-local map with the boilerplate set riding the plan — documents
    * are never exploded into a shuffle and never reassembled via
    * groupBy, which is what lets this run as a single pass at 100 TB
    * (t12 is the within-document form; this is the cross-document one). */
  def lineDedup(docs: DataFrame, lines: Column, minDocs: Int,
      sep: String = " ~ "): DataFrame = {
    val boiler = frequentLines(docs, lines, minDocs)
    docs.select(col("doc_id") +: lineDedupColumns(lines, boiler, sep): _*)
  }

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Bigram-LM quality score: the LM trains on the English slice and
    // scores every document — the CCNet ranking signal. Oracle-gated
    // bit-for-bit INCLUDING the trained LM (see lmScore: every
    // probability is one correctly-rounded integer division in Q30).
    ("t32_lm_score", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      lmScore(docs, docs.filter(col("lang") === "en"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, lang,
          string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents),
      uni AS (
        SELECT w, count(*) AS cu FROM (
          SELECT unnest(t) AS w FROM toks WHERE lang = 'en') u
        WHERE w <> '' GROUP BY w),
      tot AS (SELECT sum(cu) AS tt FROM uni),
      pos AS (
        SELECT doc_id, lang, t,
          unnest(range(1, len(t) + 1)) AS i
        FROM toks),
      bi AS (
        SELECT prev, cur, count(*) AS cb FROM (
          SELECT t[i - 1] AS prev, t[i] AS cur
          FROM pos WHERE lang = 'en' AND i > 1) p
        WHERE prev <> '' AND cur <> '' GROUP BY prev, cur),
      scored AS (
        SELECT p.doc_id,
          CASE
            WHEN p.i = 1 THEN
              CASE WHEN uc.cu IS NOT NULL
                THEN CAST(floor(CAST(uc.cu AS DOUBLE) / CAST(tot.tt AS DOUBLE) * 1073741824) AS BIGINT)
                ELSE 0 END
            WHEN b.cb IS NOT NULL
              THEN CAST(floor(CAST(b.cb AS DOUBLE) / CAST(up.cu AS DOUBLE) * 1073741824) AS BIGINT)
            WHEN uc.cu IS NOT NULL
              THEN CAST(floor(CAST(uc.cu * 2 AS DOUBLE) / CAST(5 * tot.tt AS DOUBLE) * 1073741824) AS BIGINT)
            ELSE 0 END AS q
        FROM pos p
        LEFT JOIN bi b ON p.i > 1 AND b.prev = p.t[p.i - 1] AND b.cur = p.t[p.i]
        LEFT JOIN uni up ON p.i > 1 AND up.w = p.t[p.i - 1]
        LEFT JOIN uni uc ON uc.w = p.t[p.i], tot)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(sum(q) AS BIGINT) AS lm_q30_sum,
        CAST(sum(q) AS DOUBLE) / CAST(count(*) * 1073741824 AS BIGINT)
          AS lm_mean
      FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // CCNet head/middle/tail partition on the t32 LM signal: tertile
    // cuts by token mass with exact integer boundary tests. Oracle-gated
    // end to end — the trained LM, the per-doc means, the global cum-sum
    // ordering, and every bucket verdict hash-match DuckDB.
    ("t36_ccnet_buckets", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      perplexityBuckets(docs, docs.filter(col("lang") === "en"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, lang,
          string_split_regex(trim(lower(text)), '\s+') AS t
        FROM documents),
      uni AS (
        SELECT w, count(*) AS cu FROM (
          SELECT unnest(t) AS w FROM toks WHERE lang = 'en') u
        WHERE w <> '' GROUP BY w),
      tot AS (SELECT sum(cu) AS tt FROM uni),
      pos AS (
        SELECT doc_id, lang, t,
          unnest(range(1, len(t) + 1)) AS i
        FROM toks),
      bi AS (
        SELECT prev, cur, count(*) AS cb FROM (
          SELECT t[i - 1] AS prev, t[i] AS cur
          FROM pos WHERE lang = 'en' AND i > 1) p
        WHERE prev <> '' AND cur <> '' GROUP BY prev, cur),
      scored AS (
        SELECT p.doc_id,
          CASE
            WHEN p.i = 1 THEN
              CASE WHEN uc.cu IS NOT NULL
                THEN CAST(floor(CAST(uc.cu AS DOUBLE) / CAST(tot.tt AS DOUBLE) * 1073741824) AS BIGINT)
                ELSE 0 END
            WHEN b.cb IS NOT NULL
              THEN CAST(floor(CAST(b.cb AS DOUBLE) / CAST(up.cu AS DOUBLE) * 1073741824) AS BIGINT)
            WHEN uc.cu IS NOT NULL
              THEN CAST(floor(CAST(uc.cu * 2 AS DOUBLE) / CAST(5 * tot.tt AS DOUBLE) * 1073741824) AS BIGINT)
            ELSE 0 END AS q
        FROM pos p
        LEFT JOIN bi b ON p.i > 1 AND b.prev = p.t[p.i - 1] AND b.cur = p.t[p.i]
        LEFT JOIN uni up ON p.i > 1 AND up.w = p.t[p.i - 1]
        LEFT JOIN uni uc ON uc.w = p.t[p.i], tot),
      agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(q) AS DOUBLE) / CAST(count(*) * 1073741824 AS BIGINT)
            AS lm_mean
        FROM scored GROUP BY doc_id),
      cum AS (
        SELECT doc_id, n_tokens, lm_mean,
          sum(n_tokens) OVER (ORDER BY lm_mean DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
          sum(n_tokens) OVER () AS tt
        FROM agg)
      SELECT doc_id, n_tokens, lm_mean,
        CASE WHEN c * 3 <= tt THEN 'head'
          WHEN c * 3 <= tt * 2 THEN 'middle'
          ELSE 'tail' END AS bucket
      FROM cum ORDER BY doc_id""")),

    // Hashed linear quality model: GOOD reference = even docs as-is,
    // BAD reference = odd docs reversed (deterministic OOV-ish negative
    // class, mirrored exactly in the oracle); every doc then scores
    // against the trained bucket weights. Oracle-gated bit-for-bit —
    // see hashedQualityScores for why the fixed-point design makes a
    // trained model hash-comparable across engines.
    ("t19_model_quality", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      hashedQualityScores(
        docs,
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1)
          .withColumn("text", reverse(col("text"))))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      good AS (
        SELECT CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT) % 1024 AS bucket,
               count(*) AS g
        FROM tok WHERE doc_id % 2 = 0 AND token <> '' GROUP BY 1),
      btok AS (
        SELECT unnest(string_split_regex(trim(lower(reverse(text))), '\s+')) AS token
        FROM documents WHERE doc_id % 2 = 1),
      bad AS (
        SELECT CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT) % 1024 AS bucket,
               count(*) AS b
        FROM btok WHERE token <> '' GROUP BY 1),
      w AS (
        SELECT COALESCE(good.bucket, bad.bucket) AS bucket,
          CAST(floor(CAST(COALESCE(g, 0) + 1 AS DOUBLE)
            / CAST(COALESCE(g, 0) + COALESCE(b, 0) + 2 AS DOUBLE)
            * 1073741824) AS BIGINT) AS wq
        FROM good FULL JOIN bad ON good.bucket = bad.bucket),
      scored AS (
        SELECT doc_id,
          CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT) % 1024 AS bucket
        FROM tok WHERE token <> '')
      SELECT doc_id, count(*) AS n_tokens,
        CAST(sum(COALESCE(wq, 536870912)) AS BIGINT) AS sum_wq,
        CAST(CAST(sum(COALESCE(wq, 536870912)) AS BIGINT) AS DOUBLE)
          / count(*) / 1073741824 AS quality
      FROM scored LEFT JOIN w ON scored.bucket = w.bucket
      GROUP BY doc_id ORDER BY doc_id""")),

    // PII detect + redact. Every 7th doc gets a planted email/phone/IP
    // (deterministic from doc_id); output counts + the redacted text's
    // md5 so the gate hashes the full redaction result.
    ("t10_pii_scrub", (s: SparkSession, d: String) => {
      val planted = Tables.documents(s, d).withColumn("ptext",
        when(col("doc_id") % 7 === 0,
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com tel "),
            lit("555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" ip 10."), (col("doc_id") % 250).cast("string"), lit(".0.42")))
          .otherwise(col("text")))
      planted.select(
        Seq(col("doc_id")) ++ piiCounts(col("ptext")) ++ Seq(
          md5(redactPii(col("ptext"))).as("redacted_md5"),
          length(redactPii(col("ptext"))).cast("long").as("redacted_len")): _*)
        .orderBy(col("doc_id"))
    },
    Some("""WITH planted AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN
            text || ' contact user' || doc_id || '@example.com tel 555-' ||
            lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
            ' ip 10.' || (doc_id % 250) || '.0.42'
          ELSE text END AS ptext
        FROM documents),
      red AS (
        SELECT doc_id, ptext,
          regexp_replace(regexp_replace(regexp_replace(ptext,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
            '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS r
        FROM planted)
      SELECT doc_id,
        CAST(len(regexp_extract_all(ptext,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(ptext,
          '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        CAST(len(regexp_extract_all(ptext,
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        md5(r) AS redacted_md5, CAST(length(r) AS BIGINT) AS redacted_len
      FROM red ORDER BY doc_id""")),

    // URL extraction + per-domain rollup — the profile a domain
    // blocklist / boilerplate filter consumes. Every 3rd doc gets one
    // planted URL, every 12th a second on a different domain.
    ("t11_url_domains", (s: SparkSession, d: String) => {
      val planted = Tables.documents(s, d).withColumn("ptext",
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" see https://www.site"), (col("doc_id") % 7).cast("string"),
              lit(".example.com/p/"), col("doc_id").cast("string"), lit("?ref=x")))
            .otherwise(lit("")),
          when(col("doc_id") % 12 === 0,
            concat(lit(" http://cdn"), (col("doc_id") % 3).cast("string"),
              lit(".example.net/a.js")))
            .otherwise(lit(""))))
      planted
        .select(col("doc_id"),
          explode(regexp_extract_all(col("ptext"), lit(UrlRe), lit(0))).as("url"))
        .withColumn("domain", regexp_extract(col("url"), DomainRe, 1))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("domain"))
    },
    Some("""WITH planted AS (
        SELECT doc_id, text ||
          CASE WHEN doc_id % 3 = 0 THEN ' see https://www.site' ||
            (doc_id % 7) || '.example.com/p/' || doc_id || '?ref=x'
          ELSE '' END ||
          CASE WHEN doc_id % 12 = 0 THEN ' http://cdn' || (doc_id % 3) ||
            '.example.net/a.js'
          ELSE '' END AS ptext
        FROM documents),
      urls AS (
        SELECT doc_id, unnest(regexp_extract_all(ptext, 'https?://[^\s]+')) AS url
        FROM planted)
      SELECT regexp_extract(url, 'https?://([^/\s]+)', 1) AS domain,
        count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs
      FROM urls GROUP BY 1 ORDER BY domain""")),

    // Deterministic stratified sample: per-source md5-bucket thresholds
    // (src0 25%, src1 50%, src2 75%, rest 12.5%). Emits the kept rows
    // themselves so the gate hashes the exact membership.
    ("d07_stratified_sample", (s: SparkSession, d: String) => {
      val thr = when(col("source") === "src0", "40")
        .when(col("source") === "src1", "80")
        .when(col("source") === "src2", "c0")
        .otherwise("20")
      Tables.documents(s, d)
        .withColumn("bucket", sampleBucket(col("source"), col("doc_id")))
        .filter(col("bucket") < thr)
        .select(col("doc_id"), col("source"), col("bucket"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, source, substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      FROM documents
      WHERE substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 2) <
        CASE source WHEN 'src0' THEN '40' WHEN 'src1' THEN '80'
                    WHEN 'src2' THEN 'c0' ELSE '20' END
      ORDER BY doc_id""")),

    // Composite quality gate — the Gopher/C4-style rule cascade as ONE
    // keep/drop decision with the first failing rule as the reason. All
    // metrics are row-local string/array ops shared verbatim with the
    // oracle dialect; thresholds are the contract. The verdict ordering
    // (first failure wins) matters: it is what a curation dashboard
    // aggregates by.
    ("t16_quality_gate", (s: SparkSession, d: String) => {
      val toks = split(trim(col("text")), "\\s+")
      val metrics = Tables.documents(s, d).select(col("doc_id"),
        size(toks).cast("long").as("n_tok"),
        (size(array_distinct(toks)).cast("double") / size(toks))
          .as("distinct_ratio"),
        (length(regexp_replace(trim(col("text")), "\\s+", ""))
          .cast("double") / size(toks)).as("mean_tok_len"))
      metrics
        .withColumn("verdict",
          when(col("n_tok") < 20, "too_short")
            .when(col("n_tok") > 1000, "too_long")
            .when(col("distinct_ratio") < 0.3, "repetitive")
            .when(col("mean_tok_len") < 2.5 || col("mean_tok_len") > 12.0,
              "gibberish")
            .otherwise("keep"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH m AS (
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
          CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
            / len(string_split_regex(trim(text), '\s+')) AS distinct_ratio,
          CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
            / len(string_split_regex(trim(text), '\s+')) AS mean_tok_len
        FROM documents)
      SELECT doc_id, n_tok, distinct_ratio, mean_tok_len,
        CASE WHEN n_tok < 20 THEN 'too_short'
             WHEN n_tok > 1000 THEN 'too_long'
             WHEN distinct_ratio < 0.3 THEN 'repetitive'
             WHEN mean_tok_len < 2.5 OR mean_tok_len > 12.0 THEN 'gibberish'
             ELSE 'keep' END AS verdict
      FROM m ORDER BY doc_id""")),

    // Corpus-level line dedup (CCNet-style boilerplate removal): each
    // doc is given 5 lines — two unique content slices plus a planted
    // per-source newsletter line (shared by every doc of the source) and,
    // for even docs, a global copyright footer (shared by half the
    // corpus). Lines recurring in >= 5 distinct docs are boilerplate and
    // are stripped; docs shorter than the slice plan contribute ''
    // lines, which are themselves frequent and stripped (deterministic,
    // mirrored in the oracle).
    ("t20_line_dedup", (s: SparkSession, d: String) => {
      val planted = Tables.documents(s, d).select(col("doc_id"),
        array(
          substring(col("text"), 1, 45),
          concat(lit("subscribe to "), col("source"), lit(" newsletter")),
          substring(col("text"), 46, 45),
          when(col("doc_id") % 2 === 0,
            lit("copyright example corp all rights reserved"))
            .otherwise(substring(col("text"), 91, 20)),
          substring(col("text"), 111, 25)).as("lines"))
      lineDedup(planted, col("lines"), minDocs = 5).orderBy(col("doc_id"))
    },
    Some("""WITH planted AS (
        SELECT doc_id, [
          substr(text, 1, 45),
          'subscribe to ' || source || ' newsletter',
          substr(text, 46, 45),
          CASE WHEN doc_id % 2 = 0 THEN 'copyright example corp all rights reserved'
               ELSE substr(text, 91, 20) END,
          substr(text, 111, 25)] AS lines
        FROM documents),
      p AS (SELECT doc_id, unnest(list_transform(range(1, len(lines) + 1),
              i -> {'pos': i, 'line': lines[i]})) AS u FROM planted),
      f AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM p),
      freq AS (SELECT line FROM f GROUP BY line
               HAVING count(DISTINCT doc_id) >= 5),
      flag AS (SELECT doc_id, pos, line,
                 line IN (SELECT line FROM freq) AS boiler FROM f)
      SELECT doc_id,
        CAST(count(*) AS BIGINT) AS n_lines,
        CAST(count(*) FILTER (WHERE NOT boiler) AS BIGINT) AS n_kept,
        md5(coalesce(string_agg(line, ' ~ ' ORDER BY pos)
          FILTER (WHERE NOT boiler), '')) AS cleaned_md5,
        CAST(length(coalesce(string_agg(line, ' ~ ' ORDER BY pos)
          FILTER (WHERE NOT boiler), '')) AS BIGINT) AS cleaned_len
      FROM flag GROUP BY doc_id ORDER BY doc_id""")),

    // The C4 cleaning heuristics (Raffel et al. 2020, arXiv 1910.10683
    // §2.2) as one pass: the LINE gate (terminal punctuation, >= 3
    // words, no "javascript") runs as the native codegen'd C4LineGate;
    // the PAGE rules (lorem ipsum / "{" / blocklist word / minimum
    // sentences, first hit wins) are row-local string ops over the raw
    // page. Plants: every doc gets 5 lines with deterministic rule
    // violations (no-terminal line at %3!=0, javascript line at %4=0,
    // too-short line at %5=0, and per-%50 lorem-ipsum / brace /
    // blocklist pages), mirrored exactly in the oracle.
    ("t24_c4_rules", (s: SparkSession, d: String) => {
      val fns = graft.functions.GraftFunctions
      val planted = Tables.documents(s, d).select(col("doc_id"),
        array(
          concat(substring(col("text"), 1, 40), lit(".")),
          concat(substring(col("text"), 41, 35),
            when(col("doc_id") % 3 === 0, "?").otherwise("")),
          when(col("doc_id") % 4 === 0, lit("click here javascript required."))
            .otherwise(concat(substring(col("text"), 76, 30), lit("!"))),
          when(col("doc_id") % 5 === 0, lit("buy now."))
            .otherwise(concat(substring(col("text"), 106, 25), lit("."))),
          when(col("doc_id") % 50 === 0, lit("lorem ipsum dolor sit amet."))
            .when(col("doc_id") % 50 === 1, lit("stray markup { present here."))
            .when(col("doc_id") % 50 === 2, lit("what the frak is this."))
            .otherwise(concat(substring(col("text"), 131, 20), lit(".")))
        ).as("lines"))
      val gated = planted.select(col("doc_id"),
        fns.c4_line_gate(col("lines"), minWords = 3,
          banned = Seq("javascript")).as("kept"),
        lower(concat_ws(" ", col("lines"))).as("page_l"))
      val m = gated.select(col("doc_id"),
        size(col("kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("kept")).as("cleaned"),
        size(regexp_extract_all(concat_ws(" ", col("kept")),
          lit("[.!?]"), lit(0))).cast("long").as("n_sentences"),
        col("page_l"))
      m.select(col("doc_id"), col("n_kept"), col("n_sentences"),
        when(instr(col("page_l"), "lorem ipsum") > 0, "lorem_ipsum")
          .when(instr(col("page_l"), "{") > 0, "brace")
          .when(fns.marker_count(split(col("page_l"), "\\s+"),
            Seq("frak", "gorram", "smeg")) > 0, "blocklist")
          .when(col("n_sentences") < 3, "too_few_sentences")
          .otherwise("keep").as("verdict"),
        md5(col("cleaned")).as("cleaned_md5"),
        length(col("cleaned")).cast("long").as("cleaned_len"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH planted AS (
        SELECT doc_id, [
          substr(text, 1, 40) || '.',
          substr(text, 41, 35) || CASE WHEN doc_id % 3 = 0 THEN '?' ELSE '' END,
          CASE WHEN doc_id % 4 = 0 THEN 'click here javascript required.'
               ELSE substr(text, 76, 30) || '!' END,
          CASE WHEN doc_id % 5 = 0 THEN 'buy now.'
               ELSE substr(text, 106, 25) || '.' END,
          CASE WHEN doc_id % 50 = 0 THEN 'lorem ipsum dolor sit amet.'
               WHEN doc_id % 50 = 1 THEN 'stray markup { present here.'
               WHEN doc_id % 50 = 2 THEN 'what the frak is this.'
               ELSE substr(text, 131, 20) || '.' END] AS lines
        FROM documents),
      gated AS (
        SELECT doc_id,
          list_filter(lines, l -> regexp_matches(l, '[.!?]$')
            AND len(string_split_regex(trim(l), '\s+')) >= 3
            AND strpos(lower(l), 'javascript') = 0) AS kept,
          lower(array_to_string(lines, ' ')) AS page_l
        FROM planted),
      m AS (
        SELECT doc_id,
          CAST(len(kept) AS BIGINT) AS n_kept,
          array_to_string(kept, ' ') AS cleaned,
          CAST(len(regexp_extract_all(array_to_string(kept, ' '), '[.!?]'))
            AS BIGINT) AS n_sentences,
          page_l
        FROM gated)
      SELECT doc_id, n_kept, n_sentences,
        CASE WHEN strpos(page_l, 'lorem ipsum') > 0 THEN 'lorem_ipsum'
             WHEN strpos(page_l, '{') > 0 THEN 'brace'
             WHEN len(list_filter(string_split_regex(page_l, '\s+'),
               t -> t IN ('frak', 'gorram', 'smeg'))) > 0 THEN 'blocklist'
             WHEN n_sentences < 3 THEN 'too_few_sentences'
             ELSE 'keep' END AS verdict,
        md5(cleaned) AS cleaned_md5,
        CAST(length(cleaned) AS BIGINT) AS cleaned_len
      FROM m ORDER BY doc_id""")),

    // Within-document repetition removal: split into paragraphs, drop
    // repeats keeping first occurrence, reassemble in order. The planted
    // view gives every doc 4 paragraphs with the first repeated (the
    // crawl-dedup shape: header/body/header/footer).
    ("t12_para_dedup", (s: SparkSession, d: String) => {
      val planted = Tables.documents(s, d).withColumn("ptext",
        concat_ws(" ~ ",
          substring(col("text"), 1, 50), substring(col("text"), 51, 40),
          substring(col("text"), 1, 50), substring(col("text"), 91, 30)))
      val paras = planted
        .select(col("doc_id"), posexplode(split(col("ptext"), " ~ ")))
        .toDF("doc_id", "pos", "para")
      paras
        .groupBy(col("doc_id"), col("para"))
        .agg(min(col("pos")).as("pos"))
        .groupBy(col("doc_id"))
        .agg(
          concat_ws(" ~ ", transform(
            array_sort(collect_list(struct(col("pos"), col("para")))),
            x => x.getField("para"))).as("cleaned"),
          count(lit(1)).as("n_unique"))
        .withColumn("cleaned_md5", md5(col("cleaned")))
        .select(col("doc_id"), col("n_unique"), col("cleaned_md5"),
          length(col("cleaned")).cast("long").as("cleaned_len"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH planted AS (
        SELECT doc_id,
          substr(text, 1, 50) || ' ~ ' || substr(text, 51, 40) || ' ~ ' ||
          substr(text, 1, 50) || ' ~ ' || substr(text, 91, 30) AS ptext
        FROM documents),
      p AS (
        SELECT doc_id, unnest(list_transform(
          range(1, len(string_split(ptext, ' ~ ')) + 1),
          i -> {'pos': i, 'para': string_split(ptext, ' ~ ')[i]})) AS u
        FROM planted),
      f AS (SELECT doc_id, u.pos AS pos, u.para AS para FROM p),
      m AS (SELECT doc_id, para, min(pos) AS pos FROM f GROUP BY 1, 2)
      SELECT doc_id, count(*) AS n_unique,
        md5(string_agg(para, ' ~ ' ORDER BY pos)) AS cleaned_md5,
        CAST(length(string_agg(para, ' ~ ' ORDER BY pos)) AS BIGINT) AS cleaned_len
      FROM m GROUP BY doc_id ORDER BY doc_id""")),

    // Boilerpipe-style main-content extraction, oracle-gated by the
    // planted-effective-outcome discipline: every doc's page carries a
    // nav bar (link density 1 → boilerplate), a long lead paragraph
    // (41-50 words → content via the >40 rule even after a link-dense
    // predecessor), a second paragraph (17-21 words → content via the
    // >16 rule with a clean predecessor), a related-links stub (2/3
    // link density → boilerplate), and a footer trapped by the stricter
    // after-link-dense branch (7 words, no next). DuckDB rebuilds the
    // exact surviving text from the plant rule, so a segmentation,
    // word-count, link-density, or neighbor-rule bug breaks the hash.
    ("t44_main_content", (s: SparkSession, d: String) => {
      val n2 = (col("doc_id") % 10 + 41).cast("int")
      val n3m3 = (col("doc_id") % 5 + 14).cast("int")
      def toks(prefix: String, n: Column): Column =
        concat_ws(" ", transform(sequence(lit(0), n - 1),
          j => concat(lit(prefix), j.cast("string"))))
      val page = concat(
        lit("<html><body><nav><a href=\"/\">Home</a> " +
          "<a href=\"/a\">About</a> <a href=\"/c\">Contact</a></nav>"),
        lit("<p>"), toks("w", n2), lit("</p>"),
        lit("<p>A &amp; B "), toks("v", n3m3), lit("</p>"),
        lit("<p>Related: <a href=\"/x\">more</a> <a href=\"/y\">links</a></p>"),
        lit("<footer>Copyright 2025 Example Corp All rights reserved" +
          "</footer></body></html>"))
      mainContent(Tables.documents(s, d).select(col("doc_id"), page.as("html")))
        .select(col("doc_id"), md5(col("main_text")).as("main_md5"),
          length(col("main_text")).cast("long").as("main_len"),
          col("n_blocks"), col("n_content_blocks"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH b2 AS (
        SELECT doc_id, string_agg('w' || j, ' ' ORDER BY j) AS t2
        FROM (SELECT doc_id, CAST(unnest(range(0, 41 + doc_id % 10)) AS BIGINT)
            AS j FROM documents) x
        GROUP BY doc_id),
      b3 AS (
        SELECT doc_id, 'A & B ' || string_agg('v' || j, ' ' ORDER BY j) AS t3
        FROM (SELECT doc_id, CAST(unnest(range(0, 14 + doc_id % 5)) AS BIGINT)
            AS j FROM documents) x
        GROUP BY doc_id),
      mt AS (
        SELECT b2.doc_id, t2 || chr(10) || t3 AS main_text
        FROM b2 JOIN b3 ON b2.doc_id = b3.doc_id)
      SELECT doc_id, md5(main_text) AS main_md5,
        CAST(length(main_text) AS BIGINT) AS main_len,
        CAST(5 AS INTEGER) AS n_blocks,
        CAST(2 AS INTEGER) AS n_content_blocks
      FROM mt ORDER BY doc_id""")),

    // HTML → text extraction. The planted page wraps every doc's text in
    // a deterministic full-page scaffold — head with style+script (the
    // script body contains a bare '<' to prove lazy-match containment),
    // comments, block structure, and all five decoded entities — so the
    // extraction is exercised against known ground truth end-to-end.
    ("t27_html_strip", (s: SparkSession, d: String) => {
      val page = concat(
        lit("<html><head><title>Doc</title>"),
        lit("<style type=\"text/css\">p { color: red; }</style>"),
        lit("<script src=\"a.js\">var x = 1 < 2 && y > 0;</script></head>"),
        lit("<body><!-- header -->\n<h1>Doc "), col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"),
        lit("</p><div class=\"f\">&amp;copy; site &lt;"), col("source"),
        lit("&gt; &quot;fine&quot; &#39;print&#39;&nbsp;end</div></body></html>"))
      Tables.documents(s, d)
        .select(col("doc_id"), htmlToText(page).as("cleaned"))
        .select(col("doc_id"),
          md5(col("cleaned")).as("clean_md5"),
          length(col("cleaned")).cast("long").as("clean_len"),
          size(split(col("cleaned"), "\n", -1)).cast("long").as("n_lines"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH page AS (
        SELECT doc_id,
          '<html><head><title>Doc</title>' ||
          '<style type="text/css">p { color: red; }</style>' ||
          '<script src="a.js">var x = 1 < 2 && y > 0;</script></head>' ||
          '<body><!-- header -->' || chr(10) || '<h1>Doc ' || doc_id ||
          '</h1><p>' || text ||
          '</p><div class="f">&amp;copy; site &lt;' || source ||
          '&gt; &quot;fine&quot; &#39;print&#39;&nbsp;end</div></body></html>'
            AS h
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
            '^\n|\n$', '', 'g')) AS cleaned
        FROM decoded)
      SELECT doc_id, md5(cleaned) AS clean_md5,
        CAST(length(cleaned) AS BIGINT) AS clean_len,
        CAST(len(string_split(cleaned, chr(10))) AS BIGINT) AS n_lines
      FROM cleaned ORDER BY doc_id""")),

    // URL-level dedup by canonical form. Every 3rd doc plants one of
    // four raw variants of the same logical page (case, default port,
    // www, tracking params, fragment, trailing slash) — three of the
    // four collapse to one canonical https URL, the http variant stays
    // distinct (scheme is meaning, not noise).
    ("t28_url_canon", (s: SparkSession, d: String) => {
      val k = (col("doc_id") % 5).cast("string")
      val m = (col("doc_id") % 20).cast("string")
      val v = ((col("doc_id") % 12) / lit(3)).cast("int")
      val raw = when(v === 0, concat(
          lit("HTTPS://WWW.Site"), k, lit(".Example.com:443/p/"), m,
          lit("/?utm_source=x&id="), m, lit("#frag")))
        .when(v === 1, concat(
          lit("https://site"), k, lit(".example.com/p/"), m, lit("?id="), m))
        .when(v === 2, concat(
          lit("http://Site"), k, lit(".example.com:80/p/"), m,
          lit("/?id="), m, lit("&utm_campaign=c")))
        .otherwise(concat(
          lit("https://www.site"), k, lit(".example.com/p/"), m,
          lit("?id="), m, lit("&gclid=g1")))
      Tables.documents(s, d).filter(col("doc_id") % 3 === 0)
        .select(raw.as("url"))
        .select(col("url"), canonicalUrl(col("url")).as("canonical"))
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("url")).as("n_raw_forms"))
        .orderBy(col("canonical"))
    },
    Some("""WITH planted AS (
        SELECT doc_id,
          CASE (doc_id % 12) // 3
            WHEN 0 THEN 'HTTPS://WWW.Site' || (doc_id % 5) ||
              '.Example.com:443/p/' || (doc_id % 20) ||
              '/?utm_source=x&id=' || (doc_id % 20) || '#frag'
            WHEN 1 THEN 'https://site' || (doc_id % 5) ||
              '.example.com/p/' || (doc_id % 20) || '?id=' || (doc_id % 20)
            WHEN 2 THEN 'http://Site' || (doc_id % 5) ||
              '.example.com:80/p/' || (doc_id % 20) ||
              '/?id=' || (doc_id % 20) || '&utm_campaign=c'
            ELSE 'https://www.site' || (doc_id % 5) ||
              '.example.com/p/' || (doc_id % 20) ||
              '?id=' || (doc_id % 20) || '&gclid=g1'
          END AS url
        FROM documents WHERE doc_id % 3 = 0),
      parts AS (
        SELECT url,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
            AS scheme,
          lower(regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
          regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS rawpath,
          regexp_extract(url, '\?([^#]*)', 1) AS q
        FROM planted),
      canon AS (
        SELECT url,
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
          CASE WHEN array_to_string(list_filter(string_split(q, '&'),
                 p -> NOT regexp_matches(p,
                   '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=')
                 AND p <> ''), '&') = ''
               THEN ''
               ELSE '?' || array_to_string(list_filter(string_split(q, '&'),
                 p -> NOT regexp_matches(p,
                   '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=')
                 AND p <> ''), '&')
          END AS canonical
        FROM parts)
      SELECT canonical, CAST(count(*) AS BIGINT) AS n_urls,
        CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms
      FROM canon GROUP BY canonical ORDER BY canonical""")),

    // t36's registered SCALE TWIN (r11 VERDICT item 3): same CCNet
    // head/middle/tail semantics, but the token-mass cuts come from a
    // score HISTOGRAM (one aggregation to ≤2^16 bins + a bounded driver
    // walk) instead of a corpus-wide single-partition window — plan
    // asserted window-free in CurateSpec. Rows-only (within-crossing-bin
    // membership is the resolution given up); agreement with t36 away
    // from the two crossing bins is spec-gated.
    ("t41_ccnet_buckets_scale", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      perplexityBucketsScale(docs, docs.filter(col("lang") === "en"))
        .orderBy(col("doc_id"))
    }, None),

    // Declared-language extraction off the <html lang=…> attribute —
    // planted page classes cycle attribute casing, quoting styles,
    // region subtags, attribute position, and a decoy lang on a NON-html
    // tag that must not match; DuckDB runs the same shared-dialect regex
    // over the same plant.
    ("t42_html_lang", (s: SparkSession, d: String) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 4 === 0,
            concat(lit("<html LANG=\"EN-us\"><body>"), col("text"),
              lit("</body></html>")))
          .when(col("doc_id") % 4 === 1,
            concat(lit("<html dir=ltr lang='fr'><body>"), col("text"),
              lit("</body></html>")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("<html><body lang=\"es\">"), col("text"),
              lit("</body></html>")))
          .otherwise(
            concat(lit("<HTML lang=de-AT><body>"), col("text"),
              lit("</body></html>")))
          .as("html"))
        .select(col("doc_id"), htmlLang(col("html")).as("html_lang"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH pages AS (
        SELECT doc_id,
          CASE CAST(doc_id % 4 AS INTEGER)
            WHEN 0 THEN '<html LANG="EN-us"><body>' || text || '</body></html>'
            WHEN 1 THEN '<html dir=ltr lang=''fr''><body>' || text || '</body></html>'
            WHEN 2 THEN '<html><body lang="es">' || text || '</body></html>'
            ELSE '<HTML lang=de-AT><body>' || text || '</body></html>'
          END AS html
        FROM documents)
      SELECT doc_id,
        lower(string_split(regexp_extract(html,
          '(?i)<html\b[^>]*?\slang\s*=\s*["'']?([A-Za-z][A-Za-z-]*)', 1),
          '-')[1]) AS html_lang
      FROM pages ORDER BY doc_id"""))
  )
}
