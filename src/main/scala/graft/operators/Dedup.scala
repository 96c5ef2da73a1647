package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.functions.GraftFunctions

/** Deduplication family for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH (shingle → signature → banded bucket join
  * → exact-Jaccard verify), SimHash signatures, and exact n-gram Jaccard
  * as the quadratic baseline the LSH path replaces at scale.
  *
  * Scale notes: signatures are computed **row-locally** with codegen'd
  * array expressions (no explode of the corpus); the only shuffles are
  * the band-bucket join (keys ≈ corpus × bands, but each row is just
  * (band_key, doc_id)) and the candidate verification join. At 100 TB the
  * quadratic baseline is infeasible by design — it exists as the
  * correctness oracle at small SF.
  */
object Dedup {

  /** Distinct word n-gram shingles of `text` (n=3); short docs fall back
    * to the whole text as one shingle. Native codegen'd expression — the
    * composed `transform`+`element_at` form evaluated interpreted on
    * every corpus scan (see [[graft.functions.WordGrams]]). */
  def shingles(text: Column, n: Int = 3): Column =
    GraftFunctions.word_grams(text, n)

  /** MinHash signature of the word-3-gram shingles of `tokens` — the
    * native [[graft.functions.MinHashSig]] expression (row-local, no
    * shuffle; see its scaladoc for why not composed HOFs). */
  def minhashSignature(tokens: Column, k: Int = 12): Column =
    GraftFunctions.minhash_sig(tokens, 3, k)

  /** Banded LSH keys from a signature: b bands of r rows each, keyed by
    * xxhash64 of the band slice. */
  def bandKeys(sig: Column, b: Int = 4, r: Int = 3): Column =
    array((0 until b).map { bi =>
      struct(lit(bi).as("band"),
        xxhash64((0 until r).map(j => element_at(sig, bi * r + j + 1)): _*).as("key"))
    }: _*)

  /** Candidate near-dup pairs via MinHash-LSH, verified with exact
    * Jaccard ≥ `tau`. Returns (doc_a, doc_b, jaccard).
    *
    * `maxBucket` caps the size of any (band, key) bucket before the
    * self-join (see [[Scale.capBuckets]]) — the skew guard that keeps a
    * degenerate boilerplate bucket from turning the join quadratic.
    */
  def minhashNearDups(docs: DataFrame, tau: Double = 0.5,
      k: Int = 12, b: Int = 4, r: Int = 3,
      maxBucket: Int = 100): DataFrame = {
    // banded signatures (row-local native expression); the PRE-cap keyed
    // frame is what persists — capBuckets reads it twice (bucket counts +
    // anti-join probe) and the self-join twice more, and each read is a
    // cheap cached scan of (doc_id, band, key) triples instead of a
    // signature recomputation over the corpus. The capped frame itself
    // stays a broadcast anti-join over the cache — no second
    // materialization.
    val keyed = docs
      .withColumn("bands",
        bandKeys(minhashSignature(split(trim(col("text")), "\\s+"), k), b, r))
      .select(col("doc_id"), explode(col("bands")).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    minhashNearDupsKeyed(docs, keyed, tau, maxBucket)
  }

  /** As [[minhashNearDups]], but over a caller-supplied `(doc_id, band,
    * key)` banded-keys frame. A caller that already computed (and
    * persisted) the band keys for another probe — [[DedupIndex
    * .dedupAgainst]] probes the stored bucket table with them — reuses
    * that cache here instead of paying a second signature pass over the
    * same documents. The caller owns `keyed`'s persistence. */
  def minhashNearDupsKeyed(docs: DataFrame, keyed: DataFrame,
      tau: Double = 0.5, maxBucket: Int = 100): DataFrame = {
    val banded = Scale.capBuckets(keyed, Seq("band", "key"), maxBucket)

    // the candidate pairs feed the id union (twice) and the final two
    // verify joins — persisted or the bucket self-join re-executes per
    // reference (the same trap the banded stage above guards against)
    val cands = banded.alias("x").join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // exact-Jaccard verification builds shingle arrays only for candidate
    // docs (left-semi prune first — at 100 TB the candidate set is tiny
    // next to the corpus); persisted because both verify joins read it.
    // No distinct on the id union: the right side of a left-semi join
    // tolerates duplicates (the build set dedups inherently), and the
    // pair list is bucket-capped so the union stays ≤ 2·|pairs|
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id")))
    val candSh = docs.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    cands
      .join(candSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(candSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** The b per-band bucket hashes of a MinHash signature — band index
    * mixed into the band-slice hash, so one long identifies a (band,
    * bucket) pair. Used identically on the index and probe sides of
    * [[nearDupAdmission]] (same expression tree ⇒ same hashes). */
  private def bandHashes(sig: Column, b: Int, r: Int): Seq[Column] =
    (0 until b).map { bi =>
      xxhash64(lit(bi),
        xxhash64((0 until r).map(j => element_at(sig, bi * r + j + 1)): _*))
    }

  /** Near-dup admission filter — the continuous-crawl shape: flag each
    * arriving document whose banded MinHash keys collide with the
    * already-admitted corpus. The corpus bucket index is compressed into
    * a broadcast Bloom filter over its (band, bucket) hashes, so the
    * per-document check is b codegen'd probes with NO join, NO shuffle,
    * and no streaming state — `docs` can be a batch frame or an
    * append-mode stream (stream-safe: no aggregation or watermark
    * required). False positives (rate `fpp`) only send a clean document
    * to the downstream exact-verify path ([[minhashNearDups]] on the
    * flagged subset); false negatives don't exist, matching Bloom
    * semantics — the screen has LSH's recall, not less.
    *
    * At 100 TB the index is ~n·b longs through a Bloom filter —
    * gigabytes per billion documents at 1% fpp, executor-broadcastable,
    * and rebuildable incrementally per admitted batch. */
  def nearDupAdmission(docs: DataFrame, corpus: DataFrame,
      k: Int = 12, b: Int = 4, r: Int = 3,
      expectedBuckets: Long = 0, fpp: Double = 0.01): DataFrame =
    nearDupAdmissionWith(docs, admissionIndex(corpus, k, b, r,
      expectedBuckets, fpp), k, b, r)

  /** The admission filter's index: a Bloom over the corpus's (band,
    * bucket) hashes. Exposed so a continuous-crawl caller builds it ONCE
    * and grows it per admitted batch with [[growAdmissionIndex]] instead
    * of re-scanning the whole corpus every micro-batch. */
  def admissionIndex(corpus: DataFrame, k: Int = 12, b: Int = 4, r: Int = 3,
      expectedBuckets: Long = 0,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    val sigOf = (t: Column) => minhashSignature(split(trim(t), "\\s+"), k)
    val indexKeys = corpus
      .select(explode(array(bandHashes(sigOf(col("text")), b, r): _*)).as("h"))
    // expectedBuckets sizes the filter without an extra pass; defaulting
    // to one count() over the static corpus is fine — it is the indexed
    // side, not the stream. For a growing index, pass the CAPACITY the
    // crawl plans for: Bloom fpp guarantees hold for the sized capacity,
    // not the current fill.
    val n = if (expectedBuckets > 0) expectedBuckets
      else math.max(1L, indexKeys.count())
    indexKeys.stat.bloomFilter("h", n, fpp)
  }

  /** Fold an admitted batch's bucket hashes into an existing index
    * (Bloom union = bitwise OR — mergeInPlace), returning it for
    * rebroadcast. The incremental crawl loop: probe batch i against the
    * index, admit the clean docs, grow the index with exactly those,
    * probe batch i+1.
    *
    * The batch's own Bloom is built DISTRIBUTED (`stat.bloomFilter`
    * aggregates per-partition filters and tree-merges the bitmaps), so
    * nothing row-shaped ever funnels through the driver — a backfill or
    * crawl-burst batch costs one bitmap per partition, not b×batch
    * longs collected. `capacity`/`fpp` MUST equal the values the index
    * was sized with ([[admissionIndex]]'s `expectedBuckets`/`fpp`):
    * Spark derives bit width and hash count from (n, fpp), so identical
    * parameters are what make the two filters merge-compatible — and a
    * union of the same inserted items yields the same bitset as a
    * from-scratch rebuild (Bloom insertion is deterministic). */
  def growAdmissionIndex(index: org.apache.spark.util.sketch.BloomFilter,
      admitted: DataFrame, capacity: Long, fpp: Double = 0.01,
      k: Int = 12, b: Int = 4, r: Int = 3)
      : org.apache.spark.util.sketch.BloomFilter = {
    val sigOf = (t: Column) => minhashSignature(split(trim(t), "\\s+"), k)
    val batchBloom = admitted
      .select(explode(array(bandHashes(sigOf(col("text")), b, r): _*)).as("h"))
      .stat.bloomFilter("h", capacity, fpp)
    index.mergeInPlace(batchBloom)
    index
  }

  /** Probe `docs` against a prebuilt admission index (see
    * [[admissionIndex]]); the per-document check stays b codegen'd Bloom
    * probes — no join, no shuffle, no state. */
  def nearDupAdmissionWith(docs: DataFrame,
      index: org.apache.spark.util.sketch.BloomFilter,
      k: Int = 12, b: Int = 4, r: Int = 3): DataFrame = {
    val sigOf = (t: Column) => minhashSignature(split(trim(t), "\\s+"), k)
    val bc = docs.sparkSession.sparkContext.broadcast(index)
    docs.withColumn("sig", sigOf(col("text")))
      .withColumn("dup_candidate",
        bandHashes(col("sig"), b, r)
          .map(h => GraftFunctions.bloom_might_contain(h, bc))
          .reduce(_ || _))
      .drop("sig")
  }

  /** SimHash near-dup pairs at hamming ≤ `maxHamming`: candidates from
    * equality on any of `blocks` key windows over the 64-bit signature,
    * verified by exact hamming distance.
    *
    * Scale posture: the key WIDTH derives from the corpus size
    * ([[Scale.lshBitsFor]], 16..30 bits) — block i's key is the
    * `keyBits`-wide window of the signature rotated by i·(64/blocks), so
    * bucket count grows with the data and expected occupancy stays O(1).
    * At ≤2M docs this reduces to the classic 4×16-bit pigeonhole split
    * (any pair at hamming ≤ 3 shares an untouched block exactly; ≤ 6 is
    * a high-recall screen); wider keys overlap adjacent blocks, keeping
    * 4 tables while shrinking buckets — the round-2 form's fixed 65 536
    * buckets per block re-quadratified the self-join at scale.
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 6,
      blocks: Int = 4, keyBits: Int = 0, maxBucket: Int = 100): DataFrame = {
    val sh = graft.functions.GraftFunctions.simhash64(
      split(lower(trim(col("text"))), "\\s+"))
    hammingNearDups(docs.select(col("doc_id"), sh.as("simhash")), "simhash",
      maxHamming, blocks, keyBits, maxBucket)
  }

  /** Banded hamming-≤k pairs over ANY (doc_id, 64-bit signature) frame —
    * the simhash join machinery factored out so other per-document
    * signatures (the image perceptual hash in [[Multimodal]]) share the
    * same screen-then-verify discipline: rotated key windows as the
    * candidate screen, [[Scale.capBuckets]] as the skew guard, exact
    * `bit_count(xor)` as the verdict.
    *
    * `sigCount`: pre-computed row count used to size the LSH keys when
    * `keyBits` is 0. Callers whose `sigs` frame is expensive to produce
    * (a media-decode kernel Spark cannot prune under a count aggregate)
    * should count their cheap RAW input — same cardinality, one row per
    * input — and pass it here so the decode runs once, not twice. */
  def hammingNearDups(sigs: DataFrame, hashCol: String, maxHamming: Int,
      blocks: Int = 4, keyBits: Int = 0, maxBucket: Int = 100,
      sigCount: Long = -1L): DataFrame = {
    val bits = if (keyBits > 0) keyBits
      else Scale.lshBitsFor(if (sigCount >= 0) sigCount else sigs.count(),
        targetOccupancy = 32, minBits = 16, maxBits = 30)
    val mask = (1L << bits) - 1
    val keyed = sigs.select(col("doc_id"), col(hashCol).as("simhash"))
      .select(col("doc_id"), col("simhash"),
        explode(array((0 until blocks).map { i =>
          val off = i * (64 / blocks)
          // keyBits-wide window of the signature rotated by `off`
          // (Java shift semantics: << 64 is a no-op, so off=0 is h & mask)
          val rot = shiftrightunsigned(col("simhash"), off)
            .bitwiseOR(shiftleft(col("simhash"), 64 - off))
          struct(lit(i).as("blk"), rot.bitwiseAND(lit(mask)).as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.blk"), col("bk.key"))
      // pre-cap persist: the cap's two reads (counts + probe) and the
      // self-join's two sides all scan this cache instead of recomputing
      // simhash over the corpus per reference
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = Scale.capBuckets(keyed, Seq("blk", "key"), maxBucket)
    capped.alias("x").join(capped.alias("y"),
        col("x.blk") === col("y.blk") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sim_a"), col("y.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Partial-copy (containment) pairs via winnowing-fingerprint overlap:
    * every document contributes its fingerprint set
    * ([[GraftFunctions.winnow_fingerprint]] — any shared substring of
    * length ≥ w+k-1 chars shares a print), pairs sharing ≥ `minShared`
    * prints are scored by the OVERLAP COEFFICIENT |A∩B| / min(|A|,|B|) —
    * the containment measure: a short document embedded verbatim inside
    * a long one scores ~1.0 where Jaccard washes out toward 0. This is
    * the copy-detection operator MinHash (whole-doc similarity) is not.
    *
    * Scale: fingerprints are row-local; the only shuffles carry
    * (print, doc_id) pairs and the grouped pair counts. Boilerplate
    * prints shared by everything are exactly the LSH hot-bucket problem
    * — same guard, [[Scale.capBuckets]] on the print key.
    */
  def winnowOverlapPairs(docs: DataFrame, minOverlap: Double = 0.8,
      k: Int = 8, w: Int = 16, minShared: Int = 2,
      maxBucket: Int = 100): DataFrame = {
    val fps = docs.select(col("doc_id"),
        array_distinct(GraftFunctions.winnow_fingerprint(col("text"), k, w)).as("fp"))
      .filter(size(col("fp")) > 0)
      // read by the keyed explode AND the per-doc weight totals
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = fps.select(col("doc_id"), explode(col("fp")).as("print"))
    // IDF weighting: a print shared by half the corpus says nothing
    // about copying (boilerplate); one shared by two documents says a
    // lot. weight = ln((N+1)/(df+1)) — the same smoothing as text IDF —
    // so scores measure shared RARE content, complementing capBuckets
    // (which only guards the join's pair count, not the score).
    val nDocs = fps.count()
    val weights = exploded.groupBy(col("print"))
      .agg(count(lit(1)).as("df"))
      .withColumn("wt", log((lit(nDocs + 1).cast(DoubleType)) /
        (col("df") + 1).cast(DoubleType)))
    val keyed = Scale.capBuckets(exploded, Seq("print"), maxBucket)
      .join(weights.select(col("print"), col("df"), col("wt")), "print")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // totals come from the SAME capped projection the pair join uses —
    // a print dropped by capBuckets is excluded from numerator AND
    // denominator, so a doc whose prints land in hot buckets is scored
    // over its surviving prints instead of being silently unreachable
    // (capped numerator over uncapped denominator could never hit
    // minOverlap even for a true verbatim containment)
    val totals = keyed.groupBy(col("doc_id")).agg(sum(col("wt")).as("tot_wt"))
    // a df=1 print exists in exactly one document — it can never match
    // across documents, so it's dead weight in the self-join (typically
    // MOST prints: unique content dominates any real corpus). Dropping
    // it from BOTH join inputs leaves the output bit-identical: shared
    // prints have df >= 2 by definition, and denominators above still
    // count the unique prints as non-shared content
    val joinable = keyed.filter(col("df") >= 2)
    val shared = joinable.alias("x").join(joinable.alias("y"),
        col("x.print") === col("y.print") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      // fp arrays are distinct → count = |A∩B|, sum = shared weight
      .agg(count(lit(1)).as("n_shared"), sum(col("x.wt")).as("shared_wt"))
      .filter(col("n_shared") >= minShared)
    shared
      .join(totals.select(col("doc_id").as("doc_a"), col("tot_wt").as("wa")), "doc_a")
      .join(totals.select(col("doc_id").as("doc_b"), col("tot_wt").as("wb")), "doc_b")
      .withColumn("overlap", col("shared_wt") / least(col("wa"), col("wb")))
      .filter(col("overlap") >= minOverlap)
      .select(col("doc_a"), col("doc_b"), col("overlap"))
  }

  /** Exact-substring dedup (Lee et al. 2021, arXiv 2107.06499 §4.1 —
    * "ExactSubstr"): remove every token covered by a substring of at
    * least `minLen` tokens that occurs more than once anywhere in the
    * corpus (including within one document). The n-gram-anchored
    * distributed form: a position is covered by a duplicated >= minLen
    * substring IFF some duplicated minLen-gram covers it (every length-
    * minLen window of a duplicated substring is itself duplicated), so
    * the union of duplicated-gram spans IS the union of duplicated
    * substrings — no suffix array needed, just dataflow:
    *
    *   1. one corpus-wide positional gram explode (native [[WordGrams]]
    *      occurrence mode — index = start position),
    *   2. a gram census (`count >= 2`; partial aggregation shrinks hot
    *      grams map-side) semi-joined back to keep duplicated positions
    *      — a boilerplate gram shared by a large corpus fraction skews
    *      this join's probe side, which AQE's skew-split handles (the
    *      build side is one row per gram, so splitting is always safe),
    *   3. per-document span merge — the classic gaps-and-islands pair of
    *      running-max/lag windows, partitioned by doc_id so no document
    *      ever concentrates a task beyond its own length,
    *   4. a row-local cut: kept text = the gap slices between spans
    *      (O(n_tok) slice copies; never an exists() probe per token).
    *
    * Scale: the exploded frame is read twice (census + probe) and
    * persisted. With `hashGrams=true` the join key is `xxhash64` of the
    * gram, so what persists and shuffles is (doc_id, pos, long) ≈
    * token-stream-sized — not minLen× the corpus; a hash collision can
    * only over-remove one rare span (the Bloom-style trade every
    * at-scale dedup makes). String keys (the default) are for the
    * DuckDB oracle, which must join on the same value in both engines.
    */
  def substringDedup(docs: DataFrame, minLen: Int = 50,
      hashGrams: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = if (hashGrams) xxhash64(col("gram")) else col("gram")
    val grams = docs.select(col("doc_id"),
        posexplode(GraftFunctions.word_grams(col("text"), minLen, distinct = false))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), key.as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = grams.groupBy(col("k")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select(col("k"))
    val dupPos = grams.join(dup, Seq("k"), "left_semi")
    // gaps-and-islands: a new span starts where this gram's coverage
    // [pos, pos+minLen-1] leaves a genuine uncovered gap after the
    // running maximum end of everything before it
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = dupPos
      .withColumn("end", col("pos") + lit(minLen - 1))
      .withColumn("run_end", max(col("end")).over(cum))
      .withColumn("prev_end", lag(col("run_end"), 1).over(w))
      .withColumn("new_span",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1)
          .otherwise(0))
      .withColumn("span_id", sum(col("new_span")).over(cum))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("s"), max(col("end")).as("e"),
        count(lit(1)).as("n_pos"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("n_removed"),
        sum(col("n_pos")).as("n_dup_pos"),
        sort_array(collect_list(struct(col("s"), col("e")))).as("spans"))
    docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("spans",
        coalesce(col("spans"), array().cast("array<struct<s:int,e:int>>")))
      .withColumn("n_sp", size(col("spans")))
      // kept tokens = the n_sp+1 gap slices around the spans; per-gap
      // bounds come from element_at on the (small, sorted) span array,
      // so the cut is one flatten of slice() copies — linear in n_tok
      .withColumn("kept_tk", flatten(transform(
        sequence(lit(0), col("n_sp")),
        i => {
          val gs = when(i === 0, lit(0))
            .otherwise(element_at(col("spans"), i).getField("e") + 1)
          val ge = when(i === col("n_sp"), size(col("tk")) - 1)
            .otherwise(element_at(col("spans"), i + 1).getField("s") - 1)
          slice(col("tk"), gs + 1, greatest(ge - gs + 1, lit(0)))
        })))
      .select(col("doc_id"),
        size(col("tk")).as("n_tok"),
        coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        concat_ws(" ", col("kept_tk")).as("cleaned"))
  }

  /** C4's three-sentence-span deduplication (Raffel et al. 2020, JMLR
    * — §2.2: "we discard all but one of any three-sentence span
    * occurring more than once in the data set"), the SENTENCE-level
    * member of the dedup family (d01 whole-doc, d10 token runs):
    * documents split into sentences ([[TextAnalysis.sentenceSplit]] —
    * the shared-dialect terminal-punct rule; pre-mask abbreviations
    * upstream if the corpus needs it), every n consecutive sentences
    * form a span, and for each span text occurring ≥2 times corpus-wide
    * the lexicographically-first (doc_id, start) occurrence survives —
    * every other occurrence's sentences are removed. Deterministic
    * survivor rule ⇒ idempotent re-runs, like d01.
    *
    * Scale: sentence rows carry (doc, pos, text); spans come from two
    * per-doc `lead` windows (PARTITION BY doc — never global); the
    * census is one hash aggregation on the span key (partial map-side);
    * survivors ride a min(struct) over the same aggregation; the only
    * corpus-keyed joins are the span-key semi-join and the per-doc
    * anti-join of removed positions. `hashSpans` switches the census
    * key to xxhash64 for the at-scale shuffle (the d10 option). */
  def spanDedup(docs: DataFrame, n: Int = 3,
      hashSpans: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 2, s"span size $n")
    val sents = docs.select(col("doc_id"),
        posexplode(TextAnalysis.sentenceSplit(col("text")))
          .as(Seq("pos", "raw")))
      .select(col("doc_id"), col("pos"), trim(col("raw")).as("sent"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spanText = concat_ws(" ",
      (0 until n).map(i => if (i == 0) col("sent")
        else lead(col("sent"), i).over(w)): _*)
    val lastSent = lead(col("sent"), n - 1).over(w)
    val spans = sents
      .withColumn("last", lastSent)
      .withColumn("k",
        if (hashSpans) xxhash64(spanText) else md5(spanText))
      .filter(col("last").isNotNull)
      .select(col("doc_id"), col("pos"), col("k"))
      .localCheckpoint(true) // census + occurrence join both read it
    val dups = spans.groupBy(col("k"))
      .agg(count(lit(1)).as("occ"),
        min(struct(col("doc_id"), col("pos"))).as("surv"))
      .filter(col("occ") >= 2)
      .select(col("k"), col("surv.doc_id").as("sd"), col("surv.pos").as("sp"))
    val removed = spans.join(dups, Seq("k"))
      .filter(!(col("doc_id") === col("sd") && col("pos") === col("sp")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
      .distinct()
    val kept = sents.join(removed, Seq("doc_id", "pos"), "left_anti")
    val perDoc = sents.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sentences"))
    perDoc.join(
        kept.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_kept"),
            concat_ws(" ", transform(
              sort_array(collect_list(struct(col("pos"), col("sent")))),
              x => x.getField("sent"))).as("cleaned")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sentences"),
        (col("n_sentences") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Exact dedup by normalized-text hash. The corpus has no exact dups,
    // so a deterministic duplicated view (every 5th doc re-appears with
    // doc_id+1000000) exercises the grouping; survivor = min doc_id —
    // the reference's idempotent re-ingest rule (SURVEY §2.4 windows).
    ("d01_exact_dedup", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val dup = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val all = docs.unionByName(dup)
      all
        .withColumn("doc_md5", md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))))
        .groupBy(col("doc_md5"))
        .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("survivor_id"))
    },
    Some("""WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0)
      SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS doc_md5,
             min(doc_id) AS survivor_id, count(*) AS n_copies
      FROM all_docs GROUP BY 1 ORDER BY survivor_id""")),

    // Exact n-gram Jaccard over a deterministic doc sample — the
    // quadratic baseline (oracle-gated); the LSH query below is the
    // scale path over the full corpus. The sample is an ABSOLUTE cap
    // (doc_id < 100, ≤4950 pairs at any corpus size), not proportional:
    // a `% k` sample grows with the corpus and its pairs grow
    // quadratically, turning the registered query set itself into a
    // scale hazard.
    ("d02_ngram_jaccard", (s: SparkSession, d: String) => {
      val sample = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), shingles(col("text")).as("sh"))
      sample.alias("a").join(sample.alias("b"),
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          size(array_intersect(col("a.sh"), col("b.sh"))).cast(DoubleType).as("inter"),
          size(col("a.sh")).as("na"), size(col("b.sh")).as("nb"))
        .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
        .filter(col("jaccard") >= 0.02)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH sample AS (
        SELECT doc_id,
          CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
               THEN list_distinct(list_transform(
                 range(0, len(string_split_regex(trim(text), '\s+')) - 2),
                 i -> concat_ws(' ',
                   string_split_regex(trim(text), '\s+')[i+1],
                   string_split_regex(trim(text), '\s+')[i+2],
                   string_split_regex(trim(text), '\s+')[i+3])))
               ELSE [text] END AS sh
        FROM documents WHERE doc_id < 100)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM sample a JOIN sample b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.02
      ORDER BY doc_a, doc_b""")),

    // MinHash-LSH near-dup pairs over the FULL corpus (banded signatures
    // → bucket join → exact verify). Not SQL-expressible → rows-only
    // driver check; recall vs the quadratic baseline is asserted in
    // DedupSpec.
    ("d03_minhash_lsh", (s: SparkSession, d: String) => {
      minhashNearDups(Tables.documents(s, d), tau = 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    }, None),

    // d03's ORACLE TWIN (the d13/t51 family treatment): the IDENTICAL
    // banded pairs path — [[minhashNearDupsKeyed]] with its bucket cap
    // and exact-Jaccard verify — fed by the md5 hash family
    // ([[DedupIndex.keyedBandsMd5]]), so DuckDB replays signatures,
    // banding, the cap, the candidate self-join, and the verification;
    // d03 keeps the native FNV+xxhash family (adjudicated not
    // SQL-replayable, COVERAGE.md).
    ("d14_minhash_lsh_md5", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val keyed = DedupIndex.keyedBandsMd5(docs, 12, 4, 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      minhashNearDupsKeyed(docs, keyed, tau = 0.5, maxBucket = 100)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
               THEN list_distinct(list_transform(
                 range(0, len(string_split_regex(trim(text), '\s+')) - 2),
                 i -> concat_ws(' ',
                   string_split_regex(trim(text), '\s+')[i+1],
                   string_split_regex(trim(text), '\s+')[i+2],
                   string_split_regex(trim(text), '\s+')[i+3])))
               ELSE [text] END AS sh
        FROM documents),
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
      hot AS (
        SELECT band, key FROM bands GROUP BY band, key
        HAVING count(*) > 100),
      capped AS (
        SELECT b.* FROM bands b
        LEFT JOIN hot h ON b.band = h.band AND b.key = h.key
        WHERE h.band IS NULL),
      pairs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM capped x JOIN capped y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
      SELECT p.doc_a, p.doc_b,
        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          AS jaccard
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.doc_a
      JOIN sh sb ON sb.doc_id = p.doc_b
      WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          >= 0.5
      ORDER BY p.doc_a, p.doc_b""")),

    // d04's ORACLE TWIN, completing the md5-family set (d14 minhash,
    // t51 winnow, d15 simhash): a 60-bit SimHash whose per-token hash
    // is md5-derived — bit k's vote is the exact ±1 sum both engines
    // compute — packed and fed through the IDENTICAL
    // [[hammingNearDups]] machinery (16-bit key windows, bucket cap,
    // codegen'd bit_count(xor) verify). DuckDB replays token hashes,
    // votes, packing, banding, the cap, and the per-bit hamming; d04
    // keeps the native FNV family (adjudicated in COVERAGE.md).
    ("d15_simhash_md5", (s: SparkSession, d: String) => {
      // fixture-level scan widening (the Retrieval.docsWide treatment):
      // the per-token md5 explode otherwise runs as one serial task
      val docs = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
      val votes = docs
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .select(col("doc_id"),
          conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
            .as("h"))
        .groupBy(col("doc_id"))
        .agg(
          sum(when(shiftrightunsigned(col("h"), 0).bitwiseAND(lit(1L)) === 1L,
            1).otherwise(-1)).as("v0"),
          (1 until 60).map(k =>
            sum(when(shiftrightunsigned(col("h"), k)
                .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"v$k")): _*)
      val packed = votes.select(col("doc_id"),
        (0 until 60).map(k =>
          when(col(s"v$k") > 0, lit(1L << k)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
      hammingNearDups(packed, "simhash", maxHamming = 6, keyBits = 16)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH tok AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents),
      t2 AS (
        SELECT doc_id,
          CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM tok WHERE tok <> ''),
      bits AS (
        SELECT doc_id, k.range AS k,
          CASE WHEN sum(CASE WHEN ((h >> k.range) & 1) = 1
            THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS bit
        FROM t2 CROSS JOIN range(60) k
        GROUP BY doc_id, k.range),
      bands AS (
        SELECT doc_id, CAST(k // 16 AS INTEGER) AS blk,
          sum(bit * (1::BIGINT << CAST(k % 16 AS INTEGER))) AS key
        FROM bits GROUP BY doc_id, k // 16),
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
        JOIN bits bb ON bb.doc_id = c.doc_b AND bb.k = ba.k
        GROUP BY c.doc_a, c.doc_b)
      SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 6
      ORDER BY doc_a, doc_b""")),

    // SimHash near-dup pairs (size-derived key width — see
    // simhashNearDups scaladoc for the scale posture).
    ("d04_simhash_pairs", (s: SparkSession, d: String) =>
      simhashNearDups(Tables.documents(s, d), maxHamming = 6)
        .orderBy(col("doc_a"), col("doc_b")), None),

    // Partial-copy pairs by winnowing-fingerprint overlap (containment,
    // not whole-doc similarity). Rows-only; the selection guarantee and
    // planted-copy recall are spec-gated (WinnowSpec / LlmOpsSpec).
    ("d05_winnow_overlap", (s: SparkSession, d: String) =>
      winnowOverlapPairs(Tables.documents(s, d))
        .orderBy(col("doc_a"), col("doc_b")), None),

    // Exact-substring dedup (Lee et al. 2021 ExactSubstr) over the FULL
    // corpus: tokens covered by any duplicated 8-token run are cut, the
    // survivors reassemble in place. Fully relational (explode + census
    // + windows), so the whole computation — span accounting AND the
    // cleaned text itself — is oracle-gated against DuckDB.
    ("d10_substring_dedup", (s: SparkSession, d: String) =>
      substringDedup(Tables.documents(s, d), minLen = 8)
        .select(col("doc_id"), col("n_tok"), col("n_dup_pos"),
          col("n_spans"), col("n_removed"), md5(col("cleaned")).as("kept_md5"))
        .orderBy(col("doc_id")),
    Some("""WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        FROM documents),
      grams AS (
        SELECT doc_id, CAST(r.i AS INTEGER) AS pos,
          array_to_string(tk[r.i+1 : r.i+8], ' ') AS gram
        FROM toks, unnest(range(0, greatest(len(tk) - 7, 0))) AS r(i)),
      dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
      dpos AS (
        SELECT doc_id, pos, pos + 7 AS e FROM grams
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
      sp AS (
        SELECT doc_id, span_id, min(pos) AS s, max(e) AS e,
          count(*) AS n_pos
        FROM flagged GROUP BY doc_id, span_id),
      perdoc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
          CAST(sum(e - s + 1) AS BIGINT) AS n_removed,
          CAST(sum(n_pos) AS BIGINT) AS n_dup_pos
        FROM sp GROUP BY doc_id),
      tokens AS (
        SELECT doc_id, CAST(r.i - 1 AS INTEGER) AS pos, tk[r.i] AS tok
        FROM toks, unnest(range(1, len(tk) + 1)) AS r(i)),
      kept AS (
        SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS cleaned
        FROM tokens t
        WHERE NOT EXISTS (SELECT 1 FROM sp
          WHERE sp.doc_id = t.doc_id AND t.pos BETWEEN sp.s AND sp.e)
        GROUP BY t.doc_id)
      SELECT t.doc_id, CAST(len(t.tk) AS INTEGER) AS n_tok,
        coalesce(p.n_dup_pos, 0) AS n_dup_pos,
        coalesce(p.n_spans, 0) AS n_spans,
        coalesce(p.n_removed, 0) AS n_removed,
        md5(coalesce(k.cleaned, '')) AS kept_md5
      FROM toks t
      LEFT JOIN perdoc p ON t.doc_id = p.doc_id
      LEFT JOIN kept k ON t.doc_id = k.doc_id
      ORDER BY t.doc_id""")),

    // C4 three-sentence-span dedup (Raffel et al. 2020 §2.2) over
    // planted sentence structure: every doc gets five sentences; docs
    // ≡ 0 (mod 4) share an identical middle THREE-sentence run, so the
    // (1..3) span duplicates corpus-wide and every occurrence but the
    // (min doc, min pos) one loses those three sentences — while the
    // overlapping (0..2)/(2..4) spans stay unique via the per-doc
    // sentences. DuckDB RECOMPUTES the whole pipeline (t38's split
    // recipe → span self-joins → census → survivor → removal →
    // reassembly), so a split, window, census, survivor-rule, or
    // reassembly bug breaks the hash.
    ("d12_span_dedup", (s: SparkSession, d: String) => {
      def sent(j: Int): Column =
        when(col("doc_id") % 4 === 0 && lit(j) >= 1 && lit(j) <= 3,
          lit(j match {
            case 1 => "shared alpha one."
            case 2 => "shared beta two."
            case 3 => "shared gamma three."
            case _ => ""
          }))
          .otherwise(concat(lit("u"), col("doc_id").cast("string"),
            lit(s" w$j filler.")))
      val text = concat_ws(" ", (0 to 4).map(sent): _*)
      spanDedup(Tables.documents(s, d)
          .select(col("doc_id"), text.as("text")))
        .select(col("doc_id"), col("n_sentences"), col("n_removed"),
          md5(col("cleaned")).as("cleaned_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH docs_t AS (
        SELECT doc_id, concat_ws(' ',
          'u' || doc_id || ' w0 filler.',
          CASE WHEN doc_id % 4 = 0 THEN 'shared alpha one.'
            ELSE 'u' || doc_id || ' w1 filler.' END,
          CASE WHEN doc_id % 4 = 0 THEN 'shared beta two.'
            ELSE 'u' || doc_id || ' w2 filler.' END,
          CASE WHEN doc_id % 4 = 0 THEN 'shared gamma three.'
            ELSE 'u' || doc_id || ' w3 filler.' END,
          'u' || doc_id || ' w4 filler.') AS text
        FROM documents),
      arrs AS (
        SELECT doc_id, regexp_extract_all(text, '[^.!?]*[.!?]+') AS arr
        FROM docs_t),
      sent AS (
        SELECT doc_id, generate_subscripts(arr, 1) - 1 AS pos,
          trim(unnest(arr)) AS sent
        FROM arrs),
      sp AS (
        SELECT a.doc_id, a.pos,
          a.sent || ' ' || b.sent || ' ' || c.sent AS k
        FROM sent a
        JOIN sent b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN sent c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
      ranked AS (
        SELECT doc_id, pos, k,
          count(*) OVER (PARTITION BY k) AS occ,
          row_number() OVER (PARTITION BY k ORDER BY doc_id, pos) AS rn
        FROM sp),
      rem AS (
        SELECT DISTINCT r.doc_id, r.pos + o.i AS pos
        FROM ranked r, (SELECT unnest(range(0, 3)) AS i) o
        WHERE r.occ >= 2 AND r.rn > 1),
      kept AS (
        SELECT s.doc_id, count(*) AS n_kept,
          string_agg(s.sent, ' ' ORDER BY s.pos) AS cleaned
        FROM sent s
        WHERE NOT EXISTS (SELECT 1 FROM rem
          WHERE rem.doc_id = s.doc_id AND rem.pos = s.pos)
        GROUP BY s.doc_id),
      tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sentences
        FROM sent GROUP BY doc_id)
      SELECT t.doc_id, t.n_sentences,
        t.n_sentences - coalesce(k.n_kept, 0) AS n_removed,
        md5(coalesce(k.cleaned, '')) AS cleaned_md5
      FROM tot t LEFT JOIN kept k ON t.doc_id = k.doc_id
      ORDER BY t.doc_id"""))
  )
}
