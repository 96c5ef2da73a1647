package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables

/** Training-set preparation operators that sit between curation and the
  * trainer: benchmark-contamination detection (does any training document
  * contain an evaluation document's n-grams?) and sequence packing (where
  * does each document land once the token stream is concatenated and
  * chunked into fixed-length training sequences?).
  *
  * Contamination is the n-gram membership test every serious pretraining
  * pipeline runs before reporting benchmark numbers (the GPT-3 appendix /
  * PaLM "data contamination" methodology): tokenize both corpora, take
  * distinct word 8-grams, and flag eval documents whose grams appear
  * anywhere in the training split. Scale posture: the eval side is a
  * benchmark suite — thousands of documents, not billions — so its gram
  * set broadcasts; the train side streams through one hash semi-join and
  * never materializes pairs. Here both sides come from the `documents`
  * table (split by doc_id) so the oracle can mirror the computation
  * exactly; the planted canary phrases give known-positive pairs the same
  * way d01/t10 plant their ground truth.
  *
  * Packing models the standard concatenate-then-chunk regime: per source,
  * documents are laid head-to-tail in doc_id order and the stream is cut
  * every `seqLen` tokens; a document therefore spans sequences
  * `floor(start/seqLen) .. floor((end-1)/seqLen)`. One window per source
  * computes the running offsets — the cumulative sum is the only
  * inherently sequential step, and it parallelizes by stream (source
  * here; (source, shard) at 100 TB, where each shard packs
  * independently — document boundaries between shards cost at most one
  * partially-filled sequence per shard).
  */
object Training {

  /** Word n-gram contamination of `evalDocs` against `trainDocs`: for
    * each eval document, the count and fraction of its distinct n-grams
    * that occur anywhere in the training corpus. `broadcastEval` reflects
    * the benchmark-vs-corpus asymmetry and should stay true at scale. */
  def contamination(evalDocs: DataFrame, trainDocs: DataFrame,
      textCol: String = "text", n: Int = 8,
      broadcastEval: Boolean = true, hashGrams: Boolean = false): DataFrame = {
    // hashGrams replaces each n-gram string with its xxhash64 before the
    // join — at benchmark-vs-100TB scale the join key drops from ~50-byte
    // strings to 8-byte longs (a 2^-64 collision only adds a false
    // POSITIVE, the safe direction for a contamination screen). Off for
    // the oracle query, which must match DuckDB on the strings.
    def keyed(df: DataFrame): DataFrame =
      if (hashGrams) df.withColumn("gram", xxhash64(col("gram"))) else df
    // both the totals aggregation and the hit semi-join read the eval
    // gram explode — persist or it re-executes per reference
    val evalG = keyed(evalDocs
        .select(col("doc_id"), explode(Dedup.shingles(col(textCol), n)).as("gram")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val trainG = keyed(trainDocs
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram")))
    // Hit pairs. broadcastEval=true is the 100 TB shape: the train gram
    // stream probes the BROADCAST eval set (build side must be the RIGHT
    // side of an inner join — a left-semi with a small LEFT would
    // broadcast the wrong side), and only (eval doc, gram) pairs that hit
    // reach the distinct, so the shuffle is bounded by the eval gram
    // count no matter how often a gram repeats across the training
    // corpus. The semi-join form shuffles both sides by gram — correct
    // but train-sized.
    val hitPairs =
      if (broadcastEval)
        trainG.join(broadcast(evalG), Seq("gram"))
          .select(col("doc_id"), col("gram")).distinct()
      else evalG.join(trainG, Seq("gram"), "left_semi")
    val hits = hitPairs
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    val totals = evalG.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast(DoubleType) / col("n_grams"))
          .as("contamination"))
  }

  /** Write the corpus as physical training shards in seeded-shuffle
    * order — the sink form of t17: shard = doc_id mod n, within-shard
    * order = the seeded md5 key. `repartitionByRange(shard)` +
    * `sortWithinPartitions` + `partitionBy(shard)` is the whole plan:
    * one exchange, a per-task sort, NO global sort and NO row-number
    * window — the shape that holds at any corpus size. Range (not hash)
    * partitioning on the shard id: hashing n distinct shard values into
    * n partitions collides several shards onto one task (~n/e tasks sit
    * idle, colliding tasks pay a multi-shard sort); ranges put each
    * shard on its own task. A training loader then streams shard files
    * in file order and gets the epoch permutation. */
  def writeShards(docs: DataFrame, outDir: String, nShards: Int = 8,
      seed: String = "graft42"): Unit = {
    val key = md5(concat(col("doc_id").cast("string"), lit(seed)))
    docs.select(col("doc_id"), col("source"), col("text"),
        (col("doc_id") % nShards).as("shard"), key.as("skey"))
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("skey"), col("doc_id"))
      // skey rides into the files so a reader can ASSERT the order
      // without recomputing it; one string per row, negligible next to
      // text payloads
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** Per-document placement in the packed token stream: running offsets
    * per `streamCol` (documents concatenated in doc_id order), then the
    * first/last fixed-length sequence each document touches. */
  def packSequences(docs: DataFrame, seqLen: Int,
      streamCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = docs.select(col("doc_id"), col(streamCol),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    val w = Window.partitionBy(col(streamCol)).orderBy(col("doc_id"))
    counted
      .withColumn("cum_end", sum(col("n_tok")).over(w))
      .withColumn("cum_start", col("cum_end") - col("n_tok"))
      .select(col("doc_id"), col(streamCol), col("n_tok"),
        floor(col("cum_start") / lit(seqLen)).as("first_seq"),
        floor((col("cum_end") - 1) / lit(seqLen)).as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }

  /** Document-boundary greedy packing — the OTHER packing regime next
    * to concatenate-and-chunk (t13/t26): documents never split across
    * training sequences (no cross-document attention contamination), a
    * sequence closes when the next document would overflow `seqLen`,
    * and an oversized document takes a bin alone (`overflow` flags it
    * for the caller's truncation policy). The walk is inherently
    * sequential PER STREAM (bin state carries forward), so it runs as
    * one sorted pass inside each stream's group — exactly t13's
    * parallelism contract: the stream key is `source` here and
    * (source, shard) at 100 TB, where shards pack independently and the
    * boundary costs at most one partially-filled bin per shard. */
  def packGreedy(docs: DataFrame, seqLen: Int,
      streamCol: String = "source"): DataFrame = {
    require(seqLen >= 1, s"seqLen $seqLen")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col(streamCol).as("stream"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (stream, it) =>
        val sorted = it.toSeq.sortBy(_._1)
        var bin = 0L
        var fill = 0L
        sorted.map { case (id, _, n) =>
          if (fill > 0 && fill + n > seqLen) { bin += 1; fill = 0 }
          val placed = bin
          fill += n
          if (fill >= seqLen) { bin += 1; fill = 0 }
          (id, stream, n, placed, n > seqLen)
        }
      }
      .toDF("doc_id", "stream", "n_tok", "bin_id", "overflow")
  }

  /** BPE training (Sennrich et al. 2016, arXiv 1508.07909): iterate —
    * count adjacent symbol pairs over the word-frequency table, take the
    * most frequent pair (ties break (count DESC, left ASC, right ASC) —
    * a total order, so the merge sequence is deterministic), fuse it
    * everywhere, repeat. Returns the ordered merge table (rank, left,
    * right, merged, pair_count), which IS the tokenizer.
    *
    * Scale posture — where the cluster helps and where it hurts: the
    * corpus-sized work is the word-frequency aggregation, and that runs
    * distributed (partial aggregation compresses trillions of tokens to
    * a vocab table map-side). The merge loop is the OPPOSITE shape: an
    * inherently sequential fixpoint (merge k+1 depends on k) over the
    * already-compressed vocab — running it as cluster jobs costs
    * 2·merges full barriers on a table a single node holds easily, with
    * per-iteration planning overhead dwarfing the compute (measured: a
    * distributed loop was ~100× slower at sf0.1 than this split). So
    * the vocab table ships to the driver ONCE — bounded by `maxVocab`
    * (loud error, not OOM) and prunable via `minWordCount`, the
    * SentencePiece/HF-tokenizers regime — and the loop runs locally.
    * The corpus-scale HALF of tokenization, encoding 100 TB with the
    * trained table, goes back to the cluster: [[bpeSegment]] composes
    * the merges into one codegen'd projection. `minPairCount` stops
    * early once nothing recurs (a singleton pair is not compression). */
  def bpeTrain(docs: DataFrame, merges: Int, minPairCount: Long = 2,
      minWordCount: Long = 1, maxVocab: Int = 1 << 22,
      caseFold: Boolean = true, byteLevel: Boolean = false): DataFrame = {
    // byteLevel: GPT-2's byte alphabet — words map through
    // [[graft.functions.ByteMap]] AFTER whitespace split (the map sends
    // the space byte out of ASCII, so splitting must come first), and
    // the merge loop runs unchanged over the mapped chars; caseFold
    // stays off in byte mode (case carries bytes) — ENFORCED, not just
    // documented: lowercasing before byte mapping would silently break
    // the byte-level contract
    require(!(byteLevel && caseFold),
      "bpeTrain: byteLevel=true requires caseFold=false (case carries bytes)")
    val spark = docs.sparkSession
    val base = if (caseFold) lower(col("text")) else col("text")
    val wordCol =
      if (byteLevel) graft.functions.GraftFunctions.byte_map(col("word"))
      else col("word")
    val words = docs
      .select(explode(split(trim(base), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .select(wordCol.as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minWordCount)
    val collected = words.limit(maxVocab + 1).collect()
    require(collected.length <= maxVocab,
      s"vocab exceeds maxVocab=$maxVocab; raise minWordCount")
    var tbl: Array[(Array[String], Long)] = collected.map { r =>
      r.getString(0).split("").filter(_.nonEmpty) -> r.getLong(1)
    }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= merges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      tbl.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          counts.merge((syms(j), syms(j + 1)), c, Long.box(_) + _)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var bestPair: (String, String) = null
        var bestN = Long.MinValue
        counts.forEach { (p, n) =>
          if (n > bestN || (n == bestN &&
              (p._1 < bestPair._1 ||
                (p._1 == bestPair._1 && p._2 < bestPair._2)))) {
            bestPair = p; bestN = n
          }
        }
        if (bestN < minPairCount) done = true
        else {
          val (a, b) = bestPair
          out += ((rank, a, b, a + b, bestN))
          tbl = tbl.map { case (syms, c) =>
            if (syms.length < 2) syms -> c
            else {
              val m = Array.newBuilder[String]
              var j = 0
              while (j < syms.length) {
                if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
                  m += a + b; j += 2
                } else { m += syms(j); j += 1 }
              }
              m.result() -> c
            }
          }
          rank += 1
        }
      }
    }
    import spark.implicits._
    out.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Corpus segmentation with a trained merge table — the distributed
    * half of BPE tokenization: per word, the merges apply in rank order,
    * composed as `merges` nested [[graft.functions.MergePair]]
    * expressions in ONE projection. No shuffle, no state, whole-stage
    * codegen end to end — the shape that encodes 100 TB as a plain map
    * stage. Input: (rank, left, right) rows from [[bpeTrain]]'s output
    * (collected — the merge table is tokenizer-sized, not data-sized). */
  def bpeSegmentColumn(word: Column,
      merges: Seq[(String, String)]): Column = {
    val fns = graft.functions.GraftFunctions
    merges.foldLeft(array_remove(split(word, ""), "").as("syms"))(
      (c, m) => fns.merge_pair(c, m._1, m._2))
  }

  /** WordPiece tokenizer training (Schuster & Nakajima 2012, the BERT
    * tokenizer of Devlin et al. 2018; merge rule as documented in the
    * public HuggingFace tokenizers course) — the THIRD major subword
    * family next to BPE ([[bpeTrain]]) and unigram ([[unigramTrain]]):
    * the same iterate-and-fuse loop as BPE, but the merged pair is the
    * one maximizing the LIKELIHOOD score
    * `count(pair) / (count(left) · count(right))` rather than the raw
    * pair count — frequent-but-expected pairs (both symbols common
    * everywhere) lose to pairs that co-occur more than their parts
    * predict. Non-initial symbols carry the `##` continuation marker
    * from the start, so every merged piece is position-typed and the
    * vocabulary drives [[wordpieceSegmentColumn]]'s greedy encode
    * directly.
    *
    * Exactness: scores are exact rationals compared by cross-
    * multiplication in BigInt (no double division anywhere), ties break
    * (left ASC, right ASC) — a total order, so the merge sequence is
    * deterministic. Scale split identical to [[bpeTrain]] and for the
    * same measured reason: the corpus-sized work is the distributed
    * word-frequency aggregation; the merge loop is a sequential fixpoint
    * over the bounded vocab table and runs driver-side (`maxVocab`
    * bounds the collect loudly). Returns the ordered merge table
    * (rank, left, right, merged, pair_count). */
  def wordpieceTrain(docs: DataFrame, merges: Int, minPairCount: Long = 2,
      minWordCount: Long = 1, maxVocab: Int = 1 << 22,
      caseFold: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    val base = if (caseFold) lower(col("text")) else col("text")
    val words = docs
      .select(explode(split(trim(base), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minWordCount)
    val collected = words.limit(maxVocab + 1).collect()
    require(collected.length <= maxVocab,
      s"vocab exceeds maxVocab=$maxVocab; raise minWordCount")
    var tbl: Array[(Array[String], Long)] = collected.map { r =>
      // split by CODE POINT, not UTF-16 code unit — the alphabet in
      // [[wordpieceVocab]] / t46 derives via Spark substr (code-point
      // semantics); String.split("") would leave unpaired surrogates
      // for non-BMP chars and the vocab/merge tables would disagree
      val w = r.getString(0)
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result().zipWithIndex.map { case (c, i) =>
        if (i == 0) c else "##" + c
      } -> r.getLong(1)
    }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= merges && !done) {
      val symCounts = new java.util.HashMap[String, Long]()
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      tbl.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length) {
          symCounts.merge(syms(j), c, Long.box(_) + _)
          if (j < syms.length - 1)
            pairCounts.merge((syms(j), syms(j + 1)), c, Long.box(_) + _)
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // best score = n/(l·r), compared exactly: n1·l2·r2 vs n2·l1·r1
        // in BigInt (corpus-scale counts overflow a Long product)
        var bestPair: (String, String) = null
        var bestN = 0L
        var bestDen = BigInt(0)
        pairCounts.forEach { (p, n) =>
          val den = BigInt(symCounts.get(p._1)) * BigInt(symCounts.get(p._2))
          val better =
            if (bestPair == null) true
            else {
              val cmp = (BigInt(n) * bestDen).compare(BigInt(bestN) * den)
              cmp > 0 || (cmp == 0 &&
                (p._1 < bestPair._1 ||
                  (p._1 == bestPair._1 && p._2 < bestPair._2)))
            }
          if (better) { bestPair = p; bestN = n; bestDen = den }
        }
        if (bestN < minPairCount) done = true
        else {
          val (a, b) = bestPair
          val merged = a + b.stripPrefix("##")
          // the ## marker is RESERVED: an initial merged piece that
          // itself starts with "##" (only possible from word-initial
          // '#' runs) is unrepresentable in the flat BERT-style vocab
          // string — refuse loudly rather than emit a piece the encoder
          // would silently reclassify as a continuation
          require(!(merged.startsWith("##") && !a.startsWith("##")),
            s"wordpieceTrain: merging ('$a','$b') would create initial " +
              "piece '" + merged + "' colliding with the ## continuation " +
              "marker — pre-normalize word-initial '#' runs")
          out += ((rank, a, b, merged, bestN))
          tbl = tbl.map { case (syms, c) =>
            if (syms.length < 2) syms -> c
            else {
              val m = Array.newBuilder[String]
              var j = 0
              while (j < syms.length) {
                if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
                  m += merged; j += 2
                } else { m += syms(j); j += 1 }
              }
              m.result() -> c
            }
          }
          rank += 1
        }
      }
    }
    import spark.implicits._
    out.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** The full WordPiece vocabulary a trained merge table implies: every
    * position-typed single character of the word-frequency table (the
    * alphabet — initial chars plain, later chars `##`-marked) plus every
    * merged piece. This is the input [[wordpieceSegmentColumn]] takes;
    * greedy encode needs the ALPHABET for coverage, not just the merges.
    * `minWordCount`/`caseFold` MUST match the [[wordpieceTrain]] call
    * that produced `mergeTable`, or the alphabet derives from a
    * different word table than the merges were trained on. */
  def wordpieceVocab(docs: DataFrame, mergeTable: DataFrame,
      minWordCount: Long = 1, caseFold: Boolean = true): Seq[String] = {
    val base = if (caseFold) lower(col("text")) else col("text")
    val alpha = docs
      .select(explode(split(trim(base), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minWordCount)
      .select(col("word"),
        explode(sequence(lit(1), length(col("word")))).as("s"))
      .select(when(col("s") === 1, col("word").substr(col("s"), lit(1)))
        .otherwise(concat(lit("##"),
          col("word").substr(col("s"), lit(1)))).as("piece"))
      .distinct()
      .collect().map(_.getString(0))
    val merged = mergeTable.orderBy(col("rank"))
      .collect().map(_.getAs[String]("merged"))
    (alpha ++ merged).distinct.toSeq
  }

  /** Corpus encoding with a WordPiece vocabulary — the distributed half:
    * per word, BERT's greedy longest-match-first walk as ONE codegen'd
    * projection ([[graft.functions.WordpieceSegment]]), vocabulary as
    * plan constants. No shuffle, no state — encoding 100 TB is a plain
    * map stage exactly like [[bpeSegmentColumn]]. Words with no match at
    * some position collapse to `unkToken` (WordPiece is deliberately
    * partial — coverage comes from the alphabet in the vocab). */
  def wordpieceSegmentColumn(word: Column, vocab: Seq[String],
      unkToken: String = "[UNK]"): Column = {
    require(vocab.nonEmpty, "wordpieceSegmentColumn: empty vocabulary")
    graft.functions.GraftFunctions.wordpiece_segment(word, vocab, unkToken)
  }

  // ------------------------------------------------------------------
  // Stored tokenizer models — the FIFTH stored-model family (next to
  // the dedup/retrieval/decontam/hash-and-ann index families): train
  // once, persist the tokenizer-sized model table, encode everywhere.
  // Without this lifecycle every pipeline stage retrains (t22/t34/t45
  // train per call), which a 100 TB corpus cannot afford and which
  // breaks the train-here-encode-there deployment every production
  // tokenizer has. Layout mirrors AnnIndex (model.parquet +
  // meta.parquet under one dir): the model table IS the tokenizer, and
  // `ord` pins a total row order so a loaded model is bit-identical to
  // the stored one (merge tables are rank-ordered; vocab order is
  // semantically free but kept stable for reproducible plans).
  // ------------------------------------------------------------------

  private val tokenizerFamilies = Set("bpe", "unigram", "wordpiece")

  /** Persist a trained tokenizer model table under `dir`. `family`
    * names the encode semantics the table drives; `params` carries the
    * train-time settings an encoder must match (unk token, case fold —
    * stringly, like parquet's own key-value metadata). The model is
    * tokenizer-sized (vocab rows, not corpus rows), so it writes as a
    * single file; overwrite = retrain replaces the model atomically. */
  def storeTokenizer(model: DataFrame, dir: String, family: String,
      params: Map[String, String] = Map.empty): Unit = {
    require(tokenizerFamilies.contains(family),
      s"storeTokenizer: unknown family '$family' (${tokenizerFamilies.mkString("/")})")
    require(!params.contains("family"), "storeTokenizer: 'family' is reserved")
    val spark = model.sparkSession
    import spark.implicits._
    model.coalesce(1).write.mode("overwrite").parquet(s"$dir/model.parquet")
    (("family" -> family) +: params.toSeq.sortBy(_._1))
      .toDF("key", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta.parquet")
  }

  /** Load a stored tokenizer: (family, model table, params). The model
    * frame comes back lazily — family-specific helpers below collect it
    * in its pinned order. */
  def loadTokenizer(spark: SparkSession,
      dir: String): (String, DataFrame, Map[String, String]) = {
    val meta = StoreGuard.table(spark, dir, "meta.parquet", "key", "value")
      .collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val family = meta.getOrElse("family",
      sys.error(s"loadTokenizer: $dir/meta.parquet has no 'family' row"))
    require(tokenizerFamilies.contains(family),
      s"loadTokenizer: stored family '$family' unknown to this build")
    (family, StoreGuard.table(spark, dir, "model.parquet"), meta - "family")
  }

  /** Store a WordPiece vocabulary (the [[wordpieceVocab]] /
    * SQL-derivable form [[wordpieceSegmentColumn]] consumes). */
  def storeWordpieceVocab(spark: SparkSession, vocab: Seq[String],
      dir: String, unkToken: String = "[UNK]"): Unit = {
    require(vocab.nonEmpty, "storeWordpieceVocab: empty vocabulary")
    import spark.implicits._
    storeTokenizer(
      vocab.zipWithIndex.map { case (p, i) => (i, p) }.toDF("ord", "piece"),
      dir, "wordpiece", Map("unk_token" -> unkToken))
  }

  /** Load a stored WordPiece vocabulary: (pieces in stored order, unk
    * token) — the exact arguments [[wordpieceSegmentColumn]] takes. */
  def loadWordpieceVocab(spark: SparkSession,
      dir: String): (Seq[String], String) = {
    val (family, model, params) = loadTokenizer(spark, dir)
    require(family == "wordpiece",
      s"loadWordpieceVocab: $dir stores a '$family' model")
    Seq("ord", "piece").foreach(c => require(model.columns.contains(c),
      s"loadWordpieceVocab: $dir/model.parquet has no '$c' column"))
    val vocab =
      model.orderBy(col("ord")).collect().map(_.getAs[String]("piece")).toSeq
    require(vocab.nonEmpty, s"loadWordpieceVocab: $dir stores an empty vocab")
    (vocab, params.getOrElse("unk_token", "[UNK]"))
  }

  /** Store a BPE merge table ([[bpeTrain]]'s output, rank-ordered). */
  def storeBpeMerges(merges: DataFrame, dir: String,
      byteLevel: Boolean = false): Unit =
    storeTokenizer(merges.orderBy(col("rank")), dir, "bpe",
      Map("byte_level" -> byteLevel.toString))

  /** Load stored BPE merges in rank order — the exact argument
    * [[bpeSegmentColumn]] takes — plus the byte-level flag the caller
    * must honor ([[graft.functions.GraftFunctions.byte_map]] first). */
  def loadBpeMerges(spark: SparkSession,
      dir: String): (Seq[(String, String)], Boolean) = {
    val (family, model, params) = loadTokenizer(spark, dir)
    require(family == "bpe", s"loadBpeMerges: $dir stores a '$family' model")
    Seq("rank", "left", "right").foreach(c =>
      require(model.columns.contains(c),
        s"loadBpeMerges: $dir/model.parquet has no '$c' column"))
    val rows = model.orderBy(col("rank")).collect()
    // ranks must be exactly 1..n — a gap means a truncated/partial store
    // whose encode order would silently skip merges
    rows.map(_.getAs[Int]("rank")).zipWithIndex.foreach { case (rk, i) =>
      require(rk == i + 1,
        s"loadBpeMerges: $dir ranks are not contiguous (found $rk at " +
          s"position ${i + 1})")
    }
    (rows.map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq,
      params.get("byte_level").contains("true"))
  }

  /** Store a unigram-LM model table ([[unigramTrain]]'s output). */
  def storeUnigramModel(model: DataFrame, dir: String): Unit =
    storeTokenizer(model.orderBy(col("log_prob").desc, col("piece")),
      dir, "unigram")

  /** Load a stored unigram model as the (piece, log_prob) pairs
    * [[unigramSegmentColumn]] takes, in the stored (log_prob DESC,
    * piece ASC) order. */
  def loadUnigramModel(spark: SparkSession,
      dir: String): Seq[(String, Double)] = {
    val (family, model, _) = loadTokenizer(spark, dir)
    require(family == "unigram",
      s"loadUnigramModel: $dir stores a '$family' model")
    Seq("piece", "log_prob").foreach(c => require(model.columns.contains(c),
      s"loadUnigramModel: $dir/model.parquet has no '$c' column"))
    val rows = model.orderBy(col("log_prob").desc, col("piece")).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Double]("log_prob"))).toSeq
    require(rows.nonEmpty, s"loadUnigramModel: $dir stores an empty model")
    // a NaN/positive log-prob would silently corrupt every Viterbi walk
    rows.foreach { case (p, lp) =>
      require(!lp.isNaN && lp <= 0.0,
        s"loadUnigramModel: $dir piece '$p' has invalid log_prob $lp")
    }
    rows
  }

  /** t55's SQL-derivable unigram model over the corpus word table — the
    * closed-form twin of [[unigramTrain]] (the wordpieceSqlVocab idea
    * applied to the unigram family): pieces are every single character
    * plus the top multi-char substrings (len ≤ 6) by (weighted count
    * DESC, piece ASC) up to a 120-piece vocabulary, and each piece's
    * log_prob is the EXACT dyadic rational score_q/2^20 with
    * score_q = −2^30 + len(piece)·2^20 + min(count, 2^16). Every
    * Viterbi path sum is then an integer multiple of 2^-20 with
    * magnitude ≪ 2^52 — bit-exact in double — so DuckDB replays the
    * whole DP (including the longest-last-piece tie rule) in integer
    * arithmetic. The objective the scores encode is real tokenizer
    * behavior: fewest pieces first (the −2^30 term dominates), frequent
    * pieces among equal-length segmentations (the capped count term;
    * the len·2^20 term telescopes to a per-word constant). The EM
    * trainer (t34) stays the live float-iterative anchor. */
  private[graft] def q20UnigramModel(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
    val subs = words
      .select(col("word"), col("wcnt"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("i"))
      .select(col("word"), col("wcnt"), col("i"),
        explode(sequence(lit(1),
          least(lit(6), length(col("word")) - col("i")))).as("l"))
      .select(col("word").substr(col("i") + 1, col("l")).as("piece"),
        col("wcnt"))
    val cnts = subs.groupBy(col("piece")).agg(sum(col("wcnt")).as("cnt"))
      .localCheckpoint(true) // chars + ranked multi both read the census
    val chars = cnts.filter(length(col("piece")) === 1)
    val nChars = chars.count()
    require(nChars > 0 && nChars < 120,
      s"t55 model: $nChars single chars does not fit a 120-piece vocab")
    val multi = cnts.filter(length(col("piece")) > 1)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("piece"))))
      .filter(col("rk") <= lit(120L - nChars)).drop("rk")
    chars.unionByName(multi)
      .select(col("piece"),
        ((lit(-1073741824L) +
          length(col("piece")).cast("long") * lit(1048576L) +
          least(col("cnt"), lit(65536L))).cast("double") / lit(1048576.0))
          .as("log_prob"),
        length(col("piece")).as("piece_len"))
  }

  /** t46's SQL-derivable WordPiece vocabulary over a (word, wcnt) table:
    * top-200 positional substrings ≤4 chars by (count DESC, form, piece)
    * plus every positional single char for coverage, initial pieces
    * colliding with the reserved `##` marker dropped (the oracle filters
    * identically). Shared by t46 (live anchor), the stored-vocab
    * builder, and the TrainingSpec lifecycle gate. */
  private[operators] def wordpieceSqlVocab(words: DataFrame): Seq[String] = {
    // positional substrings ≤4 chars weighted by word occurrences; the
    // census is re-read by topk AND chars — eager leaf, derive once
    val subs = words
      .select(col("word"), col("wcnt"),
        explode(sequence(lit(1), length(col("word")))).as("st"))
      .select(col("word"), col("wcnt"), col("st"),
        explode(array(lit(1), lit(2), lit(3), lit(4))).as("l"))
      .filter(col("st") + col("l") <= length(col("word")) + 1)
      .select(when(col("st") === 1, 0).otherwise(1).as("form"),
        col("word").substr(col("st"), col("l")).as("piece"),
        col("wcnt"))
      .groupBy(col("form"), col("piece")).agg(sum(col("wcnt")).as("cnt"))
      .localCheckpoint(true)
    val topk = subs
      .orderBy(col("cnt").desc, col("form").asc, col("piece").asc)
      .limit(200).select(col("form"), col("piece"))
    val chars = subs.filter(length(col("piece")) === 1)
      .select(col("form"), col("piece")).distinct()
    topk.unionByName(chars).distinct()
      .filter(!(col("form") === 0 && col("piece").startsWith("##")))
      .collect()
      .map(r => (if (r.getInt(0) == 1) "##" else "") + r.getString(1))
      .toSeq
  }

  /** The session's stored WordPiece vocabulary for dataset `d`: derive
    * t46's SQL-derivable vocabulary once per (dataset fingerprint),
    * [[storeWordpieceVocab]] it, and re-serve the directory for the
    * rest of the JVM — the same build-once-probe-many discipline the
    * four index families follow via [[IxScratch]]. t49/t50 encode from
    * THIS stored artifact; t46 stays the live-derivation anchor. */
  private def wordpieceStoreDir(s: SparkSession, d: String): String =
    IxScratch.cached(IxScratch.fingerprint(d) + "|wordpiece-vocab",
        "graft-tokstore-") { p =>
      val words = Tables.documents(s, d)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
        .localCheckpoint(true)
      storeWordpieceVocab(s, wordpieceSqlVocab(words), p)
    }

  /** The WordPiece-encode oracle (SQL-derivable vocab + per-position
    * argmax table + join-only recursive greedy walk), shared VERBATIM
    * by t46 (live vocab derivation) and t50 (encode from the STORED
    * vocab): the serving path changes, the segmentation must not. */
  val wordpieceEncodeOracleSql: String = """WITH RECURSIVE words AS (
        SELECT word, count(*) AS wcnt FROM (
          SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
          FROM documents) t
        WHERE word <> '' GROUP BY word),
      starts AS (
        SELECT word, wcnt, unnest(range(1, length(word) + 1)) AS st
        FROM words),
      spans AS (
        SELECT word, wcnt, st, unnest([1, 2, 3, 4]) AS l FROM starts),
      subs AS (
        SELECT CASE WHEN st = 1 THEN 0 ELSE 1 END AS form,
          substr(word, st, l) AS piece, sum(wcnt) AS cnt
        FROM spans WHERE st + l <= length(word) + 1
        GROUP BY 1, 2),
      topk AS (
        SELECT form, piece FROM subs
        ORDER BY cnt DESC, form ASC, piece ASC LIMIT 200),
      chars AS (
        SELECT DISTINCT form, piece FROM subs WHERE length(piece) = 1),
      vocab AS (
        SELECT DISTINCT form, piece FROM (
          SELECT * FROM topk UNION ALL SELECT * FROM chars) u
        WHERE NOT (form = 0 AND piece LIKE '##%')),
      positions AS (
        SELECT word, unnest(range(0, length(word))) AS pos FROM words),
      cands AS (
        SELECT p.word, p.pos, v.piece, v.form, length(v.piece) AS len
        FROM (SELECT word, pos, unnest([1, 2, 3, 4]) AS l
              FROM positions) p
        JOIN vocab v ON v.form = (CASE WHEN p.pos = 0 THEN 0 ELSE 1 END)
          AND v.piece = substr(p.word, p.pos + 1, p.l)
        WHERE length(v.piece) = p.l),
      best AS (
        SELECT word, pos, piece, form, len FROM (
          SELECT word, pos, piece, form, len,
            row_number() OVER (PARTITION BY word, pos
              ORDER BY len DESC) AS rn
          FROM cands) b WHERE rn = 1),
      walk AS (
        SELECT word, 0 AS pos, 0 AS ord, CAST(NULL AS VARCHAR) AS tok
        FROM words
        UNION ALL
        SELECT w.word, w.pos + b.len, w.ord + 1,
          CASE WHEN b.form = 1 THEN '##' || b.piece ELSE b.piece END
        FROM walk w JOIN best b ON b.word = w.word AND b.pos = w.pos)
      SELECT w.word, CAST(s.wcnt AS BIGINT) AS wcnt,
        CAST(count(*) AS BIGINT) AS n_pieces,
        string_agg(w.tok, ' ' ORDER BY w.ord) AS pieces
      FROM walk w JOIN words s ON s.word = w.word
      WHERE w.tok IS NOT NULL
      GROUP BY w.word, s.wcnt ORDER BY w.word"""

  /** The BPE-train oracle CTE chain: `merges` UNROLLED merge iterations
    * over the corpus word table (the w07-PageRank discipline — a
    * sequential fixpoint whose step count is a model constant unrolls
    * as chained CTEs). Each iteration is plain SQL replaying
    * [[bpeTrain]]'s loop exactly:
    *
    *  1. pair census over adjacent symbols weighted by word count
    *     (`HAVING >= 2` = minPairCount — if the global max is below it
    *     both sides stop: Spark sets `done`, the SQL's empty `b{k}`
    *     makes every later iteration a no-op identity);
    *  2. argmax under the exact tie order (count DESC, left ASC,
    *     right ASC);
    *  3. the greedy left-to-right rewrite in CLOSED FORM: a match at
    *     position i can only be adjacent to another match when
    *     left == right (else s[i+1] would have to equal both), and a
    *     run of adjacent matches merges at alternating positions — so
    *     "merge position" = match whose offset within its
    *     gaps-and-islands run is even, no recursion needed. Consumed
    *     positions (predecessor merged) drop; survivors renumber.
    *
    * Because encoding applies the merge table in rank order to the raw
    * char split, the training end state st{merges} IS the segmentation
    * of every corpus word — one chain gates t22 (the merge table), t23
    * (live-train segmentation rollup), and t52 (stored-model serving)
    * at once. */
  private def bpeOracleCtes(merges: Int,
      docsRel: String = "documents", lowered: Boolean = true): String = {
    val src = if (lowered) "trim(lower(text))" else "trim(text)"
    val base = s"""w0 AS MATERIALIZED (
        SELECT word, count(*) AS cnt FROM (
          SELECT unnest(string_split_regex($src, '\\s+')) AS word
          FROM $docsRel) z
        WHERE word <> '' GROUP BY word),
      st0 AS MATERIALIZED (
        SELECT word, cnt, CAST(p AS INTEGER) AS pos,
          substr(word, CAST(p AS INTEGER), 1) AS sym
        FROM (SELECT word, cnt, unnest(range(1, length(word) + 1)) AS p
              FROM w0) z)"""
    val iters = (1 to merges).map { k =>
      val pv = s"st${k - 1}"
      s"""
      pr$k AS MATERIALIZED (
        SELECT a.sym AS l, b.sym AS r2, sum(a.cnt) AS pc
        FROM $pv a JOIN $pv b ON a.word = b.word AND b.pos = a.pos + 1
        GROUP BY 1, 2 HAVING sum(a.cnt) >= 2),
      b$k AS MATERIALIZED (SELECT l, r2, pc FROM pr$k
        ORDER BY pc DESC, l ASC, r2 ASC LIMIT 1),
      m$k AS MATERIALIZED (
        SELECT s.word, s.pos
        FROM $pv s JOIN $pv t2 ON t2.word = s.word AND t2.pos = s.pos + 1
        JOIN b$k bb ON s.sym = bb.l AND t2.sym = bb.r2),
      ms$k AS MATERIALIZED (
        SELECT word, pos FROM (
          SELECT word, pos,
            (pos - min(pos) OVER (PARTITION BY word, grp)) % 2 AS par
          FROM (
            SELECT word, pos,
              pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
            FROM m$k) g) z WHERE par = 0),
      st$k AS MATERIALIZED (
        SELECT s.word, s.cnt,
          CAST(row_number() OVER (PARTITION BY s.word ORDER BY s.pos)
            AS INTEGER) AS pos,
          CASE WHEN m.pos IS NOT NULL THEN s.sym || n.sym ELSE s.sym END AS sym
        FROM $pv s
        LEFT JOIN ms$k m ON m.word = s.word AND m.pos = s.pos
        LEFT JOIN ms$k mp ON mp.word = s.word AND mp.pos = s.pos - 1
        LEFT JOIN $pv n ON n.word = s.word AND n.pos = s.pos + 1
        WHERE mp.pos IS NULL)"""
    }.mkString(",")
    base + "," + iters
  }

  /** The WordPiece-train oracle CTE chain — the bpeOracleCtes treatment
    * for the likelihood-scored family: the same unrolled iterations and
    * closed-form greedy rewrite, but the per-iteration argmax is over
    * the EXACT RATIONAL score count(pair)/(count(l)·count(r)), replayed
    * with a SOUND two-stage selection:
    *
    *  1. a double-precision score band — max(s)·(1−1e−9) — provably
    *    contains the exact argmax (each score is one divide of two
    *    exact-integer-valued doubles: relative error ≤ a few ulp ≈
    *    2e−16, seven orders inside the band);
    *  2. exact cross-multiplication among the banded candidates
    *    (pc·cl'·cr' vs pc'·cl·cr in HUGEINT — counts ≤ corpus tokens,
    *    so even the triple product is far under 2^127), ties (left,
    *    right) ascending — the training loop's compare verbatim.
    *
    * Spark's loop picks the GLOBAL score argmax and stops when ITS
    * pair count is < minPairCount — so the pc ≥ 2 gate applies AFTER
    * the argmax here too (an empty b{k} makes every later iteration an
    * identity no-op, which is equivalent to the loop's permanent stop
    * because a no-op leaves every score unchanged). The merged symbol
    * is left || right-without-##; the alphabet init marks non-initial
    * code points with ##. */
  private def wordpieceOracleCtes(merges: Int): String = {
    val base = """w0 AS MATERIALIZED (
        SELECT word, count(*) AS cnt FROM (
          SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
          FROM documents) z
        WHERE word <> '' GROUP BY word),
      st0 AS MATERIALIZED (
        SELECT word, cnt, CAST(p AS INTEGER) AS pos,
          CASE WHEN p = 1 THEN substr(word, CAST(p AS INTEGER), 1)
               ELSE '##' || substr(word, CAST(p AS INTEGER), 1) END AS sym
        FROM (SELECT word, cnt, unnest(range(1, length(word) + 1)) AS p
              FROM w0) z)"""
    val iters = (1 to merges).map { k =>
      val pv = s"st${k - 1}"
      s"""
      sc$k AS MATERIALIZED (
        SELECT sym, sum(cnt) AS c FROM $pv GROUP BY sym),
      pr$k AS MATERIALIZED (
        SELECT a.sym AS l, b.sym AS r2, sum(a.cnt) AS pc
        FROM $pv a JOIN $pv b ON a.word = b.word AND b.pos = a.pos + 1
        GROUP BY 1, 2),
      sj$k AS MATERIALIZED (
        SELECT p.l, p.r2, CAST(p.pc AS BIGINT) AS pc,
          CAST(cl.c AS BIGINT) AS cl, CAST(cr.c AS BIGINT) AS cr,
          CAST(p.pc AS DOUBLE) / (CAST(cl.c AS DOUBLE) * CAST(cr.c AS DOUBLE))
            AS s
        FROM pr$k p
        JOIN sc$k cl ON cl.sym = p.l
        JOIN sc$k cr ON cr.sym = p.r2),
      cand$k AS MATERIALIZED (
        SELECT * FROM sj$k
        WHERE s >= (SELECT max(s) FROM sj$k) * 0.999999999),
      b$k AS MATERIALIZED (
        SELECT c.l, c.r2, c.pc,
          c.l || CASE WHEN c.r2 LIKE '##%' THEN substr(c.r2, 3)
                      ELSE c.r2 END AS merged
        FROM cand$k c
        WHERE c.pc >= 2 AND NOT EXISTS (
          SELECT 1 FROM cand$k d
          WHERE CAST(d.pc AS HUGEINT) * c.cl * c.cr
                  > CAST(c.pc AS HUGEINT) * d.cl * d.cr
             OR (CAST(d.pc AS HUGEINT) * c.cl * c.cr
                  = CAST(c.pc AS HUGEINT) * d.cl * d.cr
                 AND (d.l < c.l OR (d.l = c.l AND d.r2 < c.r2))))),
      m$k AS MATERIALIZED (
        SELECT s.word, s.pos
        FROM $pv s JOIN $pv t2 ON t2.word = s.word AND t2.pos = s.pos + 1
        JOIN b$k bb ON s.sym = bb.l AND t2.sym = bb.r2),
      ms$k AS MATERIALIZED (
        SELECT word, pos FROM (
          SELECT word, pos,
            (pos - min(pos) OVER (PARTITION BY word, grp)) % 2 AS par
          FROM (
            SELECT word, pos,
              pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
            FROM m$k) g) z WHERE par = 0),
      st$k AS MATERIALIZED (
        SELECT s.word, s.cnt,
          CAST(row_number() OVER (PARTITION BY s.word ORDER BY s.pos)
            AS INTEGER) AS pos,
          CASE WHEN m.pos IS NOT NULL THEN (SELECT merged FROM b$k)
               ELSE s.sym END AS sym
        FROM $pv s
        LEFT JOIN ms$k m ON m.word = s.word AND m.pos = s.pos
        LEFT JOIN ms$k mp ON mp.word = s.word AND mp.pos = s.pos - 1
        WHERE mp.pos IS NULL)"""
    }.mkString(",")
    base + "," + iters
  }

  /** t45's oracle: the 16-merge WordPiece table from the unrolled
    * chain's per-iteration exact-rational argmax CTEs. */
  val wordpieceTrainOracleSql: String =
    "WITH " + wordpieceOracleCtes(16) + ",\n      mt AS (" +
      (1 to 16).map(k =>
        s"""SELECT CAST($k AS INTEGER) AS "rank", l, r2, merged, pc FROM b$k""")
        .mkString("\n        UNION ALL ") + """)
      SELECT "rank", l AS "left", r2 AS "right", merged,
        CAST(pc AS BIGINT) AS pair_count
      FROM mt ORDER BY "rank""""

  /** t22's oracle: the 16-merge table straight from the unrolled
    * chain's per-iteration argmax CTEs. */
  val bpeTrainOracleSql: String =
    "WITH " + bpeOracleCtes(16) + ",\n      mt AS (" +
      (1 to 16).map(k =>
        s"""SELECT CAST($k AS INTEGER) AS "rank", l, r2, pc FROM b$k""")
        .mkString("\n        UNION ALL ") + """)
      SELECT "rank", l AS "left", r2 AS "right", l || r2 AS merged,
        CAST(pc AS BIGINT) AS pair_count
      FROM mt ORDER BY "rank""""

  /** The per-doc segmentation-rollup oracle over `docsRel`, trained by
    * the unrolled chain over the same relation; `prefixCtes` lets a
    * caller prepend the relation's own CTE (t54's snapshot union). */
  private def bpeEncodeSql(docsRel: String, prefixCtes: String = ""): String =
    "WITH " + prefixCtes + bpeOracleCtes(16, docsRel) + s""",
      wp AS (SELECT word, CAST(count(*) AS BIGINT) AS n_pieces
             FROM st16 GROUP BY word),
      dw AS (
        SELECT doc_id, word FROM (
          SELECT doc_id,
            unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
          FROM $docsRel) z
        WHERE word <> '')
      SELECT d.doc_id,
        CAST(count(*) AS BIGINT) AS n_words,
        CAST(sum(wp.n_pieces) AS BIGINT) AS n_pieces,
        CAST(sum(length(d.word)) AS BIGINT) AS n_chars,
        CAST(sum(length(d.word)) AS DOUBLE)
          / CAST(sum(wp.n_pieces) AS DOUBLE) AS compression
      FROM dw d JOIN wp ON wp.word = d.word
      GROUP BY d.doc_id ORDER BY d.doc_id"""

  /** t23/t52's oracle (shared VERBATIM — live train vs stored-model
    * serving, the t46/t50 discipline): per-word piece counts are the
    * training end state's row counts; the per-doc rollup re-joins the
    * corpus words. */
  val bpeEncodeOracleSql: String = bpeEncodeSql("documents")

  /** t37's oracle: the unrolled train+encode chain over NON-lowered
    * words. Sound because the GPT-2 byte map is the IDENTITY on the
    * printable-ASCII range (33–126) and post-split words contain no
    * spaces — and the driver's corpus is printable-ASCII at every SF
    * (audited r18), so byte-level training ≡ char training on the raw
    * words and n_bytes ≡ length. A non-ASCII regeneration would flag
    * RED (hash mismatch), never silently pass. */
  val bpeBytesOracleSql: String =
    "WITH " + bpeOracleCtes(16, "documents", lowered = false) + """,
      wp AS (SELECT word, CAST(count(*) AS BIGINT) AS n_pieces
             FROM st16 GROUP BY word),
      dw AS (
        SELECT doc_id, word FROM (
          SELECT doc_id,
            unnest(string_split_regex(trim(text), '\s+')) AS word
          FROM documents) z
        WHERE word <> '')
      SELECT d.doc_id,
        CAST(count(*) AS BIGINT) AS n_words,
        CAST(sum(wp.n_pieces) AS BIGINT) AS n_pieces,
        CAST(sum(length(d.word)) AS BIGINT) AS n_bytes,
        CAST(sum(length(d.word)) AS DOUBLE)
          / CAST(sum(wp.n_pieces) AS DOUBLE) AS compression
      FROM dw d JOIN wp ON wp.word = d.word
      GROUP BY d.doc_id ORDER BY d.doc_id"""

  /** The planted refresh batch: every 7th document re-posted with a
    * run of a fresh token, heavy enough to MOVE the merge table at any
    * test SF (45 repeats — the new word's internal pairs outweigh the
    * organic rank-16 pair count, so v2 visibly diverges from v1 and
    * the tie-break order gets exercised by the six equal-count pairs). */
  private val refreshPlant: String = " graftql" * 45

  /** corpus ∪ the synthetic refresh batch — deterministic and
    * SQL-expressible so t54 stays oracle-gated end to end. */
  private def refreshSnapshot(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(refreshPlant)).as("text")))

  /** t54's oracle: the same unrolled train+encode chain over the
    * snapshot union (the plant replayed via repeat()). */
  val bpeRefreshOracleSql: String = bpeEncodeSql("docs54",
    """docs54 AS MATERIALIZED (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
          text || repeat(' graftql', 45) AS text
        FROM documents WHERE doc_id % 7 = 0),""")

  /** v1/v2 store dirs for the t54 refresh lifecycle (IxScratch-cached,
    * the c12 discipline): v1 trains on the corpus; v2 RETRAINS on
    * corpus ∪ batch and stores ALONGSIDE v1 — a versioned store (the
    * AnnIndex-meta idea applied as sibling dirs), so old-model encodes
    * stay reproducible from the old dir after a refresh (TrainingSpec
    * gates exactly that). */
  private[graft] def bpeRefreshDirs(s: SparkSession,
      d: String): (String, String) = {
    val root = IxScratch.cached(
        IxScratch.fingerprint(d) + "|bpe-refresh", "graft-tokstore-") { p =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      storeBpeMerges(bpeTrain(docs, merges = 16), p + "/v1")
      storeBpeMerges(bpeTrain(refreshSnapshot(docs), merges = 16), p + "/v2")
    }
    (root + "/v1", root + "/v2")
  }

  /** Unigram-LM tokenizer training (the SentencePiece unigram model,
    * Kudo 2018, arXiv 1804.10959) — the OTHER major subword family next
    * to BPE ([[bpeTrain]]): seed a piece inventory from frequent word
    * substrings, fit piece probabilities by EM over each word's
    * segmentation lattice (log-domain forward-backward — soft counts,
    * not Viterbi's hard ones), prune to `vocabSize` keeping every
    * single character (coverage stays total), and re-fit.
    *
    * Scale split mirrors [[bpeTrain]] exactly and for the same measured
    * reason: the corpus-sized work is the word-frequency aggregation
    * (distributed, map-side partial agg compresses the corpus to a
    * vocab table); EM is a sequential fixpoint over that bounded table
    * and runs driver-side (`maxVocab` bounds the collect loudly).
    * Encoding goes back to the cluster as one codegen'd projection
    * ([[unigramSegmentColumn]]).
    *
    * Deterministic by construction: words, pieces, and accumulation all
    * iterate in sorted order, so the same frame yields bit-identical
    * doubles on every run. Returns (piece, log_prob, piece_len) sorted
    * by (log_prob DESC, piece ASC) — the model table IS the tokenizer.
    */
  def unigramTrain(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 6,
      emIters: Int = 3, seedFactor: Int = 4, minWordCount: Long = 1,
      maxVocab: Int = 1 << 22): DataFrame = {
    require(vocabSize >= 2, s"vocabSize $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen $maxPieceLen")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minWordCount)
    val collected = words.limit(maxVocab + 1).collect()
    require(collected.length <= maxVocab,
      s"vocab exceeds maxVocab=$maxVocab; raise minWordCount")
    val freq = collected.map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1) // deterministic iteration order everywhere below
    require(freq.nonEmpty, "unigramTrain: empty corpus")

    // --- seed inventory: substring counts up to maxPieceLen ---
    val subCnt = new java.util.HashMap[String, Long]()
    freq.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          subCnt.merge(w.substring(i, j), c, Long.box(_) + _)
          j += 1
        }
        i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val all = subCnt.entrySet().asScala
      .map(e => (e.getKey, e.getValue.longValue())).toArray
    val chars = all.filter(_._1.length == 1).map(_._1).sorted
    require(vocabSize > chars.length,
      s"vocabSize $vocabSize <= ${chars.length} distinct chars — coverage needs every char")
    val seedMulti = all.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(vocabSize * seedFactor, vocabSize) - chars.length)
    val seed = (chars.map(c => c -> subCnt.get(c).longValue()) ++ seedMulti)
      .sortBy(_._1)

    // --- EM over the word lattices, log domain ---
    def logSumExp(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

    def emFit(pieces0: Array[String], logp0: Array[Double],
        iters: Int): (Array[String], Array[Double]) = {
      var pieces = pieces0
      var logp = logp0
      var it = 0
      while (it < iters) {
        val lp = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
        var i = 0
        while (i < pieces.length) {
          lp.put(pieces(i), java.lang.Double.valueOf(logp(i))); i += 1
        }
        val maxLen = pieces.foldLeft(1)((m, p) => math.max(m, p.length))
        val expCnt = new java.util.HashMap[String, Double]()
        freq.foreach { case (w, c) =>
          val n = w.length
          val alpha = new Array[Double](n + 1)
          val beta = new Array[Double](n + 1)
          java.util.Arrays.fill(alpha, 1, n + 1, Double.NegativeInfinity)
          java.util.Arrays.fill(beta, 0, n, Double.NegativeInfinity)
          var i2 = 1
          while (i2 <= n) {
            var j = math.max(0, i2 - maxLen)
            while (j < i2) {
              val s = lp.get(w.substring(j, i2))
              if (s != null && alpha(j) != Double.NegativeInfinity)
                alpha(i2) = logSumExp(alpha(i2), alpha(j) + s.doubleValue())
              j += 1
            }
            i2 += 1
          }
          val z = alpha(n)
          // a word whose every char is in vocab is always coverable;
          // guard anyway (a dropped piece must never strand a word)
          require(z != Double.NegativeInfinity, s"word '$w' not coverable")
          var j2 = n - 1
          while (j2 >= 0) {
            var i3 = j2 + 1
            while (i3 <= math.min(n, j2 + maxLen)) {
              val s = lp.get(w.substring(j2, i3))
              if (s != null && beta(i3) != Double.NegativeInfinity)
                beta(j2) = logSumExp(beta(j2), s.doubleValue() + beta(i3))
              i3 += 1
            }
            j2 -= 1
          }
          // expected piece counts: alpha(j)·p·beta(i)/Z per lattice edge
          var j3 = 0
          while (j3 < n) {
            if (alpha(j3) != Double.NegativeInfinity) {
              var i4 = j3 + 1
              while (i4 <= math.min(n, j3 + maxLen)) {
                val piece = w.substring(j3, i4)
                val s = lp.get(piece)
                if (s != null && beta(i4) != Double.NegativeInfinity) {
                  val e = c * math.exp(alpha(j3) + s.doubleValue() + beta(i4) - z)
                  expCnt.merge(piece, e, Double.box(_) + _)
                }
                i4 += 1
              }
            }
            j3 += 1
          }
        }
        // M-step in sorted piece order (deterministic double sums).
        // Every piece sits on SOME lattice path (seeds are substrings
        // of corpus words) so its soft count is mathematically > 0 —
        // but once probability mass concentrates, a rare piece's
        // exp(alpha+s+beta-Z) underflows to exactly 0.0 and log would
        // hand it -Infinity forever; floor counts at 1e-9 so scores
        // stay finite and coverage never degenerates
        var total = 0.0
        i = 0
        while (i < pieces.length) {
          total += math.max(expCnt.getOrDefault(pieces(i), 0.0), 1e-9)
          i += 1
        }
        val logTotal = math.log(total)
        logp = pieces.map(p =>
          math.log(math.max(expCnt.getOrDefault(p, 0.0), 1e-9)) - logTotal)
        it += 1
      }
      (pieces, logp)
    }

    val seedPieces = seed.map(_._1)
    val seedTotal = seed.map(_._2.toDouble).sum
    val seedLogp = seed.map(e => math.log(e._2.toDouble / seedTotal))
    val (p1, l1) = emFit(seedPieces, seedLogp, emIters)

    // --- prune to vocabSize: keep every char, top multi-char by prob ---
    val scored = p1.zip(l1)
    val keptMulti = scored.filter(_._1.length > 1)
      .sortBy { case (p, s) => (-s, p) }
      .take(vocabSize - chars.length)
    val kept = (scored.filter(_._1.length == 1) ++ keptMulti).sortBy(_._1)
    val norm = kept.map(_._2).reduce(logSumExp)
    val (p2, l2) = emFit(kept.map(_._1), kept.map(_._2 - norm), emIters)

    import spark.implicits._
    p2.zip(l2).toSeq
      .map { case (p, s) => (p, s, p.length) }
      .sortBy { case (p, s, _) => (-s, p) }
      .toDF("piece", "log_prob", "piece_len")
  }

  /** Corpus segmentation with a trained unigram model — the distributed
    * half: per word, one codegen'd Viterbi scan with the model shipped
    * as plan constants ([[graft.functions.UnigramSegment]]). No shuffle,
    * no state — encoding 100 TB is a plain map stage, exactly like
    * [[bpeSegmentColumn]]. `pieces` are (piece, log_prob) rows from
    * [[unigramTrain]] (collected — tokenizer-sized, not data-sized);
    * out-of-vocabulary characters fall back to single-char pieces at
    * one nat below the worst piece score. */
  def unigramSegmentColumn(word: Column,
      pieces: Seq[(String, Double)]): Column = {
    require(pieces.nonEmpty, "unigramSegmentColumn: empty model")
    graft.functions.GraftFunctions.unigram_segment(word, pieces,
      unkScore = pieces.map(_._2).min - 1.0)
  }

  /** Materialize the packed training sequences themselves — the emit
    * half of [[packSequences]] (which only computes placement): tokens
    * take a global position in their source stream (running doc offsets
    * + within-doc position), chunk `seqLen` cuts the stream, and each
    * sequence reassembles in position order. One corpus-sized explode
    * and ONE exchange on (stream, seq_id) — re-chunking is inherently a
    * repartition of the token stream, and this is the minimal one; at
    * 100 TB the stream key becomes (source, shard) exactly like t13 and
    * shards pack independently. The per-sequence reassembly sorts
    * seqLen-bounded arrays row-locally (the interpreted-HOF projection
    * runs on n/seqLen sequence rows, not on the token stream). */
  def packEmit(docs: DataFrame, seqLen: Int,
      streamCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(trim(col("text")), "\\s+")
    val counted = docs.select(col("doc_id"), col(streamCol), toks.as("tk"))
      .withColumn("n_tok", size(col("tk")).cast("long"))
    val w = Window.partitionBy(col(streamCol)).orderBy(col("doc_id"))
    val tokens = counted
      .withColumn("cum_start", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col(streamCol), col("cum_start"),
        posexplode(col("tk")).as(Seq("pos", "tok")))
      .withColumn("gpos", col("cum_start") + col("pos"))
      .withColumn("seq_id", floor(col("gpos") / lit(seqLen)))
    tokens
      .groupBy(col(streamCol), col("seq_id"))
      .agg(count(lit(1)).as("n_tok"),
        countDistinct(col("doc_id")).as("n_docs"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("gpos"), col("tok")))),
          x => x.getField("tok")))).as("seq_md5"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, arXiv 2302.03169 —
    * Data Selection via Importance Resampling): hashed n-gram bag-of-words
    * models of a TARGET slice and the RAW corpus, per-bucket importance
    * weights, per-document importance as the aggregate of its features'
    * weights. Features are the paper's: unigrams plus word bigrams,
    * hashed into `buckets` md5 buckets.
    *
    * Engine-exact arithmetic (the t19 discipline): the per-bucket weight
    * is the smoothed target/raw probability RATIO quantized to Q20
    * fixed-point — `floor(((t+1)/(T+m)) / ((r+1)/(R+m)) · 2²⁰)` — built
    * from integer counts by a fixed sequence of correctly-rounded IEEE
    * double ops, so DuckDB reproduces every weight bit-for-bit; a
    * document's total is then an integer SUM (order-free under any
    * partitioning). The paper aggregates log-weights (a product of
    * ratios); the quantized-ratio MEAN used here induces a selection
    * ordering from the same bucket model with no transcendental calls —
    * `ln` is the one step two engines won't reproduce exactly.
    *
    * Scale posture: the feature explode is map-side; the model is one
    * aggregation collapsing the corpus to `buckets` rows (partial
    * aggregation shrinks it before the exchange); totals ride a window
    * over the model table (model-sized, not data-sized); scoring is a
    * broadcast join + one groupBy(doc_id). The exploded frame feeds both
    * the model build and the scoring pass — persisted, or the corpus
    * tokenizes twice. */
  def dsirScores(docs: DataFrame, isTarget: Column,
      buckets: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fns = graft.functions.GraftFunctions
    def bucketOf(feat: Column): Column =
      pmod(conv(substring(md5(feat), 1, 8), 16, 10).cast("long"),
        lit(buckets.toLong))
    val uni = docs.select(col("doc_id"), isTarget.as("is_t"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("feat"))
      .filter(col("feat") =!= "")
    val bi = docs.select(col("doc_id"), isTarget.as("is_t"),
      explode(fns.word_grams(lower(col("text")), 2, distinct = false))
        .as("feat"))
    val feats = uni.unionAll(bi)
      .select(col("doc_id"), col("is_t"), bucketOf(col("feat")).as("bucket"))
    val counts = feats.groupBy(col("bucket")).agg(
      count(lit(1)).as("r"),
      sum(when(col("is_t"), lit(1L)).otherwise(lit(0L))).as("t"))
    val all = Window.partitionBy()
    val w = counts.select(col("bucket"),
      floor(
        ((col("t") + 1).cast("double") /
          (sum(col("t")).over(all) + buckets).cast("double")) /
        ((col("r") + 1).cast("double") /
          (sum(col("r")).over(all) + buckets).cast("double")) *
        lit(1048576L))
        .cast("long").as("wq"))
      // buckets-row model, eager (localCheckpoint → auto-GC'd): scoring
      // re-tokenizes the corpus once instead of caching the exploded
      // feature frame nothing ever unpersisted (r12 ADVICE) — at scale
      // that cache is grams× the corpus
      .localCheckpoint(true)
    // raw = the scored corpus, so every scored bucket exists in the
    // model; the coalesce is belt-and-braces for a caller scoring a
    // frame that wasn't the model's raw side
    feats.join(broadcast(w), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("wq"), lit(0L))).as("sum_wq"))
      .withColumn("ratio",
        col("sum_wq").cast("double") / col("n_feats") / lit(1048576L))
  }

  /** The 100-TB form of t25's DSIR selection: instead of ranking every
    * document through one single-partition `row_number` window (exact,
    * fine at gate scale, a scale-killer at billions of docs), the cutoff
    * comes from ONE `approx_percentile` aggregation over the scores and
    * selection is a plain threshold filter riding a broadcast scalar —
    * the corpus never enters a window and never globally sorts.
    * Agreement with the exact form everywhere except documents whose
    * ratio ties the boundary value is spec-gated (TrainingSpec). */
  def dsirSelectScale(docs: DataFrame, isTarget: Column,
      keepFraction: Double = 0.2, accuracy: Int = 10000): DataFrame = {
    require(keepFraction > 0 && keepFraction < 1, s"keepFraction $keepFraction")
    // referenced twice (threshold agg + selection) — materialized ONCE,
    // eagerly, via localCheckpoint so the blocks are ContextCleaner-freed
    // when the frame goes unreachable (a bare persist here leaked across
    // the whole sweep — r12 ADVICE); per-doc rows, far smaller than the
    // corpus text
    val scored = dsirScores(docs, isTarget).localCheckpoint(true)
    val thr = scored.agg(percentile_approx(col("ratio"),
      lit(1.0 - keepFraction), lit(accuracy)).as("sel_threshold"))
    scored.crossJoin(broadcast(thr))
      .withColumn("selected", col("ratio") >= col("sel_threshold"))
  }

  /** Apply the t15 source-mixture weights as a one-pass deterministic
    * sampler — the step between "here is the mixture table" and "here is
    * the training corpus" (the Doremi / multilingual-temperature
    * workflow's application half).
    *
    * Per source: acceptance ratio mix_weight/token_share, normalized by
    * the max ratio so the most up-weighted source keeps every document
    * (a single pass can only downsample; true up-sampling is the
    * loader's repeat factor, which this rate table also feeds). The
    * accept test is a deterministic md5 bucket against floor(rate·16^6)
    * — re-runs and engine swaps keep the IDENTICAL document set, which
    * is what makes a training mixture auditable.
    *
    * Scale: one corpus scan for per-doc token counts, a per-source
    * aggregation (tiny), rates broadcast back over the cached per-doc
    * frame — the corpus never shuffles. */
  def applyMixture(docs: DataFrame, alpha: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
    val perDoc = docs.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .localCheckpoint(true) // referenced twice; eager + auto-GC'd
    val rates = perDoc.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("n_tokens"))
      .withColumn("total_tokens", sum(col("n_tokens")).over(w))
      .withColumn("n_sources", count(lit(1)).over(w))
      .withColumn("token_share",
        col("n_tokens").cast(DoubleType) / col("total_tokens"))
      .withColumn("ratio",
        (lit(alpha) * col("token_share")
          + lit(1 - alpha) / col("n_sources")) / col("token_share"))
      .withColumn("rate", col("ratio") / max(col("ratio")).over(w))
      .select(col("source"), col("rate"),
        floor(col("rate") * lit(16777216.0)).as("threshold"))
    perDoc.join(broadcast(rates), "source")
      .withColumn("bucket",
        conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))),
          1, 6), 16, 10).cast("long"))
      .filter(col("bucket") < col("threshold"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("bucket"),
        col("rate"))
      .orderBy(col("doc_id"))
  }

  type Q = (SparkSession, String) => DataFrame

  // Canary phrase: 8 tokens, the first unique per planted pair, appended
  // to eval doc 30k and train doc 30k+1 — a known-positive shared 8-gram
  // with no organic counterpart (mirrored exactly in the oracle SQL).
  private def withCanaries(df: DataFrame): DataFrame = {
    val tail = " alpha beta gamma delta epsilon zeta eta"
    df.withColumn("ptext",
      when(col("doc_id") % 30 === 0,
        concat(col("text"), lit(" zq"),
          (col("doc_id") / 30).cast("long").cast("string"), lit(tail)))
        .when(col("doc_id") % 30 === 1,
          concat(col("text"), lit(" zq"),
            ((col("doc_id") - 1) / 30).cast("long").cast("string"), lit(tail)))
        .otherwise(col("text")))
  }

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Benchmark contamination: eval split = doc_id % 10 == 0, train =
    // the rest. Canaries guarantee planted positives (every eval doc
    // with doc_id % 30 == 0); organic duplicates in the corpus surface
    // as genuine contamination in both engines alike.
    ("d08_contamination", (s: SparkSession, d: String) => {
      val planted = withCanaries(Tables.documents(s, d))
        .select(col("doc_id"), col("ptext"))
      contamination(
        planted.filter(col("doc_id") % 10 === 0),
        planted.filter(col("doc_id") % 10 =!= 0),
        textCol = "ptext")
        .orderBy(col("doc_id"))
    },
    Some("""WITH planted AS (
        SELECT doc_id, CASE
          WHEN doc_id % 30 = 0 THEN text || ' zq' || (doc_id // 30) ||
            ' alpha beta gamma delta epsilon zeta eta'
          WHEN doc_id % 30 = 1 THEN text || ' zq' || ((doc_id - 1) // 30) ||
            ' alpha beta gamma delta epsilon zeta eta'
          ELSE text END AS ptext
        FROM documents),
      grams AS (
        SELECT doc_id, unnest(
          CASE WHEN len(string_split_regex(trim(ptext), '\s+')) >= 8
          THEN list_distinct(list_transform(
            range(0, len(string_split_regex(trim(ptext), '\s+')) - 7),
            i -> array_to_string(string_split_regex(trim(ptext), '\s+')[i+1:i+8], ' ')))
          ELSE [ptext] END) AS gram
        FROM planted),
      tot AS (SELECT doc_id, count(*) AS n_grams FROM grams
              WHERE doc_id % 10 = 0 GROUP BY 1),
      hit AS (SELECT doc_id, count(*) AS n_hit FROM grams g
              WHERE doc_id % 10 = 0 AND gram IN
                (SELECT gram FROM grams WHERE doc_id % 10 <> 0)
              GROUP BY 1)
      SELECT tot.doc_id, n_grams, coalesce(n_hit, 0) AS n_hit,
        CAST(coalesce(n_hit, 0) AS DOUBLE) / n_grams AS contamination
      FROM tot LEFT JOIN hit USING (doc_id) ORDER BY doc_id""")),

    // Tokenizer induction, step one: corpus-wide adjacent character-pair
    // frequencies within words — the candidate ranking BPE's first merge
    // consumes. Row-local pair expansion, one aggregation, top-30 under a
    // total order; at scale this is the per-iteration primitive of a
    // distributed BPE trainer (re-run over the re-segmented corpus after
    // each merge).
    ("t14_bpe_pairs", (s: SparkSession, d: String) => {
      val words = Tables.documents(s, d)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(length(col("word")) >= 2)
      words
        .select(explode(transform(
          sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(30)
    },
    Some("""WITH words AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        FROM documents),
      pairs AS (
        SELECT unnest(list_transform(range(1, length(word)),
          i -> substr(word, i, 2))) AS pair
        FROM words WHERE length(word) >= 2)
      SELECT pair, count(*) AS n FROM pairs
      GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 30""")),

    // Full BPE training loop (t14 is its single-iteration primitive):
    // 16 merges over the corpus's word-frequency table. Not
    // SQL-expressible (iterated fixpoint); the gate is TrainingSpec's
    // bit-for-bit comparison against an independent local reference
    // implementation, plus determinism. Ordered by rank — the merge
    // sequence is the contract.
    // FULL oracle since r18: the 16-merge fixpoint unrolls as chained
    // CTEs (bpeOracleCtes — pair census, exact-tie argmax, closed-form
    // greedy rewrite per iteration), so DuckDB replays the ENTIRE
    // training loop and the merge table is hash-gated bit-for-bit.
    ("t22_bpe_train", (s: SparkSession, d: String) =>
      bpeTrain(Tables.documents(s, d), merges = 16)
        .orderBy(col("rank")), Some(bpeTrainOracleSql)),

    // Corpus segmentation with the trained tokenizer — per-doc word,
    // piece, and char totals plus the chars-per-piece compression the
    // merges buy. The segmentation itself is one shuffle-free codegen'd
    // projection (16 nested merge_pair applications); only the per-doc
    // stat rollup aggregates (production emits the pieces stream and
    // skips even that). FULL oracle since r18 (shared VERBATIM with
    // t52): encoding applies the merges in rank order to the raw char
    // split, so the unrolled training chain's end state IS each word's
    // segmentation — one oracle replays train AND encode. TrainingSpec
    // additionally pins every distinct word against the reference
    // tokenizer.
    ("t23_bpe_segment", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val merges = bpeTrain(docs, merges = 16).orderBy(col("rank"))
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      docs
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .select(col("doc_id"),
          size(bpeSegmentColumn(col("word"), merges)).cast("long")
            .as("n_pieces"),
          length(col("word")).cast("long").as("n_chars"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("n_chars")).as("n_chars"))
        .withColumn("compression",
          col("n_chars").cast("double") / col("n_pieces").cast("double"))
        .orderBy(col("doc_id"))
    }, Some(bpeEncodeOracleSql)),

    // t23 served from the STORED merge table — the fifth stored-model
    // family's BPE leg (t50's discipline): train + storeBpeMerges ONCE
    // per dataset into an IxScratch dir, every call after encodes from
    // loadBpeMerges. Output is t23's VERBATIM shape; FULL oracle since
    // r18 (t23's verbatim, the t46/t50 serving discipline), with
    // TrainingSpec pinning stored ≡ live bit-for-bit on the registered
    // queries themselves.
    ("t52_bpe_stored", (s: SparkSession, d: String) => {
      val dir = IxScratch.cached(
          IxScratch.fingerprint(d) + "|bpe-merges", "graft-tokstore-") { p =>
        storeBpeMerges(bpeTrain(Tables.documents(s, d), merges = 16), p)
      }
      val (merges, byteLevel) = loadBpeMerges(s, dir)
      require(!byteLevel, "t52 serves the char-level model")
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .select(col("doc_id"),
          size(bpeSegmentColumn(col("word"), merges)).cast("long")
            .as("n_pieces"),
          length(col("word")).cast("long").as("n_chars"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("n_chars")).as("n_chars"))
        .withColumn("compression",
          col("n_chars").cast("double") / col("n_pieces").cast("double"))
        .orderBy(col("doc_id"))
    }, Some(bpeEncodeOracleSql)),

    // Unigram-LM tokenizer training — the SentencePiece counterpart to
    // t22's BPE: 120-piece model over the corpus word table (substring
    // seed → EM on the segmentation lattice → char-preserving prune →
    // re-fit). Not SQL-expressible (iterated EM fixpoint); the gate is
    // TrainingSpec's parity against an independent in-spec reference
    // implementation plus bit-identical determinism. Ordered by
    // (log_prob DESC, piece) — the model table is the contract.
    ("t34_unigram_train", (s: SparkSession, d: String) =>
      unigramTrain(Tables.documents(s, d), vocabSize = 120,
          maxPieceLen = 6, emIters = 3)
        .orderBy(col("log_prob").desc, col("piece")), None),

    // Corpus segmentation with the trained unigram model — per-doc
    // word/piece/char totals plus compression, the t23 rollup through
    // the OTHER tokenizer family. The segmentation itself is one
    // shuffle-free codegen'd Viterbi projection with the model as plan
    // constants. Gate: TrainingSpec segments every distinct word
    // identically to the in-spec reference Viterbi and pieces always
    // reassemble to the word.
    ("t35_unigram_segment", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val model = unigramTrain(docs, vocabSize = 120, maxPieceLen = 6,
          emIters = 3)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      docs
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .select(col("doc_id"),
          size(unigramSegmentColumn(col("word"), model)).cast("long")
            .as("n_pieces"),
          length(col("word")).cast("long").as("n_chars"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("n_chars")).as("n_chars"))
        .withColumn("compression",
          col("n_chars").cast("double") / col("n_pieces").cast("double"))
        .orderBy(col("doc_id"))
    }, None),

    // t35 served from the STORED unigram model — the family's third
    // leg (t50/t52 discipline): train + storeUnigramModel once per
    // dataset, encode from loadUnigramModel (bit-exact doubles — the
    // store round-trips the EM log-probs without a text step). Output
    // is t35's VERBATIM shape; rows-only, stored ≡ live spec-pinned.
    ("t53_unigram_stored", (s: SparkSession, d: String) => {
      val dir = IxScratch.cached(
          IxScratch.fingerprint(d) + "|unigram-model",
          "graft-tokstore-") { p =>
        storeUnigramModel(unigramTrain(Tables.documents(s, d),
          vocabSize = 120, maxPieceLen = 6, emIters = 3), p)
      }
      val model = loadUnigramModel(s, dir)
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .select(col("doc_id"),
          size(unigramSegmentColumn(col("word"), model)).cast("long")
            .as("n_pieces"),
          length(col("word")).cast("long").as("n_chars"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("n_chars")).as("n_chars"))
        .withColumn("compression",
          col("n_chars").cast("double") / col("n_pieces").cast("double"))
        .orderBy(col("doc_id"))
    }, None),

    // The unigram STORED-SERVING oracle leg (closing the one tokenizer
    // family with no oracle): t53's exact machinery — storeUnigramModel
    // → StoreGuard'd loadUnigramModel → the codegen'd UnigramSegment
    // Viterbi — under the SQL-derivable Q20 model ([[q20UnigramModel]]:
    // every log_prob an exact dyadic score_q/2^20, so every path sum
    // and every DP comparison is bit-exact in both engines). The oracle
    // re-derives the model from raw text and replays the FULL Viterbi —
    // lattice arcs, the forward max-DP with the longest-last-piece tie
    // rule (first max in j-ascending candidate order), and the
    // backtrace — as recursive CTEs carrying the DP arrays as list
    // state (the t39/t46 join-only-recursion discipline extended to
    // DP). Targets are the distinct words of every 89th doc. t34/t35/
    // t53 stay the live EM anchors (float fixpoint, adjudicated);
    // TrainingSpec pins reassembly + stored ≡ fresh parity here.
    ("t55_unigram_stored_q20", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val dir = IxScratch.cached(
          IxScratch.fingerprint(d) + "|t55-model", "graft-t55-") { p =>
        storeUnigramModel(q20UnigramModel(docs), p)
      }
      val model = loadUnigramModel(s, dir)
      docs.filter(col("doc_id") % 89 === 0)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "").distinct()
        .select(col("word"),
          unigramSegmentColumn(col("word"), model).as("segs"))
        .select(col("word"),
          array_join(col("segs"), "|").as("segmentation"),
          size(col("segs")).cast("long").as("n_pieces"))
        .orderBy(col("word"))
    },
    Some("""WITH RECURSIVE words AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS wcnt FROM (
          SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
          FROM documents) z
        WHERE word <> '' GROUP BY word),
      pos AS (
        SELECT word, wcnt, CAST(r.i AS INTEGER) AS i
        FROM words, unnest(range(0, length(word))) AS r(i)),
      subs AS (
        SELECT substr(word, i + 1, CAST(r.l AS INTEGER)) AS piece, wcnt
        FROM pos, unnest(range(1, least(6, length(word) - i) + 1)) AS r(l)),
      cnts AS MATERIALIZED (
        SELECT piece, CAST(sum(wcnt) AS BIGINT) AS cnt
        FROM subs GROUP BY piece),
      chars AS MATERIALIZED (
        SELECT piece, cnt FROM cnts WHERE length(piece) = 1),
      nchars AS (SELECT count(*) AS nc FROM chars),
      multi AS (
        SELECT piece, cnt FROM (
          SELECT piece, cnt,
            row_number() OVER (ORDER BY cnt DESC, piece) AS rk
          FROM cnts WHERE length(piece) > 1) z, nchars
        WHERE rk <= 120 - nc),
      model AS MATERIALIZED (
        SELECT piece,
          -1073741824 + CAST(length(piece) AS BIGINT) * 1048576 +
            least(cnt, 65536) AS score_q
        FROM (SELECT piece, cnt FROM chars
              UNION ALL SELECT piece, cnt FROM multi) u),
      twn AS MATERIALIZED (
        SELECT word, CAST(length(word) AS INTEGER) AS n FROM (
          SELECT DISTINCT word FROM (
            SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
              AS word
            FROM documents WHERE doc_id % 89 = 0) y
          WHERE word <> '') z),
      cand AS (
        SELECT t.word, CAST(p.i AS INTEGER) AS j,
          CAST(p.i + l.l AS INTEGER) AS i,
          substr(t.word, CAST(p.i AS INTEGER) + 1, CAST(l.l AS INTEGER))
            AS piece
        FROM twn t, unnest(range(0, t.n)) AS p(i),
          unnest(range(1, least(6, t.n - p.i) + 1)) AS l(l)),
      arclist AS MATERIALIZED (
        SELECT c.word, c.i,
          list(c.j ORDER BY c.j) AS arcj,
          list(m.score_q ORDER BY c.j) AS arcsc
        FROM cand c JOIN model m ON m.piece = c.piece
        GROUP BY c.word, c.i),
      vit AS (
        SELECT word, n, 0 AS i,
          [CAST(0 AS BIGINT)] AS bests, [CAST(0 AS INTEGER)] AS backs
        FROM twn
        UNION ALL
        SELECT word, n, i + 1,
          list_append(bests, list_max(cands)),
          list_append(backs, arcj[list_position(cands, list_max(cands))])
        FROM (
          SELECT v.word, v.n, v.i AS i, v.bests, v.backs, a.arcj,
            list_transform(range(1, len(a.arcj) + 1),
              k -> v.bests[a.arcj[k] + 1] + a.arcsc[k]) AS cands
          FROM vit v JOIN arclist a ON a.word = v.word AND a.i = v.i + 1
          WHERE v.i < v.n) z),
      vf AS MATERIALIZED (
        SELECT word, n, backs FROM vit WHERE i = n),
      bt AS (
        SELECT word, n, n AS p, CAST([] AS VARCHAR[]) AS rev FROM vf
        UNION ALL
        SELECT b.word, b.n, f.backs[b.p + 1] AS p,
          list_append(b.rev, substr(b.word, f.backs[b.p + 1] + 1,
            b.p - f.backs[b.p + 1]))
        FROM bt b JOIN vf f ON f.word = b.word
        WHERE b.p > 0)
      SELECT word, array_to_string(list_reverse(rev), '|') AS segmentation,
        CAST(len(rev) AS BIGINT) AS n_pieces
      FROM bt WHERE p = 0
      ORDER BY word""")),

    // Stored-tokenizer REFRESH lifecycle — the grow/refresh semantics
    // every index family already registers, for the tokenizer store:
    // v1 trains+stores on the corpus; a synthetic batch arrives (every
    // 7th doc re-posted with a planted fresh-token run); v2 RETRAINS on
    // corpus ∪ batch and stores alongside v1 (versioned sibling dirs —
    // the old model stays servable, TrainingSpec asserts v1 encodes
    // reproduce bit-for-bit after the refresh); the registered query
    // SERVES the snapshot from the loaded v2. FULL oracle: the same
    // unrolled train+encode chain over the snapshot union, plant
    // replayed via repeat() — train, store, reload, and serve all sit
    // under the hash compare.
    ("t54_tokenizer_refresh", (s: SparkSession, d: String) => {
      val (_, v2) = bpeRefreshDirs(s, d)
      val (merges, byteLevel) = loadBpeMerges(s, v2)
      require(!byteLevel, "t54 serves the char-level model")
      refreshSnapshot(Tables.documents(s, d))
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .select(col("doc_id"),
          size(bpeSegmentColumn(col("word"), merges)).cast("long")
            .as("n_pieces"),
          length(col("word")).cast("long").as("n_chars"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("n_chars")).as("n_chars"))
        .withColumn("compression",
          col("n_chars").cast("double") / col("n_pieces").cast("double"))
        .orderBy(col("doc_id"))
    }, Some(bpeRefreshOracleSql)),

    // WordPiece tokenizer training — the BERT tokenizer, completing the
    // subword-family triad next to t22's BPE and t34's unigram model:
    // 16 likelihood-scored merges (count(pair)/(count(l)·count(r)),
    // exact rational compare) over the corpus word table, continuation
    // symbols ##-marked from the start. FULL oracle since r18
    // (wordpieceOracleCtes — the t22 unrolled-chain treatment with the
    // exact-rational argmax replayed by a sound two-stage selection:
    // double-score band, then exact HUGEINT cross-multiplication among
    // the banded candidates); TrainingSpec keeps the bit-for-bit parity
    // against an independent in-spec reference plus hand-computed
    // score cases.
    ("t45_wordpiece_train", (s: SparkSession, d: String) =>
      wordpieceTrain(Tables.documents(s, d), merges = 16)
        .orderBy(col("rank")), Some(wordpieceTrainOracleSql)),

    // WordPiece greedy encode under a FULL DuckDB oracle — the first
    // fully oracle-gated tokenizer in the family (t23/t35 are
    // reference-parity gated because their trained models are iterated
    // fixpoints): the vocabulary here is SQL-derivable (top-200
    // positional substrings ≤4 chars by (count, form, piece) over the
    // word table, plus every positional single char for coverage), and
    // BERT's longest-match-first walk replays exactly — the oracle
    // computes per-position best matches, then walks each word with a
    // recursive CTE (greedy = the argmax table makes the recursion
    // join-only). The Spark side segments with the same codegen'd
    // expression production uses; every piece of every word must match.
    ("t46_wordpiece_segment", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      // the word table is the truly multi-referenced stage (substring
      // census AND the final segmentation read it): eager leaf, so the
      // corpus explode+aggregate runs exactly once
      val words = docs
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
        .localCheckpoint(true)
      val vocab = wordpieceSqlVocab(words)
      words
        .select(col("word"), col("wcnt"),
          wordpieceSegmentColumn(col("word"), vocab).as("segs"))
        .select(col("word"), col("wcnt"),
          size(col("segs")).cast("long").as("n_pieces"),
          array_join(col("segs"), " ").as("pieces"))
        .orderBy(col("word"))
    },
    Some(wordpieceEncodeOracleSql)),

    // WordPiece encode from the STORED vocabulary — the serving half of
    // the fifth stored-model family: the vocab derives and persists
    // ONCE per dataset (storeWordpieceVocab under an IxScratch dir, the
    // AnnIndex model.parquet pattern) and this query encodes the corpus
    // by LOADING it — train here, encode everywhere. Oracle is t46's
    // VERBATIM: the serving path changes, the segmentation must not
    // (the r11/c10 discipline); stored ≡ live parity is additionally
    // TrainingSpec's lifecycle gate.
    ("t50_wordpiece_stored", (s: SparkSession, d: String) => {
      val (vocab, unk) = loadWordpieceVocab(s, wordpieceStoreDir(s, d))
      Tables.documents(s, d)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
        .select(col("word"), col("wcnt"),
          wordpieceSegmentColumn(col("word"), vocab, unk).as("segs"))
        .select(col("word"), col("wcnt"),
          size(col("segs")).cast("long").as("n_pieces"),
          array_join(col("segs"), " ").as("pieces"))
        .orderBy(col("word"))
    },
    Some(wordpieceEncodeOracleSql)),

    // Tokenizer FERTILITY per language — the multilingual-fairness
    // number a tokenizer eval reports (mean pieces per word, weighted
    // by word occurrences, per language): languages whose words the
    // vocabulary covers poorly pay more pieces per word, i.e. more
    // sequence length for the same text. Reuses t46's SQL-derivable
    // WordPiece vocabulary and greedy walk verbatim; the rollup weights
    // each distinct word's piece count by its per-language occurrence
    // counts — all exact integers, fertility as a Q20 integer ratio, so
    // the whole multilingual report is oracle-gated.
    ("t49_tokenizer_fertility", (s: SparkSession, d: String) => {
      val docs = Tables.documents(s, d)
      val langWords = docs
        .select(col("lang"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("wcnt"))
        .localCheckpoint(true)
      val words = langWords.groupBy(col("word"))
        .agg(sum(col("wcnt")).as("wcnt"))
      // the eval reads the STORED vocabulary (same artifact t50 serves
      // from — the lang-marginalized word counts equal t46's, so the
      // derivation is identical): the served tokenizer answers the
      // eval-side question too, nothing retrains here
      val (vocab, unk) = loadWordpieceVocab(s, wordpieceStoreDir(s, d))
      val segged = words.select(col("word"),
          size(wordpieceSegmentColumn(col("word"), vocab, unk)).cast("long")
            .as("n_pieces"))
      langWords.join(segged, Seq("word"))
        .groupBy(col("lang"))
        .agg(sum(col("wcnt")).as("n_words"),
          sum(col("wcnt") * col("n_pieces")).as("n_pieces"))
        .withColumn("fertility_q20",
          floor(lit(1048576.0) * col("n_pieces").cast("double")
            / col("n_words").cast("double")).cast("long"))
        .orderBy(col("lang"))
    },
    Some("""WITH RECURSIVE words AS (
        SELECT word, count(*) AS wcnt FROM (
          SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
          FROM documents) t
        WHERE word <> '' GROUP BY word),
      starts AS (
        SELECT word, wcnt, unnest(range(1, length(word) + 1)) AS st
        FROM words),
      spans AS (
        SELECT word, wcnt, st, unnest([1, 2, 3, 4]) AS l FROM starts),
      subs AS (
        SELECT CASE WHEN st = 1 THEN 0 ELSE 1 END AS form,
          substr(word, st, l) AS piece, sum(wcnt) AS cnt
        FROM spans WHERE st + l <= length(word) + 1
        GROUP BY 1, 2),
      topk AS (
        SELECT form, piece FROM subs
        ORDER BY cnt DESC, form ASC, piece ASC LIMIT 200),
      chars AS (
        SELECT DISTINCT form, piece FROM subs WHERE length(piece) = 1),
      vocab AS (
        SELECT DISTINCT form, piece FROM (
          SELECT * FROM topk UNION ALL SELECT * FROM chars) u
        WHERE NOT (form = 0 AND piece LIKE '##%')),
      positions AS (
        SELECT word, unnest(range(0, length(word))) AS pos FROM words),
      cands AS (
        SELECT p.word, p.pos, v.piece, v.form, length(v.piece) AS len
        FROM (SELECT word, pos, unnest([1, 2, 3, 4]) AS l
              FROM positions) p
        JOIN vocab v ON v.form = (CASE WHEN p.pos = 0 THEN 0 ELSE 1 END)
          AND v.piece = substr(p.word, p.pos + 1, p.l)
        WHERE length(v.piece) = p.l),
      best AS (
        SELECT word, pos, piece, form, len FROM (
          SELECT word, pos, piece, form, len,
            row_number() OVER (PARTITION BY word, pos
              ORDER BY len DESC) AS rn
          FROM cands) b WHERE rn = 1),
      walk AS (
        SELECT word, 0 AS pos, 0 AS ord, CAST(NULL AS VARCHAR) AS tok
        FROM words
        UNION ALL
        SELECT w.word, w.pos + b.len, w.ord + 1,
          CASE WHEN b.form = 1 THEN '##' || b.piece ELSE b.piece END
        FROM walk w JOIN best b ON b.word = w.word AND b.pos = w.pos),
      pieces AS (
        SELECT word, CAST(count(*) AS BIGINT) AS n_pieces
        FROM walk WHERE tok IS NOT NULL GROUP BY word),
      lw AS (
        SELECT lang, word, count(*) AS wcnt FROM (
          SELECT lang,
            unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
          FROM documents) t
        WHERE word <> '' GROUP BY lang, word)
      SELECT lw.lang,
        CAST(sum(lw.wcnt) AS BIGINT) AS n_words,
        CAST(sum(lw.wcnt * p.n_pieces) AS BIGINT) AS n_pieces,
        CAST(floor(1048576.0 * CAST(sum(lw.wcnt * p.n_pieces) AS DOUBLE)
          / CAST(sum(lw.wcnt) AS DOUBLE)) AS BIGINT) AS fertility_q20
      FROM lw JOIN pieces p ON p.word = lw.word
      GROUP BY lw.lang ORDER BY lw.lang""")),

    // Document-boundary greedy packing, oracle-gated: DuckDB replays
    // the sequential bin walk with a recursive CTE carrying (open bin,
    // fill) per stream — every placement, overflow flag, and bin close
    // (including the exact-fit close) must match the one-pass group
    // walk.
    ("t39_pack_boundary", (s: SparkSession, d: String) =>
      packGreedy(Tables.documents(s, d), seqLen = 256)
        .orderBy(col("stream"), col("doc_id")),
    Some("""WITH RECURSIVE d AS (
        SELECT doc_id, source AS stream,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
          row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents),
      packed AS (
        SELECT doc_id, stream, n_tok, rn,
          CAST(0 AS BIGINT) AS bin_id,
          n_tok > 256 AS overflow,
          CASE WHEN n_tok >= 256 THEN CAST(1 AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS st_bin,
          CASE WHEN n_tok >= 256 THEN CAST(0 AS BIGINT)
            ELSE n_tok END AS st_fill
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.doc_id, d.stream, d.n_tok, d.rn,
          CASE WHEN p.st_fill > 0 AND p.st_fill + d.n_tok > 256
            THEN p.st_bin + 1 ELSE p.st_bin END,
          d.n_tok > 256,
          CASE WHEN (CASE WHEN p.st_fill > 0 AND p.st_fill + d.n_tok > 256
              THEN d.n_tok ELSE p.st_fill + d.n_tok END) >= 256
            THEN (CASE WHEN p.st_fill > 0 AND p.st_fill + d.n_tok > 256
              THEN p.st_bin + 1 ELSE p.st_bin END) + 1
            ELSE (CASE WHEN p.st_fill > 0 AND p.st_fill + d.n_tok > 256
              THEN p.st_bin + 1 ELSE p.st_bin END) END,
          CASE WHEN (CASE WHEN p.st_fill > 0 AND p.st_fill + d.n_tok > 256
              THEN d.n_tok ELSE p.st_fill + d.n_tok END) >= 256
            THEN CAST(0 AS BIGINT)
            ELSE (CASE WHEN p.st_fill > 0 AND p.st_fill + d.n_tok > 256
              THEN d.n_tok ELSE p.st_fill + d.n_tok END) END
        FROM d JOIN packed p ON d.stream = p.stream AND d.rn = p.rn + 1)
      SELECT doc_id, stream, n_tok, bin_id, overflow
      FROM packed ORDER BY stream, doc_id""")),

    // Byte-level BPE — the production tokenizer regime (GPT-2 lineage):
    // words map through the bijective byte alphabet
    // (functions/ByteMap.scala) and the UNCHANGED merge loop trains over
    // mapped chars, so the tokenizer covers ANY byte sequence with zero
    // unknown tokens; segmentation composes byte_map into the same
    // shuffle-free MergePair projection. Per-doc rollup like t23 with
    // n_bytes = UTF-8 byte totals. FULL oracle since r18
    // (bpeBytesOracleSql): the byte map is the IDENTITY on printable
    // ASCII and the driver's corpus is printable-ASCII at every SF, so
    // the non-lowered unrolled chain replays byte-level training
    // exactly (a non-ASCII regeneration flags red, never passes
    // silently); the bijection (emoji/CJK round-trips) and multibyte
    // reassembly stay spec-gated in TrainingSpec.
    ("t37_bpe_bytes", (s: SparkSession, d: String) => {
      val fns = graft.functions.GraftFunctions
      val docs = Tables.documents(s, d)
      val merges = bpeTrain(docs, merges = 16, caseFold = false,
          byteLevel = true)
        .orderBy(col("rank"))
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      docs
        .select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .select(col("doc_id"),
          size(bpeSegmentColumn(fns.byte_map(col("word")), merges))
            .cast("long").as("n_pieces"),
          length(fns.byte_map(col("word"))).cast("long").as("n_bytes"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("n_bytes")).as("n_bytes"))
        .withColumn("compression",
          col("n_bytes").cast("double") / col("n_pieces").cast("double"))
        .orderBy(col("doc_id"))
    }, Some(bpeBytesOracleSql)),

    // Source mixture weighting — the sampling-temperature table a
    // training data loader consumes: per-source token mass, its share,
    // and a smoothed weight interpolating proportional with uniform
    // (alpha=0.5), which upweights small sources the way multilingual
    // pretraining mixtures do. All arithmetic derives from exact integer
    // totals in the same expression order on both engines, so the gate
    // hashes bit-equal doubles. One tiny aggregation; the window total
    // sums integers (order-independent).
    ("t15_mixture_weights", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val perSource = Tables.documents(s, d)
        .select(col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      val w = Window.partitionBy()
      perSource
        .withColumn("total_tokens", sum(col("n_tokens")).over(w))
        .withColumn("n_sources", count(lit(1)).over(w))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          (col("n_tokens").cast(DoubleType) / col("total_tokens"))
            .as("token_share"),
          (lit(0.5) * (col("n_tokens").cast(DoubleType) / col("total_tokens"))
            + lit(0.5) / col("n_sources")).as("mix_weight"))
        .orderBy(col("source"))
    },
    Some("""WITH per_source AS (
        SELECT source, count(*) AS n_docs,
          CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
      tot AS (
        SELECT source, n_docs, n_tokens,
          CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens,
          count(*) OVER () AS n_sources
        FROM per_source)
      SELECT source, n_docs, n_tokens,
        CAST(n_tokens AS DOUBLE) / total_tokens AS token_share,
        0.5 * (CAST(n_tokens AS DOUBLE) / total_tokens) + 0.5 / n_sources
          AS mix_weight
      FROM tot ORDER BY source""")),

    // Concatenate-and-chunk sequence packing at seqLen=256 per source
    // stream: each doc's first/last training sequence and span.
    ("t13_seq_pack", (s: SparkSession, d: String) =>
      packSequences(Tables.documents(s, d), seqLen = 256)
        .orderBy(col("source"), col("doc_id")),
    Some("""WITH counted AS (
        SELECT doc_id, source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        FROM documents),
      offs AS (
        SELECT doc_id, source, n_tok,
          CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum_end
        FROM counted)
      SELECT doc_id, source, n_tok,
        (cum_end - n_tok) // 256 AS first_seq,
        (cum_end - 1) // 256 AS last_seq,
        (cum_end - 1) // 256 - (cum_end - n_tok) // 256 + 1 AS n_seqs
      FROM offs ORDER BY source, doc_id""")),

    // Deterministic seeded corpus shuffle into training shards. Shard
    // assignment is doc_id mod n (balanced by construction, no data
    // movement to decide); the RANDOMIZATION lives in the within-shard
    // order: a seeded md5 of the doc id. At 100 TB this is
    // repartition(n, shard) + sortWithinPartitions(key) — each shard
    // writer sorts locally, no global sort, no single-partition window.
    // Changing the seed literal reshuffles every epoch deterministically.
    ("t17_shuffle_shards", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val nShards = 8
      val key = md5(concat(col("doc_id").cast("string"), lit("graft42")))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          (col("doc_id") % nShards).as("shard"), key.as("skey"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))))
        .select(col("doc_id"), col("source"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    },
    Some("""WITH keyed AS (
        SELECT doc_id, source, doc_id % 8 AS shard,
          md5(CAST(doc_id AS VARCHAR) || 'graft42') AS skey
        FROM documents)
      SELECT doc_id, source, shard,
        CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id)
          AS INTEGER) AS pos
      FROM keyed ORDER BY shard, pos""")),

    // Greedy per-source token-budget sampling — the epoch planner's cut:
    // documents are taken in seeded-shuffle order until the source's
    // token budget is reached (the document crossing the boundary is
    // kept, the standard closed-on-start rule, so every budget>0 yields
    // at least one document). One cumulative-sum window per source —
    // shard-parallel at scale exactly like t13's packing windows.
    ("t18_token_budget", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 2000L
      val key = md5(concat(col("doc_id").cast("string"), lit("graft42")))
      val counted = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), key.as("skey"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      val w = Window.partitionBy(col("source")).orderBy(col("skey"), col("doc_id"))
      counted
        .withColumn("cum_end", sum(col("n_tok")).over(w))
        .filter(col("cum_end") - col("n_tok") < budget)
        .select(col("doc_id"), col("source"), col("n_tok"), col("cum_end"))
        .orderBy(col("source"), col("cum_end"), col("doc_id"))
    },
    Some("""WITH counted AS (
        SELECT doc_id, source,
          md5(CAST(doc_id AS VARCHAR) || 'graft42') AS skey,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        FROM documents),
      offs AS (
        SELECT doc_id, source, n_tok,
          CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY skey, doc_id)
            AS BIGINT) AS cum_end
        FROM counted)
      SELECT doc_id, source, n_tok, cum_end
      FROM offs WHERE cum_end - n_tok < 2000
      ORDER BY source, cum_end, doc_id""")),

    // DSIR-style data selection: English docs are the target slice, the
    // whole corpus is raw; every doc gets its quantized importance and
    // the top 20% by mean importance (doc_id tiebreak) are selected.
    // The exact global rank is the sf-scale GATE; at 100 TB the cutoff
    // comes from approx_percentile on `ratio` and selection is a plain
    // threshold filter — no global window in the production path.
    ("t25_dsir_select", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      dsirScores(Tables.documents(s, d), col("lang") === "en")
        .withColumn("sel_rank", row_number().over(
          Window.orderBy(col("ratio").desc, col("doc_id"))).cast("long"))
        .withColumn("selected", col("sel_rank") <=
          floor(count(lit(1)).over(Window.partitionBy()) * lit(0.2)))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, lang = 'en' AS is_t,
          string_split_regex(trim(lower(text)), '\s+') AS tk
        FROM documents),
      uni AS (
        SELECT doc_id, is_t, unnest(tk) AS feat FROM toks),
      bi AS (
        SELECT doc_id, is_t, unnest(list_transform(range(1, len(tk)),
          i -> tk[i] || ' ' || tk[i + 1])) AS feat
        FROM toks),
      feats AS (
        SELECT doc_id, is_t,
          CAST(concat('0x', substr(md5(feat), 1, 8)) AS BIGINT) % 2048 AS bucket
        FROM (SELECT * FROM uni WHERE feat <> ''
              UNION ALL SELECT * FROM bi) u),
      cnt AS (
        SELECT bucket, count(*) AS r,
          sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS t
        FROM feats GROUP BY bucket),
      w AS (
        SELECT bucket,
          CAST(floor(
            (CAST(t + 1 AS DOUBLE) / CAST(sum(t) OVER () + 2048 AS DOUBLE)) /
            (CAST(r + 1 AS DOUBLE) / CAST(sum(r) OVER () + 2048 AS DOUBLE))
            * 1048576) AS BIGINT) AS wq
        FROM cnt),
      sc AS (
        SELECT doc_id, count(*) AS n_feats,
          CAST(sum(COALESCE(wq, 0)) AS BIGINT) AS sum_wq
        FROM feats LEFT JOIN w USING (bucket) GROUP BY doc_id),
      r AS (
        SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats, sum_wq,
          CAST(sum_wq AS DOUBLE) / n_feats / 1048576 AS ratio,
          count(*) OVER () AS n_docs
        FROM sc)
      SELECT doc_id, n_feats, sum_wq, ratio,
        CAST(row_number() OVER (ORDER BY ratio DESC, doc_id) AS BIGINT)
          AS sel_rank,
        row_number() OVER (ORDER BY ratio DESC, doc_id)
          <= floor(n_docs * 0.2) AS selected
      FROM r ORDER BY doc_id""")),

    // The materialized training sequences (t13 computes where docs land;
    // this emits what the trainer reads): every 256-token sequence's
    // exact content hash, token count, and how many documents it spans.
    ("t26_pack_emit", (s: SparkSession, d: String) =>
      packEmit(Tables.documents(s, d), seqLen = 256)
        .orderBy(col("source"), col("seq_id")),
    Some("""WITH counted AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS tk,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        FROM documents),
      offs AS (
        SELECT doc_id, source, tk,
          sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok
            AS cum_start
        FROM counted),
      tokens AS (
        SELECT doc_id, source,
          cum_start + r.i - 1 AS gpos, tk[r.i] AS tok,
          (cum_start + r.i - 1) // 256 AS seq_id
        FROM offs, unnest(range(1, len(tk) + 1)) AS r(i))
      SELECT source, CAST(seq_id AS BIGINT) AS seq_id,
        CAST(count(*) AS BIGINT) AS n_tok,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        md5(string_agg(tok, ' ' ORDER BY gpos)) AS seq_md5
      FROM tokens GROUP BY source, seq_id
      ORDER BY source, seq_id""")),

    // The application step of t15: turn the mixture weights into a
    // single-pass deterministic document sampler. Per-source acceptance
    // rate = (mix_weight / token_share) normalized so the most
    // UP-weighted source keeps everything (rate 1 — one pass can only
    // downsample); accept iff the doc's md5 bucket clears the source's
    // threshold. Every double derives from exact integer totals in the
    // same expression order on both engines, thresholds quantize to
    // integers (floor · 16^6), and membership is a string-hash compare —
    // so the exact kept-set hash-matches. Plan shape: one tiny
    // aggregation broadcast back over one corpus scan; no corpus
    // shuffle.
    ("t30_mixture_apply", (s: SparkSession, d: String) =>
      applyMixture(Tables.documents(s, d)),
    Some("""WITH per_doc AS (
        SELECT doc_id, source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        FROM documents),
      per_source AS (
        SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM per_doc GROUP BY source),
      tot AS (
        SELECT source, n_tokens,
          CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens,
          count(*) OVER () AS n_sources
        FROM per_source),
      rates AS (
        SELECT source,
          (0.5 * (CAST(n_tokens AS DOUBLE) / total_tokens) + 0.5 / n_sources)
            / (CAST(n_tokens AS DOUBLE) / total_tokens) AS ratio
        FROM tot),
      normed AS (
        SELECT source, ratio / max(ratio) OVER () AS rate FROM rates),
      keyed AS (
        SELECT d.doc_id, d.source, d.n_tok, n.rate,
          CAST(concat('0x', substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 6))
            AS BIGINT) AS bucket,
          CAST(floor(n.rate * 16777216.0) AS BIGINT) AS threshold
        FROM per_doc d JOIN normed n USING (source))
      SELECT doc_id, source, n_tok, bucket, rate FROM keyed
      WHERE bucket < threshold ORDER BY doc_id""")),

    // t25's registered SCALE TWIN (r11 VERDICT item 3): the same DSIR
    // scoring, but the top-20% cut comes from approx_percentile +
    // threshold filter — no corpus-wide window, no global sort (plan
    // asserted window-free in TrainingSpec). Rows-only by nature
    // (approx_percentile's interpolation isn't engine-reproducible);
    // agreement with t25 away from the boundary ratio is spec-gated.
    ("t40_dsir_scale", (s: SparkSession, d: String) =>
      dsirSelectScale(Tables.documents(s, d), col("lang") === "en")
        .orderBy(col("doc_id")), None)
  )
}
