package graft

import org.apache.spark.sql.functions._

import graft.operators.Training

/** Ground-truth semantics of the training-set preparation operators:
  * planted canary grams make their eval docs contaminated, clean synthetic
  * docs score zero, and sequence packing reconstructs a consistent
  * gap-free token stream per source.
  */
class TrainingSpec extends SparkSuite {
  import spark.implicits._

  test("contamination: planted canaries hit; fully-disjoint docs score 0") {
    val rows = SparkEntry.queries("d08_contamination")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // every eval doc is present exactly once (doc_id % 10 == 0)
    val n = Tables.documents(spark, sf0001).count()
    assert(rows.keySet == (0L until n).filter(_ % 10 == 0).toSet)
    // each canary doc shares at least its planted 8-gram with the train split
    rows.foreach { case (id, (nHit, frac)) =>
      if (id % 30 == 0) assert(nHit >= 1L && frac > 0.0, s"canary doc $id")
      assert(frac >= 0.0 && frac <= 1.0, s"doc $id")
    }
  }

  test("contamination: synthetic disjoint corpora — exact hit accounting") {
    val evalDocs = Seq(
      (1L, "a b c d e f g h i j"), // grams: 3 (8-grams of 10 tokens)
      (2L, "z y x w v u t s r q") // fully disjoint from train
    ).toDF("doc_id", "text")
    val train = Seq(
      (10L, "PRE a b c d e f g h POST") // contains eval doc 1's first 8-gram
    ).toDF("doc_id", "text")
    val out = Training.contamination(evalDocs, train)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((3L, 1L)))
    assert(out(2L) == ((3L, 0L)))
  }

  test("contamination: broadcast, shuffle, and hashed formulations agree") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val ev = docs.filter(col("doc_id") % 10 === 0)
    val tr = docs.filter(col("doc_id") % 10 =!= 0)
    val a = Training.contamination(ev, tr, broadcastEval = true)
      .orderBy("doc_id").collect().toSeq
    val b = Training.contamination(ev, tr, broadcastEval = false)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // the long-keyed scale variant produces identical counts
    val c = Training.contamination(ev, tr, hashGrams = true)
      .orderBy("doc_id").collect().toSeq
    assert(a == c)
  }

  test("seq packing: per-source stream is gap-free and spans are exact") {
    val out = SparkEntry.queries("t13_seq_pack")(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._2).foreach { case (_, id, nTok, first, last, nSeqs) =>
        assert(nTok >= 1L, s"doc $id")
        assert(first == cum / 256, s"doc $id first_seq")
        assert(last == (cum + nTok - 1) / 256, s"doc $id last_seq")
        assert(nSeqs == last - first + 1, s"doc $id n_seqs")
        cum += nTok
      }
    }
  }

  test("seq packing: a doc longer than seqLen spans multiple sequences") {
    val docs = Seq(
      (1L, "s", Seq.fill(5)("w").mkString(" ")), // 5 tokens
      (2L, "s", Seq.fill(20)("w").mkString(" ")) // crosses the 8-boundary twice
    ).toDF("doc_id", "source", "text")
    val out = Training.packSequences(docs, seqLen = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out(0) == ((1L, 0L, 0L, 1L))) // tokens [0,5) -> seq 0
    assert(out(1) == ((2L, 0L, 3L, 4L))) // tokens [5,25) -> seqs 0..3
  }

  test("pack emit: sequences carry exactly the chunked token stream") {
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "s", "a b c"),        // gpos 0..2
      (2L, "s", "d e f g h i"),  // gpos 3..8
      (3L, "s", "j"),            // gpos 9
      (4L, "t", "p q r s t"))    // its own stream, gpos 0..4
      .toDF("doc_id", "source", "text")
    val out = Training.packEmit(docs, seqLen = 4)
      .orderBy("source", "seq_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(out == Seq(
      ("s", 0L, 4L, 2L, md5("a b c d")),  // spans docs 1+2
      ("s", 1L, 4L, 1L, md5("e f g h")),
      ("s", 2L, 2L, 2L, md5("i j")),      // tail: docs 2+3
      ("t", 0L, 4L, 1L, md5("p q r s")),
      ("t", 1L, 1L, 1L, md5("t"))))
  }

  test("pack emit agrees with t13's placement on the real corpus") {
    val seqs = SparkEntry.queries("t26_pack_emit")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(seqs.nonEmpty)
    seqs.groupBy(_._1).foreach { case (src, ss) =>
      val ordered = ss.sortBy(_._2)
      // seq ids are contiguous from 0 and every non-tail sequence is full
      assert(ordered.map(_._2).toSeq == (0L until ordered.length).toSeq, src)
      ordered.init.foreach { case (_, id, nTok, _) =>
        assert(nTok == 256L, s"$src seq $id not full")
      }
      assert(ordered.last._3 <= 256L)
    }
    // total emitted tokens == total corpus tokens, stream by stream
    val fromDocs = Tables.documents(spark, sf0001)
      .select(col("source"), size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromSeqs = seqs.groupBy(_._1).map { case (s, ss) => s -> ss.map(_._3).sum }
    assert(fromSeqs == fromDocs)
    // t13 (placement) and t26 (emission) assign identical doc->seq spans:
    // every doc's first/last sequence from t13 must exist in t26's id range
    val t13 = SparkEntry.queries("t13_seq_pack")(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    val maxSeq = seqs.groupBy(_._1).map { case (s, ss) => s -> ss.map(_._2).max }
    t13.foreach { case (src, first, last) =>
      assert(first >= 0L && last <= maxSeq(src), s"$src span [$first,$last]")
    }
  }

  test("shuffle shards: balanced permutation, deterministic, non-trivial order") {
    val rows = SparkEntry.queries("t17_shuffle_shards")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(rows.length == nDocs)
    assert(rows.map(_._1).distinct.length == nDocs) // every doc exactly once
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet == (0L until 8L).toSet)
    // mod assignment: counts differ by at most one
    val sizes = byShard.values.map(_.length)
    assert(sizes.max - sizes.min <= 1, sizes.toSeq)
    // pos is 1..count within each shard
    byShard.values.foreach(s =>
      assert(s.map(_._3).sorted.toSeq == (1 to s.length).toSeq))
    // the seeded order is not the doc_id order (the point of a shuffle)
    val shard0 = byShard(0L).sortBy(_._3).map(_._1).toSeq
    assert(shard0 != shard0.sorted)
    // deterministic: same seed, same permutation
    val again = SparkEntry.queries("t17_shuffle_shards")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("shard sink: files carry the t17 permutation without a global sort") {
    val out = tempDir("shards").getAbsolutePath
    Training.writeShards(Tables.documents(spark, sf0001), s"file:$out")
    // the physical plan the sink runs must not contain a global sort or
    // a window — one exchange, per-partition sorts only
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.map(_.getName).sorted.toSeq ==
      (0 until 8).map(i => s"shard=$i"))
    // reading one shard's files in order reproduces t17's permutation
    val expected = SparkEntry.queries("t17_shuffle_shards")(spark, sf0001)
      .filter(col("shard") === 3).orderBy(col("pos")).collect()
      .map(_.getLong(0)).toSeq
    val files = new java.io.File(s"$out/shard=3").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val got = files.flatMap { f =>
      spark.read.parquet(s"file:${f.getAbsolutePath}").collect()
        .map(r => (r.getAs[String]("skey"), r.getAs[Long]("doc_id")))
    }.toSeq
    // within-file row order IS the seeded order (sortWithinPartitions
    // wrote it); verify against the recomputed key, then against t17
    assert(got == got.sortBy(identity))
    assert(got.map(_._2) == expected)
  }

  test("token budget: greedy cut reaches the budget and no further") {
    val budget = 2000L
    val kept = SparkEntry.queries("t18_token_budget")(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(kept.nonEmpty)
    val allBySource = Tables.documents(spark, sf0001)
      .select(col("source")).groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.groupBy(_._1).foreach { case (src, ds) =>
      val ordered = ds.sortBy(_._4)
      // cum_end is a proper running sum of the kept prefix
      var cum = 0L
      ordered.foreach { case (_, id, nTok, cumEnd) =>
        cum += nTok; assert(cumEnd == cum, s"doc $id cum_end")
      }
      // budget reached unless the source ran out of documents
      if (ds.length < allBySource(src)) assert(cum >= budget, s"$src under budget")
      // greedy minimality: the last doc starts before the budget line
      val last = ordered.last
      assert(last._4 - last._3 < budget, s"$src kept a doc past the cut")
    }
  }

  /** Independent local BPE reference: same tokenization, tie-break
    * (count DESC, left ASC, right ASC), greedy left-to-right apply, and
    * min-pair-count stop — implemented over plain Scala collections so a
    * bug in the distributed loop can't hide in shared code. */
  private def referenceBpe(wordCounts: Map[String, Long], merges: Int,
      minPairCount: Long = 2): Seq[(Int, String, String, String, Long)] = {
    var tbl: Seq[(Vector[String], Long)] =
      wordCounts.toSeq.map { case (w, c) =>
        w.split("").filter(_.nonEmpty).toVector -> c
      }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= merges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      tbl.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((x, y), m) => (-m, x, y) }
        if (n < minPairCount) done = true
        else {
          out += ((rank, a, b, a + b, n))
          tbl = tbl.map { case (syms, c) =>
            val m = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
                m += a + b; j += 2
              } else { m += syms(j); j += 1 }
            }
            m.result() -> c
          }
          rank += 1
        }
      }
    }
    out.toSeq
  }

  /** A corpus engineered for tie-break stress: pair families with EQUAL
    * corpus-wide counts, so the (count DESC, left ASC, right ASC) rule —
    * not the counts — decides merge order, and later merges must win on
    * counts created by earlier ones. A tie-break regression invisible at
    * one (vocab, corpus) point surfaces here as a different sequence. */
  private def tieCorpus = {
    val rows = Seq(
      // "zy" and "zx" appear exactly 7 times each: count tie, right
      // tie-break (x < y) must order (z,x) before (z,y)
      (0L, Seq.fill(7)("zy").mkString(" ")),
      (1L, Seq.fill(7)("zx").mkString(" ")),
      // "ba" vs "ca" at 6 each: left tie-break (b < c)
      (2L, Seq.fill(6)("ba").mkString(" ")),
      (3L, Seq.fill(6)("ca").mkString(" ")),
      // a chain word whose later merges depend on earlier ones
      (4L, Seq.fill(5)("dede").mkString(" ")),
      (5L, Seq.fill(4)("fgfgfg").mkString(" ")))
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("doc_id", "text")
  }

  private def checkBpeTrainParity(
      docs: org.apache.spark.sql.DataFrame, m: Int): Unit = {
    import graft.operators.Training
    val got = Training.bpeTrain(docs, merges = m)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val wordCounts = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").groupBy(col("w")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceBpe(wordCounts, merges = m)
    assert(got == expected, s"merges=$m:\ngot      $got\nexpected $expected")
    // merged symbols compose from earlier merges or single chars only
    val vocab = scala.collection.mutable.Set[String]()
    got.foreach { case (_, a, b, ab, n) =>
      assert(a.length == 1 || vocab.contains(a), s"unknown left $a")
      assert(b.length == 1 || vocab.contains(b), s"unknown right $b")
      assert(ab == a + b)
      assert(n >= 2)
      vocab += ab
    }
    // determinism: a second run yields the identical merge sequence
    val again = Training.bpeTrain(docs, merges = m)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(again == got)
  }

  test("bpe training matches the reference at two vocab sizes and two corpora") {
    // the matrix: a tie-break regression that happens to agree at one
    // (vocab, corpus) point cannot agree at all four
    val docs = Tables.documents(spark, sf0001)
    checkBpeTrainParity(docs, 12)
    checkBpeTrainParity(docs, 64) // deep vocab: merges built on merges
    checkBpeTrainParity(tieCorpus, 16)
    assert(Training.bpeTrain(docs, merges = 12).count() == 12,
      "corpus has ample repeated pairs for 12 merges")
    // the planted ties resolve by the documented rule, not by luck
    val tied = Training.bpeTrain(tieCorpus, merges = 8)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val zxIdx = tied.indexOf(("z", "x")); val zyIdx = tied.indexOf(("z", "y"))
    assert(zxIdx >= 0 && zyIdx >= 0 && zxIdx < zyIdx,
      s"right-symbol tie-break violated: $tied")
  }

  private def checkBpeSegmentParity(
      docs: org.apache.spark.sql.DataFrame, m: Int): Unit = {
    import graft.operators.Training
    val merges = Training.bpeTrain(docs, merges = m).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val distinctWords = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "").distinct()
    val segmented = distinctWords
      .select(col("word"),
        Training.bpeSegmentColumn(col("word"), merges).as("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    def refApply(w: String): Seq[String] =
      merges.foldLeft(w.split("").filter(_.nonEmpty).toVector) {
        case (syms, (a, b)) =>
          val mb = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              mb += a + b; j += 2
            } else { mb += syms(j); j += 1 }
          }
          mb.result()
      }
    assert(segmented.nonEmpty)
    segmented.foreach { case (w, pieces) =>
      assert(pieces == refApply(w), s"merges=$m word '$w'")
      assert(pieces.mkString == w, s"pieces must reassemble '$w'")
    }
    // the trained merges actually compress: pieces < chars somewhere
    assert(segmented.exists { case (w, p) => w.length > 1 && p.size < w.length },
      s"merges=$m: no word compressed — merges did not apply")
  }

  test("bpe segmentation matches the reference at two vocab sizes and two corpora") {
    val docs = Tables.documents(spark, sf0001)
    checkBpeSegmentParity(docs, 12)
    checkBpeSegmentParity(docs, 64)
    checkBpeSegmentParity(tieCorpus, 16)
  }

  test("dsir selection enriches the target slice and is deterministic") {
    import org.apache.spark.sql.functions._
    def run() = SparkEntry.queries("t25_dsir_select")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getBoolean(5)))
    val rows = run()
    val langs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val selected = rows.filter(_._3).map(_._1)
    // exactly the top-20% cut
    assert(selected.length == (rows.length * 0.2).toInt)
    // target (en) docs must be OVERrepresented among the selected vs the
    // corpus base rate — the whole point of importance resampling
    val baseRate = langs.values.count(_ == "en").toDouble / langs.size
    val selRate = selected.count(langs(_) == "en").toDouble / selected.length
    assert(selRate > baseRate,
      s"selected en-rate $selRate not above base rate $baseRate")
    // rank is a permutation of 1..n and the run is deterministic
    assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
    assert(run().toSeq == rows.toSeq)
  }

  test("dsir scale twin: no global rank in the plan, agreement away from the boundary ratio") {
    import org.apache.spark.sql.functions._
    val exact = SparkEntry.queries("t25_dsir_select")(spark, sf0001)
      .select(col("doc_id"), col("ratio"), col("selected"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    val scaleDf = Training.dsirSelectScale(
      Tables.documents(spark, sf0001), col("lang") === "en")
    // the scale-killer is gone: no corpus-wide row_number rank (the
    // remaining Window in dsirScores runs over the 2048-row model table)
    assert(!scaleDf.queryExecution.executedPlan.toString.contains("row_number"),
      "scale twin still global-ranks the corpus")
    val scale = scaleDf
      .select(col("doc_id"), col("ratio"), col("selected"), col("sel_threshold"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2), r.getDouble(3)))
    assert(scale.map(_._1).toSet == exact.keySet)
    val thr = scale.head._4
    // the exact form's boundary: the worst selected ratio
    val vStar = exact.values.filter(_._2).map(_._1).min
    val lo = math.min(thr, vStar); val hi = math.max(thr, vStar)
    for ((id, ratio, sel, _) <- scale) {
      if (ratio > hi) assert(sel && exact(id)._2,
        s"doc $id ratio $ratio above both cuts but not selected in both")
      else if (ratio < lo) assert(!sel && !exact(id)._2,
        s"doc $id ratio $ratio below both cuts but selected somewhere")
      // ratios inside [lo, hi] are the boundary — forms may disagree
    }
    // the approximate threshold sits where it should: the selected
    // count is within the boundary-tie band of the exact 20% cut
    val nBoundary = scale.count(r => r._2 >= lo && r._2 <= hi)
    val kExact = exact.values.count(_._2)
    val kScale = scale.count(_._3)
    assert(math.abs(kScale - kExact) <= nBoundary,
      s"selected counts $kScale vs $kExact differ beyond the $nBoundary-doc boundary band")
  }

  test("mixture apply: max-upweighted source keeps all, others downsample") {
    // small source = most upweighted under alpha=0.5 → rate 1.0
    val docs = (0 until 400).map { i =>
      val src = if (i < 40) "tiny" else if (i < 200) "mid" else "big"
      (i.toLong, src, (0 until 20).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val kept = Training.applyMixture(docs)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("tiny") == 40L, bySrc)          // rate exactly 1
    assert(bySrc("mid") < 160L && bySrc("big") < 200L, bySrc)
    // the exact acceptance rates respect the weight order (empirical
    // counts are md5-bucket noisy at this size; the rates are the law)
    val rates = kept.select("source", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("tiny") == 1.0, rates)
    assert(rates("big") < rates("mid") && rates("mid") < 1.0, rates)
    // determinism: bit-identical membership on a re-run
    val again = Training.applyMixture(docs)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).toSeq)
  }

  test("greedy boundary packing: hand-computed walk with exact fits and oversized docs") {
    import graft.operators.Training
    val sizes = Seq(4, 5, 2, 10, 3, 11, 1)
    val docs = sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, "s", (1 to n).map(k => s"w$k").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val got = Training.packGreedy(docs, seqLen = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    // 4+5 fill bin 0; 2 opens bin 1; 10 exactly fills (and closes)
    // bin 2; 3 opens bin 3; 11 overflows alone in bin 4; 1 lands in 5
    assert(got.toSeq == Seq(
      (0L, 0L, false), (1L, 0L, false), (2L, 1L, false), (3L, 2L, false),
      (4L, 3L, false), (5L, 4L, true), (6L, 5L, false)))
    // no bin except overflow bins ever exceeds seqLen
    val mass = Training.packGreedy(docs, seqLen = 10)
      .groupBy("bin_id").agg(sum("n_tok").as("m"), max("overflow").as("o"))
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    mass.foreach { case (m, o) => assert(o || m <= 10, s"bin mass $m") }
    // streams pack independently
    val two = docs.union(
      sizes.zipWithIndex.map { case (n, i) =>
        ((100 + i).toLong, "t", (1 to n).map(k => s"v$k").mkString(" "))
      }.toDF("doc_id", "source", "text"))
    val byStream = Training.packGreedy(two, seqLen = 10)
      .groupBy("stream").agg(max("bin_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStream == Map("s" -> 5L, "t" -> 5L))
  }

  // ---- unigram-LM tokenizer (t34/t35) gates ----

  /** Independent reference unigram trainer — same defined algorithm
    * (seed → EM forward-backward → char-preserving prune → re-fit),
    * written functionally over immutable maps rather than the
    * operator's imperative array loops. Double sums land within ulps of
    * the operator's (different accumulation structures), so parity
    * compares at 1e-9; piece SETS compare exactly. */
  private def referenceUnigram(wordCounts: Seq[(String, Long)],
      vocabSize: Int, maxPieceLen: Int, emIters: Int,
      seedFactor: Int = 4): Seq[(String, Double)] = {
    val freq = wordCounts.sortBy(_._1)
    val subCnt = freq.foldLeft(Map.empty[String, Long]) { case (m0, (w, c)) =>
      (for {
        i <- 0 until w.length
        j <- (i + 1) to math.min(w.length, i + maxPieceLen)
      } yield w.substring(i, j)).foldLeft(m0)((m, p) =>
        m.updated(p, m.getOrElse(p, 0L) + c))
    }
    val chars = subCnt.keys.filter(_.length == 1).toSeq.sorted
    val multi = subCnt.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(vocabSize * seedFactor, vocabSize) - chars.length)
    val seed = (chars.map(c => c -> subCnt(c)) ++ multi).sortBy(_._1)
    val total = seed.map(_._2.toDouble).sum

    def lse(xs: Iterable[Double]): Double = {
      val finite = xs.filter(_ != Double.NegativeInfinity)
      if (finite.isEmpty) Double.NegativeInfinity
      else {
        val m = finite.max
        m + math.log(finite.map(x => math.exp(x - m)).sum)
      }
    }

    def em(model: Map[String, Double], iters: Int): Map[String, Double] =
      if (iters == 0) model
      else {
        val maxLen = model.keys.map(_.length).max
        val exp = scala.collection.mutable.Map[String, Double]()
        freq.foreach { case (w, c) =>
          val n = w.length
          val alpha = new Array[Double](n + 1)
          (1 to n).foreach { i =>
            alpha(i) = lse((math.max(0, i - maxLen) until i).flatMap(j =>
              model.get(w.substring(j, i)).map(alpha(j) + _)))
          }
          val beta = new Array[Double](n + 1)
          (n - 1 to 0 by -1).foreach { j =>
            beta(j) = lse((j + 1 to math.min(n, j + maxLen)).flatMap(i =>
              model.get(w.substring(j, i)).map(_ + beta(i))))
          }
          for {
            j <- 0 until n
            i <- (j + 1) to math.min(n, j + maxLen)
            s <- model.get(w.substring(j, i))
          } {
            val p = w.substring(j, i)
            exp(p) = exp.getOrElse(p, 0.0) +
              c * math.exp(alpha(j) + s + beta(i) - alpha(n))
          }
        }
        // 1e-9 count floor mirrors the operator (underflowed rare
        // pieces must keep finite scores)
        val tot = model.keys.toSeq.sorted
          .map(p => math.max(exp.getOrElse(p, 0.0), 1e-9)).sum
        em(model.map { case (p, _) =>
          p -> (math.log(math.max(exp.getOrElse(p, 0.0), 1e-9)) -
            math.log(tot)) }, iters - 1)
      }

    val fit1 = em(seed.map { case (p, c) =>
      p -> math.log(c.toDouble / total) }.toMap, emIters)
    val keptMulti = fit1.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, s) => (-s, p) }.take(vocabSize - chars.length)
    val kept = fit1.toSeq.filter(_._1.length == 1) ++ keptMulti
    val norm = lse(kept.map(_._2))
    em(kept.map { case (p, s) => p -> (s - norm) }.toMap, emIters)
      .toSeq.sortBy { case (p, s) => (-s, p) }
  }

  /** Reference Viterbi mirroring the documented contract: left-to-right
    * DP, candidates longest-first, strictly-better-wins (ties keep the
    * longer last piece), single-char OOV fallback. Summation order
    * (prefix score + piece score) matches the native expression so the
    * discrete output cannot drift on fp ties. */
  private def referenceViterbi(w: String, model: Map[String, Double],
      unkScore: Double): Seq[String] = {
    val maxLen = model.keys.map(_.length).max
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    for (i <- 1 to n) {
      var found = false
      for (j <- math.max(0, i - maxLen) until i) {
        model.get(w.substring(j, i)).foreach { s =>
          if (best(j) + s > best(i)) { best(i) = best(j) + s; back(i) = j }
          found = true
        }
      }
      if (!found) {
        best(i) = best(i - 1) + unkScore; back(i) = i - 1
      }
    }
    Iterator.iterate(n)(back(_)).takeWhile(_ > 0)
      .map(i => w.substring(back(i), i)).toSeq.reverse
  }

  test("unigram training: reference parity, coverage, normalization, determinism") {
    import graft.operators.Training
    for (docs <- Seq(Tables.documents(spark, sf0001), tieCorpus)) {
      val got = Training.unigramTrain(docs, vocabSize = 120,
          maxPieceLen = 6, emIters = 3)
        .orderBy(col("log_prob").desc, col("piece")).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      val wordCounts = docs
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(col("w") =!= "").groupBy(col("w")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val ref = referenceUnigram(wordCounts, vocabSize = 120,
        maxPieceLen = 6, emIters = 3)
      assert(got.map(_._1).sorted == ref.map(_._1).sorted,
        "piece inventories differ")
      val refMap = ref.toMap
      got.foreach { case (p, s) =>
        assert(math.abs(s - refMap(p)) < 1e-9, s"piece '$p': $s vs ${refMap(p)}")
      }
      // every corpus char is a piece (total coverage survives pruning)
      val corpusChars = wordCounts.flatMap(_._1.toSeq).map(_.toString).toSet
      val pieceSet = got.map(_._1).toSet
      assert(corpusChars.subsetOf(pieceSet))
      // probabilities normalize: logsumexp(log_probs) ~ 0
      val m = got.map(_._2).max
      assert(math.abs(m + math.log(got.map(s => math.exp(s._2 - m)).sum)) < 1e-9)
      // the model prefers real units over raw chars: multi-char pieces
      // dominate the top of the table
      assert(got.take(10).exists(_._1.length > 1),
        s"no multi-char piece near the top: ${got.take(10)}")
      // determinism: bit-identical on a re-run
      val again = Training.unigramTrain(docs, vocabSize = 120,
          maxPieceLen = 6, emIters = 3)
        .orderBy(col("log_prob").desc, col("piece")).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(again.map(p => (p._1, java.lang.Double.doubleToLongBits(p._2))) ==
        got.map(p => (p._1, java.lang.Double.doubleToLongBits(p._2))))
    }
  }

  test("unigram segmentation: reference Viterbi parity, reassembly, compression") {
    import graft.operators.Training
    val docs = Tables.documents(spark, sf0001)
    val model = Training.unigramTrain(docs, vocabSize = 120,
        maxPieceLen = 6, emIters = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val unk = model.map(_._2).min - 1.0
    val segmented = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "").distinct()
      .select(col("word"),
        Training.unigramSegmentColumn(col("word"), model).as("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(segmented.nonEmpty)
    val refMap = model.toMap
    segmented.foreach { case (w, pieces) =>
      assert(pieces == referenceViterbi(w, refMap, unk), s"word '$w'")
      assert(pieces.mkString == w, s"pieces must reassemble '$w'")
    }
    // the trained model actually compresses: pieces < chars somewhere
    assert(segmented.exists { case (w, p) => w.length > 1 && p.size < w.length })
  }

  test("t55 q20 model: exact dyadic scores, serving matches the in-spec " +
      "reference Viterbi, pieces reassemble") {
    import graft.operators.Training
    val docs = Tables.documents(spark, sf0001)
    val model = Training.q20UnigramModel(docs)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(model.nonEmpty)
    // every log_prob is an exact multiple of 2^-20 — the bit-exactness
    // the oracle's integer DP replay rests on — finite and negative
    model.foreach { case (p, lp) =>
      val q = lp * 1048576.0
      assert(q == math.rint(q) && lp < 0.0 && !lp.isInfinite,
        s"piece '$p' score $lp is not an exact Q20 dyadic")
    }
    val reg = SparkEntry.queries("t55_unigram_stored_q20")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(reg.nonEmpty)
    val refMap = model.toMap
    val unk = model.map(_._2).min - 1.0
    reg.filterNot(_._1.contains("|")).foreach { case (w, seg, n) =>
      val pieces = seg.split("\\|", -1).toSeq
      assert(pieces.mkString == w, s"pieces must reassemble '$w'")
      assert(pieces.length.toLong == n, s"n_pieces drifted for '$w'")
      assert(pieces == referenceViterbi(w, refMap, unk),
        s"q20 serving diverged from the reference Viterbi on '$w'")
    }
  }

  test("unigram segmentation: hand cases — likelihood wins, ties keep longer, OOV falls back") {
    val spark2 = spark
    import spark2.implicits._
    import graft.operators.Training
    def seg(word: String, model: Seq[(String, Double)]): Seq[String] =
      Seq(word).toDF("w")
        .select(Training.unigramSegmentColumn(col("w"), model).as("p"))
        .collect().head.getSeq[String](0)
    // the fused piece is likelier than its chars → it wins
    assert(seg("abab", Seq("ab" -> -1.0, "a" -> -3.0, "b" -> -3.0)) ==
      Seq("ab", "ab"))
    // the chars are likelier than the fused piece → they win
    assert(seg("ab", Seq("ab" -> -5.0, "a" -> -1.0, "b" -> -1.0)) ==
      Seq("a", "b"))
    // exact score tie (-2 both ways) → the longer last piece wins
    assert(seg("aa", Seq("aa" -> -2.0, "a" -> -1.0)) == Seq("aa"))
    // OOV chars fall back to single-char pieces; coverage is total
    assert(seg("axa", Seq("a" -> -1.0)) == Seq("a", "x", "a"))
    assert(seg("", Seq("a" -> -1.0)) == Seq.empty[String])
  }

  // ---- byte-level BPE (t37) gates ----

  test("byte map: bijective on arbitrary unicode, length = UTF-8 bytes, no raw whitespace") {
    val spark2 = spark
    import spark2.implicits._
    val fns = graft.functions.GraftFunctions
    val inputs = Seq("hello", "Mixed CASE", "café", "ναι", "🙂🙃",
      "tab\tand\nnewline", "nul byte", "ÿ¡¬®")
    val rows = inputs.toDF("t")
      .select(col("t"), fns.byte_map(col("t")).as("m"),
        fns.byte_unmap(fns.byte_map(col("t"))).as("back"))
      .collect()
    rows.foreach { r =>
      val (t, m, back) = (r.getString(0), r.getString(1), r.getString(2))
      assert(back == t, s"round-trip broke for '$t'")
      assert(m.length == t.getBytes("UTF-8").length,
        s"'$t': mapped length ${m.length} != byte count")
      // whitespace and controls leave the raw-ASCII range entirely
      assert(!m.exists(c => c.isWhitespace || c.isControl), s"'$t' → '$m'")
    }
    // unmapping a string outside the byte alphabet is loud
    val e = intercept[Exception](Seq("Ȁ").toDF("t") // U+0200 > alphabet
      .select(fns.byte_unmap(col("t"))).collect())
    assert(e.getMessage.contains("alphabet") ||
      (e.getCause != null && e.getCause.getMessage.contains("alphabet")))
  }

  test("byte-level bpe: ASCII parity with char bpe; multibyte pieces reassemble") {
    import graft.operators.Training
    val docs = Tables.documents(spark, sf0001)
    // printable-ASCII corpus: the byte map is the identity, so the merge
    // sequences must agree exactly (both without case folding)
    val chars = Training.bpeTrain(docs, merges = 12, caseFold = false)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    val bytes = Training.bpeTrain(docs, merges = 12, caseFold = false,
        byteLevel = true)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(bytes == chars, "byte map must be identity on printable ASCII")

    // multibyte corpus: train + segment byte-level, then unmapped pieces
    // must reassemble the EXACT original words
    val spark2 = spark
    import spark2.implicits._
    val uni = Seq(
      (1L, "café café café ναι ναι 🙂🙂 smile"),
      (2L, "café ναι 🙂 smile smile smile")).toDF("doc_id", "text")
    val merges = Training.bpeTrain(uni, merges = 8, caseFold = false,
        byteLevel = true)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val fns = graft.functions.GraftFunctions
    val segmented = uni
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .distinct()
      .select(col("word"),
        Training.bpeSegmentColumn(fns.byte_map(col("word")), merges).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    segmented.foreach { case (w, pieces) =>
      // unmap to BYTES and decode once at the end — a merge boundary may
      // split a multibyte character, so per-piece string decoding would
      // mangle partial sequences
      val back = new String(
        pieces.flatMap(p => graft.functions.ByteMapEval
          .unmap(org.apache.spark.unsafe.types.UTF8String.fromString(p))
          .getBytes).toArray, "UTF-8")
      assert(back == w, s"pieces did not reassemble '$w'")
    }
    // the repeated multibyte words actually compress below their byte count
    val cafe = segmented.find(_._1 == "café").get
    assert(cafe._2.length < "café".getBytes("UTF-8").length, cafe)
  }

  test("bpe merge application is greedy left-to-right without overlap") {
    val fns = graft.functions.GraftFunctions
    val df = Seq(
      Seq("a", "a", "a"),
      Seq("a", "a", "a", "a"),
      Seq("x", "a", "a", "y"),
      Seq("a", "b", "a", "a"),
      Seq.empty[String]).toDF("syms")
    val out = df.select(fns.merge_pair(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("aa", "a"))
    assert(out(1) == Seq("aa", "aa"))
    assert(out(2) == Seq("x", "aa", "y"))
    assert(out(3) == Seq("a", "b", "aa"))
    assert(out(4) == Seq.empty[String])
  }

  test("bpe oracle closed-form rewrite (gaps-and-islands parity rule) ≡ " +
      "the scan rewrite on every adversarial overlap shape") {
    // The t22/t23/t52 oracle rewrites each merge in CLOSED FORM: a match
    // at position i can only neighbor another match when left == right,
    // and a run of adjacent matches merges at alternating offsets. The
    // corpus never trains a left==right merge (r18 audit), so that
    // branch is pinned HERE against the scan loop bpeTrain uses —
    // transcribed from the SQL (islands by pos - row_number, parity of
    // pos - min(pos) within the island), deliberately not shared code.
    def scan(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
          out += a + b; j += 2
        } else { out += syms(j); j += 1 }
      }
      out.result()
    }
    def closed(syms: Vector[String], a: String, b: String): Vector[String] = {
      val matches = (0 until syms.length - 1)
        .filter(i => syms(i) == a && syms(i + 1) == b)
      val starts = matches.zipWithIndex
        .groupBy { case (pos, rn) => pos - rn } // island key
        .values.flatMap { isl =>
          val mn = isl.map(_._1).min
          isl.collect { case (pos, _) if (pos - mn) % 2 == 0 => pos }
        }.toSet
      syms.indices.filterNot(i => starts.contains(i - 1)).map { i =>
        if (starts.contains(i)) syms(i) + syms(i + 1) else syms(i)
      }.toVector
    }
    val hand = Seq(
      ("aaaa", "a", "a"), ("aaa", "a", "a"), ("aa", "a", "a"),
      ("aaaaa", "a", "a"), ("aaaaaa", "a", "a"),
      ("ababab", "a", "b"), ("ababa", "b", "a"), ("aabaa", "a", "a"),
      ("xaay", "a", "a"), ("abaa", "a", "a"), ("baab", "a", "b"))
    hand.foreach { case (w, a, b) =>
      val syms = w.split("").toVector
      assert(closed(syms, a, b) == scan(syms, a, b), s"word $w pair ($a,$b)")
    }
    // exhaustive over the 2-letter alphabet up to length 10 — every
    // overlap island shape appears
    for (len <- 1 to 10; n <- 0 until (1 << len);
         pair <- Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))) {
      val syms = (0 until len)
        .map(i => if (((n >> i) & 1) == 1) "b" else "a").toVector
      assert(closed(syms, pair._1, pair._2) == scan(syms, pair._1, pair._2),
        s"word ${syms.mkString} pair $pair")
    }
  }

  // ---- WordPiece (t45/t46) ----

  /** Independent reference WordPiece trainer: likelihood-scored merges
    * (count(pair)/(count(l)·count(r)) compared as exact rationals),
    * continuation symbols ##-marked from the start, ties (left, right).
    * Deliberately different code shape from the production loop (sorted
    * immutable maps, minBy on a comparable key) so a shared bug can't
    * hide. */
  private def referenceWordpiece(wordCounts: Map[String, Long], merges: Int,
      minPairCount: Long = 2): Seq[(Int, String, String, String, Long)] = {
    var tbl: Seq[(Vector[String], Long)] =
      wordCounts.toSeq.sortBy(_._1).map { case (w, c) =>
        w.split("").filter(_.nonEmpty).zipWithIndex
          .map { case (ch, i) => if (i == 0) ch else "##" + ch }
          .toVector -> c
      }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= merges && !done) {
      val syms = scala.collection.mutable.Map[String, Long]()
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      tbl.foreach { case (ss, c) =>
        ss.foreach(x => syms(x) = syms.getOrElse(x, 0L) + c)
        ss.zip(ss.tail).foreach { p => pairs(p) = pairs.getOrElse(p, 0L) + c }
      }
      if (pairs.isEmpty) done = true
      else {
        // exact rational argmax: compare n1/(l1 r1) vs n2/(l2 r2) by
        // cross-multiplication; ties by (left, right) ascending
        val best = pairs.toSeq.reduceLeft { (x, y) =>
          val cmp = (BigInt(y._2) * BigInt(syms(x._1._1)) * BigInt(syms(x._1._2)))
            .compare(BigInt(x._2) * BigInt(syms(y._1._1)) * BigInt(syms(y._1._2)))
          if (cmp > 0) y
          else if (cmp < 0) x
          else if (y._1._1 < x._1._1 ||
            (y._1._1 == x._1._1 && y._1._2 < x._1._2)) y
          else x
        }
        val ((a, b), n) = best
        if (n < minPairCount) done = true
        else {
          val merged = a + b.stripPrefix("##")
          out += ((rank, a, b, merged, n))
          tbl = tbl.map { case (ss, c) =>
            val m = Vector.newBuilder[String]
            var j = 0
            while (j < ss.length) {
              if (j + 1 < ss.length && ss(j) == a && ss(j + 1) == b) {
                m += merged; j += 2
              } else { m += ss(j); j += 1 }
            }
            m.result() -> c
          }
          rank += 1
        }
      }
    }
    out.toSeq
  }

  private def checkWordpieceTrainParity(
      docs: org.apache.spark.sql.DataFrame, m: Int): Unit = {
    import graft.operators.Training
    val got = Training.wordpieceTrain(docs, merges = m)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val wordCounts = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").groupBy(col("w")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceWordpiece(wordCounts, merges = m)
    assert(got == expected, s"merges=$m:\ngot      $got\nexpected $expected")
    val again = Training.wordpieceTrain(docs, merges = m)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(again == got, "wordpiece training must be deterministic")
  }

  test("wordpiece training: reference parity on two corpora; likelihood " +
      "beats raw count; continuation marking is hand-verified") {
    import graft.operators.Training
    checkWordpieceTrainParity(Tables.documents(spark, sf0001), 12)
    checkWordpieceTrainParity(tieCorpus, 16)

    // the WordPiece-vs-BPE discriminator, on paper: pair (a,##b)
    // occurs 10x but "a" is everywhere (count(a)=100, count(##b)=10 ->
    // score 10/1000 = 0.01); pair (c,##d) occurs 6x and its symbols
    // occur ONLY there (score 6/36 = 0.167). BPE (raw counts: 10 vs 6)
    // merges (a,b) first; WordPiece must merge (c,##d).
    val spark2 = spark
    import spark2.implicits._
    val scored = (
      (0 until 10).map(i => (i.toLong, "ab")) ++
      (0 until 90).map(i => (100L + i, "a")) ++
      (0 until 90).map(i => (200L + i, "b")) ++
      (0 until 6).map(i => (300L + i, "cd"))).toDF("doc_id", "text")
    val first = Training.wordpieceTrain(scored, merges = 1)
      .head()
    assert((first.getString(1), first.getString(2), first.getString(3),
      first.getLong(4)) == ("c", "##d", "cd", 6L), first)
    // BPE on the same corpus picks the raw-count winner - the two
    // trainers genuinely differ where their papers say they differ
    val bpeFirst = Training.bpeTrain(scored, merges = 1).head()
    assert((bpeFirst.getString(1), bpeFirst.getString(2)) == ("a", "b"))

    // hand-computed chain with continuation symbols: "fff" x4 ->
    // syms (f, ##f, ##f); scores 4/(4*8) vs 4/(8*8) -> (f,##f) merges
    // to "ff" (## stripped), then (ff,##f) -> "fff"
    val fff = (0 until 4).map(i => (i.toLong, "fff")).toDF("doc_id", "text")
    val chain = Training.wordpieceTrain(fff, merges = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(chain == Seq(("f", "##f", "ff"), ("ff", "##f", "fff")), chain)
  }

  test("wordpiece segmentation: greedy longest-match hand cases, UNK, " +
      "## marking, trained-vocab parity and reassembly") {
    import graft.operators.Training
    val spark2 = spark
    import spark2.implicits._
    // hand vocabulary: initial pieces {a, ab, abc, b}, continuation
    // pieces {##c, ##bc, ##d}
    val vocab = Seq("a", "ab", "abc", "b", "##c", "##bc", "##d")
    val words = Seq("abc", "abd", "abcd", "ad", "ba", "b").toDF("word")
    val got = words.select(col("word"),
        Training.wordpieceSegmentColumn(col("word"), vocab).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("abc") == Seq("abc"), got("abc"))          // longest wins
    assert(got("abd") == Seq("ab", "##d"), got("abd"))
    assert(got("abcd") == Seq("abc", "##d"), got("abcd")) // not ab+##c+##d
    assert(got("ad") == Seq("a", "##d"), got("ad"))
    assert(got("ba") == Seq("[UNK]"), got("ba"))          // no ##a piece
    assert(got("b") == Seq("b"), got("b"))

    // trained vocabulary over the real corpus: expression parity with an
    // in-spec reference greedy walk, and non-UNK pieces reassemble
    val docs = Tables.documents(spark, sf0001)
    val merges = Training.wordpieceTrain(docs, merges = 24)
    val tv = Training.wordpieceVocab(docs, merges)
    val init = tv.filterNot(_.startsWith("##")).toSet
    val cont = tv.filter(_.startsWith("##")).map(_.substring(2)).toSet
    def refGreedy(w: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var pos = 0
      while (pos < w.length) {
        val set = if (pos == 0) init else cont
        val hit = (math.min(w.length - pos,
            set.map(_.length).max) to 1 by -1)
          .find(l => set.contains(w.substring(pos, pos + l)))
        hit match {
          case None => return Seq("[UNK]")
          case Some(l) =>
            out += (if (pos == 0) "" else "##") + w.substring(pos, pos + l)
            pos += l
        }
      }
      out.toSeq
    }
    val distinctWords = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "").distinct()
    val seg = distinctWords.select(col("word"),
        Training.wordpieceSegmentColumn(col("word"), tv).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    assert(seg.nonEmpty)
    seg.foreach { case (w, ps) =>
      assert(ps == refGreedy(w), s"word $w: got $ps expected ${refGreedy(w)}")
      if (ps != Seq("[UNK]"))
        assert(ps.map(_.stripPrefix("##")).mkString == w,
          s"pieces of $w do not reassemble: $ps")
    }
    // the trained alphabet covers the corpus, so nothing is UNK here
    assert(seg.forall(_._2 != Seq("[UNK]")))
  }

  test("wordpiece segmentation: seeded random fuzz vs the reference walk") {
    import graft.operators.Training
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(0xC0FFEE)
    val alpha = "abcde"
    def randPiece(maxLen: Int): String =
      (0 until (1 + rnd.nextInt(maxLen))).map(_ =>
        alpha(rnd.nextInt(alpha.length))).mkString
    (0 until 5).foreach { round =>
      // random vocab: overlapping prefixes on purpose; every single
      // char present in both forms so nothing is trivially UNK unless
      // the walk paints itself into a corner (which greedy CAN do -
      // the reference must agree on exactly when)
      val vocab = (alpha.map(_.toString) ++ alpha.map("##" + _) ++
        (0 until 30).map(_ => randPiece(4)) ++
        (0 until 30).map(_ => "##" + randPiece(4))).distinct
      val init = vocab.filterNot(_.startsWith("##")).toSet
      val cont = vocab.filter(_.startsWith("##")).map(_.substring(2)).toSet
      def ref(w: String): Seq[String] = {
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var pos = 0
        while (pos < w.length) {
          val set = if (pos == 0) init else cont
          val hit = (math.min(w.length - pos, 4) to 1 by -1)
            .find(l => set.contains(w.substring(pos, pos + l)))
          hit match {
            case None => return Seq("[UNK]")
            case Some(l) =>
              out += (if (pos == 0) "" else "##") + w.substring(pos, pos + l)
              pos += l
          }
        }
        out.toSeq
      }
      val words = (0 until 200).map(_ =>
        (0 until (1 + rnd.nextInt(12))).map(_ =>
          alpha(rnd.nextInt(alpha.length))).mkString).distinct
      val got = words.toDF("word")
        .select(col("word"),
          Training.wordpieceSegmentColumn(col("word"), vocab).as("p"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      words.foreach { w =>
        assert(got(w) == ref(w), s"round $round word $w: ${got(w)}")
      }
    }
  }

  // ---- stored tokenizer lifecycle (the fifth stored-model family) ----

  test("stored wordpiece vocab: store → load → encode is bit-identical " +
      "to the in-session encode") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the the quick quick thequick browns"),
      (2L, "unseen zebra")).toDF("doc_id", "text")
    val words = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
    val merges = Training.wordpieceTrain(docs, merges = 8)
    val vocab = Training.wordpieceVocab(docs, merges)
    val dir = tempDir("graft-tokstore").toString
    Training.storeWordpieceVocab(spark, vocab, dir, unkToken = "[UNK]")
    val (loaded, unk) = Training.loadWordpieceVocab(spark, dir)
    assert(loaded == vocab, "stored vocab lost content or order")
    assert(unk == "[UNK]")
    def enc(v: Seq[String]) = words
      .select(col("word"),
        Training.wordpieceSegmentColumn(col("word"), v, unk).as("p"))
      .orderBy(col("word"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toSeq
    assert(enc(loaded) == enc(vocab),
      "encode from the stored vocab diverges from the in-session encode")
  }

  test("stored bpe merges: rank order survives the round trip and drives " +
      "an identical segmentation") {
    val docs = Seq(
      (0L, "banana bandana ban ban banana"),
      (1L, "an analog annal banana")).toDF("doc_id", "text")
    val merges = Training.bpeTrain(docs, merges = 6)
    val dir = tempDir("graft-tokstore").toString
    Training.storeBpeMerges(merges, dir)
    val (loaded, byteLevel) = Training.loadBpeMerges(spark, dir)
    assert(!byteLevel)
    val live = merges.orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    assert(loaded == live, "merge table lost rank order in the store")
    val words = Seq("banana", "bandana", "analog").toDF("word")
    def seg(m: Seq[(String, String)]) = words
      .select(col("word"),
        Training.bpeSegmentColumn(col("word"), m).as("p"))
      .orderBy(col("word"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toSeq
    assert(seg(loaded) == seg(live))
  }

  test("stored unigram model: log-probs survive bit-exactly and Viterbi " +
      "segmentation is unchanged") {
    val docs = Seq(
      (0L, "abc abc ab c abcabc"),
      (1L, "cab cab ba")).toDF("doc_id", "text")
    val model = Training.unigramTrain(docs, vocabSize = 12, maxPieceLen = 3,
      emIters = 2)
    val dir = tempDir("graft-tokstore").toString
    Training.storeUnigramModel(model, dir)
    val loaded = Training.loadUnigramModel(spark, dir)
    val live = model.orderBy(col("log_prob").desc, col("piece")).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Double]("log_prob"))).toSeq
    // bit-exact doubles: the store must not round-trip through text
    assert(loaded.map(_._1) == live.map(_._1))
    assert(loaded.zip(live).forall { case ((_, a), (_, b)) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
    }, "log_prob doubles changed bits in the store")
    val words = Seq("abc", "cab", "abcabc").toDF("word")
    def seg(m: Seq[(String, Double)]) = words
      .select(col("word"),
        Training.unigramSegmentColumn(col("word"), m).as("p"))
      .orderBy(col("word"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toSeq
    assert(seg(loaded) == seg(live))
  }

  test("registered stored-serving forms equal their live twins bit for bit " +
      "(t52 ≡ t23, t53 ≡ t35 on the same dataset)") {
    def frame(name: String) =
      SparkEntry.queries(name)(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(frame("t52_bpe_stored") == frame("t23_bpe_segment"),
      "BPE encode from the stored merge table diverges from the live form")
    assert(frame("t53_unigram_stored") == frame("t35_unigram_segment"),
      "unigram encode from the stored model diverges from the live form")
  }

  test("t54 refresh lifecycle: v2 retrains on the snapshot, v1 stays " +
      "bit-identically servable, the served output equals live encode") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val (v1, v2) = Training.bpeRefreshDirs(spark, sf0001)
    // old-dir reproducibility: the refresh must not have touched v1
    val live1 = Training.bpeTrain(docs, merges = 16)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val (m1, bl1) = Training.loadBpeMerges(spark, v1)
    assert(!bl1 && m1 == live1, "v1 no longer reproduces its training run")
    // the refresh actually MOVED the model (the plant outweighs the
    // organic rank-16 pair at every test SF)
    val (m2, _) = Training.loadBpeMerges(spark, v2)
    assert(m2 != m1, "refresh produced an identical model — plant too weak")
    assert(m2.exists { case (a, b) => (a + b).contains("graftql") ||
      "graftql".contains(a + b) },
      s"v2 merges never touch the planted token: $m2")
    // the registered serving form equals a from-scratch live encode
    val served = SparkEntry.queries("t54_tokenizer_refresh")(spark, sf0001)
      .collect().toSeq
    assert(served.nonEmpty)
    val again = SparkEntry.queries("t54_tokenizer_refresh")(spark, sf0001)
      .collect().toSeq
    assert(served == again)
  }

  test("stored tokenizer meta: family mismatch and missing family fail loudly") {
    val docs = Seq((0L, "aa ab aa")).toDF("doc_id", "text")
    val dir = tempDir("graft-tokstore").toString
    Training.storeBpeMerges(Training.bpeTrain(docs, merges = 2), dir)
    val e = intercept[IllegalArgumentException] {
      Training.loadWordpieceVocab(spark, dir)
    }
    assert(e.getMessage.contains("bpe"))
    intercept[IllegalArgumentException] {
      Training.storeTokenizer(docs, dir, "not-a-family")
    }
  }
}
