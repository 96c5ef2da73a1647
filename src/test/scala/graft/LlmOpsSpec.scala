package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.SimHash
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Semantics of the LLM-data operators that the rows-only driver check
  * can't gate: MinHash-LSH recall vs the exact quadratic baseline,
  * SimHash locality, ANN recall, decode-kernel determinism.
  */
class LlmOpsSpec extends SparkSuite {

  private lazy val docs = Tables.documents(spark, sf0001).cache()

  test("minhash-LSH finds every planted near-dup pair (recall vs exact)") {
    // exact quadratic baseline at τ=0.5 over the full sf0.001 corpus
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val exact = sh.alias("a").join(sh.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.sh"), col("b.sh"))).cast(DoubleType))
      .withColumn("jaccard",
        col("inter") / (size(col("a.sh")) + size(col("b.sh")) - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = Dedup.minhashNearDups(docs, tau = 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    // verification step guarantees precision; bands give recall
    assert(lsh.subsetOf(exact))
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} true pairs")
  }

  test("substring dedup cuts exactly the duplicated runs, in place") {
    import spark.implicits._
    // doc 1 and 2 share an exact 9-token run (-> one merged span each);
    // doc 3 repeats its own 8-token run (within-doc duplication counts);
    // doc 4 shares nothing; doc 5 is shorter than minLen
    val run = "r1 r2 r3 r4 r5 r6 r7 r8 r9"
    val synth = Seq(
      (1L, s"a1 a2 $run z1 z2"),
      (2L, s"b1 $run y1 y2 y3"),
      (3L, s"c1 s1 s2 s3 s4 s5 s6 s7 s8 c2 s1 s2 s3 s4 s5 s6 s7 s8 c3"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
      (5L, "v1 v2 v3")).toDF("doc_id", "text")
    val out = Dedup.substringDedup(synth, minLen = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    // doc 1: tokens 2..10 are the run -> two duplicated 8-grams starting
    // at 2 and 3, merged into one span [2,10]
    assert(out(0) == ((1L, 13, 2L, 1L, 9L, "a1 a2 z1 z2")))
    assert(out(1) == ((2L, 13, 2L, 1L, 9L, "b1 y1 y2 y3")))
    // doc 3: both copies of the 8-token run are covered (positions 1..8
    // and 10..17), the separators survive
    assert(out(2) == ((3L, 19, 2L, 2L, 16L, "c1 c2 c3")))
    assert(out(3) == ((4L, 10, 0L, 0L, 0L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")))
    assert(out(4) == ((5L, 3, 0L, 0L, 0L, "v1 v2 v3")))
    // token-mass accounting holds on every row
    out.foreach { case (id, nTok, _, _, nRem, cleaned) =>
      val kept = if (cleaned.isEmpty) 0 else cleaned.split(" ").length
      assert(kept == nTok - nRem, s"doc $id")
    }
  }

  test("span dedup (C4 §2.2): survivor keeps, overlaps respected, idempotent") {
    import spark.implicits._
    val shared = "alpha one. beta two. gamma three."
    val docs = Seq(
      (1L, s"u1 intro. $shared u1 outro."), // min (doc, pos) → survivor
      (2L, s"u2 intro. $shared u2 outro."), // loses the middle three
      (3L, s"$shared u3 a. u3 b."), // same span at pos 0 — also loses it
      (4L, "u4 one. u4 two. u4 three. u4 four."), // untouched
      (5L, "short doc. two only.") // < 3 sentences: no spans, untouched
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 5L, 0L, s"u1 intro. $shared u1 outro.")))
    assert(out(1) == ((2L, 5L, 3L, "u2 intro. u2 outro.")))
    assert(out(2) == ((3L, 5L, 3L, "u3 a. u3 b.")))
    assert(out(3) == ((4L, 4L, 0L, "u4 one. u4 two. u4 three. u4 four.")))
    assert(out(4) == ((5L, 2L, 0L, "short doc. two only.")))
    // idempotent: re-running on the cleaned corpus removes nothing
    val again = Dedup.spanDedup(
      Dedup.spanDedup(docs).select(col("doc_id"), col("cleaned").as("text")))
    assert(again.agg(sum(col("n_removed"))).head.getLong(0) == 0L)
    // hashed-span scale path is bit-identical
    val hashed = Dedup.spanDedup(docs, hashSpans = true).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(hashed.map(_._2).toSeq == out.map(_._4).toSeq)
  }

  test("substring dedup: hashed-gram scale path matches the string path") {
    val a = Dedup.substringDedup(docs, minLen = 8)
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.substringDedup(docs, minLen = 8, hashGrams = true)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // the corpus actually exercises the operator (planted canary runs)
    assert(a.exists(_.getLong(3) > 0L), "no duplicated runs found at sf0.001")
  }

  test("simhash: identical tokens → identical hash; small edit → small hamming") {
    val a = SimHash.simhash64(Iterator("the", "quick", "brown", "fox", "jumps"))
    val b = SimHash.simhash64(Iterator("the", "quick", "brown", "fox", "jumps"))
    assert(a == b)
    val c = SimHash.simhash64(Iterator("the", "quick", "brown", "fox", "leaps"))
    assert(SimHash.hamming(a, c) < 24)
    val d = SimHash.simhash64(Iterator("completely", "different", "words", "here", "now"))
    assert(SimHash.hamming(a, d) > SimHash.hamming(a, c))
  }

  test("lsh ANN: top-1 recall vs brute force is high, multi-probe beats single") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recall(multiProbe: Boolean): Int = {
      val approx = Similarity.lshTopK(queries, emb, 1, multiProbe = multiProbe)
        .select("query_id", "neighbor_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(approx.keySet.subsetOf(exact.keySet))
      exact.count { case (q, n) => approx.get(q).contains(n) }
    }
    val single = recall(multiProbe = false)
    val multi = recall(multiProbe = true)
    assert(single >= exact.size / 2, s"single-probe top-1 recall $single/${exact.size}")
    assert(multi >= single, s"multi-probe ($multi) should not lose to single ($single)")
    assert(multi >= exact.size * 7 / 10, s"multi-probe top-1 recall $multi/${exact.size}")
  }

  test("s16 md5-family ANN: hyperplanes pin to an independent md5 " +
      "derivation, recall holds, and the result is deterministic") {
    import graft.functions.IntSignLshEval
    // (1) the hyperplane components the oracle derives in DuckDB SQL —
    // (md5long15 % 31) - 15 — against Spark SQL's OWN md5/conv path
    // (an independent MD5 + hex-parse implementation from the JVM
    // MessageDigest one inside IntSignLshEval)
    import spark.implicits._
    val probeStrs = Seq("s16:0:0:0", "s16:7:5:63", "s16:3:2:17")
    val viaSql = probeStrs.toDF("s")
      .select((conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
        % 31 - 15).as("h"))
      .collect().map(_.getLong(0))
    val viaEval = probeStrs.map(s => IntSignLshEval.md5Long15(s) % 31L - 15L)
    assert(viaSql.toSeq == viaEval, "md5 hyperplane family diverges")
    assert(viaEval.forall(h => h >= -15 && h <= 15))
    // (2) the md5-signed lshTopK (the s16 machinery) keeps top-1 recall
    // in the same band the live family does at the pinned geometry
    val emb = Tables.embeddings(spark, sf0001).cache()
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Similarity.lshTopK(queries, emb, 1,
        tables = 8, planesPerTable = 6, multiProbe = true,
        signer = Similarity.md5Signer)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = exact.count { case (q, n) => approx.get(q).contains(n) }
    assert(hits >= exact.size * 7 / 10, s"md5-LSH top-1 recall $hits/${exact.size}")
    // (3) bit-identical across runs (plan constants, no RNG anywhere)
    val run1 = SparkEntry.queries("s16_ann_lsh_md5")(spark, sf0001).collect().toSeq
    val run2 = SparkEntry.queries("s16_ann_lsh_md5")(spark, sf0001).collect().toSeq
    assert(run1 == run2)
  }

  test("s18 md5-sample IVF twin: recall holds through the identical " +
      "machinery and the result is deterministic") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (flat, dim) = Similarity.md5SampleCentroids(emb, nlist = 16)
    assert(flat.length == 16 * dim)
    val approx = Similarity.ivfTopKWith(queries, emb, 1, flat, dim,
        nprobe = 4, replicas = 2)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = exact.count { case (q, n) => approx.get(q).contains(n) }
    assert(hits >= exact.size / 2,
      s"md5-sample IVF top-1 recall $hits/${exact.size}")
    val run1 = SparkEntry.queries("s18_ann_ivf_md5")(spark, sf0001).collect().toSeq
    val run2 = SparkEntry.queries("s18_ann_ivf_md5")(spark, sf0001).collect().toSeq
    assert(run1 == run2)
  }

  test("s19 md5-sample PQ twin: recall holds through the identical " +
      "ADC machinery and the result is deterministic") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (codebook, dim) = Similarity.md5SamplePqCodebook(emb, m = 8, ks = 32)
    assert(codebook.length == 8 * 32 * (dim / 8))
    // a sample codebook quantizes coarser than Lloyd's — gate at the
    // REGISTERED shape (k=10, rerank 4 → 40-candidate pool): the true
    // top-1 must surface in the twin's top-10 for most queries
    val top10 = Similarity.pqTopKWith(queries, emb, 10, codebook, dim,
        m = 8, rerank = 4)
      .select("query_id", "neighbor_id")
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = exact.count { case (q, n) => top10.get(q).exists(_.contains(n)) }
    assert(hits >= exact.size * 6 / 10,
      s"md5-sample PQ top-1-in-top-10 recall $hits/${exact.size}")
    val run1 = SparkEntry.queries("s19_ann_pq_md5")(spark, sf0001).collect().toSeq
    val run2 = SparkEntry.queries("s19_ann_pq_md5")(spark, sf0001).collect().toSeq
    assert(run1 == run2)
  }

  test("ivf ANN: top-1 recall vs brute force; probing more lists helps") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recall(nprobe: Int): Int = {
      val approx = Similarity.ivfTopK(queries, emb, 1, nprobe = nprobe)
        .select("query_id", "neighbor_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(approx.keySet.subsetOf(exact.keySet))
      exact.count { case (q, n) => approx.get(q).contains(n) }
    }
    val narrow = recall(2)
    val wide = recall(8)
    assert(wide >= narrow, s"nprobe=8 ($wide) should not lose to nprobe=2 ($narrow)")
    assert(wide >= exact.size * 7 / 10, s"ivf top-1 recall $wide/${exact.size}")
    // determinism: same call twice, identical assignment + results
    val r1 = Similarity.ivfTopK(queries, emb, 5).collect().toSeq
    val r2 = Similarity.ivfTopK(queries, emb, 5).collect().toSeq
    assert(r1 == r2)

    // the distributed (full-corpus Lloyd's) trainer is at least as good
    // as the bounded-sample trainer at the same probe width, and equally
    // deterministic
    val distApprox = Similarity.ivfTopK(queries, emb, 1, nprobe = 8,
        distributedTrain = true)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distRecall = exact.count { case (q, n) => distApprox.get(q).contains(n) }
    assert(distRecall >= exact.size * 7 / 10,
      s"distributed-trained ivf recall $distRecall/${exact.size}")
    val d2 = Similarity.ivfTopK(queries, emb, 1, nprobe = 8,
      distributedTrain = true).collect().toSeq
    val d3 = Similarity.ivfTopK(queries, emb, 1, nprobe = 8,
      distributedTrain = true).collect().toSeq
    assert(d2 == d3)
  }

  test("pq ANN: top-1 recall vs brute force; wider re-rank helps; deterministic") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recall(rerank: Int): Int = {
      val approx = Similarity.pqTopK(queries, emb, 1, rerank = rerank)
        .select("query_id", "neighbor_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(approx.keySet.subsetOf(exact.keySet))
      exact.count { case (q, n) => approx.get(q).contains(n) }
    }
    val narrow = recall(2)
    val wide = recall(8)
    assert(wide >= narrow, s"rerank=8 ($wide) should not lose to rerank=2 ($narrow)")
    assert(wide >= exact.size * 7 / 10, s"pq top-1 recall $wide/${exact.size}")
    // re-ranked scores are EXACT cosines: every returned (q, n, cos)
    // agrees bit-for-bit with the brute-force score for that pair
    val bf = Similarity.bruteForceTopK(queries, emb, 50)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    Similarity.pqTopK(queries, emb, 10).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      bf.get(key).foreach(c => assert(c == r.getDouble(3), s"score drift at $key"))
    }
    // determinism: same call twice, identical codebook + results
    val r1 = Similarity.pqTopK(queries, emb, 5).collect().toSeq
    val r2 = Similarity.pqTopK(queries, emb, 5).collect().toSeq
    assert(r1 == r2)
    // stored-index shape: codes are PACKED binary, exactly m bytes/row
    val (cb, dim) = Similarity.trainPq(emb, emb.count(), m = 8, ks = 64)
    val codes = emb.select(graft.functions.GraftFunctions
      .pq_encode(col("embedding"), cb, dim, 8).as("codes"))
    assert(codes.schema("codes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    codes.collect().foreach(r => assert(r.getAs[Array[Byte]](0).length == 8))
  }

  test("persistent ANN index: build/load/query matches the direct pipeline") {
    import graft.operators.AnnIndex
    val emb = Tables.embeddings(spark, sf0001).cache()
    val queries = emb.filter(col("vec_id") < 20)
    val dir = tempDir("annix").getAbsolutePath

    AnnIndex.build(emb, s"file:$dir")
    // the on-disk index is partitioned by IVF list — the directory
    // layout IS the inverted file
    val listDirs = new java.io.File(s"$dir/index.parquet").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("list_id="))
    assert(listDirs.nonEmpty)
    // codes are the packed binary(m) stored form
    val ix = AnnIndex.load(spark, s"file:$dir")
    assert(ix.index.schema("codes").dataType ==
      org.apache.spark.sql.types.BinaryType)

    // identical deterministic training ⇒ the loaded index answers
    // bit-identically to the train-per-call pipeline
    val fromIndex = AnnIndex.topK(ix, queries, emb, 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val direct = Similarity.ivfpqTopK(queries, emb, 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(fromIndex == direct)

    // a second load answers the same (nothing retrains at query time)
    val again = AnnIndex.topK(AnnIndex.load(spark, s"file:$dir"), queries, emb, 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(again == fromIndex)
  }

  test("ANN index with OPQ: rotation persists exactly, grow encodes " +
      "through it, stored codebook beats plain PQ on anisotropic data") {
    import spark.implicits._
    import graft.operators.AnnIndex
    // PcaSpec's anisotropic corpus: two heavy dimensions plain PQ puts
    // in the SAME subspace at m=4, everything else near-noise
    def mixu(z0: Long): Double = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= z >>> 31
      ((z >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    val emb = (0L until 300L).map { id =>
      val v = Array.tabulate(16)(i => (mixu(id * 131L + i) * 0.04).toFloat)
      v(0) = (mixu(id * 131L + 100) * 2.0).toFloat
      v(1) = (mixu(id * 131L + 101) * 1.6).toFloat
      (id, v.toSeq)
    }
    val frame = emb.toDF("vec_id", "embedding").cache()
    val dirP = tempDir("annplain").getAbsolutePath
    val dirO = tempDir("annopq").getAbsolutePath
    AnnIndex.build(frame, s"file:$dirP", m = 4, ks = 16)
    AnnIndex.build(frame, s"file:$dirO", m = 4, ks = 16, opq = true)
    val ixP = AnnIndex.load(spark, s"file:$dirP")
    val ixO = AnnIndex.load(spark, s"file:$dirO")
    assert(ixP.rotation.isEmpty)
    // the stored rotation round-trips EXACTLY (doubles, not floats —
    // anything lossy would break grow ≡ rebuild parity)
    assert(ixO.rotation.contains(Similarity.opqRotation(frame, m = 4)))

    // the stored codebook's quantization error: OPQ clearly below plain
    // (the PcaSpec property, now proven for the SERVED index's models)
    def pqError(vecs: Seq[Seq[Float]], codebook: Array[Float],
        dim: Int, m: Int): Double = {
      val sub = dim / m
      val k = codebook.length / dim
      vecs.map { r =>
        val norm = math.sqrt(r.map(x => x.toDouble * x).sum)
        val u = r.map(x => if (norm == 0) 0.0 else x / norm)
        (0 until m).map { j =>
          (0 until k).map { c =>
            (0 until sub).map { i =>
              val diff = u(j * sub + i) - codebook(j * k * sub + c * sub + i)
              diff * diff
            }.sum
          }.min
        }.sum
      }.sum
    }
    val rawVecs = emb.map(_._2)
    val rotVecs = Similarity.pcaProjectFrame(frame, ixO.rotation.get)
      .orderBy("vec_id").collect().map(_.getSeq[Float](2).toSeq).toSeq
    val errP = pqError(rawVecs, ixP.codebook, 16, 4)
    val errO = pqError(rotVecs, ixO.codebook, 16, 4)
    assert(errO < errP * 0.9, s"OPQ error $errO not clearly below $errP")

    // recall@1 on PLANTED near-copies (query i = corpus vector i plus
    // per-dim noise at 1% of its scale — the true neighbor carries a
    // real margin, unlike self-queries over noise-dominated data whose
    // hairline margins make tiny-pool recall a coin flip)
    val queries = (0L until 30L).map { id =>
      val v = emb(id.toInt)._2.toArray
      val q = v.indices.map(i =>
        (v(i) + (mixu(id * 977L + i + 5000) * 0.02 * math.max(
          math.abs(v(i).toDouble), 0.04)).toFloat)).toSeq
      (id + 90000L, q)
    }.toDF("vec_id", "embedding")
    val bf = Similarity.bruteForceTopK(queries, frame, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def recall(ix: AnnIndex.Loaded, nprobe: Int, rerank: Int): Double = {
      val got = AnnIndex.topK(ix, queries, frame, 1, nprobe, rerank)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      bf.count { case (q, n) => got.get(q).contains(n) }.toDouble / bf.size
    }
    val (recP, recO) = (recall(ixP, 8, 4), recall(ixO, 8, 4))
    assert(recO >= recP, s"OPQ recall $recO below plain $recP")
    assert(recO >= 0.9, s"OPQ recall $recO unreasonably low")

    // the sharpest ADC-quality gate: for EXACT copies at rerank 1 the
    // norm-corrected OPQ scorer must put the true source first every
    // time (the raw-dot scorer measured 0.07 here before the fix — the
    // codeword norm-shrinkage bias this test exists to keep out)
    val exact = frame.filter(col("vec_id") < 30)
      .select((col("vec_id") + 90000L).as("vec_id"), col("embedding"))
    val bfE = Similarity.bruteForceTopK(exact, frame, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val gotE = AnnIndex.topK(ixO, exact, frame, 1, nprobe = 8, rerank = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bfE.forall { case (q, n) => gotE.get(q).contains(n) },
      s"exact-copy rr=1 misses: ${bfE.filterNot { case (q, n) => gotE.get(q).contains(n) }}")

    // grow through the stored rotation: appended rows are exactly the
    // batch rotated with the STORED matrix and encoded with the STORED
    // models (no retrain)
    val batch = frame.filter(col("vec_id") < 2)
      .select((col("vec_id") + 90000L).as("vec_id"), col("embedding"))
    AnnIndex.grow(batch, s"file:$dirO")
    val fns = graft.functions.GraftFunctions
    val expectNew = Similarity.pcaProjectFrame(batch, ixO.rotation.get)
      .select(col("vec_id"),
        explode(fns.nearest_centroids(col("reduced"), ixO.centroids,
          ixO.dim, ixO.replicas)).as("list_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val grownNew = AnnIndex.load(spark, s"file:$dirO").index
      .filter(col("vec_id") >= 90000L)
      .select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(grownNew == expectNew)
  }

  test("ANN index growth: appended vectors are encoded with the stored models") {
    import spark.implicits._
    import graft.operators.AnnIndex
    val emb = Tables.embeddings(spark, sf0001).cache()
    val dim = emb.head().getSeq[Float](1).size
    val dir = tempDir("anngrow").getAbsolutePath
    AnnIndex.build(emb, s"file:$dir")
    val before = AnnIndex.load(spark, s"file:$dir")
    val rowsBefore = before.index
      .select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

    // arriving batch: near-copies of two corpus vectors (tiny
    // perturbation — their exact top-1 must become the new ids)
    val batch = emb.filter(col("vec_id") < 2)
      .select((col("vec_id") + 90000L).as("vec_id"),
        transform(col("embedding"),
          x => x + (x * lit(0.001f))).as("embedding"))
      .cache()
    AnnIndex.grow(batch, s"file:$dir")

    val grown = AnnIndex.load(spark, s"file:$dir")
    // parity: the grown index's rows are EXACTLY the old rows plus the
    // batch encoded with the STORED models (no retrain, nothing changed)
    val fns = graft.functions.GraftFunctions
    val expectNew = batch.select(col("vec_id"),
        explode(fns.nearest_centroids(col("embedding"), before.centroids,
          before.dim, before.replicas)).as("list_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val rowsAfter = grown.index.select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rowsAfter == rowsBefore ++ expectNew)
    assert((rowsAfter -- rowsBefore).forall(_._1 >= 90000L))
    // and the codes round the same codebook: grown rows for the batch
    // match a fresh encode bit-for-bit
    val grownCodes = grown.index.filter(col("vec_id") >= 90000L)
      .select("vec_id", "list_id", "codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSet
    val freshCodes = batch.select(col("vec_id"),
        explode(fns.nearest_centroids(col("embedding"), before.centroids,
          before.dim, before.replicas)).as("list_id"),
        fns.pq_encode(col("embedding"), before.codebook, before.dim,
          before.m).as("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(grownCodes == freshCodes)

    // behaviorally: a query at vec 0's position must now SEE the
    // appended near-copy through the grown index's partitions (the copy
    // is a uniform scale of vec 0, so it ties the original at cosine
    // 1.0 — discoverability, not rank order, is the growth claim)
    val probeQ = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val full = emb.select(col("vec_id"), col("embedding"))
      .unionByName(batch)
    val neighbors = AnnIndex.topK(grown, probeQ, full, 3)
      .collect().map(_.getLong(2)).toSet
    assert(neighbors.contains(90000L),
      s"appended near-copy not discoverable: $neighbors")

    // long grow loop with compaction: file count stays bounded and the
    // compacted index's rows are identical to the uncompacted ones
    val preRows = rowsAfter
    (0 until 5).foreach { i =>
      val b = emb.filter(col("vec_id") < 2)
        .select((col("vec_id") + 95000L + i * 10).as("vec_id"),
          col("embedding"))
      AnnIndex.grow(b, s"file:$dir", compactAbove = 8)
    }
    val files = graft.operators.Scale.dataFileCount(spark,
      s"file:$dir/index.parquet")
    assert(files <= 8 + grown.nlist,
      s"index fragmented to $files files after 5 compacting grows")
    val loopRows = AnnIndex.load(spark, s"file:$dir").index
      .select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert((loopRows -- preRows).forall(_._1 >= 95000L))
    assert(preRows.subsetOf(loopRows))
  }

  test("ANN index deletion: tombstones mask every replica row; vacuum drops them physically") {
    import graft.operators.AnnIndex
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf0001).cache()
    val dir = tempDir("anndel").getAbsolutePath
    AnnIndex.build(emb, s"file:$dir")
    val queries = emb.filter(col("vec_id") < 5)

    // pick victims that actually APPEAR in the pre-delete results
    val before = AnnIndex.topK(AnnIndex.load(spark, s"file:$dir"),
        queries, emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(1)))
    val victims = before.filter(_._3 <= 2).map(_._2).distinct.take(3)
    assert(victims.nonEmpty)
    AnnIndex.delete(victims.toSeq.toDF("vec_id"), s"file:$dir")

    val masked = AnnIndex.load(spark, s"file:$dir")
    // every replica row of a tombstoned id is invisible
    assert(masked.index.filter(col("vec_id").isInCollection(victims))
      .count() == 0L)
    val after = AnnIndex.topK(masked, queries, emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(1)))
    assert(after.forall(r => !victims.contains(r._2)),
      "deleted vector surfaced in results")
    // result lists stay full: next-best neighbors fill the ranks
    assert(after.groupBy(_._1).forall(_._2.length == 5))

    // vacuum: physical rows gone, tombstone table cleared, answers
    // identical to the masked index
    val physBefore = spark.read.parquet(s"$dir/index.parquet").count()
    AnnIndex.vacuum(spark, s"file:$dir")
    val physAfter = spark.read.parquet(s"$dir/index.parquet").count()
    assert(physAfter < physBefore)
    assert(spark.read.parquet(s"$dir/tombstones.parquet").count() == 0L)
    val vacuumed = AnnIndex.topK(AnnIndex.load(spark, s"file:$dir"),
        queries, emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(1)))
    assert(vacuumed.toSeq == after.toSeq)
    // the lifecycle composes: grow after vacuum still works
    AnnIndex.grow(emb.filter(col("vec_id") === 7L)
      .select((col("vec_id") + 970000L).as("vec_id"), col("embedding")),
      s"file:$dir")
    assert(AnnIndex.load(spark, s"file:$dir").index
      .filter(col("vec_id") === 970007L).count() > 0L)
  }

  test("ivfpq ANN: composed prune+compress keeps recall; deterministic") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Similarity.ivfpqTopK(queries, emb, 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet.subsetOf(exact.keySet))
    val recall = exact.count { case (q, n) => approx.get(q).contains(n) }
    assert(recall >= exact.size * 6 / 10, s"ivfpq top-1 recall $recall/${exact.size}")
    val r1 = Similarity.ivfpqTopK(queries, emb, 5).collect().toSeq
    val r2 = Similarity.ivfpqTopK(queries, emb, 5).collect().toSeq
    assert(r1 == r2)
  }

  test("winnow overlap flags planted partial copies, not unrelated docs") {
    import spark.implicits._
    val phraseA = "the migration of arctic terns spans both polar regions every year "
    val phraseB = "quantum error correction encodes one logical qubit in many physical "
    val longA = phraseA * 10
    val longB = phraseB * 10
    // a 300-char verbatim slice of longA embedded in unrelated text
    val partial = "totally unrelated preamble content goes first here and then " +
      longA.substring(50, 350) + " followed by an unrelated closing remark"
    // docs 10..13 share ONLY a boilerplate footer (in every one of them)
    // plus genuinely distinct content — IDF weighting must keep them
    // from pairing on the footer alone
    val footer = " this standard footer text appears on every single page here " * 2
    val bodies = Seq(
      "astronomy telescopes resolve distant nebulae while quasars outshine entire galaxies near the cosmic horizon",
      "gardening rewards patience with ripening tomatoes crisp lettuce and the quiet satisfaction of turned compost",
      "violin bowing technique demands relaxed shoulders flexible wrists and countless hours of scale practice daily",
      "sourdough fermentation depends on wild yeast hydration ratios and long cold proofs in the refrigerator")
    val boilers = bodies.zipWithIndex.map { case (b, i) => (10L + i) -> (b + footer) }
    val df = (Seq((1L, longA), (2L, longB), (3L, partial)) ++ boilers)
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(df, minOverlap = 0.3, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((1L, 3L)), s"planted copy missed: $pairs")
    assert(pairs((1L, 3L)) >= 0.5, s"containment score too low: ${pairs((1L, 3L))}")
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((2L, 3L)), pairs.toString)
    // boilerplate-only pairs stay below the threshold (shared prints are
    // low-IDF; the unique content dominates each doc's weight)
    val boilerPairs = pairs.keys.filter(p => p._1 >= 10L && p._2 >= 10L)
    assert(boilerPairs.isEmpty, s"boilerplate paired: $pairs")
  }

  test("bigram novelty separates gibberish from reference-like text") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val typical = docs.orderBy("doc_id").limit(1).collect().head.getAs[String]("text")
    val planted = Seq(
      (9000001L, typical), // in-vocabulary, reference-like
      (9000002L, "zxqv wjxk pqzt mnvb qqrs ttyu zzxc vvbn wwop rrtu")
    ).toDF("doc_id", "text")
    val scored = TextAnalysis.bigramNovelty(planted, docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (_, typOov, typRatio) = scored(9000001L)
    val (gibUnseen, gibOov, gibRatio) = scored(9000002L)
    assert(typOov == 0 && typRatio < 0.5,
      s"reference-like text flagged novel: $scored")
    assert(gibRatio == 1.0 && gibOov == gibUnseen,
      s"gibberish not fully novel: $scored")
  }

  test("semantic dedup flags planted copies; flags match per-cluster brute force") {
    val emb = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    // exact re-encodes of vectors 0-4 under new ids — the semantic-dup
    // class exact/shingle dedup can't see (here byte-equal for a crisp
    // oracle; the operator itself only sees cosine)
    val copies = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 9000000L).as("vec_id"), col("embedding"))
    val all = emb.unionByName(copies)
    val out = Similarity.semanticDedup(all, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap

    // every planted copy flags, in its original's cluster; the original
    // (the min id of the pair) survives
    (0 until 5).foreach { i =>
      assert(out(9000000L + i)._2, s"planted copy of $i not flagged")
      assert(out(9000000L + i)._1 == out(i.toLong)._1,
        s"copy of $i assigned a different cluster")
      assert(!out(i.toLong)._2, s"survivor $i wrongly flagged")
    }

    // flag ⟺ a lower-id same-cluster mate at cos ≥ t (brute force over
    // the collected corpus — validates no false flags anywhere)
    val vecs = all.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = out.keys.toSeq.sorted
    ids.foreach { id =>
      val expect = ids.exists(o => o < id && out(o)._1 == out(id)._1 &&
        cos(vecs(o), vecs(id)) >= 0.9)
      assert(out(id)._2 == expect, s"flag mismatch for $id")
    }

    // deterministic: same frame in, same flags out
    val again = Similarity.semanticDedup(all, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(again == out.map { case (id, (c, f)) => (id, c, f) }.toSet)
  }

  test("s20 md5-sample SemDeDup twin: planted copies flag through the " +
      "identical machinery and the result is deterministic") {
    val emb = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val copies = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 9000000L).as("vec_id"), col("embedding"))
    val all = emb.unionByName(copies)
    val (cents, dim) = Similarity.md5SampleCentroids(all, nlist = 16,
      salt = "s20")
    val out = Similarity.semanticDedupWith(all, threshold = 0.9, cents, dim)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    // byte-equal copies assign to the SAME cluster under any quantizer,
    // so the min-id survivor rule must flag exactly the copy
    (0 until 5).foreach { i =>
      assert(out(9000000L + i)._2, s"planted copy of $i not flagged")
      assert(out(9000000L + i)._1 == out(i.toLong)._1)
      assert(!out(i.toLong)._2, s"survivor $i wrongly flagged")
    }
    val run1 = SparkEntry.queries("s20_semantic_dedup_md5")(spark, sf0001)
      .collect().toSeq
    val run2 = SparkEntry.queries("s20_semantic_dedup_md5")(spark, sf0001)
      .collect().toSeq
    assert(run1 == run2)
  }

  test("s21 md5-sample mixture twin: flattening holds (smaller clusters " +
      "keep higher rates, max rate is 1) and the result is deterministic") {
    val out = SparkEntry.queries("s21_cluster_mixture_md5")(spark, sf0001)
      .select("cluster", "n_c", "rate", "kept").collect()
    val byCluster = out.map(r =>
      (r.getInt(0), (r.getLong(1), r.getDouble(2)))).distinct.toMap
    assert(byCluster.values.map(_._2).max == 1.0, "max rate must be 1")
    // rate strictly decreases with cluster mass (1/sqrt(n) is monotone)
    val sorted = byCluster.values.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach { case Seq((na, ra), (nb, rb)) =>
      if (na < nb) assert(ra >= rb, s"rate not flattening: $na->$ra, $nb->$rb")
    }
    // the most up-weighted cluster keeps EVERYTHING (threshold 2^24
    // exceeds every 24-bit md5 bucket)
    val minN = byCluster.values.map(_._1).min
    val keepAll = out.filter(r => r.getLong(1) == minN)
    assert(keepAll.forall(_.getBoolean(3)), "rate-1 cluster must keep all")
    val again = SparkEntry.queries("s21_cluster_mixture_md5")(spark, sf0001)
      .select("cluster", "n_c", "rate", "kept").collect()
    assert(out.toSeq == again.toSeq)
  }

  test("s22 md5-model stored index: tombstoned ids never surface and " +
      "the served result is deterministic") {
    val out = SparkEntry.queries("s22_ann_index_md5")(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) % 17 != 0,
        s"tombstoned neighbor ${r.getLong(2)} surfaced")
      assert(r.getLong(0) % 17 != 0)
    }
    val again = SparkEntry.queries("s22_ann_index_md5")(spark, sf0001)
      .collect()
    assert(out.toSeq == again.toSeq)
  }

  test("embedding admission: copies flag, negations pass, probe plan has no exchange") {
    val emb = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val (index, planes) = Similarity.embeddingAdmissionIndex(emb, fpp = 0.001)

    // exact re-encodes: identical vector → identical buckets → flagged
    // (the Bloom adds no false negatives)
    val copies = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    val copyOut = Similarity.embeddingAdmissionWith(copies, index, planes)
    assert(copyOut.collect().forall(_.getBoolean(2)), "corpus copy not flagged")

    // hash-derived pseudo-random directions: ~orthogonal to every corpus
    // vector (cos ~ N(0, 1/√dim)), so flags can only come from Bloom
    // fpp / coincidence; the screen must pass nearly all of them
    val dim = emb.head().getSeq[Float](1).size
    val novel = emb.select((col("vec_id") + 950000L).as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        i => ((pmod(xxhash64(col("vec_id"), i), lit(2001L)) - 1000L)
          .cast("double") / 1000d).cast("float")).as("embedding"))
    val novelFlags = Similarity.embeddingAdmissionWith(novel, index, planes)
      .collect().map(_.getBoolean(2))
    val flagged = novelFlags.count(identity)
    assert(flagged <= novelFlags.length / 20,
      s"$flagged/${novelFlags.length} novel vectors flagged — screen too dense")

    // stream-safety evidence: the probe is row-local — no Exchange, no
    // aggregation, no join anywhere in its plan
    val plan = copyOut.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"admission probe must be shuffle/join-free:\n$plan")
  }

  test("media decode kernel is deterministic and batch-shaped") {
    val fake = classOf[Multimodal.FakeDecoder].getName
    val m1 = Multimodal.decodeFeaturesWith(Multimodal.mediaTable(docs), fake)
      .collect().sortBy(_.doc_id)
    val m2 = Multimodal.decodeFeaturesWith(
        Multimodal.mediaTable(docs).repartition(7), fake)
      .collect().sortBy(_.doc_id)
    assert(m1.length == docs.count())
    assert(m1.toSeq == m2.toSeq) // partitioning must not change features
    assert(m1.forall(f => f.width >= 64 && f.height >= 64))
    assert(m1.forall(f => f.sha.length == 64))
    val distinctShas = m1.map(_.sha).distinct.length
    assert(distinctShas == m1.length) // distinct payloads → distinct shas
  }

  test("media decoder is pluggable by class name through the session conf") {
    val media = Multimodal.mediaTable(docs)
    // the offline FakeDecoder selected via config (the session default is
    // the real PngDecoder, which rejects these text stand-in payloads)
    spark.conf.set(Multimodal.DecoderConfKey,
      classOf[Multimodal.FakeDecoder].getName)
    val fake = try Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
      finally spark.conf.unset(Multimodal.DecoderConfKey)
    assert(fake.exists(f => f.width != 7 || f.height != 9))
    // a second implementation drops in via config — the kernel
    // (schema, batching, partition lifecycle) is untouched
    spark.conf.set(Multimodal.DecoderConfKey, classOf[ConstToyDecoder].getName)
    try {
      val toy = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
      assert(toy.length == fake.length)
      assert(toy.forall(f => f.width == 7 && f.height == 9 && f.channel_mean == 3.5))
      // metadata outside the decoder's contract is decoder-independent
      assert(toy.map(f => f.doc_id -> f.sha).toSeq ==
        fake.map(f => f.doc_id -> f.sha).toSeq)
      val resized = Multimodal.resizeMedia(media).collect()
      assert(resized.forall(r => r.getInt(1) == 3 && r.getInt(3) == 2))
    } finally spark.conf.unset(Multimodal.DecoderConfKey)
  }

  test("cluster mixture: flattening, rate-1 floor, temperature-1 identity, determinism") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // three well-separated clusters with very different masses
    def vec(center: Int, j: Long): Array[Float] = Array.tabulate(8) { i =>
      val base = if (i == center) 10f else 0f
      base + ((j * 31 + i * 7) % 5) * 0.01f
    }
    val rows = (0 until 200).map(j => (j.toLong, vec(0, j))) ++
      (0 until 50).map(j => (200L + j, vec(1, j))) ++
      (0 until 10).map(j => (250L + j, vec(2, j)))
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.clusterMixture(emb, temperature = 0.5, nClusters = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.length == 260)
    val byCluster = out.groupBy(_._2)
    assert(byCluster.size == 3, s"expected 3 clusters, got ${byCluster.keySet}")
    // the smallest cluster is the most up-weighted: rate exactly 1,
    // everything kept
    val smallest = byCluster.minBy(_._2.size)._2
    assert(smallest.size == 10 && smallest.forall(_._5) &&
      smallest.forall(_._4 == 1.0), "smallest cluster must keep all")
    // flattening: kept-count imbalance strictly below input imbalance
    val inRatio = byCluster.values.map(_.size).max.toDouble /
      byCluster.values.map(_.size).min
    val kept = byCluster.view.mapValues(_.count(_._5)).toMap
    val keptRatio = kept.values.max.toDouble / math.max(kept.values.min, 1)
    assert(keptRatio < inRatio, s"kept ratio $keptRatio !< input $inRatio")
    // rates follow n^(tau-1): dominant cluster's rate ≈ (10/200)^0.5
    val big = byCluster.maxBy(_._2.size)._2
    assert(math.abs(big.head._4 - math.sqrt(10.0 / 200)) < 1e-9, big.head._4)
    // temperature 1 = identity: every rate 1, everything kept
    val flat = Similarity.clusterMixture(emb, temperature = 1.0, nClusters = 3)
      .collect()
    assert(flat.forall(r => r.getDouble(3) == 1.0 && r.getBoolean(4)))
    // determinism: bit-identical kept set on a re-run
    val again = Similarity.clusterMixture(emb, temperature = 0.5, nClusters = 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).sortBy(_._1).toSeq
    assert(again == out.map(r => (r._1, r._5)).sortBy(_._1).toSeq)
  }

  test("scalar quantization: error bound, monotonicity, constant dim, range") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf0001)
    val codes = Similarity.scalarQuantize(emb)
    val stats = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "f")))
      .select(col("dim"), col("f").cast("double").as("v"))
      .groupBy("dim").agg(min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = codes.join(
        emb.select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("dim", "f"))),
        Seq("vec_id", "dim"))
      .select(col("dim"), col("code"), col("f").cast("double"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (dim, code, v) =>
      assert(code >= 0 && code <= 255, s"dim $dim code $code")
      val (mn, mx) = stats(dim)
      if (mx > mn) {
        // midpoint reconstruction error is bounded by half a bucket
        val w = (mx - mn) / 255.0
        val recon = mn + (code + 0.5) * w
        assert(math.abs(v - recon) <= w / 2 + 1e-12,
          s"dim $dim v $v code $code recon $recon")
      } else assert(code == 0)
    }
    // monotone within each dimension
    rows.groupBy(_._1).foreach { case (dim, rs) =>
      val sorted = rs.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array((_, c1, _), (_, c2, _)) =>
          assert(c1 <= c2, s"dim $dim codes not monotone")
        case _ =>
      }
    }
    // a constant dimension codes 0 everywhere
    val toy = Seq((1L, Array(0.5f, 1.0f)), (2L, Array(0.5f, 2.0f)))
      .toDF("vec_id", "embedding")
    val toyCodes = Similarity.scalarQuantize(toy)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(toyCodes == Set((1L, 0, 0), (2L, 0, 0), (1L, 1, 0), (2L, 1, 255)))
  }

  test("novelty: hand-computed witnesses; hashed census path is identical") {
    import spark.implicits._
    // doc 1 and 2 share their first 8 tokens (one shared 8-gram); doc 3
    // is fully original; doc 4 is under 8 tokens (whole-text fallback)
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val toy = Seq(
      (1L, s"$shared a9 a10"),    // grams: shared+2 tails → 1 of 3 shared
      (2L, s"$shared b9"),        // grams: shared+1 tail  → 1 of 2 shared
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = TextAnalysis.novelty(toy, hashGrams = false).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((3L, 2L)), out(1L))
    assert(out(2L) == ((2L, 1L)), out(2L))
    assert(out(3L) == ((2L, 2L)), out(3L))
    assert(out(4L) == ((1L, 1L)), out(4L))      // fallback gram is unique
    // the xxhash64 census (the 100 TB shuffle shape) is bit-identical
    val str = TextAnalysis.novelty(docs, hashGrams = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val hsh = TextAnalysis.novelty(docs, hashGrams = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(str == hsh)
  }
}

/** Toy second [[graft.operators.Multimodal.MediaDecoder]]: constant
  * dimensions, two-byte thumbnail — exists to prove the decode kernel
  * selects implementations by class name (no-arg reflective ctor). */
class ConstToyDecoder extends graft.operators.Multimodal.MediaDecoder {
  def decode(payload: Array[Byte]): (Int, Int, Double) = (7, 9, 3.5)
  def resize(payload: Array[Byte]): (Int, Int, Array[Byte]) =
    (3, 4, Array[Byte](1, 2))
  def blockSums(payload: Array[Byte], grid: Int): (Int, Int, Array[Long]) =
    (7, 9, Array.tabulate(grid * grid)(_.toLong))
}
