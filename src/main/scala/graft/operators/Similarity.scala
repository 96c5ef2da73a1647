package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables

/** Similarity search over the embedding column (`array<float>`, dim 64):
  * exact brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH bucketed variant as the scale path (candidates
  * from sign-pattern buckets instead of the full cross product).
  *
  * All vector math is codegen'd array expressions (`aggregate`/
  * `zip_with`) in double precision with row-local sequential summation —
  * deterministic and oracle-matchable.
  */
object Similarity {

  /** Exact cosine similarity — the native [[graft.functions.CosineSim]]
    * expression (fused single-pass double loop; same ascending-index
    * summation as the composed `aggregate(zip_with(...))` form and the
    * DuckDB oracle, so results are bit-identical). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_sim(a, b)

  /** Exact top-k neighbors for each query vector (brute force): queries ×
    * corpus crossJoin with the small query side broadcast, then per-query
    * top-k via window. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.alias("c").crossJoin(broadcast(queries.alias("q")))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Signature family for the LSH machinery: (vector, tables, planes) →
    * array<long> of per-table buckets. [[liveSigner]] is the default
    * (native splitmix-double [[graft.functions.SignLsh]]);
    * [[md5Signer]] is the exact-integer md5-hyperplane family the s16
    * oracle twin runs the IDENTICAL machinery under. */
  type Signer = (Column, Int, Int) => Column

  val liveSigner: Signer =
    (c, t, p) => graft.functions.GraftFunctions.sign_lsh(c, t, p)

  val md5Signer: Signer =
    (c, t, p) => graft.functions.GraftFunctions.int_sign_lsh(c, t, p)

  /** (vec_id, table, bucket) keys for `tables` LSH hash tables of
    * `planesPerTable` sign bits each (OR-amplification: a pair is a
    * candidate if it collides in ANY table — a single m-bit bucket has
    * ~(1-θ/π)^m collision probability, near zero for the ~60-70°
    * neighbors in this corpus). Buckets come from the native [[SignLsh]]
    * expression — a tight primitive loop, not per-plane HOFs.
    */
  def lshKeyed(df: DataFrame, tables: Int, planesPerTable: Int,
      signer: Signer = liveSigner): DataFrame =
    df.select(col("vec_id"),
        posexplode(signer(col("embedding"), tables, planesPerTable)))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "bucket")

  /** Multi-probe variant for the QUERY side: besides the exact bucket,
    * probe every one-bit-flipped bucket per table (planesPerTable extra
    * keys each) — near-miss sign flips are the dominant loss mode, so
    * this buys recall for tables× fewer hash tables at query-side-only
    * cost (the corpus side stays single-keyed).
    */
  def lshKeyedMultiProbe(df: DataFrame, tables: Int, planesPerTable: Int,
      signer: Signer = liveSigner): DataFrame = {
    val keyed = lshKeyed(df, tables, planesPerTable, signer)
    val probes = keyed.select(col("vec_id"), col("table"),
        explode(array((0 until planesPerTable).map(b =>
          col("bucket").bitwiseXOR(lit(1L << b))): _*)).as("bucket"))
    keyed.unionByName(probes)
  }

  /** Planes per hash table sized to the corpus (see
    * [[Scale.lshBitsFor]]): expected bucket occupancy stays O(1) at any
    * corpus size instead of buckets growing O(n) under a fixed plane
    * count. `corpus.count()` is one metadata-cheap action at plan time —
    * the same runtime-statistics trade AQE makes. */
  def planesFor(corpusSize: Long): Int =
    Scale.lshBitsFor(corpusSize, targetOccupancy = 32, minBits = 4, maxBits = 30)

  /** Approximate top-k: candidates collide with the query in any of the
    * LSH tables, are scored exactly, then per-query top-k. The bucket
    * join replaces the cross product — the shuffle is corpus × tables
    * keys, not corpus², which is what survives 100 TB.
    *
    * `planesPerTable` defaults to the size-derived policy
    * ([[planesFor]]); pass an explicit value to pin it.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      tables: Int = 8, planesPerTable: Int = 0,
      multiProbe: Boolean = true, signer: Signer = liveSigner): DataFrame = {
    val planes = if (planesPerTable > 0) planesPerTable else planesFor(corpus.count())
    import org.apache.spark.sql.expressions.Window
    // candidate ids first (dedup over small (qid, nid) keys — never
    // shuffle the embedding arrays as dedup keys), then one scoring join
    val qKeys = if (multiProbe) lshKeyedMultiProbe(queries, tables, planes, signer)
      else lshKeyed(queries, tables, planes, signer)
    val cands = lshKeyed(corpus, tables, planes, signer).alias("c")
      .join(broadcast(qKeys.alias("q")), Seq("table", "bucket"))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
      .distinct()
    val scored = cands
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"))), "query_id")
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Embedding-cosine near-dup pairs ≥ `threshold`: candidates from
    * any-table LSH bucket collision, scored exactly, ids deduped before
    * the embedding joins.
    *
    * Scale posture (the round-2 defect this replaces): planes per table
    * derive from the corpus size ([[planesFor]]) so bucket count grows
    * WITH the data — expected occupancy is O(1) and the bucket self-join
    * stays O(n·occupancy) instead of O(n²/2^planes). Recall lost to the
    * wider keys is recovered by multi-probing every one-bit-flipped
    * bucket on the LEFT side of the self-join only (pairs whose buckets
    * differ by ≤1 bit still collide; the right side stays single-keyed,
    * so the key blow-up is planes+1 on one side, not (planes+1)²).
    * `capBuckets` remains purely a skew guard for degenerate hot keys.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double,
      tables: Int = 8, planesPerTable: Int = 0,
      maxBucket: Int = 1000, signer: Signer = liveSigner): DataFrame = {
    val planes = if (planesPerTable > 0) planesPerTable else planesFor(emb.count())
    // pre-cap persist: the cap's counts + probe and the self-join's two
    // sides all read the cached keys instead of re-hashing the corpus
    val keyed = lshKeyed(emb, tables, planes, signer)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keys = Scale.capBuckets(keyed,
      Seq("table", "bucket"), maxBucket) // skew guard — see Scale.capBuckets
    // left side probes its exact bucket plus every 1-bit flip
    val probes = keys.select(col("vec_id"), col("table"),
      explode(array((col("bucket") +: (0 until planes).map(b =>
        col("bucket").bitwiseXOR(lit(1L << b)))): _*)).as("bucket"))
    val cands = probes.alias("a").join(keys.alias("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cands
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  // -------------------------------------------------------------------
  // IVF (inverted-file) ANN — the second scale path besides LSH: a
  // coarse k-means quantizer partitions the corpus into nlist inverted
  // lists; queries probe only the nprobe nearest lists. Candidate volume
  // is ~corpus·nprobe/nlist instead of corpus², and with nlist ~ √n the
  // per-query work stays O(√n · nprobe · dim) at any corpus size.

  /** Classic IVF sizing: nlist ≈ √n (balances quantizer cost against
    * list length), clamped to something sane. */
  def nlistFor(corpusSize: Long): Int =
    math.max(4, math.min(65536, math.round(math.sqrt(corpusSize.toDouble)).toInt))

  /** Train the coarse quantizer: a deterministic bounded sample
    * (every step-th vec_id — no RNG, so plans are reproducible) is
    * collected to the driver and run through seedless Lloyd's k-means on
    * the unit sphere (spherical k-means: assign by dot, re-mean,
    * re-normalize). The sample is FIXED-SIZE no matter the corpus — at
    * 100 TB this is still a ~4k×dim driver matrix — and the centroids
    * broadcast with the plan like any small model. Returns the row-major
    * flat of L2-normalized centroids.
    */
  def trainCentroids(corpus: DataFrame, nlist: Int, corpusSize: Long,
      sampleMax: Int = 4096, iters: Int = 8): (Array[Float], Int) = {
    val step = math.max(1L, corpusSize / sampleMax)
    val rows = corpus.filter(pmod(col("vec_id"), lit(step)) === 0)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(rows.nonEmpty, "empty corpus")
    val dim = rows.head.length
    def normalize(v: Array[Double]): Array[Double] = {
      var s = 0.0; var j = 0
      while (j < dim) { s += v(j) * v(j); j += 1 }
      val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
      val out = new Array[Double](dim)
      j = 0; while (j < dim) { out(j) = v(j) * inv; j += 1 }
      out
    }
    val unit = rows.map(r => normalize(r.map(_.toDouble)))
    val k = math.min(nlist, unit.length)
    // evenly-spaced init over the (vec_id-ordered) sample — deterministic
    var cents = Array.tabulate(k)(i => unit((i.toLong * unit.length / k).toInt))
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      unit.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var dot = 0.0; var j = 0
          while (j < dim) { dot += v(j) * cents(c)(j); j += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c) else normalize(sums(c))) // empty: keep
    }
    (cents.flatten.map(_.toFloat), dim)
  }

  /** Distributed trainer: same deterministic evenly-spaced init as
    * [[trainCentroids]] (iters=0 there returns just the init), then
    * Lloyd's iterations over the FULL corpus — assignment and partial
    * (sum, count) accumulation run per partition, and only k×dim
    * partials reach the driver per iteration (the MLlib k-means shape).
    * Use when cluster balance matters more than the training pass cost:
    * the bounded-sample trainer can misplace centroids the sample never
    * saw; this one sees every vector. Still deterministic — no RNG, and
    * the per-partition partial sums merge by index, not arrival order…
    * up to float-sum associativity in the partials, which moves
    * centroids by ulps, not lists.
    */
  def trainCentroidsDistributed(corpus: DataFrame, nlist: Int,
      corpusSize: Long, iters: Int = 8,
      sampleMax: Int = 4096): (Array[Float], Int) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (initFlat, dim) = trainCentroids(corpus, nlist, corpusSize,
      sampleMax, iters = 0)
    val k = initFlat.length / dim
    var cents: Array[Double] = initFlat.map(_.toDouble)
    val vecs = corpus.select(col("embedding")).as[Array[Float]]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 0 until iters) {
        val bc = spark.sparkContext.broadcast(cents)
        val partials = vecs.mapPartitions { it =>
          val c = bc.value
          val sums = new Array[Double](k * dim)
          val counts = new Array[Long](k)
          it.foreach { raw =>
            // unit-normalize, assign by max dot, accumulate
            var s = 0.0; var j = 0
            while (j < dim) { s += raw(j).toDouble * raw(j); j += 1 }
            val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
            var best = 0; var bestDot = Double.NegativeInfinity
            var ci = 0
            while (ci < k) {
              var dot = 0.0; j = 0
              while (j < dim) { dot += raw(j) * inv * c(ci * dim + j); j += 1 }
              if (dot > bestDot) { bestDot = dot; best = ci }
              ci += 1
            }
            j = 0
            while (j < dim) { sums(best * dim + j) += raw(j) * inv; j += 1 }
            counts(best) += 1
          }
          Iterator.single((sums, counts))
        }.collect()
        val sums = new Array[Double](k * dim)
        val counts = new Array[Long](k)
        partials.foreach { case (ps, pc) =>
          var i = 0
          while (i < sums.length) { sums(i) += ps(i); i += 1 }
          i = 0
          while (i < k) { counts(i) += pc(i); i += 1 }
        }
        val next = new Array[Double](k * dim)
        var ci = 0
        while (ci < k) {
          if (counts(ci) == 0) // empty list: keep the old centroid
            System.arraycopy(cents, ci * dim, next, ci * dim, dim)
          else {
            var s = 0.0; var j = 0
            while (j < dim) { val v = sums(ci * dim + j); s += v * v; j += 1 }
            val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
            j = 0
            while (j < dim) { next(ci * dim + j) = sums(ci * dim + j) * inv; j += 1 }
          }
          ci += 1
        }
        cents = next
        bc.unpersist()
      }
      (cents.map(_.toFloat), dim)
    } finally vecs.unpersist()
  }

  /** IVF approximate top-k: corpus rows are stored in their `replicas`
    * nearest inverted lists (replica assignment — the standard recall
    * lever for neighbors that straddle a Voronoi boundary; storage cost
    * is a known ×replicas); each query explodes to its nprobe nearest
    * lists and broadcasts. The list-id equi-join yields candidate id
    * pairs (deduped on the small ids — the embedding arrays never ride
    * through the dedup shuffle), which are then scored exactly in one
    * join back to the corpus and window top-k'd. The assignment column
    * is the natural partition/cluster key for a stored index. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 0, nprobe: Int = 8, replicas: Int = 2,
      distributedTrain: Boolean = false): DataFrame = {
    val n = corpus.count()
    val lists = if (nlist > 0) nlist else nlistFor(n)
    val (flat, dim) =
      if (distributedTrain) trainCentroidsDistributed(corpus, lists, n)
      else trainCentroids(corpus, lists, n)
    ivfTopKWith(queries, corpus, k, flat, dim, nprobe, replicas)
  }

  /** [[ivfTopK]]'s machinery with the coarse quantizer supplied by the
    * caller — assignment explode, broadcast probes, candidate-id dedup,
    * exact-cosine rerank, window top-k. Exists so the s18 oracle twin
    * runs the IDENTICAL plan under an SQL-derivable quantizer (the
    * md5-sampled corpus vectors) while ivfTopK keeps Lloyd's k-means. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
      flat: Array[Float], dim: Int, nprobe: Int = 8,
      replicas: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lists = flat.length / dim
    def nearest(c: Column, p: Int) =
      graft.functions.GraftFunctions.nearest_centroids(c, flat, dim, p)
    val assigned = corpus.select(col("vec_id"),
      explode(nearest(col("embedding"), math.min(replicas, lists))).as("list_id"))
    val probes = queries.select(col("vec_id").as("query_id"),
      explode(nearest(col("embedding"), math.min(nprobe, lists))).as("list_id"))
    val cands = assigned.join(broadcast(probes), "list_id")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val scored = cands
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"))), "query_id")
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** The SQL-derivable PQ codebook for the s19 oracle twin: the `ks`
    * smallest-md5-draw corpus vectors, each unit-normalized with
    * EXACTLY [[graft.functions.PqEval]]'s arithmetic (sequential
    * norm², multiply by a precomputed 1/√s) and float-rounded the way
    * [[trainPq]] stores centroids — every codeword component is a
    * value DuckDB re-derives via CAST(… AS REAL). Sample-as-codebook
    * is a legitimate quantizer init (no Lloyd pass); layout is
    * [[PqEncode]]'s subspace-major `[j][code][subdim]` flat. */
  def md5SamplePqCodebook(corpus: DataFrame, m: Int, ks: Int,
      salt: String = "s19"): (Array[Float], Int) = {
    val rows = corpus
      .select(col("vec_id"), col("embedding"),
        md5(concat(lit(salt + ":"), col("vec_id").cast("string"))).as("mk"))
      .orderBy(col("mk"), col("vec_id")).limit(ks)
      .collect()
    require(rows.nonEmpty, "md5SamplePqCodebook: empty corpus")
    val dim = rows.head.getSeq[Float](1).length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val ksEff = rows.length
    val codebook = new Array[Float](m * ksEff * sub)
    rows.zipWithIndex.foreach { case (r, c) =>
      val e = r.getSeq[Float](1)
      val v = new Array[Double](dim)
      var s = 0.0
      var i = 0
      while (i < dim) { val x = e(i).toDouble; v(i) = x; s += x * x; i += 1 }
      if (s > 0) {
        val inv = 1.0 / math.sqrt(s)
        i = 0
        while (i < dim) { v(i) *= inv; i += 1 }
      }
      for (j <- 0 until m; i2 <- 0 until sub)
        codebook(j * ksEff * sub + c * sub + i2) = v(j * sub + i2).toFloat
    }
    (codebook, dim)
  }

  /** The SQL-derivable coarse quantizer for the s18 IVF oracle twin:
    * the `nlist` corpus vectors with the smallest md5 draw, in draw
    * order — sample-as-centroids (a legitimate quantizer init; the
    * corpus is unit-normalized, so raw sample vectors ARE spherical
    * centroids). No Lloyd iteration → every centroid component is a
    * stored float DuckDB reads back exactly. Returns (flat, dim). */
  def md5SampleCentroids(corpus: DataFrame, nlist: Int,
      salt: String = "s18"): (Array[Float], Int) = {
    val rows = corpus
      .select(col("vec_id"), col("embedding"),
        md5(concat(lit(salt + ":"), col("vec_id").cast("string"))).as("mk"))
      .orderBy(col("mk"), col("vec_id")).limit(nlist)
      .collect()
    require(rows.nonEmpty, "md5SampleCentroids: empty corpus")
    val dim = rows.head.getSeq[Float](1).length
    (rows.flatMap(_.getSeq[Float](1)).toArray, dim)
  }

  // -------------------------------------------------------------------
  // Product quantization (PQ) — the third scale path: instead of pruning
  // candidates (LSH buckets, IVF lists), compress the vectors so an
  // EXHAUSTIVE scan is cheap. Each unit-normalized embedding becomes m
  // sub-codes (m bytes packed); query-time cosine is m table lookups per
  // row (ADC) instead of dim multiplies, cutting the scan's memory
  // traffic ~dim·4/m ×. The compressed scan ranks everything, a small
  // top-R candidate set is re-scored exactly, and top-k comes from the
  // exact scores — the classic PQ-with-re-ranking pipeline. At 100 TB
  // the codes column IS the index: it stores alongside the corpus and
  // composes with IVF lists (IVFPQ) when even the compressed scan is too
  // much.

  /** Train per-subspace codebooks: the same deterministic bounded sample
    * as [[trainCentroids]] (every step-th vec_id, ≤`sampleMax` rows),
    * unit-normalized, split into `m` subspaces; per subspace, seedless
    * Lloyd's k-means (evenly-spaced init over the vec_id-ordered sample,
    * L2 assignment, lowest-index tie-break). Returns the codebook as
    * [[PqEncode]]/[[PqLut]] expect it: subspace-major
    * `[j][code][subdim]` flat, plus the vector dim. */
  def trainPq(corpus: DataFrame, corpusSize: Long, m: Int = 8, ks: Int = 64,
      sampleMax: Int = 4096, iters: Int = 8): (Array[Float], Int) = {
    val step = math.max(1L, corpusSize / sampleMax)
    val rows = corpus.filter(pmod(col("vec_id"), lit(step)) === 0)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(rows.nonEmpty, "empty corpus")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val unit = rows.map { r =>
      var s = 0.0; var j = 0
      while (j < dim) { s += r(j).toDouble * r(j); j += 1 }
      val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
      Array.tabulate(dim)(i => r(i) * inv)
    }
    val k = math.min(ks, unit.length)
    val codebook = new Array[Float](m * k * sub)
    for (j <- 0 until m) {
      val pts = unit.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      var cents = Array.tabulate(k)(c => pts((c.toLong * pts.length / k).toInt).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Int](k)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d2 = 0.0; var i = 0
            while (i < sub) { val df = p(i) - cents(c)(i); d2 += df * df; i += 1 }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(k)(c =>
          if (counts(c) == 0) cents(c) // empty cell: keep
          else Array.tabulate(sub)(i => sums(c)(i) / counts(c)))
      }
      for (c <- 0 until k; i <- 0 until sub)
        codebook(j * k * sub + c * sub + i) = cents(c)(i).toFloat
    }
    (codebook, dim)
  }

  /** PQ approximate top-k: encode the corpus once (the stored index),
    * broadcast the queries with their precomputed ADC tables, rank every
    * row by the compressed score, keep the top `rerank·k` per query, and
    * re-score only those exactly. Output shape matches [[bruteForceTopK]].
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, ks: Int = 64, rerank: Int = 4): DataFrame = {
    val (codebook, dim) = trainPq(corpus, corpus.count(), m, ks)
    pqTopKWith(queries, corpus, k, codebook, dim, m, rerank)
  }

  /** [[pqTopK]]'s machinery with the codebook supplied by the caller —
    * encode scan, broadcast LUTs, ADC crossJoin scan, bounded-heap
    * top-R, exact rerank. Exists so the s19 oracle twin runs the
    * IDENTICAL plan under an SQL-derivable codebook
    * ([[md5SamplePqCodebook]]) while pqTopK keeps per-subspace Lloyd's. */
  def pqTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
      codebook: Array[Float], dim: Int, m: Int,
      rerank: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fns = graft.functions.GraftFunctions
    val ksEff = codebook.length / dim
    val codes = corpus.select(col("vec_id"),
      fns.pq_encode(col("embedding"), codebook, dim, m).as("codes"))
    val q = queries.select(col("vec_id").as("query_id"),
      fns.pq_lut(col("embedding"), codebook, dim, m).as("lut"))
    val approx = codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        fns.pq_adc(col("codes"), col("lut"), ksEff).as("adc"))
    // bounded-heap top-R per query (custom whole-operator plan — see
    // plans.TopKPerKey): the ADC scan's candidate pool never gets sorted
    // wholesale, and the map side pre-prunes to R rows per query before
    // the exchange
    val cands = graft.plans.TopKPerKey.topKPerKey(approx,
        Seq("query_id"), Seq(("adc", true), ("neighbor_id", false)),
        rerank * k)
      .select(col("query_id"), col("neighbor_id"))
    val scored = cands
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"))), "query_id")
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVFPQ — the billion-scale composition (FAISS's default index
    * family): the IVF coarse quantizer prunes the search to nprobe
    * inverted lists AND the rows inside each list carry PQ codes instead
    * of vectors, so the per-list scan is ADC lookups. Candidate volume
    * is ~n·nprobe·replicas/nlist rows of m-byte codes — both the prune
    * and the compression applied at once. Exact re-rank of the top
    * `rerank·k` restores true cosines.
    *
    * Both models train on the same deterministic bounded sample; the
    * assignment+codes frame is the stored index (list_id is its natural
    * partition key). */
  def ivfpqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 0, nprobe: Int = 8, replicas: Int = 2,
      m: Int = 8, ks: Int = 64, rerank: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fns = graft.functions.GraftFunctions
    val n = corpus.count()
    val lists = if (nlist > 0) nlist else nlistFor(n)
    val (flat, dim) = trainCentroids(corpus, lists, n)
    val (codebook, _) = trainPq(corpus, n, m, ks)
    val ksEff = codebook.length / dim
    def nearest(c: Column, p: Int) =
      fns.nearest_centroids(c, flat, dim, p)
    val index = corpus.select(col("vec_id"),
      explode(nearest(col("embedding"), math.min(replicas, lists))).as("list_id"),
      fns.pq_encode(col("embedding"), codebook, dim, m).as("codes"))
    val probes = queries.select(col("vec_id").as("query_id"),
      explode(nearest(col("embedding"), math.min(nprobe, lists))).as("list_id"),
      fns.pq_lut(col("embedding"), codebook, dim, m).as("lut"))
    // replicas score identically (same codes, same lut) → distinct on the
    // (query, neighbor, adc) triple collapses them
    val approx = index.join(broadcast(probes), "list_id")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        fns.pq_adc(col("codes"), col("lut"), ksEff).as("adc"))
      .distinct()
    // bounded-heap top-R per query (see plans.TopKPerKey) instead of a
    // window sort over the probed lists' full candidate pool
    val cands = graft.plans.TopKPerKey.topKPerKey(approx,
        Seq("query_id"), Seq(("adc", true), ("neighbor_id", false)),
        rerank * k)
      .select(col("query_id"), col("neighbor_id"))
    val scored = cands
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"))), "query_id")
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Plane count for an admission SCREEN — deliberately much wider than
    * [[planesFor]]'s join sizing: a join wants occupancy ~32 (candidates
    * are verified anyway), but a screen's false-positive rate is the
    * fraction of OCCUPIED buckets times the probe count, so buckets must
    * be sparse — ~log2(n)+12 bits leaves ≤ n/2^12 of bucket space
    * occupied and the whole probe fan (tables × (planes+1)) still lands
    * well under 1% accidental flags. Recall at these widths is for
    * NEAR-EXACT embeddings (re-encodes, crops — hamming ≤ 1 per table
    * across 8 tables); broader similarity belongs to
    * [[embeddingNearDups]], not an ingest screen. */
  def admissionPlanesFor(corpusSize: Long): Int =
    math.min(30, Scale.lshBitsFor(corpusSize, targetOccupancy = 1,
      minBits = 16, maxBits = 30) + 12)

  /** Embedding-stream admission index — the vector-side analog of
    * [[Dedup.admissionIndex]]: a Bloom filter over the corpus's
    * (table, bucket) sign-LSH keys, hashed with xxhash64. Returns the
    * filter AND the plane count it was built with (size-derived unless
    * pinned) — probes must use the SAME geometry. Size `expectedBuckets`
    * to the crawl's planned capacity for a growable index.
    *
    * `fpp` is the PER-DOCUMENT false-flag budget, not the per-probe
    * Bloom rate: a probe fans out tables × (planes+1) membership tests,
    * so the filter is built at fpp / fan — per-probe rates compound
    * (232 probes at 0.001 ≈ 21% of clean documents flagged; sized to
    * the fan it stays ≈ fpp). Bits/key grow only ln(fan) ≈ 2×. */
  def embeddingAdmissionIndex(corpus: DataFrame, tables: Int = 8,
      planesPerTable: Int = 0, expectedBuckets: Long = 0, fpp: Double = 0.01)
      : (org.apache.spark.util.sketch.BloomFilter, Int) = {
    val planes = if (planesPerTable > 0) planesPerTable
      else admissionPlanesFor(corpus.count())
    val keys = lshKeyed(corpus, tables, planes)
      .select(xxhash64(col("table"), col("bucket")).as("h"))
    val n = if (expectedBuckets > 0) expectedBuckets
      else math.max(1L, keys.count())
    val perProbe = fpp / (tables.toDouble * (planes + 1))
    (keys.stat.bloomFilter("h", n, perProbe), planes)
  }

  /** Fold an admitted batch into an embedding admission index —
    * distributed Bloom union exactly like [[Dedup.growAdmissionIndex]]:
    * `capacity`/`fpp`/geometry MUST equal the index's build parameters
    * for merge-compatibility (the same per-probe derate is applied). */
  def growEmbeddingAdmissionIndex(
      index: org.apache.spark.util.sketch.BloomFilter, admitted: DataFrame,
      capacity: Long, planesPerTable: Int, fpp: Double = 0.01,
      tables: Int = 8): org.apache.spark.util.sketch.BloomFilter = {
    val perProbe = fpp / (tables.toDouble * (planesPerTable + 1))
    val batch = lshKeyed(admitted, tables, planesPerTable)
      .select(xxhash64(col("table"), col("bucket")).as("h"))
      .stat.bloomFilter("h", capacity, perProbe)
    index.mergeInPlace(batch)
    index
  }

  /** Flag each arriving embedding whose sign-LSH buckets collide with
    * the admitted corpus — semantic near-dup admission at ingest, for
    * embedding streams what [[Dedup.nearDupAdmissionWith]] is for text.
    * The check is tables×(planes+1) codegen'd Bloom probes (exact bucket
    * plus every 1-bit flip — the multi-probe recall device of
    * [[embeddingNearDups]], here on the probe side only): NO join, NO
    * shuffle, NO state, so the same operator serves batch frames and
    * append-mode streams. False positives (`fpp` + genuine bucket
    * neighbors) go to a downstream exact verify; false negatives are
    * those of LSH itself, the Bloom adds none. */
  def embeddingAdmissionWith(vecs: DataFrame,
      index: org.apache.spark.util.sketch.BloomFilter,
      planesPerTable: Int, tables: Int = 8): DataFrame = {
    val fns = graft.functions.GraftFunctions
    val bc = vecs.sparkSession.sparkContext.broadcast(index)
    val probes = for {
      t <- 0 until tables
      flip <- -1 until planesPerTable
    } yield {
      val base = element_at(col("__sig"), t + 1)
      val bucket = if (flip < 0) base else base.bitwiseXOR(lit(1L << flip))
      fns.bloom_might_contain(xxhash64(lit(t), bucket), bc)
    }
    vecs
      .withColumn("__sig", fns.sign_lsh(col("embedding"), tables, planesPerTable))
      .withColumn("dup_candidate", probes.reduce(_ || _))
      .drop("__sig")
  }

  /** One-shot convenience: build the index from `corpus`, probe `vecs`. */
  def embeddingAdmission(vecs: DataFrame, corpus: DataFrame,
      tables: Int = 8, planesPerTable: Int = 0,
      expectedBuckets: Long = 0, fpp: Double = 0.01): DataFrame = {
    val (index, planes) = embeddingAdmissionIndex(corpus, tables,
      planesPerTable, expectedBuckets, fpp)
    embeddingAdmissionWith(vecs, index, planes, tables)
  }

  /** Scalar (SQ8) uniform quantization: per-dimension [min, max] train
    * pass, codes floor((v−min)/(max−min)·255) ∈ 0..255 (a constant
    * dimension codes 0). All arithmetic is engine-exact — see the s13
    * registration. `stats` (d rows) broadcasts back over one exploded
    * scan; at corpus scale this is a map + a tiny aggregation. */
  def scalarQuantize(emb: DataFrame): DataFrame = {
    val vals = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "f")))
      .select(col("vec_id"), col("dim"), col("f").cast("double").as("v"))
    // the d-row model is materialized EAGERLY (localCheckpoint — blocks
    // are freed by the ContextCleaner once unreachable, unlike a
    // persist() nothing ever releases), so the coding pass re-scans the
    // corpus once instead of caching the d×-expanded explode — at corpus
    // scale that cache is d× the data; in-session it leaks (r12 ADVICE)
    val stats = vals.groupBy(col("dim"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .localCheckpoint(true)
    vals.join(broadcast(stats), Seq("dim"))
      .select(col("vec_id"), col("dim"),
        when(col("mx") === col("mn"), lit(0))
          .otherwise(floor((col("v") - col("mn")) / (col("mx") - col("mn"))
            * 255).cast("int"))
          .as("code"))
  }

  /** Cluster-balanced sampling — the DoReMi/temperature-flattening
    * workflow over SEMANTIC clusters instead of named sources (t15/t30
    * balance by source label; this balances by what documents are
    * ABOUT): cluster the embedding corpus with the IVF coarse
    * quantizer, flatten cluster mass with a `temperature` exponent
    * (rate_c ∝ n_c^(τ−1), τ<1 down-weights dominant topics), normalize
    * so the most up-weighted cluster keeps everything (one pass can
    * only downsample — the t30 rule), and accept each vector by the
    * deterministic md5-bucket test so re-runs keep the identical set.
    *
    * Plan: centroids ride the plan (broadcast model), assignment is the
    * codegen'd row-local argmax, cluster counts are one tiny
    * aggregation broadcast back — the corpus never shuffles. */
  def clusterMixture(emb: DataFrame, temperature: Double = 0.5,
      nClusters: Int = 0): DataFrame = {
    require(temperature > 0 && temperature <= 1, s"temperature $temperature")
    val n = emb.count()
    val k = if (nClusters > 0) nClusters else nlistFor(n)
    val (cents, dim) = trainCentroids(emb, k, n)
    clusterMixtureWith(emb, cents, dim,
      rate = c => pow(c.cast("double"), lit(temperature - 1)))
  }

  /** [[clusterMixture]]'s machinery with the cluster model and the
    * flattening-rate form supplied by the caller — assignment argmax,
    * the k-row rate table, the md5-bucket accept. Exists so the s21
    * oracle twin runs the IDENTICAL plan under [[md5SampleCentroids]]
    * and an engine-exact rate (`1/√n` — IEEE sqrt is correctly rounded
    * everywhere, `pow(n, −0.5)` is not), while clusterMixture keeps
    * k-means + the general temperature exponent. */
  def clusterMixtureWith(emb: DataFrame, cents: Array[Float], dim: Int,
      rate: Column => Column): DataFrame = {
    val fns = graft.functions.GraftFunctions
    val assigned = emb.select(col("vec_id"),
        element_at(fns.nearest_centroids(col("embedding"), cents, dim, 1), 1)
          .as("cluster"))
    val counts = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n_c"))
    // rate_c ∝ n_c^(τ-1), normalized by the max so the most up-weighted
    // cluster keeps rate 1; Q24-quantized threshold, md5-bucket accept
    // (the t30 determinism discipline)
    val rated = counts
      .withColumn("raw_rate", rate(col("n_c")))
      .withColumn("rate", col("raw_rate") /
        max(col("raw_rate")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .select(col("cluster"), col("n_c"), col("rate"),
        floor(col("rate") * lit(16777216.0)).cast("long").as("threshold"))
      // k-row rate table, eager (auto-GC'd) — the accept pass then
      // recomputes the row-local argmax instead of caching a
      // corpus-sized assignment frame that nothing unpersists
      .localCheckpoint(true)
    assigned.join(broadcast(rated), Seq("cluster"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit("cmix:"), col("vec_id").cast("string"))),
          1, 6), 16, 10).cast("long"))
      .select(col("vec_id"), col("cluster"), col("n_c"), col("rate"),
        (col("bucket") < col("threshold")).as("kept"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv
    * 2303.09540): cluster the corpus with the IVF coarse quantizer
    * (spherical k-means, k ≈ √n), then within each cluster flag every
    * vector whose cosine to a LOWER-id cluster-mate reaches `threshold`
    * — the min-id survivor rule exact dedup (d01) uses, so re-runs are
    * idempotent. Near-duplicate *meaning* (paraphrases, re-encodes,
    * crops) collapses where exact and shingle dedup see distinct bytes.
    *
    * Scale: the only quadratic work is per-cluster — k ≈ √n keeps
    * expected cluster size √n, so candidate pairs are ~n·√n/2 WITHIN
    * partitions of one hash exchange on cluster id (centroids ride the
    * plan as a broadcast model, assignment is a codegen'd row-local
    * argmax). `maxCluster` is the usual degenerate-bucket guard
    * ([[Scale.capBuckets]]): a cluster that swallowed a mode of the
    * embedding distribution would re-quadratify the join; its rows are
    * exempted from dedup rather than concentrated on one task.
    *
    * Returns (vec_id, cluster, is_dup) for every input vector.
    */
  def semanticDedup(emb: DataFrame, threshold: Double, nClusters: Int = 0,
      maxCluster: Int = 10000): DataFrame = {
    val n = emb.count()
    val k = if (nClusters > 0) nClusters else nlistFor(n)
    val (cents, dim) = trainCentroids(emb, k, n)
    semanticDedupWith(emb, threshold, cents, dim, maxCluster)
  }

  /** [[semanticDedup]]'s machinery with the cluster model supplied by
    * the caller — assignment argmax, capBuckets guard, in-cluster
    * id-ordered pair join, threshold flag. Exists so the s20 oracle
    * twin runs the IDENTICAL plan under [[md5SampleCentroids]] while
    * semanticDedup keeps spherical k-means. */
  def semanticDedupWith(emb: DataFrame, threshold: Double,
      cents: Array[Float], dim: Int,
      maxCluster: Int = 10000): DataFrame = {
    val fns = graft.functions.GraftFunctions
    // read by the cap (counts + probe), both self-join sides, and the
    // final flag join — one cached materialization of (id, cluster, vec)
    val assigned = emb.select(col("vec_id"), col("embedding"),
        element_at(fns.nearest_centroids(col("embedding"), cents, dim, 1), 1)
          .as("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capped = Scale.capBuckets(assigned, Seq("cluster"), maxCluster)
    val dropped = capped.alias("a").join(capped.alias("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosine(col("a.embedding"), col("b.embedding")) >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cluster"))
      .join(dropped.withColumn("is_dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }

  /** Exact second-moment table for PCA — the distributed half of
    * covariance estimation, in Q24 fixed point so it is ENGINE-EXACT:
    * each component quantizes to `floor(v·2^24)` (float32 → double is
    * lossless, the scale and floor are exact), and the output per
    * dimension pair (i ≤ j) is (n, Σqᵢ, Σqⱼ, Σqᵢqⱼ) — integers an
    * independent engine reproduces bit-for-bit, unlike a float
    * covariance whose value depends on summation order.
    *
    * Scale shape: the classic one-pass distributed moment accumulation —
    * each task folds its rows into ONE d×d partial (Long accumulators,
    * flushed into BigInt every 4096 rows so products near 2^48 can never
    * overflow), and only those d²-sized partials cross the exchange; the
    * final reduce sums DECIMAL(38,0) (order-free, overflow-proof at any
    * corpus size). Nothing vector-sized shuffles. */
  def pcaMoments(emb: DataFrame, qBits: Int = 24): DataFrame = {
    require(qBits >= 1 && qBits <= 28, s"qBits $qBits")
    val spark = emb.sparkSession
    import spark.implicits._
    val scale = (1L << qBits).toDouble
    // largest |q| whose pairwise products sum exactly in a Long across
    // one 4096-row flush window: 4096·qMax² ≤ Long.Max
    val qMax = math.sqrt(Long.MaxValue.toDouble / 4096).toLong - 1
    val partials = emb.select(col("embedding")).as[Array[Float]]
      .mapPartitions { it =>
        var d = -1
        var n = 0L
        var flushed = 0
        var s: Array[Long] = null
        var p: Array[Long] = null // packed upper triangle Σ qi·qj
        var sBig: Array[BigInt] = null
        var pBig: Array[BigInt] = null
        def flush(): Unit = {
          var t = 0
          while (t < s.length) { sBig(t) += s(t); s(t) = 0L; t += 1 }
          t = 0
          while (t < p.length) { pBig(t) += p(t); p(t) = 0L; t += 1 }
          flushed = 0
        }
        it.foreach { v =>
          if (d < 0) {
            d = v.length
            require(d >= 1 && d <= 256, s"pcaMoments: dim $d outside 1..256")
            s = new Array[Long](d)
            p = new Array[Long](d * (d + 1) / 2)
            sBig = Array.fill(d)(BigInt(0))
            pBig = Array.fill(d * (d + 1) / 2)(BigInt(0))
          }
          require(v.length == d, s"pcaMoments: ragged dim ${v.length} vs $d")
          val q = new Array[Long](d)
          var i = 0
          while (i < d) {
            q(i) = math.floor(v(i).toDouble * scale).toLong
            // the Long pair accumulator flushes to BigInt every 4096
            // rows, so |qi·qj| must stay under Long.Max/4096 — LOUD
            // bound, not silent covariance corruption (≈ |v| ≤ 2.8 at
            // the default qBits=24)
            require(math.abs(q(i)) <= qMax,
              s"pcaMoments: |component| ${v(i)} exceeds the exact-" +
                s"accumulation bound ${qMax / scale} at qBits=$qBits")
            i += 1
          }
          var idx = 0
          i = 0
          while (i < d) {
            s(i) += q(i)
            var j = i
            while (j < d) {
              p(idx) += q(i) * q(j)
              idx += 1
              j += 1
            }
            i += 1
          }
          n += 1
          flushed += 1
          if (flushed >= 4096) flush()
        }
        if (d < 0) Iterator.empty
        else {
          flush()
          var idx = 0
          val rows = Seq.newBuilder[(Int, Int, Long, String, String, String)]
          var i = 0
          while (i < d) {
            var j = i
            while (j < d) {
              rows += ((i, j, n, sBig(i).toString, sBig(j).toString,
                pBig(idx).toString))
              idx += 1
              j += 1
            }
            i += 1
          }
          rows.result().iterator
        }
      }
      .toDF("i", "j", "pn", "psi", "psj", "psij")
    partials
      .groupBy(col("i"), col("j"))
      .agg(
        sum(col("pn")).as("n"),
        sum(col("psi").cast("decimal(38,0)")).as("s_i"),
        sum(col("psj").cast("decimal(38,0)")).as("s_j"),
        sum(col("psij").cast("decimal(38,0)")).as("s_ij"))
  }

  /** PCA training from the exact moment table: build the d×d sample
    * covariance in doubles, diagonalize with cyclic Jacobi rotations
    * (deterministic sweep order → bit-identical runs), order eigenpairs
    * by eigenvalue descending, and fix each component's sign so its
    * largest-magnitude entry is positive (eigenvectors are defined up
    * to sign; an undefined sign would make downstream encodes
    * run-dependent). The moment table is d²-sized — driver-side by
    * construction, like the IVF/PQ trainers. Returns (components k×d,
    * all eigenvalues descending). */
  def pcaTrain(emb: DataFrame, k: Int, qBits: Int = 24): (Seq[Seq[Double]], Seq[Double]) = {
    val rows = pcaMoments(emb, qBits).collect()
    require(rows.nonEmpty, "pcaTrain: empty corpus")
    val d = rows.map(_.getInt(1)).max + 1
    require(k >= 1 && k <= d, s"pcaTrain: k $k outside 1..$d")
    val n = rows.head.getLong(2)
    val scale = (1L << qBits).toDouble
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val si = r.getDecimal(3).doubleValue() / scale
      val sj = r.getDecimal(4).doubleValue() / scale
      val sij = r.getDecimal(5).doubleValue() / (scale * scale)
      val c = sij / n - (si / n) * (sj / n)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => (-vals(i), i))
    val comps = order.take(k).map { ei =>
      val v = Array.tabulate(d)(r => vecs(r)(ei))
      // deterministic sign: largest-|entry| positive (first on ties)
      var best = 0
      var m = math.abs(v(0))
      var r = 1
      while (r < d) {
        if (math.abs(v(r)) > m) { m = math.abs(v(r)); best = r }
        r += 1
      }
      (if (v(best) < 0) v.map(x => -x) else v).toSeq
    }
    (comps, order.map(vals(_)))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: sweep the
    * upper triangle in fixed (p, q) order, rotate away each off-diagonal
    * element, until the off-diagonal mass is numerically zero. O(d³) per
    * sweep on a tokenizer-sized matrix — driver arithmetic, bounded and
    * deterministic. Returns (eigenvalues, eigenvector COLUMNS). */
  private def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > 1e-22) {
      off = 0.0
      for (p <- 0 until d; q <- (p + 1) until d) off += a(p)(q) * a(p)(q)
      if (off > 1e-22) {
        for (p <- 0 until d; q <- (p + 1) until d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case tt => tt
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            for (r <- 0 until d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
            }
            for (r <- 0 until d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
            }
            for (r <- 0 until d) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
            }
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Project an embedding frame onto trained components — the encode
    * half: one codegen'd row-local projection
    * ([[graft.functions.PcaProject]], matrix as plan constants), no
    * shuffle, no state. The reduced vectors feed the same ANN family
    * (s01–s06) at k/d of the scan and memory cost. */
  def pcaProjectFrame(emb: DataFrame, components: Seq[Seq[Double]]): DataFrame =
    emb.withColumn("reduced",
      graft.functions.GraftFunctions.pca_project(col("embedding"), components))

  /** Parametric-OPQ rotation (Ge et al. 2013 §4: PCA + eigenvalue
    * allocation) — the preprocessing that makes product quantization
    * work on anisotropic embeddings: plain PQ splits RAW coordinates
    * into subspaces, so correlated/heavy dimensions pile into one
    * subspace and its k centroids drown while the others quantize
    * noise. The fix: rotate to principal axes, then deal dimensions to
    * the `m` subspaces GREEDILY BALANCING the per-subspace eigenvalue
    * log-product (variance product ≈ quantization difficulty). Returns
    * the d×d rotation with each subspace's dimensions contiguous —
    * feed [[pcaProjectFrame]] then [[trainPq]]/[[pqTopK]] unchanged.
    * Deterministic: sorted eigenpairs, ties to the lowest bucket index. */
  def opqRotation(emb: DataFrame, m: Int): Seq[Seq[Double]] = {
    val d = emb.select(size(col("embedding"))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m $m")
    val sub = d / m
    val (comps, eigvals) = pcaTrain(emb, k = d)
    val logs = eigvals.map(v => math.log(math.max(v, 1e-12)))
    // LPT greedy needs NON-NEGATIVE weights or "least loaded" inverts
    // (eigenvalues < 1 have negative logs and the heaviest bucket looks
    // emptiest); shift by the minimum — every bucket ends with exactly
    // `sub` dims, so a constant shift cancels out of the balance
    val shift = logs.min
    val load = new Array[Double](m)
    val used = new Array[Int](m)
    val buckets = Array.fill(m)(Seq.newBuilder[Int])
    // eigvals arrive descending: place each principal dim into the
    // open subspace with the smallest shifted variance log-product
    logs.indices.foreach { i =>
      val j = (0 until m).filter(used(_) < sub)
        .minBy(j => (load(j), j))
      buckets(j) += i
      load(j) += logs(i) - shift
      used(j) += 1
    }
    buckets.toSeq.flatMap(_.result().map(comps(_)))
  }

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // Exact cosine top-10 for a deterministic query set (vec_id < 5),
    // DuckDB-oracle-gated with identical double arithmetic.
    ("s01_cosine_topk", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      bruteForceTopK(emb.filter(col("vec_id") < 5), emb, 10)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_sum(list_transform(list_zip(q.embedding, c.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        FROM embeddings c, q WHERE q.vec_id <> c.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    // LSH-bucketed ANN over the full corpus for 20 queries — the scale
    // path (rows-only; recall vs brute force asserted in SimilaritySpec).
    ("s02_ann_lsh", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      lshTopK(emb.filter(col("vec_id") < 20), emb, 10)
        .orderBy(col("query_id"), col("rank"))
    }, None),

    // s02's ORACLE TWIN (the d14/d15 hash-family treatment applied to
    // the ANN stack): the IDENTICAL [[lshTopK]] machinery — multi-probe
    // OR-amplified bucket keys, the broadcast bucket join, candidate-id
    // dedup before the scoring joins, exact-cosine rerank, window top-k
    // — under the md5-derived INTEGER hyperplane family
    // ([[md5Signer]] / [[graft.functions.IntSignLsh]]): DuckDB replays
    // hyperplane derivation, Q24 quantization, the exact integer dots,
    // sign bits, bucket packing, every 1-bit probe flip, and the same
    // double-cosine rerank s01 already pins. s02 keeps the native
    // splitmix-double family (float dots are not SQL-derivable —
    // adjudicated in COVERAGE.md). Geometry pinned (8 tables × 6
    // planes) so the oracle is SF-static.
    ("s16_ann_lsh_md5", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      lshTopK(emb.filter(col("vec_id") < 20), emb, 10,
          tables = 8, planesPerTable = 6, multiProbe = true,
          signer = md5Signer)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH qv AS (
        SELECT vec_id, j.range AS j,
          CAST(floor(CAST(embedding[CAST(j.range AS INTEGER) + 1] AS DOUBLE)
            * 16777216) AS BIGINT) AS qj
        FROM embeddings CROSS JOIN range(64) j),
      hp AS (
        SELECT t.range AS t, p.range AS p, j.range AS j,
          (CAST(concat('0x', substr(md5('s16:' || CAST(t.range AS VARCHAR)
            || ':' || CAST(p.range AS VARCHAR) || ':'
            || CAST(j.range AS VARCHAR)), 1, 15)) AS BIGINT) % 31) - 15 AS h
        FROM range(8) t CROSS JOIN range(6) p CROSS JOIN range(64) j),
      dots AS (
        SELECT v.vec_id, hp.t, hp.p, sum(v.qj * hp.h) AS dot
        FROM qv v JOIN hp ON hp.j = v.j
        GROUP BY v.vec_id, hp.t, hp.p),
      keys AS (
        SELECT vec_id, t,
          CAST(sum(CASE WHEN dot >= 0
            THEN 1::BIGINT << CAST(p AS INTEGER) ELSE 0 END) AS BIGINT)
            AS bucket
        FROM dots GROUP BY vec_id, t),
      probes AS (
        SELECT vec_id, t, bucket FROM keys WHERE vec_id < 20
        UNION ALL
        SELECT k.vec_id, k.t,
          xor(k.bucket, 1::BIGINT << CAST(b.range AS INTEGER)) AS bucket
        FROM keys k CROSS JOIN range(6) b WHERE k.vec_id < 20),
      cands AS (
        SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM probes p JOIN keys c ON c.t = p.t AND c.bucket = p.bucket
        WHERE p.vec_id <> c.vec_id),
      scored AS (
        SELECT cd.query_id, cd.neighbor_id,
          list_sum(list_transform(list_zip(qe.embedding, ce.embedding),
            pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(qe.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(ce.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        FROM cands cd
        JOIN embeddings qe ON qe.vec_id = cd.query_id
        JOIN embeddings ce ON ce.vec_id = cd.neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    // Embedding-cosine near-dup pairs above a threshold, candidates from
    // any-table LSH collision (rows-only). Candidate ids dedup first;
    // embeddings join back once for scoring.
    ("s03_embedding_neardup", (s: SparkSession, d: String) =>
      embeddingNearDups(Tables.embeddings(s, d), threshold = 0.3)
        .orderBy(col("vec_a"), col("vec_b")), None),

    // s03's ORACLE TWIN — the PAIRS half of the ANN stack under the md5
    // hyperplane family (s16 covers the top-k half): the IDENTICAL
    // [[embeddingNearDups]] machinery — persisted keys, the
    // [[Scale.capBuckets]] skew guard, left-side-only multi-probe, the
    // id-ordered bucket self-join, candidate dedup before the scoring
    // joins, exact-cosine threshold — with only the signature family
    // swapped. DuckDB replays the cap (HAVING > maxBucket anti-join,
    // the d14 pattern), every probe flip, and the rerank.
    ("s17_embedding_neardup_md5", (s: SparkSession, d: String) =>
      embeddingNearDups(Tables.embeddings(s, d), threshold = 0.3,
          tables = 8, planesPerTable = 6, signer = md5Signer)
        .orderBy(col("vec_a"), col("vec_b")),
    Some("""WITH qv AS (
        SELECT vec_id, j.range AS j,
          CAST(floor(CAST(embedding[CAST(j.range AS INTEGER) + 1] AS DOUBLE)
            * 16777216) AS BIGINT) AS qj
        FROM embeddings CROSS JOIN range(64) j),
      hp AS (
        SELECT t.range AS t, p.range AS p, j.range AS j,
          (CAST(concat('0x', substr(md5('s16:' || CAST(t.range AS VARCHAR)
            || ':' || CAST(p.range AS VARCHAR) || ':'
            || CAST(j.range AS VARCHAR)), 1, 15)) AS BIGINT) % 31) - 15 AS h
        FROM range(8) t CROSS JOIN range(6) p CROSS JOIN range(64) j),
      dots AS (
        SELECT v.vec_id, hp.t, hp.p, sum(v.qj * hp.h) AS dot
        FROM qv v JOIN hp ON hp.j = v.j
        GROUP BY v.vec_id, hp.t, hp.p),
      keys AS (
        SELECT vec_id, t,
          CAST(sum(CASE WHEN dot >= 0
            THEN 1::BIGINT << CAST(p AS INTEGER) ELSE 0 END) AS BIGINT)
            AS bucket
        FROM dots GROUP BY vec_id, t),
      hot AS (
        SELECT t, bucket FROM keys GROUP BY t, bucket
        HAVING count(*) > 1000),
      capped AS (
        SELECT k.vec_id, k.t, k.bucket FROM keys k
        LEFT JOIN hot h ON h.t = k.t AND h.bucket = k.bucket
        WHERE h.t IS NULL),
      probes AS (
        SELECT vec_id, t, bucket FROM capped
        UNION ALL
        SELECT c.vec_id, c.t,
          xor(c.bucket, 1::BIGINT << CAST(b.range AS INTEGER)) AS bucket
        FROM capped c CROSS JOIN range(6) b),
      pairs AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM probes a JOIN capped b
          ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      scored AS (
        SELECT p.vec_a, p.vec_b,
          list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
            pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(ea.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(eb.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        FROM pairs p
        JOIN embeddings ea ON ea.vec_id = p.vec_a
        JOIN embeddings eb ON eb.vec_id = p.vec_b)
      SELECT vec_a, vec_b, cos FROM scored
      WHERE cos >= 0.3 ORDER BY vec_a, vec_b""")),

    // IVF-bucketed ANN for the same 20 queries — the inverted-list scale
    // path (rows-only; recall vs brute force asserted in LlmOpsSpec).
    ("s04_ann_ivf", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      ivfTopK(emb.filter(col("vec_id") < 20), emb, 10)
        .orderBy(col("query_id"), col("rank"))
    }, None),

    // s04's ORACLE TWIN — the IVF candidate machinery under an
    // SQL-derivable quantizer (completing the ANN twin set: s16 LSH
    // top-k, s17 LSH pairs, s18 IVF lists): the IDENTICAL
    // [[ivfTopKWith]] plan — replica assignment explode, broadcast
    // probes, candidate-id dedup, exact-cosine rerank, window top-k —
    // with centroids = the 16 smallest-md5-draw corpus vectors
    // ([[md5SampleCentroids]]; the corpus is unit-normalized, so raw
    // sample vectors are spherical centroids and the stored floats
    // replay exactly). DuckDB recomputes every assignment dot (the s01
    // sequential-double form, ties to the lower centroid index — the
    // native expression's insertion order), both probe fans, and the
    // rerank. s04 keeps Lloyd's k-means (float-iterative, adjudicated).
    ("s18_ann_ivf_md5", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val (flat, dim) = md5SampleCentroids(emb, nlist = 16)
      ivfTopKWith(emb.filter(col("vec_id") < 20), emb, 10,
          flat, dim, nprobe = 4, replicas = 2)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH cents AS (
        SELECT cidx, embedding AS ce FROM (
          SELECT CAST(row_number() OVER (
              ORDER BY md5('s18:' || CAST(vec_id AS VARCHAR)), vec_id) - 1
            AS INTEGER) AS cidx, embedding
          FROM embeddings) z
        WHERE cidx < 16),
      dots AS (
        SELECT e.vec_id, c.cidx,
          list_sum(list_transform(list_zip(e.embedding, c.ce),
            pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) AS dot
        FROM embeddings e CROSS JOIN cents c),
      ranked_dots AS (
        SELECT vec_id, cidx,
          row_number() OVER (PARTITION BY vec_id
            ORDER BY dot DESC, cidx ASC) AS rn
        FROM dots),
      asg AS (
        SELECT vec_id, cidx AS list_id FROM ranked_dots WHERE rn <= 2),
      probes AS (
        SELECT vec_id AS query_id, cidx AS list_id
        FROM ranked_dots WHERE vec_id < 20 AND rn <= 4),
      cands AS (
        SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
        FROM asg a JOIN probes p ON p.list_id = a.list_id
        WHERE p.query_id <> a.vec_id),
      scored AS (
        SELECT cd.query_id, cd.neighbor_id,
          list_sum(list_transform(list_zip(qe.embedding, ce.embedding),
            pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(qe.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(ce.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        FROM cands cd
        JOIN embeddings qe ON qe.vec_id = cd.query_id
        JOIN embeddings ce ON ce.vec_id = cd.neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    // PQ compressed-scan ANN for the same 20 queries — the memory-
    // bandwidth scale path (rows-only; recall vs brute force asserted in
    // LlmOpsSpec).
    ("s05_ann_pq", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      pqTopK(emb.filter(col("vec_id") < 20), emb, 10)
        .orderBy(col("query_id"), col("rank"))
    }, None),

    // s05's ORACLE TWIN — the PQ COMPRESSION machinery under an
    // SQL-derivable codebook (the last ANN leg: s16/s17 LSH, s18 IVF
    // lists, s19 compressed-scan codes): the IDENTICAL [[pqTopKWith]]
    // plan — PqEncode scan, broadcast PqLut tables, the ADC
    // crossJoin scan, bounded-heap top-R, exact-cosine rerank — with
    // the codebook = the 32 smallest-md5-draw corpus vectors
    // ([[md5SamplePqCodebook]]). Every number replays: normalization is
    // PqEval's exact op order (×(1/√s), NOT /√s), codewords are
    // CAST-to-REAL float roundings, per-subspace argmin d2 ties to the
    // lower code, the ADC sum is an ordered 8-term list_sum, top-R by
    // (adc DESC, id ASC), rerank is s01's cosine. s05 keeps
    // per-subspace Lloyd's (float-iterative, adjudicated).
    ("s19_ann_pq_md5", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val (codebook, dim) = md5SamplePqCodebook(emb, m = 8, ks = 32)
      pqTopKWith(emb.filter(col("vec_id") < 20), emb, 10,
          codebook, dim, m = 8, rerank = 4)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH nrm AS MATERIALIZED (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE) *
            (1.0 / sqrt(list_sum(list_transform(embedding,
              y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))) AS vn
        FROM embeddings),
      samp AS (
        SELECT CAST(row_number() OVER (
            ORDER BY md5('s19:' || CAST(vec_id AS VARCHAR)), vec_id) - 1
          AS INTEGER) AS c, vec_id
        FROM embeddings),
      cb AS MATERIALIZED (
        SELECT s2.c,
          list_transform(n.vn, x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS cw
        FROM samp s2 JOIN nrm n ON n.vec_id = s2.vec_id
        WHERE s2.c < 32),
      enc AS MATERIALIZED (
        SELECT n.vec_id, CAST(j.range AS INTEGER) AS j, b.c,
          list_sum(list_transform(range(0, 8), i ->
            (n.vn[CAST(j.range * 8 + i AS INTEGER) + 1]
              - b.cw[CAST(j.range * 8 + i AS INTEGER) + 1])
            * (n.vn[CAST(j.range * 8 + i AS INTEGER) + 1]
              - b.cw[CAST(j.range * 8 + i AS INTEGER) + 1]))) AS d2
        FROM nrm n CROSS JOIN range(8) j CROSS JOIN cb b),
      codes AS MATERIALIZED (
        SELECT vec_id, j, c AS code FROM (
          SELECT vec_id, j, c,
            row_number() OVER (PARTITION BY vec_id, j
              ORDER BY d2 ASC, c ASC) AS rn
          FROM enc) z WHERE rn = 1),
      lutq AS MATERIALIZED (
        SELECT n.vec_id AS query_id, CAST(j.range AS INTEGER) AS j, b.c,
          list_sum(list_transform(range(0, 8), i ->
            n.vn[CAST(j.range * 8 + i AS INTEGER) + 1]
            * b.cw[CAST(j.range * 8 + i AS INTEGER) + 1])) AS dot
        FROM nrm n CROSS JOIN range(8) j CROSS JOIN cb b
        WHERE n.vec_id < 20),
      adcs AS MATERIALIZED (
        SELECT l.query_id, cd.vec_id AS neighbor_id,
          list_sum(list(l.dot ORDER BY l.j)) AS adc
        FROM codes cd JOIN lutq l ON l.j = cd.j AND l.c = cd.code
        WHERE l.query_id <> cd.vec_id
        GROUP BY l.query_id, cd.vec_id),
      cands AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY adc DESC, neighbor_id ASC) AS rn
          FROM adcs) z WHERE rn <= 40),
      scored AS (
        SELECT cd.query_id, cd.neighbor_id,
          list_sum(list_transform(list_zip(qe.embedding, ce.embedding),
            pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(qe.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(ce.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        FROM cands cd
        JOIN embeddings qe ON qe.vec_id = cd.query_id
        JOIN embeddings ce ON ce.vec_id = cd.neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    // IVFPQ — list pruning × code compression composed (rows-only;
    // recall vs brute force asserted in LlmOpsSpec).
    ("s06_ann_ivfpq", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      ivfpqTopK(emb.filter(col("vec_id") < 20), emb, 10)
        .orderBy(col("query_id"), col("rank"))
    }, None),

    // Index deletion lifecycle: build the persistent IVFPQ index once,
    // tombstone every 17th vector, query through the loaded (masked)
    // index — deleted vectors must never surface, including replica
    // rows across lists. Rows-only; tombstone masking, vacuum
    // physical-drop parity, and checkpoint discipline are spec-gated
    // in LlmOpsSpec.
    ("s12_ann_delete", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val dir = IxScratch.cached(
          "s12:" + IxScratch.fingerprint(d, "embeddings.parquet"),
          "graft_s12_ix") { p =>
        AnnIndex.build(emb, p)
        AnnIndex.delete(
          emb.filter(col("vec_id") % 17 === 0).select(col("vec_id")), p)
      }
      AnnIndex.topK(AnnIndex.load(s, dir),
          emb.filter(col("vec_id") < 5 && col("vec_id") % 17 =!= 0), emb, 10)
        .orderBy(col("query_id"), col("rank"))
    }, None),

    // s12's ORACLE TWIN — the PERSISTENT index lifecycle under the
    // oracle: AnnIndex.build with the md5-sample models (the s18
    // centroid family + the s19 codebook family, reused salts so the
    // oracle reuses those exact derivations), tombstone every 17th
    // vector via AnnIndex.delete, then serve through AnnIndex.load +
    // topK — store, masked load, IVFPQ probe (replica assignment,
    // nprobe lists, ADC, top-R, rerank) ALL hash-replayed. DuckDB
    // recomputes the index content (assignments + codes minus
    // tombstones), both probe fans, the ordered ADC sums, and the
    // rerank. s12 keeps the trained float models (adjudicated); the
    // tombstone MACHINERY (physical vacuum parity, checkpoint
    // discipline) stays spec-gated in LlmOpsSpec.
    ("s22_ann_index_md5", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val dir = IxScratch.cached(
          "s22:" + IxScratch.fingerprint(d, "embeddings.parquet"),
          "graft_s22_ix") { p =>
        val (cents, _) = md5SampleCentroids(emb, nlist = 16, salt = "s18")
        val (codebook, _) = md5SamplePqCodebook(emb, m = 8, ks = 32,
          salt = "s19")
        AnnIndex.build(emb, p, nlist = 16, replicas = 2, m = 8, ks = 32,
          models = Some((cents, codebook)))
        AnnIndex.delete(
          emb.filter(col("vec_id") % 17 === 0).select(col("vec_id")), p)
      }
      AnnIndex.topK(AnnIndex.load(s, dir),
          emb.filter(col("vec_id") < 20 && col("vec_id") % 17 =!= 0),
          emb, 10, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH cents AS (
        SELECT cidx, embedding AS ce FROM (
          SELECT CAST(row_number() OVER (
              ORDER BY md5('s18:' || CAST(vec_id AS VARCHAR)), vec_id) - 1
            AS INTEGER) AS cidx, embedding
          FROM embeddings) z
        WHERE cidx < 16),
      cdots AS (
        SELECT e.vec_id, c.cidx,
          list_sum(list_transform(list_zip(e.embedding, c.ce),
            pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) AS dot
        FROM embeddings e CROSS JOIN cents c),
      ranked_dots AS (
        SELECT vec_id, cidx,
          row_number() OVER (PARTITION BY vec_id
            ORDER BY dot DESC, cidx ASC) AS rn
        FROM cdots),
      nrm AS MATERIALIZED (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE) *
            (1.0 / sqrt(list_sum(list_transform(embedding,
              y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))) AS vn
        FROM embeddings),
      samp AS (
        SELECT CAST(row_number() OVER (
            ORDER BY md5('s19:' || CAST(vec_id AS VARCHAR)), vec_id) - 1
          AS INTEGER) AS c, vec_id
        FROM embeddings),
      cb AS MATERIALIZED (
        SELECT s2.c,
          list_transform(n.vn, x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS cw
        FROM samp s2 JOIN nrm n ON n.vec_id = s2.vec_id
        WHERE s2.c < 32),
      enc AS MATERIALIZED (
        SELECT n.vec_id, CAST(j.range AS INTEGER) AS j, b.c,
          list_sum(list_transform(range(0, 8), i ->
            (n.vn[CAST(j.range * 8 + i AS INTEGER) + 1]
              - b.cw[CAST(j.range * 8 + i AS INTEGER) + 1])
            * (n.vn[CAST(j.range * 8 + i AS INTEGER) + 1]
              - b.cw[CAST(j.range * 8 + i AS INTEGER) + 1]))) AS d2
        FROM nrm n CROSS JOIN range(8) j CROSS JOIN cb b),
      codes AS MATERIALIZED (
        SELECT vec_id, j, c AS code FROM (
          SELECT vec_id, j, c,
            row_number() OVER (PARTITION BY vec_id, j
              ORDER BY d2 ASC, c ASC) AS rn
          FROM enc) z WHERE rn = 1),
      ix AS (
        SELECT vec_id, cidx AS list_id FROM ranked_dots
        WHERE rn <= 2 AND vec_id % 17 <> 0),
      probes AS (
        SELECT vec_id AS query_id, cidx AS list_id
        FROM ranked_dots
        WHERE vec_id < 20 AND vec_id % 17 <> 0 AND rn <= 4),
      pairs AS (
        SELECT DISTINCT p.query_id, i.vec_id AS neighbor_id
        FROM ix i JOIN probes p ON p.list_id = i.list_id
        WHERE p.query_id <> i.vec_id),
      lutq AS MATERIALIZED (
        SELECT n.vec_id AS query_id, CAST(j.range AS INTEGER) AS j, b.c,
          list_sum(list_transform(range(0, 8), i ->
            n.vn[CAST(j.range * 8 + i AS INTEGER) + 1]
            * b.cw[CAST(j.range * 8 + i AS INTEGER) + 1])) AS dot
        FROM nrm n CROSS JOIN range(8) j CROSS JOIN cb b
        WHERE n.vec_id < 20 AND n.vec_id % 17 <> 0),
      adcs AS (
        SELECT pr2.query_id, pr2.neighbor_id,
          list_sum(list(l.dot ORDER BY l.j)) AS adc
        FROM pairs pr2
        JOIN codes cd ON cd.vec_id = pr2.neighbor_id
        JOIN lutq l ON l.query_id = pr2.query_id
          AND l.j = cd.j AND l.c = cd.code
        GROUP BY pr2.query_id, pr2.neighbor_id),
      cands AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY adc DESC, neighbor_id ASC) AS rn
          FROM adcs) z WHERE rn <= 40),
      scored AS (
        SELECT cd.query_id, cd.neighbor_id,
          list_sum(list_transform(list_zip(qe.embedding, ce.embedding),
            pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(qe.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(ce.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        FROM cands cd
        JOIN embeddings qe ON qe.vec_id = cd.query_id
        JOIN embeddings ce ON ce.vec_id = cd.neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cos
      FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""")),

    // OPQ-rotated persistent index (FAISS's OPQ preprocessing reaching
    // the SERVED index, not just the one-shot s11 encode): build stores
    // the parametric-OPQ rotation as exact doubles, both models train
    // over rotated vectors, queries probe through the stored rotation
    // with the NORM-CORRECTED ADC (pq_adc_cos — the raw dot's codeword
    // norm-shrinkage bias measurably inverts rankings in rotated
    // anisotropic spaces). Rows-only (float model math is not
    // SQL-replayable); LlmOpsSpec pins rotation round-trip exactness,
    // grow-through-rotation parity, stored-codebook quantization error
    // strictly below plain PQ, and exact copies found at rerank 1.
    ("s15_ann_opq", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val dir = IxScratch.cached(
          "s15:" + IxScratch.fingerprint(d, "embeddings.parquet"),
          "graft_s15_ix") { p =>
        AnnIndex.build(emb, p, opq = true)
      }
      AnnIndex.topK(AnnIndex.load(s, dir),
          emb.filter(col("vec_id") < 5), emb, 10)
        .orderBy(col("query_id"), col("rank"))
    }, None),

    // SemDeDup semantic deduplication over the full embedding corpus
    // (rows-only — centroid training is not SQL-expressible; planted
    // duplicates, idempotence, and determinism are spec-gated in
    // LlmOpsSpec).
    ("s07_semantic_dedup", (s: SparkSession, d: String) =>
      semanticDedup(Tables.embeddings(s, d), threshold = 0.45)
        .orderBy(col("vec_id")), None),

    // s07's ORACLE TWIN — SemDeDup's machinery under the md5-sample
    // quantizer (the s18 treatment applied to the dedup composition):
    // the IDENTICAL [[semanticDedupWith]] plan — row-local argmax
    // assignment, the capBuckets guard, the in-cluster id-ordered pair
    // join, exact-cosine threshold, survivors-by-min-id — with the
    // clusters = the 16 smallest-md5-draw corpus vectors. DuckDB
    // replays assignments (s01's sequential-double dots, lower-index
    // ties), the cap, every pair, and the threshold. s07 keeps
    // spherical k-means (float-iterative, adjudicated).
    ("s20_semantic_dedup_md5", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val (cents, dim) = md5SampleCentroids(emb, nlist = 16, salt = "s20")
      semanticDedupWith(emb, threshold = 0.45, cents, dim)
        .orderBy(col("vec_id"))
    },
    Some("""WITH cents AS (
        SELECT cidx, embedding AS ce FROM (
          SELECT CAST(row_number() OVER (
              ORDER BY md5('s20:' || CAST(vec_id AS VARCHAR)), vec_id) - 1
            AS INTEGER) AS cidx, embedding
          FROM embeddings) z
        WHERE cidx < 16),
      dots AS (
        SELECT e.vec_id, c.cidx,
          list_sum(list_transform(list_zip(e.embedding, c.ce),
            pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) AS dot
        FROM embeddings e CROSS JOIN cents c),
      asg AS (
        SELECT vec_id, cidx AS cluster FROM (
          SELECT vec_id, cidx,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY dot DESC, cidx ASC) AS rn
          FROM dots) z WHERE rn = 1),
      hot AS (
        SELECT cluster FROM asg GROUP BY cluster
        HAVING count(*) > 10000),
      capped AS (
        SELECT a.vec_id, a.cluster FROM asg a
        LEFT JOIN hot h ON h.cluster = a.cluster
        WHERE h.cluster IS NULL),
      dropped AS (
        SELECT DISTINCT b.vec_id FROM capped a
        JOIN capped b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
        WHERE list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
            pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(ea.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(eb.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.45)
      SELECT a.vec_id, a.cluster,
        (d.vec_id IS NOT NULL) AS is_dup
      FROM asg a LEFT JOIN dropped d ON d.vec_id = a.vec_id
      ORDER BY a.vec_id""")),

    // Embedding-stream admission screen: the second half of the corpus
    // probed against an index of the first half — join/shuffle/state-
    // free, the shape that rides an append stream unchanged (rows-only;
    // copy/novel behavior and the no-Exchange plan are spec-gated).
    ("s08_embedding_admission", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val n = emb.count()
      embeddingAdmission(emb.filter(col("vec_id") >= n / 2),
          emb.filter(col("vec_id") < n / 2), fpp = 0.001)
        .select(col("vec_id"), col("dup_candidate"))
        .orderBy(col("vec_id"))
    }, None),

    // PCA moment table — the distributed half of covariance estimation,
    // oracle-gated EXACTLY: Q24 quantization makes every (n, Σqᵢ, Σqⱼ,
    // Σqᵢqⱼ) an integer DuckDB reproduces bit-for-bit by joining the
    // unnested vectors; a float covariance could never hash-match
    // (summation order). The eigen/projection half rides s10.
    // The sums compute in DECIMAL(38,0) (exact + overflow-proof at any
    // corpus size) but REGISTER as STRING: the driver's canonicalizer
    // stringifies Decimal columns differently on its two sides (the
    // r11 s09 red — same family as r10's array<int> crash), and the
    // values are exact integers so the cast loses nothing. OracleTypes
    // Spec lints every oracle-gated output down to driver-safe scalars.
    ("s09_pca_moments", (s: SparkSession, d: String) =>
      pcaMoments(Tables.embeddings(s, d))
        .select(col("i"), col("j"), col("n"),
          col("s_i").cast("string").as("s_i"),
          col("s_j").cast("string").as("s_j"),
          col("s_ij").cast("string").as("s_ij"))
        .orderBy(col("i"), col("j")),
    Some("""WITH idx AS (
        SELECT vec_id, embedding AS e,
          unnest(range(1, len(embedding) + 1)) AS ii
        FROM embeddings),
      q AS (
        SELECT vec_id, CAST(ii - 1 AS INTEGER) AS i,
          CAST(floor(CAST(e[ii] AS DOUBLE) * 16777216) AS BIGINT) AS qv
        FROM idx),
      pr AS (
        SELECT a.i AS i, b.i AS j, a.qv AS qa, b.qv AS qb
        FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i)
      SELECT i, j, CAST(count(*) AS BIGINT) AS n,
        CAST(CAST(sum(qa) AS DECIMAL(38,0)) AS VARCHAR) AS s_i,
        CAST(CAST(sum(qb) AS DECIMAL(38,0)) AS VARCHAR) AS s_j,
        CAST(CAST(sum(qa * qb) AS DECIMAL(38,0)) AS VARCHAR) AS s_ij
      FROM pr GROUP BY i, j ORDER BY i, j""")),

    // PCA-reduced embedding encode: train on the exact moments (Jacobi
    // eigensolver driver-side over the d×d table — the IVF/PQ trainer
    // shape), project every vector through the codegen'd PcaProject
    // expression to 8 of 64 dims. Rows-only (eigenvectors are
    // float-iterative); orthonormality, eigen-residuals, variance
    // capture, reference-matmul parity, and determinism are spec-gated
    // in PcaSpec.
    ("s10_pca_project", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val (comps, _) = pcaTrain(emb, k = 8)
      pcaProjectFrame(emb, comps)
        .select(col("vec_id"),
          posexplode(col("reduced")).as(Seq("comp_idx", "coord")))
        .orderBy(col("vec_id"), col("comp_idx"))
    }, None),

    // OPQ-rotated PQ encode: the full-d parametric-OPQ rotation
    // (PCA + eigenvalue allocation) followed by the stored-index PQ
    // byte codes over the rotated vectors — the FAISS OPQ preprocessing
    // composed with the existing s05 machinery. Rows-only (rotation is
    // float-iterative); the quantization-error improvement over
    // unrotated PQ and the allocation balance are spec-gated in
    // PcaSpec.
    ("s11_opq_encode", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val n = emb.count()
      val rot = opqRotation(emb, m = 8)
      val rotated = pcaProjectFrame(emb, rot)
        .select(col("vec_id"), col("reduced").as("embedding"))
      val (codebook, dim) = trainPq(rotated, n, m = 8)
      val fns = graft.functions.GraftFunctions
      rotated
        .select(col("vec_id"),
          hex(fns.pq_encode(col("embedding"), codebook, dim, 8)).as("codes"))
        .orderBy(col("vec_id"))
    }, None),

    // Scalar (SQ8) embedding quantization — the third standard vector
    // compression next to PQ (s05) and OPQ (s11), and the FAISS
    // SQ8/ScaNN int8 shape: per-DIMENSION min/max train pass, uniform
    // 8-bit codes. Oracle-gated bit-for-bit: float32→double is
    // lossless, min/max are order-free, and the code is one correctly-
    // rounded divide+multiply+floor both engines agree on. Plan: one
    // explode feeds a d-row stats aggregation (tiny — broadcast back)
    // and the coding join; the corpus never shuffles beyond the final
    // order. Reconstruction-error bound and round-trip monotonicity
    // are spec-gated in LlmOpsSpec.
    // Cluster-balanced sampling — temperature-flattened keep rates over
    // semantic clusters (the DoReMi workflow with topics instead of
    // source labels). Rows-only (k-means is float-iterative);
    // flattening, rate-1 floor, temperature=1 identity, and determinism
    // are spec-gated in LlmOpsSpec.
    ("s14_cluster_mixture", (s: SparkSession, d: String) =>
      clusterMixture(Tables.embeddings(s, d), temperature = 0.5)
        .orderBy(col("vec_id")), None),

    // s14's ORACLE TWIN — temperature-flattened cluster sampling under
    // the md5-sample quantizer and an ENGINE-EXACT rate form: the
    // IDENTICAL [[clusterMixtureWith]] machinery (argmax assignment,
    // k-row rate table, Q24 threshold, md5-bucket accept) with
    // rate = 1/√n_c — IEEE sqrt is correctly rounded in every engine
    // where pow(n, τ−1) is a libm coin-flip in the last ulp (and a
    // 1-ulp rate difference flips the floor'd threshold). Same τ=0.5
    // flattening semantics; DuckDB replays assignments, counts, rates,
    // thresholds, and each vector's md5-bucket accept. s14 keeps
    // k-means + the general pow exponent (adjudicated).
    ("s21_cluster_mixture_md5", (s: SparkSession, d: String) => {
      val emb = Tables.embeddings(s, d)
      val (cents, dim) = md5SampleCentroids(emb, nlist = 16, salt = "s21")
      clusterMixtureWith(emb, cents, dim,
          rate = c => lit(1.0) / sqrt(c.cast("double")))
        .orderBy(col("vec_id"))
    },
    Some("""WITH cents AS (
        SELECT cidx, embedding AS ce FROM (
          SELECT CAST(row_number() OVER (
              ORDER BY md5('s21:' || CAST(vec_id AS VARCHAR)), vec_id) - 1
            AS INTEGER) AS cidx, embedding
          FROM embeddings) z
        WHERE cidx < 16),
      dots AS (
        SELECT e.vec_id, c.cidx,
          list_sum(list_transform(list_zip(e.embedding, c.ce),
            pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) AS dot
        FROM embeddings e CROSS JOIN cents c),
      asg AS (
        SELECT vec_id, cidx AS cluster FROM (
          SELECT vec_id, cidx,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY dot DESC, cidx ASC) AS rn
          FROM dots) z WHERE rn = 1),
      cnt AS (
        SELECT cluster, CAST(count(*) AS BIGINT) AS n_c
        FROM asg GROUP BY cluster),
      rated AS (
        SELECT cluster, n_c,
          1.0 / sqrt(CAST(n_c AS DOUBLE)) AS raw_rate
        FROM cnt),
      r3 AS (
        SELECT cluster, n_c,
          raw_rate / (SELECT max(raw_rate) FROM rated) AS rate,
          CAST(floor(raw_rate / (SELECT max(raw_rate) FROM rated)
            * 16777216.0) AS BIGINT) AS threshold
        FROM rated)
      SELECT a.vec_id, a.cluster, r3.n_c, r3.rate,
        CAST(concat('0x', substr(md5('cmix:' || CAST(a.vec_id AS VARCHAR)),
          1, 6)) AS BIGINT) < r3.threshold AS kept
      FROM asg a JOIN r3 ON r3.cluster = a.cluster
      ORDER BY a.vec_id""")),

    ("s13_scalar_quant", (s: SparkSession, d: String) =>
      scalarQuantize(Tables.embeddings(s, d))
        .orderBy(col("vec_id"), col("dim")),
    Some("""WITH idx AS (
        SELECT vec_id, embedding AS e,
          unnest(range(1, len(embedding) + 1)) AS ii
        FROM embeddings),
      v AS (
        SELECT vec_id, CAST(ii - 1 AS INTEGER) AS dim,
          CAST(e[ii] AS DOUBLE) AS v
        FROM idx),
      st AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM v GROUP BY dim)
      SELECT vec_id, dim,
        CAST(CASE WHEN mx = mn THEN 0
          ELSE floor((v - mn) / (mx - mn) * 255) END AS INTEGER) AS code
      FROM v JOIN st USING (dim) ORDER BY vec_id, dim"""))
  )
}
