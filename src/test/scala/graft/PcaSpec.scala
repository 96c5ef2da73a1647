package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** PCA family gates (s09/s10): exact moment accumulation, Jacobi
  * eigensolver properties, codegen projection parity, and the
  * end-to-end dimensionality-reduction value on a planted low-rank
  * corpus.
  */
class PcaSpec extends SparkSuite {

  private def toDFloat(rows: Seq[(Long, Array[Float])]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("pcaMoments: hand-computed Q24 moments on a tiny frame; flush path covered") {
    // 3 vectors in 2-D with easily hand-quantized values
    val emb = toDFloat(Seq(
      (1L, Array(0.5f, -0.25f)),
      (2L, Array(0.25f, 0.5f)),
      (3L, Array(-0.5f, 0.125f))))
    val got = Similarity.pcaMoments(emb).orderBy("i", "j").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDecimal(3).longValueExact(), r.getDecimal(4).longValueExact(),
        r.getDecimal(5).longValueExact()))
    val Q = 1L << 24
    val q = Seq(
      Seq(Q / 2, -Q / 4), // floor is exact on these dyadic values
      Seq(Q / 4, Q / 2),
      Seq(-Q / 2, Q / 8))
    def s(i: Int) = q.map(_(i)).sum
    def sij(i: Int, j: Int) = q.map(v => v(i) * v(j)).sum
    assert(got.toSeq == Seq(
      (0, 0, 3L, s(0), s(0), sij(0, 0)),
      (0, 1, 3L, s(0), s(1), sij(0, 1)),
      (1, 1, 3L, s(1), s(1), sij(1, 1))))
    // the >4096-row flush path yields the same exact totals as a
    // straight sum (here: 5000 copies of one vector, single partition)
    val big = toDFloat((1L to 5000L).map(i => (i, Array(0.5f, 0.25f))))
      .repartition(1)
    val bigGot = Similarity.pcaMoments(big).orderBy("i", "j").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDecimal(3).longValueExact(), r.getDecimal(5).longValueExact()))
    assert(bigGot.toSeq == Seq(
      (0, 0, 5000L, 5000L * (Q / 2), 5000L * (Q / 2) * (Q / 2)),
      (0, 1, 5000L, 5000L * (Q / 2), 5000L * (Q / 2) * (Q / 4)),
      (1, 1, 5000L, 5000L * (Q / 4), 5000L * (Q / 4) * (Q / 4))))
  }

  /** Deterministic low-rank corpus: vectors live near a 3-dimensional
    * subspace of 16-dim space (3 axis-aligned signal directions with
    * very different variances + tiny off-subspace noise). */
  private def lowRank(n: Int): Seq[(Long, Array[Float])] =
    (0L until n.toLong).map { id =>
      def lcg(k: Long): Double = {
        val z = (id * 6364136223846793005L + k * 1442695040888963407L + 1L)
        ((z >>> 11).toDouble / (1L << 53).toDouble) - 0.5
      }
      val v = new Array[Float](16)
      v(0) = (lcg(1) * 0.8).toFloat  // dominant signal
      v(5) = (lcg(2) * 0.4).toFloat  // second
      v(9) = (lcg(3) * 0.2).toFloat  // third
      var i = 0
      while (i < 16) { v(i) = (v(i) + lcg(100 + i) * 0.01).toFloat; i += 1 }
      (id, v)
    }

  test("pcaTrain: orthonormal components, eigen residuals, descending variance, trace") {
    val emb = toDFloat(lowRank(400))
    val (comps, eigvals) = Similarity.pcaTrain(emb, k = 16)
    val d = 16
    assert(comps.length == d && eigvals.length == d)
    // eigenvalues descending
    eigvals.sliding(2).foreach { case Seq(a, b) => assert(a >= b - 1e-12) }
    // orthonormal rows
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(i => comps(a)(i) * comps(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<c$a, c$b> = $dot")
    }
    // rebuild the covariance from the exact moments and check C·v = λ·v
    val rows = Similarity.pcaMoments(emb).collect()
    val scale = (1L << 24).toDouble
    val n = rows.head.getLong(2)
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val c = r.getDecimal(5).doubleValue() / (scale * scale) / n -
        (r.getDecimal(3).doubleValue() / scale / n) *
          (r.getDecimal(4).doubleValue() / scale / n)
      cov(i)(j) = c; cov(j)(i) = c
    }
    for (e <- 0 until d) {
      for (r <- 0 until d) {
        val cv = (0 until d).map(i => cov(r)(i) * comps(e)(i)).sum
        assert(math.abs(cv - eigvals(e) * comps(e)(r)) < 1e-8,
          s"eigen residual at ($e, $r)")
      }
    }
    // trace is preserved: Σλ = Σ C_ii
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(eigvals.sum - trace) < 1e-9)
    // the planted 3-D signal dominates: top-3 capture >95% of variance
    assert(eigvals.take(3).sum > 0.95 * eigvals.sum,
      s"top-3 ${eigvals.take(3).sum} vs total ${eigvals.sum}")
    // deterministic: bit-identical on a re-run
    val (comps2, eig2) = Similarity.pcaTrain(emb, k = 16)
    assert(comps2 == comps && eig2 == eigvals)
  }

  test("pcaProjectFrame: codegen projection matches the reference matmul bit-for-bit") {
    val emb = toDFloat(lowRank(50))
    val (comps, _) = Similarity.pcaTrain(emb, k = 4)
    val got = Similarity.pcaProjectFrame(emb, comps)
      .select(col("vec_id"), col("reduced")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val raw = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    raw.foreach { case (id, v) =>
      val want = comps.map { row =>
        var acc = 0.0
        var i = 0
        while (i < row.length) { acc += row(i) * v(i); i += 1 }
        acc.toFloat
      }
      assert(got(id) == want, s"vec $id")
    }
    // dimension mismatch fails loudly
    val bad = toDFloat(Seq((1L, Array(1.0f, 2.0f))))
    // a local relation may surface the kernel's IllegalArgumentException
    // directly, a distributed scan wraps it in SparkException — either
    // way it must be loud and name the mismatch
    val e = intercept[Exception](
      Similarity.pcaProjectFrame(bad, comps).collect())
    assert(e.getMessage.contains("dims") ||
      (e.getCause != null && e.getCause.getMessage.contains("dims")))
  }

  test("opqRotation: balanced eigen allocation beats unrotated PQ on anisotropic data") {
    def mixu(z0: Long): Double = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= z >>> 31
      ((z >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    // two heavy dimensions that plain PQ puts in the SAME subspace
    // (dims 0 and 1 of subspace 0 at m=4), everything else near-noise
    val emb = (0L until 300L).map { id =>
      val v = Array.tabulate(16)(i => (mixu(id * 131L + i) * 0.04).toFloat)
      v(0) = (mixu(id * 131L + 100) * 2.0).toFloat
      v(1) = (mixu(id * 131L + 101) * 1.6).toFloat
      (id, v)
    }
    val frame = toDFloat(emb)

    // total squared quantization residual under a trained codebook,
    // mirroring trainPq's unit normalization — computed independently
    // here, not via the PqEncode expression
    def pqError(vecs: Seq[Array[Float]], codebook: Array[Float],
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

    val plainCb = Similarity.trainPq(frame, 300L, m = 4, ks = 16)._1
    val plainErr = pqError(emb.map(_._2), plainCb, 16, 4)

    val rot = Similarity.opqRotation(frame, m = 4)
    // a d×d rotation stays orthonormal after allocation reordering
    for (a <- rot.indices; b <- a until rot.length) {
      val dot = rot(a).zip(rot(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"($a,$b)")
    }
    val rotated = Similarity.pcaProjectFrame(frame, rot)
      .select(col("vec_id"), col("reduced").as("embedding"))
    val rotVecs = rotated.orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toArray).toSeq
    val rotCb = Similarity.trainPq(rotated, 300L, m = 4, ks = 16)._1
    val rotErr = pqError(rotVecs, rotCb, 16, 4)

    assert(rotErr < plainErr * 0.9,
      s"OPQ error $rotErr not clearly below plain PQ $plainErr")
    // determinism
    assert(Similarity.opqRotation(frame, m = 4) == rot)
  }

  test("reduced space preserves geometry and cluster structure") {
    // what PCA guarantees is APPROXIMATION, not rank preservation: the
    // dropped dims carry ~5% of variance, so pairwise cosines move by
    // O(noise/signal) — bounded — while knife-edge top-k ties inside a
    // dense neighborhood may legitimately reorder. Gate both halves:
    // cosine drift is small on the low-rank corpus, and on a clustered
    // corpus the reduced space sends every query's top-5 to the SAME
    // cluster full space does (the ANN candidate-quality contract).
    val emb = lowRank(200)
    val (comps, _) = Similarity.pcaTrain(toDFloat(emb), k = 3)
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    def reduce(v: Array[Float]): Seq[Double] =
      comps.map(_.zip(v).map { case (c, x) => c * x.toDouble }.sum)
    val drifts = for {
      q <- emb.take(10)
      c <- emb.drop(10)
    } yield math.abs(
      cosine(q._2.map(_.toDouble).toSeq, c._2.map(_.toDouble).toSeq) -
        cosine(reduce(q._2), reduce(c._2)))
    assert(drifts.max < 0.1, s"max cosine drift ${drifts.max}")
    assert(drifts.sum / drifts.size < 0.02,
      s"mean cosine drift ${drifts.sum / drifts.size}")

    // clustered corpus: 10 well-separated directions in 64-dim + noise
    def mix(z0: Long): Double = { // splitmix finalizer → uniform(-0.5, 0.5)
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= z >>> 31
      ((z >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    val clustered = (0L until 200L).map { id =>
      def lcg(k: Long): Double = mix((id % 10) * 7919L + k) // cluster id % 10
      def noise(k: Long): Double = mix(id * 104729L + k * 31L + 5L)
      val v = Array.tabulate(64)(i => (lcg(i) * 0.5 + noise(i) * 0.02).toFloat)
      (id, v)
    }
    val (comps8, _) = Similarity.pcaTrain(toDFloat(clustered), k = 8)
    val reducedFrame = Similarity.pcaProjectFrame(toDFloat(clustered), comps8)
      .select(col("vec_id"), col("reduced").as("embedding"))
    def topClusters(frame: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] = {
      val qs = frame.filter(col("vec_id") < 10)
      Similarity.bruteForceTopK(qs, frame.filter(col("vec_id") >= 10), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2 % 10).toSeq }
    }
    val fullC = topClusters(toDFloat(clustered))
    val redC = topClusters(reducedFrame)
    // query q sits in cluster q; both spaces must agree that every
    // top-5 neighbor is the query's own cluster
    for (q <- 0L until 10L) {
      assert(fullC(q).forall(_ == q), s"full space impure at $q: ${fullC(q)}")
      assert(redC(q).forall(_ == q), s"reduced impure at $q: ${redC(q)}")
    }
  }
}
