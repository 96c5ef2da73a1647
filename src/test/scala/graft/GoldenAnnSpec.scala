package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Value-level regression gates for the ANN family that has no SQL
  * oracle (s02 LSH, s04 IVF, s05 PQ, s06 IVFPQ): a deterministic
  * committed corpus, full expected TOP-K FRAMES checked in as golden
  * CSVs — the GoldenDedupSpec treatment. The existing recall +
  * determinism specs bound quality but would pass a candidate-generation
  * regression that happens to preserve planted-pair recall; these gates
  * catch any drift in banding, probing, centroid training, code
  * assignment, ADC ranking, or re-rank ordering as a VALUE change.
  *
  * The corpus is generated arithmetically (fixed LCG — no RNG object, no
  * clock): 10 well-separated cluster centers, 19 members each with small
  * perturbations, plus 10 planted near-duplicates of vectors 0-9 (ids
  * 190-199) whose exact top-1 is unambiguous. Every size-derived
  * parameter (planes, nlist, ks) is pinned explicitly so the goldens
  * never move with corpus-size heuristics. The one float column is
  * compared at 1e-9 (double summation inside cosine is row-local and
  * deterministic; the slack covers constant-folding differences only).
  */
class GoldenAnnSpec extends SparkSuite {

  val Dim = 16
  val NClusters = 10

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  /** map a raw LCG draw to [-1, 1) with 6 decimal digits (exact in
    * float/double, so the committed corpus has no representation drift) */
  private def unit(h: Long): Float =
    (math.floorMod(h, 2000000L) - 1000000L) / 1000000.0f

  def corpus: DataFrame = {
    val centers = Array.tabulate(NClusters)(c =>
      Array.tabulate(Dim)(d => unit(lcg(7000L + c).drop(d).next())))
    // ids 0..189: cluster i/19, perturbed member
    val members = (0 until 190).map { i =>
      val c = centers(i / 19)
      val v = Array.tabulate(Dim)(d =>
        c(d) + 0.15f * unit(lcg(100L * i + 11).drop(d).next()))
      (i.toLong, v)
    }
    // ids 190..199: near-duplicates of the FIRST member of each cluster
    // (ids 0, 19, …, 171; tiny perturbation) — one query per cluster, so
    // each query's re-rank candidate pool holds ~18 same-cluster members
    // + its dup and the PQ top-R prune can never tie the dup out (all
    // queries in one cluster would put ~28 same-code candidates in one
    // pool, more than rerank·k)
    val dups = (0 until 10).map { j =>
      val base = members(19 * j)._2
      val v = Array.tabulate(Dim)(d =>
        base(d) + 0.01f * unit(lcg(9000L + j).drop(d).next()))
      ((190 + j).toLong, v)
    }
    val spark2 = spark
    import spark2.implicits._
    (members ++ dups).toDF("vec_id", "embedding")
  }

  /** one query per cluster: ids 0, 19, 38, …, 171 */
  def queries: DataFrame =
    corpus.filter(col("vec_id") < 190 && col("vec_id") % 19 === 0)

  // every size-derived default pinned: planesFor/nlistFor read count()
  def s02Frame: DataFrame =
    Similarity.lshTopK(queries, corpus, k = 5, tables = 8,
        planesPerTable = 6, multiProbe = true)
      .orderBy(col("query_id"), col("rank"))

  def s04Frame: DataFrame =
    Similarity.ivfTopK(queries, corpus, k = 5, nlist = 8, nprobe = 4,
        replicas = 2)
      .orderBy(col("query_id"), col("rank"))

  def s05Frame: DataFrame =
    Similarity.pqTopK(queries, corpus, k = 5, m = 8, ks = 16, rerank = 4)
      .orderBy(col("query_id"), col("rank"))

  def s06Frame: DataFrame =
    Similarity.ivfpqTopK(queries, corpus, k = 5, nlist = 8, nprobe = 4,
        replicas = 2, m = 8, ks = 16, rerank = 4)
      .orderBy(col("query_id"), col("rank"))

  private def golden(name: String): Seq[(Long, Int, Long, Double)] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    assert(in != null, s"missing golden fixture $name — " +
      "regenerate with graft.GoldenAnnDump (a regen is a semantic change)")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().drop(1).map { l =>
      val f = l.split(",")
      (f(0).toLong, f(1).toInt, f(2).toLong, f(3).toDouble)
    }.toVector
    finally src.close()
  }

  private def check(name: String, frame: DataFrame, csv: String): Unit = {
    val got = frame.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val want = golden(csv)
    assert(got.length == want.length,
      s"$name drifted from golden (row count ${got.length} vs ${want.length}):\n" +
        s"got  ${got.toSeq}\nwant ${want.toSeq}")
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 &&
        math.abs(g._4 - w._4) < 1e-9,
        s"$name drifted from golden at $w: got $g")
    }
    // the frame must keep finding the planted near-dups at rank 1, or
    // the committed values gate a broken index
    val top1 = got.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    (0 until 10).foreach(j => assert(top1.get(19L * j).contains(190L + j),
      s"$name: planted near-dup ${190 + j} is not rank-1 for query ${19 * j}"))
  }

  test("s02 LSH top-k matches the committed golden frame value-for-value") {
    check("s02", s02Frame, "s02_topk.csv")
  }

  test("s04 IVF top-k matches the committed golden frame value-for-value") {
    check("s04", s04Frame, "s04_topk.csv")
  }

  test("s05 PQ top-k matches the committed golden frame value-for-value") {
    check("s05", s05Frame, "s05_topk.csv")
  }

  test("s06 IVFPQ top-k matches the committed golden frame value-for-value") {
    check("s06", s06Frame, "s06_topk.csv")
  }
}

/** One-off regenerator: `sbt "Test/runMain graft.GoldenAnnDump <dir>"`
  * writes the four golden CSVs; review the diff before committing — a
  * regeneration is a SEMANTIC CHANGE to the ANN family, not a refresh. */
object GoldenAnnDump {
  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args.headOption.getOrElse("/tmp/golden"))
    outDir.mkdirs()
    val suite = new GoldenAnnSpec
    def write(name: String, frame: DataFrame): Unit = {
      val lines = frame.collect().map(r =>
        f"${r.getLong(0)}%d,${r.getInt(1)}%d,${r.getLong(2)}%d,${r.getDouble(3)}%.12f")
      val f = new java.io.File(outDir, name)
      java.nio.file.Files.write(f.toPath,
        ("query_id,rank,neighbor_id,cos" +: lines.toSeq)
          .mkString("", "\n", "\n").getBytes("UTF-8"))
      println(s"wrote ${f.getAbsolutePath} (${lines.length} rows)")
    }
    write("s02_topk.csv", suite.s02Frame)
    write("s04_topk.csv", suite.s04Frame)
    write("s05_topk.csv", suite.s05Frame)
    write("s06_topk.csv", suite.s06Frame)
    suite.spark.stop()
  }
}
