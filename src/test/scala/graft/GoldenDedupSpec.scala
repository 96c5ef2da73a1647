package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Value-level regression gates for the near-dup operators that have no
  * SQL oracle (d04 simhash, d05 winnow): a deterministic committed
  * corpus, full expected output frames checked in as golden CSVs — the
  * m06 spirit for the near-dup family. Any semantic drift in the
  * signature expressions, banding, capping, or scoring changes a VALUE
  * here, not just a count or a recall bound.
  *
  * The corpus is generated arithmetically (fixed LCG, fixed vocab — no
  * RNG object, no clock), so the golden files are stable across Spark
  * versions and partitionings; the one float column is compared at 1e-9
  * (sum order inside an aggregate is partitioning-dependent in the last
  * ulp).
  */
class GoldenDedupSpec extends SparkSuite {

  /** Deterministic corpus: 40 base docs, 5 planted near-dups (2-word
    * edits of docs 0-4), 5 planted partial copies (15-word verbatim
    * spans of docs 5-9 inside novel text). */
  def corpus: DataFrame = {
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)
    def words(seed: Long, n: Int): Vector[String] =
      lcg(seed).take(n).map(h => s"w${math.floorMod(h, 80)}").toVector

    val base = (0 until 40).map(i => (i.toLong, words(1000L + i, 30)))
    val nearDups = (0 until 5).map { i =>
      val w = base(i)._2.updated(3, "editx").updated(17, "edity")
      (100L + i, w)
    }
    val partialCopies = (0 until 5).map { i =>
      val span = base(5 + i)._2.slice(5, 20) // 15-word verbatim span
      (200L + i, words(9000L + i, 6) ++ span ++ words(9500L + i, 6))
    }
    val rows = (base ++ nearDups ++ partialCopies)
      .map { case (id, ws) => (id, ws.mkString(" ")) }
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("doc_id", "text")
  }

  private def golden(name: String): Seq[Array[String]] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    assert(in != null, s"missing golden fixture $name — " +
      "regenerate with GoldenDedupSpec.dump (see scaladoc)")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().drop(1).map(_.split(",")).toVector
    finally src.close()
  }

  def d04Frame: DataFrame =
    // fixed keyBits: the production default derives width from count(),
    // which would tie the golden values to corpus size heuristics
    Dedup.simhashNearDups(corpus, maxHamming = 6, keyBits = 16)
      .orderBy(col("doc_a"), col("doc_b"))

  def d05Frame: DataFrame =
    Dedup.winnowOverlapPairs(corpus, minOverlap = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  def d03Frame: DataFrame =
    Dedup.minhashNearDups(corpus, tau = 0.35)
      .orderBy(col("doc_a"), col("doc_b"))

  def t08Frame: DataFrame =
    corpus.select(col("doc_id"),
      size(graft.functions.GraftFunctions.winnow_fingerprint(
        col("text"), 8, 16)).as("n_prints"))
      .orderBy(col("doc_id"))

  test("d04 simhash pairs match the committed golden frame value-for-value") {
    val got = d04Frame.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val want = golden("d04_pairs.csv")
      .map(f => (f(0).toLong, f(1).toLong, f(2).toInt))
    assert(got.toSeq == want.toSeq,
      s"d04 drifted from golden:\ngot  ${got.toSeq}\nwant ${want.toSeq}")
    // the gate must include the planted near-dups, or it gates nothing
    val pairs = got.map(t => (t._1, t._2)).toSet
    (0 until 5).foreach(i => assert(pairs.contains((i.toLong, 100L + i)),
      s"planted near-dup pair ($i, ${100 + i}) missing"))
  }

  test("d05 winnow overlaps match the committed golden frame value-for-value") {
    val got = d05Frame.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = golden("d05_pairs.csv")
      .map(f => (f(0).toLong, f(1).toLong, f(2).toDouble))
    assert(got.length == want.length,
      s"d05 drifted from golden:\ngot  ${got.toSeq}\nwant ${want.toSeq}")
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && math.abs(g._3 - w._3) < 1e-9,
        s"d05 drifted from golden at pair $w: got $g")
    }
    val pairs = got.map(t => (t._1, t._2)).toSet
    (0 until 5).foreach(i => assert(pairs.contains((5L + i, 200L + i)),
      s"planted partial-copy pair (${5 + i}, ${200 + i}) missing"))
  }

  test("d03 minhash-LSH pairs match the committed golden frame value-for-value") {
    val got = d03Frame.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = golden("d03_pairs.csv")
      .map(f => (f(0).toLong, f(1).toLong, f(2).toDouble))
    assert(got.length == want.length,
      s"d03 drifted from golden:\ngot  ${got.toSeq}\nwant ${want.toSeq}")
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && math.abs(g._3 - w._3) < 1e-9,
        s"d03 drifted from golden at pair $w: got $g")
    }
    val pairs = got.map(t => (t._1, t._2)).toSet
    (0 until 5).foreach(i => assert(pairs.contains((i.toLong, 100L + i)),
      s"planted near-dup pair ($i, ${100 + i}) missing"))
  }

  test("t08 winnow fingerprint counts match the committed golden frame") {
    val got = t08Frame.collect().map(r => (r.getLong(0), r.getInt(1)))
    val want = golden("t08_counts.csv").map(f => (f(0).toLong, f(1).toInt))
    assert(got.toSeq == want.toSeq,
      s"t08 drifted from golden:\ngot  ${got.toSeq}\nwant ${want.toSeq}")
    assert(got.forall(_._2 > 0), "every document must fingerprint")
  }
}

/** One-off regenerator: `sbt "Test/runMain graft.GoldenDedupDump <dir>"`
  * writes the two golden CSVs; review the diff before committing — a
  * regeneration is a SEMANTIC CHANGE to d04/d05, not a refresh. */
object GoldenDedupDump {
  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args.headOption.getOrElse("/tmp/golden"))
    outDir.mkdirs()
    val suite = new GoldenDedupSpec
    def write(name: String, header: String, lines: Seq[String]): Unit = {
      val f = new java.io.File(outDir, name)
      java.nio.file.Files.write(f.toPath,
        (header +: lines).mkString("", "\n", "\n").getBytes("UTF-8"))
      println(s"wrote ${f.getAbsolutePath} (${lines.size} rows)")
    }
    write("d04_pairs.csv", "doc_a,doc_b,hamming",
      suite.d04Frame.collect().map(r =>
        s"${r.getLong(0)},${r.getLong(1)},${r.getInt(2)}").toSeq)
    write("d05_pairs.csv", "doc_a,doc_b,overlap",
      suite.d05Frame.collect().map(r =>
        f"${r.getLong(0)}%d,${r.getLong(1)}%d,${r.getDouble(2)}%.12f").toSeq)
    write("d03_pairs.csv", "doc_a,doc_b,jaccard",
      suite.d03Frame.collect().map(r =>
        f"${r.getLong(0)}%d,${r.getLong(1)}%d,${r.getDouble(2)}%.12f").toSeq)
    write("t08_counts.csv", "doc_id,n_prints",
      suite.t08Frame.collect().map(r =>
        s"${r.getLong(0)},${r.getInt(1)}").toSeq)
    suite.spark.stop()
  }
}
