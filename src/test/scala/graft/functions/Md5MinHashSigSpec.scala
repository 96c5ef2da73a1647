package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** [[Md5MinHashSig]] must be bit-identical to the composed HOF form it
  * replaced in DedupIndex.keyedBandsMd5 (r19 optimization) — the d13/d14
  * and c13/c14/c15 oracle hashes depend on exact equality. */
class Md5MinHashSigSpec extends SparkSuite {

  private val k = 12

  /** The original interpreted form, kept here as the reference. */
  private def composedSigs(grams: org.apache.spark.sql.Column) =
    array((0 until k).map { i =>
      array_min(transform(grams, g =>
        conv(substring(md5(concat(lit(i + ":"), g)), 1, 15), 16, 10)
          .cast("long")))
    }: _*)

  test("native signature matches the composed HOF form bit-for-bit") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "short",
      "",
      "  leading and   trailing  spaces   collapse ",
      "unicode λόγος 東京 emoji 😀 mixed with ascii",
      "repeat repeat repeat repeat repeat repeat repeat",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      (1 to 400).map(i => s"w$i").mkString(" ") // long doc, many shingles
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.operators.Dedup.shingles(col("text")).as("grams"))
    val both = df.select(col("doc_id"),
      composedSigs(col("grams")).as("ref"),
      GraftFunctions.md5_minhash_sig(col("grams"), k).as("native"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: ${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
    }
  }

  test("null and empty shingle arrays mirror array_min(transform) semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("only")),
      (2L, Seq.empty[String])
    ).toDF("doc_id", "grams")
    val out = df.select(col("doc_id"),
        GraftFunctions.md5_minhash_sig(col("grams"), k).as("native"),
        composedSigs(col("grams")).as("ref"))
      .collect().sortBy(_.getLong(0))
    // non-empty: equal arrays
    assert(out(0).getSeq[Long](1) == out(0).getSeq[Long](2))
    // empty grams: both forms yield null (array_min of empty is null,
    // so the composed array() is an array of k nulls; the native form
    // collapses to a null array — both mean "no signature", and the
    // downstream band keys agree: concat_ws skips nulls either way)
    assert(out(1).isNullAt(1))
    assert(out(1).getSeq[Any](2).forall(_ == null))
  }

  test("keyedBandsMd5 band keys agree with the pre-optimization form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // identical → same keys
      (3L, "one two"),
      (4L, "completely different text with several words here")
    ).toDF("doc_id", "text")
    // reference: the pre-r19 composed pipeline, inlined
    val sigs = (0 until k).map { i =>
      array_min(transform(col("grams"), g =>
        conv(substring(md5(concat(lit(i + ":"), g)), 1, 15), 16, 10)
          .cast("long"))).as(s"sig_$i")
    }
    val ref = docs
      .select(col("doc_id"),
        graft.operators.Dedup.shingles(col("text")).as("grams"))
      .select(col("doc_id") +: sigs: _*)
      .select(col("doc_id"), explode(array((0 until 4).map { j =>
        struct(lit(j).as("band"),
          md5(concat_ws(",",
            (0 until 3).map(x => col(s"sig_${j * 3 + x}")): _*)).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val got = graft.operators.DedupIndex.testKeyedBandsMd5(docs, k, 4, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == ref)
  }
}
