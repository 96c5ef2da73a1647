package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The native word-grams expression: bit-exact parity with the composed
  * `split`+`transform`+`array_distinct` form it replaced (the shingle
  * stage of every dedup/contamination scan), including the short-doc
  * fallback, Spark's spaces-only trim, and first-occurrence distinct
  * order.
  */
class WordGramsSpec extends SparkSuite {

  import spark.implicits._

  /** The pre-native composed form, verbatim. */
  private def composed(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = split(trim(text), "\\s+")
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o + 1)): _*))
    when(size(toks) >= n, array_distinct(grams)).otherwise(array(text))
  }

  test("word_grams matches the composed HOF form on edge cases") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a b a b", // duplicate grams — first-occurrence order
      "one two", // shorter than n=3 → whole text
      "", // empty → [""] token → fallback
      "   ", // all-space: Spark trim → "" → fallback keeps original
      "\tstarts with tab then words here", // tab survives Spark trim
      "x  double  spaced  tokens  here",
      "exactly three words").toDF("text")
    for (n <- Seq(2, 3, 8)) {
      val got = docs.select(
        GraftFunctions.word_grams(col("text"), n).as("native"),
        composed(col("text"), n).as("hof")).collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
      }
    }
  }

  test("non-distinct word_grams keeps every occurrence; short docs are empty") {
    val docs = Seq(
      "a b a b a b a b",
      "the quick brown fox jumps over the lazy dog",
      "one two", // shorter than n=3 → NO grams (not the dedup fallback)
      "",
      "x  double  spaced  tokens  here").toDF("text")
    for (n <- Seq(2, 3)) {
      // composed non-distinct reference: every sliding position, in order
      val toks = split(trim(col("text")), "\\s+")
      val grams = transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o + 1)): _*))
      val hof = when(size(toks) >= n, grams)
        .otherwise(array().cast("array<string>"))
      val got = docs.select(
        GraftFunctions.word_grams(col("text"), n, distinct = false).as("native"),
        hof.as("hof")).collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
      }
    }
  }

  test("word_grams matches the composed form on randomized corpus text") {
    val rnd = new scala.util.Random(0x96A35L)
    val words = Seq("alpha", "beta", "g", "dd", "eps", "zz", "theta")
    val docs = (1 to 200).map { _ =>
      (0 until rnd.nextInt(14)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
    }.toDF("text")
    val got = docs.select(
      GraftFunctions.word_grams(col("text"), 3).as("native"),
      composed(col("text"), 3).as("hof")).collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }
}
