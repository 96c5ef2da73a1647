package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The native Unicode-NFC expression (t47's normalize-before-hash
  * primitive): parity with the JDK reference on hand sequences —
  * composition, identity on already-NFC text, sequences with no
  * precomposed form, idempotence, and the dedup motivation (decomposed
  * and precomposed spellings hash equal AFTER normalization) — all
  * under codegen.fallback=false so the generated code is exercised.
  */
class NfcNormalizeSpec extends SparkSuite {

  import spark.implicits._

  private def norm(ss: Seq[String]): Seq[String] =
    ss.toDF("s")
      .select(GraftFunctions.nfc_normalize(col("s")).as("n"))
      .collect().map(_.getString(0)).toSeq

  test("hand sequences: compose, keep, and no-precomposed-form cases") {
    val eAcuteD = "e\u0301" // decomposed: e + combining acute
    val eAcuteC = "\u00e9"  // precomposed
    val got = norm(Seq(
      eAcuteD, eAcuteC, "plain ascii", "x\u0301",
      "a\u0300a\u0303", ""))
    assert(got(0) == eAcuteC, s"decomposed must compose: ${got(0)}")
    assert(got(1) == eAcuteC, "already-NFC text must pass through")
    assert(got(2) == "plain ascii")
    // x + combining acute has no precomposed codepoint: NFC keeps the
    // two-codepoint sequence
    assert(got(3) == "x\u0301" && got(3).length == 2, got(3))
    assert(got(4) == "\u00e0\u00e3", got(4)) // a-grave a-tilde compose
    assert(got(5) == "")
  }

  test("JDK reference parity and idempotence over a generated matrix") {
    val bases = Seq("a", "e", "i", "o", "u", "n", "x", "q")
    val marks = Seq("\u0300", "\u0301", "\u0302", "\u0303", "\u0308")
    val inputs = for (b <- bases; m <- marks)
      yield s"pre $b$m mid ${b}${m}${m} end"
    val got = norm(inputs)
    inputs.zip(got).foreach { case (in, out) =>
      val ref = java.text.Normalizer.normalize(in,
        java.text.Normalizer.Form.NFC)
      assert(out == ref, s"input ${in.map(_.toInt)}")
      // idempotent: normalizing the output changes nothing
      assert(java.text.Normalizer.isNormalized(out,
        java.text.Normalizer.Form.NFC))
    }
  }

  test("the dedup motivation: spellings collide on md5 only after " +
      "normalization") {
    val d = Seq(("a", "caf\u00e9 menu"), ("b", "cafe\u0301 menu"))
      .toDF("id", "text")
    val rawKeys = d.select(md5(col("text")).as("k"))
      .collect().map(_.getString(0)).distinct
    assert(rawKeys.length == 2, "raw spellings must differ")
    val normKeys = d.select(
        md5(GraftFunctions.nfc_normalize(col("text"))).as("k"))
      .collect().map(_.getString(0)).distinct
    assert(normKeys.length == 1, "normalized spellings must collide")
  }
}
