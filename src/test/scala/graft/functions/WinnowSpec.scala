package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

/** Winnowing fingerprints: the selection guarantee (shared substring of
  * length >= w + k - 1 shares a print), determinism, and codegen
  * execution of the expression.
  */
class WinnowSpec extends SparkSuite {

  private val K = 8
  private val W = 16

  private def prints(s: String): Set[Long] =
    WinnowEval.prints(UTF8String.fromString(s), K, W)
      .toLongArray().toSet

  test("deterministic; short strings fingerprint to empty") {
    val s = "a document long enough to produce several fingerprints, repeated words and all"
    assert(prints(s) == prints(s))
    assert(prints(s).nonEmpty)
    assert(prints("short") == Set.empty)
  }

  test("winnowing guarantee: shared region >= w+k-1 chars shares a print") {
    // 40-char common region (> W + K - 1 = 23) in different surroundings
    val common = "the quick brown fox jumps over the lazy "
    assert(common.length >= W + K - 1)
    val a = "PREFIX-ONE " + common + " SUFFIX-ALPHA"
    val b = "completely different lead-in text here: " + common + " and another tail"
    val shared = prints(a).intersect(prints(b))
    assert(shared.nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("unrelated documents do not collide") {
    val a = prints("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val b = prints("one two three four five six seven eight nine ten eleven twelve")
    assert(a.intersect(b).isEmpty)
  }

  test("expression executes inside codegen and t08 shape is sane") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "tiny")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        GraftFunctions.winnow_fingerprint(col("text"), K, W).as("fp"))
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[Long](1).nonEmpty)
    assert(got(1).getSeq[Long](1).isEmpty)
    // overlap-join shape: fingerprints explode to a join key
    val docs = graft.Tables.documents(spark, sf0001).limit(50)
    val fps = docs.select(col("doc_id"),
      explode(GraftFunctions.winnow_fingerprint(col("text"), K, W)).as("fp"))
    assert(fps.count() > 0)
  }
}
