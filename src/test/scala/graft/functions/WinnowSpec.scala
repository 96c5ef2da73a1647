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

  test("t51 closed-form selection ≡ the deque algorithm on shared md5 hashes") {
    // t51's slice/argmin/consecutive-dedup formulation must emit the
    // EXACT sequence WinnowEval's monotonic deque emits — run the deque
    // (verbatim semantics: evict-equal-on-push rightmost minimum, emit
    // on argmin-index change) over the same md5-derived hashes and
    // compare every document's print string against the registered query
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(gram: String): Long = {
      val hex = md.digest(gram.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def deque(t0: String): Seq[Long] = {
      // CODE-POINT semantics throughout — the product sides (Spark
      // substring/substr, DuckDB substr) count code points, so the
      // reference must too or a non-BMP char in the fixture would
      // split cap and k-gram windows at different positions
      val cps = t0.codePoints().toArray.take(200)
      def cpSub(from: Int, until: Int): String =
        new String(cps, from, until - from)
      if (cps.length < K) return Seq.empty
      val hs = (0 to cps.length - K).map(p => h(cpSub(p, p + K))).toArray
      val m = hs.length
      val win = math.min(W, m)
      val dq = new Array[Int](m)
      var head = 0; var tail = 0; var lastSel = -1
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      var i = 0
      while (i < m) {
        while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - win) head += 1
        if (i >= win - 1 && dq(head) != lastSel) {
          lastSel = dq(head); out += hs(lastSel)
        }
        i += 1
      }
      out.toSeq
    }
    val got = graft.SparkEntry.queries("t51_winnow_md5")(spark, sf0001)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("prints")).toMap
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val want = deque(r.getString(1)).mkString("-")
      assert(got(r.getLong(0)) == want,
        s"doc ${r.getLong(0)}: closed form diverges from the deque")
    }
  }
}
