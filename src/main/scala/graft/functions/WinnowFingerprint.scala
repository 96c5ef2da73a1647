package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (the rolling-hash fingerprint of the
  * north-star list): polynomial rolling hash over character k-grams, then
  * the MOSS selection rule — in every window of `w` consecutive k-gram
  * hashes keep the minimum, rightmost on ties, recording a hash whenever
  * the selected position changes (Schleimer/Wilkerson/Aiken, "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — a public
  * algorithm). The guarantee: any substring match of length ≥ w + k - 1
  * between two documents shares at least one fingerprint, so a
  * fingerprint-overlap join finds partial-copy pairs without comparing
  * full texts.
  *
  * Row-local and codegen'd: one O(n) pass per document (rolling hash +
  * monotonic-deque window minimum), no HOFs.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, s"need k>=2, w>=1; got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowEval.prints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowEval.prints($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helper (called from generated code). */
object WinnowEval {

  private val Base = 1000003L

  /** splitmix64 finalizer — spreads the polynomial hash so window minima
    * are uniform. */
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def prints(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val str = s.toString
    val n = str.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 } // Base^(k-1), wrap-around ok
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + str.charAt(i); i += 1 }
    hashes(0) = mix(h)
    i = k
    while (i < n) {
      h = (h - str.charAt(i - k) * pow) * Base + str.charAt(i)
      hashes(i - k + 1) = mix(h)
      i += 1
    }

    val win = math.min(w, m) // short docs: one global window
    // monotonic deque of indices, values ascending front→back; evicting
    // equal values on push makes the FRONT the rightmost minimum
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var lastSel = -1
    i = 0
    while (i < m) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1 && deque(head) != lastSel) {
        lastSel = deque(head)
        out += hashes(lastSel)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
