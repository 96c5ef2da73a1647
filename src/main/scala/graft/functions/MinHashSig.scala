package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature of a token array: word `n`-gram shingles are hashed
  * (FNV-1a-64 over the joined shingle), and each of the `k` signature
  * slots keeps the minimum of a derived hash `mix(base, i)`. Fewer than
  * `n` tokens → the whole token sequence is the single shingle.
  *
  * Native expression for the same reason as [[SignLsh]]: the composed
  * form (`transform` + `array_min` HOFs per slot) evaluates outside
  * whole-stage codegen — measured ~10 s for 5 000 docs at sf0.1 vs
  * sub-second here. Duplicate shingles need no dedup (min over a
  * multiset equals min over its set).
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashEval.signature(input.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashEval.signature($c, $n, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static eval helper (called from generated code). */
object MinHashEval {
  def signature(arr: ArrayData, n: Int, k: Int): GenericArrayData = {
    val m = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)

    def consume(shingle: String): Unit = {
      val base = SimHash.fnv1a64(shingle)
      var i = 0
      while (i < k) {
        // splitmix-style derivation of the i-th hash function
        var z = base + i * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= (z >>> 31)
        if (z < mins(i)) mins(i) = z
        i += 1
      }
    }

    def token(i: Int): String =
      if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString

    if (m < n) {
      consume((0 until m).map(token).mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= m - n) {
        sb.setLength(0)
        var o = 0
        while (o < n) {
          if (o > 0) sb.append(' ')
          sb.append(token(i + o))
          o += 1
        }
        consume(sb.toString)
        i += 1
      }
    }
    new GenericArrayData(mins)
  }
}

/** Exact sequential-sum cosine similarity of two float arrays, in double
  * precision — `dot/(sqrt(dot_aa)*sqrt(dot_bb))` with ascending-index
  * summation, matching the DuckDB oracle's `list_sum(list_transform(...))`
  * bit-for-bit. Native because per-pair `aggregate(zip_with(...))` HOFs
  * dominate candidate scoring at scale.
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineEval.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // real codegen (via the static helper) keeps candidate-scoring
  // projections inside whole-stage codegen
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineEval.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static helper the generated code calls (Scala object → static
  * forwarders visible to Janino). */
object CosineEval {
  def cosine(x: ArrayData, y: ArrayData): Double = {
    val m = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var j = 0
    while (j < m) {
      val xv = x.getFloat(j).toDouble
      val yv = y.getFloat(j).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      j += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
