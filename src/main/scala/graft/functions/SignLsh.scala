package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane (sign) LSH bucket keys for a float-vector column:
  * for each of `tables` hash tables, the bucket is the sign bit-pattern
  * of the vector against `planesPerTable` pseudo-random hyperplanes
  * (deterministic splitmix64 coefficients from `seed`).
  *
  * Exists as a native expression because the composed-built-ins form
  * (per-plane `aggregate(zip_with(...))`) evaluates higher-order
  * functions outside whole-stage codegen — measured ~6× slower at
  * sf0.1. One eval here is a tight primitive-double loop over
  * tables × planes × dim.
  */
case class SignLsh(child: Expression, tables: Int, planesPerTable: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh"

  override protected def nullSafeEval(input: Any): Any =
    SignLshEval.buckets(input.asInstanceOf[ArrayData], tables, planesPerTable, seed)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignLshEval.buckets($c, $tables, $planesPerTable, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static eval helper (called from generated code); planes are cached
  * per (tables, planesPerTable, dim, seed) process-wide. */
object SignLshEval {
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Long), Array[Array[Double]]]()

  def buckets(arr: ArrayData, tables: Int, planesPerTable: Int, seed: Long): GenericArrayData = {
    val dim = arr.numElements()
    val ps = planeCache.computeIfAbsent((tables, planesPerTable, dim, seed),
      _ => SignLsh.planes(tables * planesPerTable, dim, seed))
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = arr.getFloat(i).toDouble; i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val plane = ps(t * planesPerTable + p)
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += v(j) * plane(j); j += 1 }
        if (dot >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

object SignLsh {
  /** Deterministic pseudo-random planes in (-1, 1), splitmix64 over
    * (plane, dim) — the same family for every caller so bucket keys are
    * comparable across frames. */
  def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    def mix(x: Long): Long = {
      var z = x * 0x9e3779b97f4a7c15L + 0x243f6a8885a308d3L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(nPlanes, dim)((p, j) =>
      mix(seed + p.toLong * 131071L + j).toDouble / Long.MaxValue.toDouble)
  }
}
