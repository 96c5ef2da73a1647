package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Indices of the `p` nearest centroids to a float-vector column — the
  * IVF (inverted-file) coarse-quantizer probe. `centroidsFlat` is the
  * row-major concatenation of `nlist` L2-NORMALIZED centroids of length
  * `dim`, shipped with the plan as a reference object; ranking is by dot
  * product, which for normalized centroids orders identically to cosine
  * (the query's own norm is constant across centroids). Ties break on
  * the lower index, so assignment is deterministic.
  *
  * A native expression for the same reason as [[SignLsh]]: this runs
  * once per corpus row (assignment, p=1) and once per query row
  * (probing, p=nprobe) — a hot primitive loop of nlist×dim multiplies
  * that must stay inside whole-stage codegen.
  */
case class NearestCentroids(child: Expression, centroidsFlat: Array[Float],
    dim: Int, p: Int) extends UnaryExpression {

  require(dim > 0 && centroidsFlat.length % dim == 0,
    s"centroid block ${centroidsFlat.length} not a multiple of dim $dim")
  require(p > 0 && p <= centroidsFlat.length / dim,
    s"p=$p outside 1..${centroidsFlat.length / dim}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroidsEval.topP(input.asInstanceOf[ArrayData], centroidsFlat, dim, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroidsFlat, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroidsEval.topP($c, $ref, $dim, $p)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helper (called from generated code). */
object NearestCentroidsEval {

  def topP(arr: ArrayData, flat: Array[Float], dim: Int, p: Int): GenericArrayData = {
    val nlist = flat.length / dim
    val d = math.min(dim, arr.numElements())
    val v = new Array[Double](d)
    var i = 0
    while (i < d) { v(i) = arr.getFloat(i).toDouble; i += 1 }
    // partial selection: keep the best p of nlist (p is small — 1..64)
    val bestIdx = new Array[Int](p)
    val bestDot = new Array[Double](p)
    java.util.Arrays.fill(bestDot, Double.NegativeInfinity)
    var c = 0
    while (c < nlist) {
      var dot = 0.0
      var j = 0
      val base = c * dim
      while (j < d) { dot += v(j) * flat(base + j); j += 1 }
      // insert (dot, c) if it beats the current worst of the best-p
      if (dot > bestDot(p - 1)) {
        var k = p - 1
        while (k > 0 && bestDot(k - 1) < dot) {
          bestDot(k) = bestDot(k - 1); bestIdx(k) = bestIdx(k - 1); k -= 1
        }
        bestDot(k) = dot; bestIdx(k) = c
      }
      c += 1
    }
    new GenericArrayData(bestIdx)
  }
}
