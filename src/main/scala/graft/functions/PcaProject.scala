package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Project a float vector onto a fixed set of component directions —
  * the encode half of PCA dimensionality reduction (and of any learned
  * linear map: OPQ rotations, random projections with learned axes).
  * Output coordinate c is the dot product of the input with
  * `components(c)`, accumulated in double in ascending dimension order
  * (a DEFINED order, so reference implementations can match it
  * bit-for-bit) and cast to float.
  *
  * Native for the usual reason: the per-row k×d multiply is the hot
  * corpus-encode loop; `aggregate`/`zip_with` lambda chains run
  * interpreted per row. The trained matrix rides the plan as constants
  * ([[CodegenContext.addReferenceObj]]) — encoding 100 TB is a
  * shuffle-free map stage.
  */
case class PcaProject(child: Expression, components: Seq[Seq[Double]])
    extends UnaryExpression {

  require(components.nonEmpty, "pca_project: no components")
  require(components.forall(_.length == components.head.length),
    "pca_project: ragged component matrix")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pca_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pca_project requires array<float>, got ${other.catalogString}")
  }

  @transient private lazy val matrix: Array[Array[Double]] =
    components.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    PcaProjectEval.project(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("pcaComponents", matrix, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PcaProjectEval.project($c, $matRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helper (called from generated code). */
object PcaProjectEval {
  def project(arr: ArrayData, m: Array[Array[Double]]): GenericArrayData = {
    val d = m(0).length
    require(arr.numElements() == d,
      s"pca_project: vector has ${arr.numElements()} dims, components $d")
    val v = arr.toFloatArray()
    val out = new Array[Any](m.length)
    var c = 0
    while (c < m.length) {
      val row = m(c)
      var acc = 0.0
      var i = 0
      while (i < d) { acc += row(i) * v(i); i += 1 }
      out(c) = acc.toFloat
      c += 1
    }
    new GenericArrayData(out)
  }
}
