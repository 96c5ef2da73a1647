package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply one BPE merge to a symbol array: every adjacent (left, right)
  * pair becomes the single symbol left+right, scanning left to right
  * without overlap (the standard BPE application order: "aaa" under
  * (a,a) → ["aa","a"]). One merge instance per training iteration —
  * the apply half of [[graft.operators.Training.bpeTrain]]'s loop.
  *
  * Native for the usual reason: the composed form would be an
  * `aggregate`/`transform` lambda chain evaluated interpreted per word;
  * this is one primitive scan inside codegen with the pair shipped as
  * plan constants.
  */
case class MergePair(child: Expression, left: String, right: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "merge_pair"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"merge_pair requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val pair = MergePairEval.build(Array(left, right))

  override protected def nullSafeEval(input: Any): Any =
    MergePairEval.merge(input.asInstanceOf[ArrayData], pair)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrRef = ctx.addReferenceObj("mergePair", Array(left, right),
      "java.lang.String[]")
    val pairVar = ctx.addMutableState(
      "org.apache.spark.unsafe.types.UTF8String[]", "graftMergePair",
      v => s"$v = graft.functions.MergePairEval.build($arrRef);")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MergePairEval.merge($c, $pairVar)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helpers (called from generated code). */
object MergePairEval {
  /** [left, right, left+right] as UTF8Strings, built once per instance. */
  def build(pair: Array[String]): Array[UTF8String] = Array(
    UTF8String.fromString(pair(0)),
    UTF8String.fromString(pair(1)),
    UTF8String.fromString(pair(0) + pair(1)))

  def merge(arr: ArrayData, pair: Array[UTF8String]): GenericArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && !arr.isNullAt(i) && !arr.isNullAt(i + 1) &&
          arr.getUTF8String(i).equals(pair(0)) &&
          arr.getUTF8String(i + 1).equals(pair(1))) {
        out.add(pair(2))
        i += 2
      } else {
        // clone: the input may be an UnsafeArrayData view into a reused
        // row buffer; the output must own its bytes
        out.add(if (arr.isNullAt(i)) null else arr.getUTF8String(i).clone())
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}
