package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Remove every element of a string array that belongs to a fixed
  * excluded set, preserving order — the cleanup half of corpus-level
  * line deduplication (t20): the frequent-line set rides the plan, each
  * document filters its lines row-locally, and reassembly needs no
  * shuffle at all.
  *
  * Native for the [[MarkerCount]] reason: the composed form
  * (`filter(lines, l => !array_contains(litSet, l))`) evaluates its
  * lambda interpreted, outside whole-stage codegen, and scans the
  * excluded set LINEARLY per line — O(lines · |set|) on what is a plain
  * map stage over the full corpus. Here it is one primitive loop with
  * O(1) hash probes against a set built once per generated class.
  *
  * NULL array yields NULL; NULL elements are kept (membership of NULL
  * in a string set is vacuously false).
  */
case class ArrayExclude(child: Expression, excluded: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def prettyName: String = "array_exclude"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_exclude requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val set = ArrayExcludeEval.build(excluded.toArray)

  override protected def nullSafeEval(input: Any): Any =
    ArrayExcludeEval.exclude(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship plain strings with the plan; build the UTF8String set once per
    // generated class instance
    val arrRef = ctx.addReferenceObj("excludedLines", excluded.toArray,
      "java.lang.String[]")
    val setVar = ctx.addMutableState("java.util.HashSet", "graftExcludeSet",
      v => s"$v = graft.functions.ArrayExcludeEval.build($arrRef);")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ArrayExcludeEval.exclude($c, $setVar)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helpers (called from generated code). */
object ArrayExcludeEval {
  def build(xs: Array[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(xs.length * 2, 16))
    xs.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }

  def exclude(arr: ArrayData, set: java.util.HashSet[UTF8String])
      : GenericArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) out.add(null)
      else {
        val v = arr.getUTF8String(i)
        // clone: the input may be an UnsafeArrayData view into a reused
        // row buffer; the output must own its bytes
        if (!set.contains(v)) out.add(v.clone())
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
