package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements present in a fixed marker-word set
  * (optionally lowercased first) — the stopword-ratio and language-ID
  * scoring primitive of [[graft.operators.TextAnalysis]].
  *
  * Exists as a native expression because the composed form —
  * `size(filter(toks, t => t.isInCollection(markers)))` — carries a
  * `LambdaFunction`, and higher-order functions evaluate interpreted,
  * outside whole-stage codegen. Text quality/langid are single-map-stage
  * operators over the full corpus: at 100 TB that lambda is the hot
  * loop. Here the per-row cost is one primitive loop over the tokens
  * with O(1) hash probes against a set built once per generated class.
  */
case class MarkerCount(child: Expression, markers: Seq[String], lowercase: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "marker_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"marker_count requires array<string>, got ${other.catalogString}")
    }

  @transient private lazy val set = MarkerCountEval.build(markers.toArray)

  override protected def nullSafeEval(input: Any): Any =
    MarkerCountEval.count(input.asInstanceOf[ArrayData], set, lowercase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the plain strings with the plan; build the UTF8String set once
    // per generated class instance
    val arrRef = ctx.addReferenceObj("markerWords", markers.toArray, "java.lang.String[]")
    val setVar = ctx.addMutableState("java.util.HashSet", "graftMarkerSet",
      v => s"$v = graft.functions.MarkerCountEval.build($arrRef);")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MarkerCountEval.count($c, $setVar, $lowercase)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helpers (called from generated code). */
object MarkerCountEval {
  def build(markers: Array[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.length * 2)
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  def count(arr: ArrayData, set: java.util.HashSet[UTF8String],
      lowercase: Boolean): Int = {
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (set.contains(if (lowercase) t.toLowerCase else t)) n += 1
      }
      i += 1
    }
    n
  }
}
