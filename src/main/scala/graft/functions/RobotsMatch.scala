package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 robots pattern match of a URL path (left) against a rule
  * pattern (right): literal prefix, `*` wildcards, trailing `$` anchor
  * ([[graft.kernel.Robots.patternMatches]]). Native so the urls×rules
  * verdict join keeps its filter inside whole-stage codegen — the rule
  * pattern is a JOINED COLUMN, not a plan constant, which rules out the
  * addReferenceObj form the other kernels use. */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_match"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"robots_match requires (string, string), got $other")
    }

  override protected def nullSafeEval(path: Any, pattern: Any): Any =
    RobotsMatchEval.matches(path.asInstanceOf[UTF8String],
      pattern.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, q) =>
      s"graft.functions.RobotsMatchEval.matches($p, $q)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Static eval helper (called from generated code). */
object RobotsMatchEval {
  def matches(path: UTF8String, pattern: UTF8String): Boolean =
    graft.kernel.Robots.patternMatches(pattern.toString, path.toString)
}
