package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The C4 line gate (Raffel et al. 2020, arXiv 1910.10683 §2.2) over an
  * array of lines: keep a line iff it ends in terminal punctuation
  * (`.`, `!`, `?`), has at least `minWords` whitespace words, and
  * contains none of the `banned` substrings (case-insensitive —
  * C4 drops any line with the word "javascript"). Order preserved.
  *
  * Native for the [[MarkerCount]] reason: the composed form is a
  * `filter` lambda with a regex match, a split, and a per-banned-term
  * scan per line, all interpreted — on the map stage that touches every
  * line of the corpus. Here it is one primitive pass per line inside
  * codegen. NULL array yields NULL; NULL lines are dropped (a null line
  * has no terminal punctuation).
  *
  * Exact-parity contract with the oracle dialect: word counts split the
  * TRIMMED line on `\s+` (an empty line counts 1, matching
  * `string_split_regex` / Spark `split` on empty input), the terminal
  * check reads the RAW line's last character, and banned matching is
  * substring-of-lowercased-line.
  */
case class C4LineGate(child: Expression, minWords: Int, banned: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "c4_line_gate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"c4_line_gate requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val bannedU = C4LineGateEval.build(banned.toArray)

  override protected def nullSafeEval(input: Any): Any =
    C4LineGateEval.gate(input.asInstanceOf[ArrayData], minWords, bannedU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrRef = ctx.addReferenceObj("bannedTerms", banned.toArray,
      "java.lang.String[]")
    val bannedVar = ctx.addMutableState("java.lang.String[]", "graftC4Banned",
      v => s"$v = graft.functions.C4LineGateEval.build($arrRef);")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.C4LineGateEval.gate($c, $minWords, $bannedVar)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helpers (called from generated code). */
object C4LineGateEval {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  def build(banned: Array[String]): Array[String] =
    banned.map(_.toLowerCase(java.util.Locale.ROOT))

  private def keep(line: UTF8String, minWords: Int,
      banned: Array[String]): Boolean = {
    val s = line.toString
    if (s.isEmpty) return false
    val last = s.charAt(s.length - 1)
    if (last != '.' && last != '!' && last != '?') return false
    // trim like Spark's trim() (ASCII spaces), then \s+ split: an empty
    // remainder still yields one (empty) token — same as the SQL dialects
    if (ws.split(line.trim.toString, -1).length < minWords) return false
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i < banned.length) {
      if (lower.contains(banned(i))) return false
      i += 1
    }
    true
  }

  def gate(arr: ArrayData, minWords: Int,
      banned: Array[String]): GenericArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getUTF8String(i)
        // clone: the input may be an UnsafeArrayData view into a reused
        // row buffer; the output must own its bytes
        if (keep(v, minWords, banned)) out.add(v.clone())
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
