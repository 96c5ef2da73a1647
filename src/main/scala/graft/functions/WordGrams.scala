package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word `n`-gram shingles of a text column — the shingle stage
  * every corpus-wide dedup/contamination operator explodes (reference
  * semantics: whitespace tokens, space-joined n-grams, first-occurrence
  * distinct; fewer than `n` tokens falls back to the whole text as one
  * shingle).
  *
  * Native for the usual reason: the composed form (`split` +
  * `transform(sequence(...), element_at ...)` + `array_distinct`)
  * evaluates the lambda OUTSIDE whole-stage codegen with a per-token
  * `element_at` walk — O(tokens·n) interpreted calls per document on the
  * hottest scans in the engine (d02/d03-verify/d06/d08). Here it's one
  * tokenizer pass and one hash-set dedup inside codegen.
  *
  * Output order and values are bit-identical to the composed form, so
  * the DuckDB oracles are unaffected. One deliberate divergence: NULL
  * text yields NULL (standard null-safe expression semantics) where the
  * composed form yielded `[NULL]` — an exploded null gram row that
  * would have polluted totals; corpus text columns are non-null, and
  * NULL-in/NULL-out is the behavior a caller would want anyway.
  *
  * `distinct = false` keeps every occurrence in order — the form
  * repetition statistics need (t21 counts gram OCCURRENCES; a distinct
  * list would erase exactly the signal being measured). The non-distinct
  * form also drops the whole-text fallback: fewer than `n` tokens means
  * there ARE no n-grams, so it yields an empty array (the fallback is a
  * dedup-side convention so short docs still carry one shingle).
  */
case class WordGrams(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_grams requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordGramsEval.grams(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordGramsEval.grams($c, $n, $distinct)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helper (called from generated code). */
object WordGramsEval {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  def grams(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    // UTF8String.trim strips ASCII spaces only — Spark's trim(), not
    // Java's String.trim (which also strips tabs/newlines and would
    // drop the leading empty token the composed form keeps)
    val toks = ws.split(text.trim.toString, -1)
    if (toks.length < n)
      return if (distinct) new GenericArrayData(Array[Any](text))
        else new GenericArrayData(Array.empty[Any])
    // LinkedHashSet preserves first-occurrence order; the occurrence
    // list just appends — both emit grams in text order
    val seen = if (distinct) new java.util.LinkedHashSet[String]() else null
    val all = if (distinct) null else new java.util.ArrayList[Any]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var o = 0
      while (o < n) {
        if (o > 0) sb.append(' ')
        sb.append(toks(i + o))
        o += 1
      }
      if (distinct) seen.add(sb.toString)
      else all.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    if (!distinct) return new GenericArrayData(all.toArray)
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
