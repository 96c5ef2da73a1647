package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) — the
  * normalize-before-you-hash step every text dedup pipeline owes its
  * corpus: `e` + COMBINING ACUTE and precomposed `é` are the same text
  * to a reader but different bytes to xxhash64/MinHash/exact dedup, so
  * un-normalized corpora silently miss duplicates (and double-count
  * n-grams) wherever sources disagree on composition. One row-local
  * projection over `java.text.Normalizer` (the JDK's Unicode NFC);
  * engine-comparable — DuckDB's `nfc_normalize` implements the same
  * standard, which is what oracle-gates t47.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * nearly all real corpus text (all of ASCII) is already NFC — the
  * common case pays one scan, not a rebuild. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeEval.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalizeEval.normalize($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helper (called from generated code). */
object NfcNormalizeEval {
  import java.text.Normalizer

  def normalize(input: UTF8String): UTF8String = {
    val s = input.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}
