package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2's byte-level text encoding (Radford et al. 2019; the
  * `bytes_to_unicode` table every byte-level BPE tokenizer uses): each
  * UTF-8 BYTE of the input maps to one printable unicode character —
  * printable latin bytes map to themselves, everything else (controls,
  * whitespace, high bytes) shifts into a contiguous block above 255.
  * The map is a bijection, so `inverse = true` recovers the exact
  * original bytes: tokenizers trained on the mapped alphabet can
  * represent ANY byte sequence (emoji, CJK, binary junk in a crawl)
  * with a 256-symbol base vocabulary and zero unknown tokens.
  *
  * Codegen'd like [[MergePair]]: the corpus map stage stays a
  * shuffle-free projection.
  */
case class ByteMap(child: Expression, inverse: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = if (inverse) "byte_unmap" else "byte_map"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    if (inverse) ByteMapEval.unmap(input.asInstanceOf[UTF8String])
    else ByteMapEval.map(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      if (inverse) s"graft.functions.ByteMapEval.unmap($c)"
      else s"graft.functions.ByteMapEval.map($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helpers + the canonical tables. */
object ByteMapEval {

  /** byte value → mapped code point: printable ranges 33–126, 161–172,
    * 174–255 map to themselves; the remaining 68 bytes map to 256+k in
    * byte order (the public GPT-2 construction). */
  val toChar: Array[Char] = {
    val out = new Array[Char](256)
    var shift = 0
    var b = 0
    while (b < 256) {
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
        (b >= 174 && b <= 255)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
      b += 1
    }
    out
  }

  private val fromChar: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](512)
    toChar.zipWithIndex.foreach { case (c, b) => m.put(c, b.toByte) }
    m
  }

  def map(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val chars = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      chars(i) = toChar(bytes(i) & 0xff)
      i += 1
    }
    UTF8String.fromString(new String(chars))
  }

  def unmap(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) {
      val b = fromChar.get(Character.valueOf(str.charAt(i)))
      require(b != null,
        s"byte_unmap: character U+${str.charAt(i).toInt.toHexString} is not in the byte alphabet")
      out(i) = b.byteValue()
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
