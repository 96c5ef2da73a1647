package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over a token array (Charikar similarity hashing):
  * each token is FNV-1a-64 hashed; bit j of the result is the sign of the
  * vote sum over tokens' j-th bits. Near-identical documents differ in
  * few bits, so hamming distance ≤ k is a near-dup predicate that needs
  * no pairwise text comparison — at scale candidates come from grouping
  * on rotated bit-blocks of the signature.
  *
  * Row-local, deterministic across engines/JVMs (no JVM hashCode).
  */
object SimHash {

  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhash64(tokens: Iterator[String]): Long = {
    val votes = new Array[Int](64)
    while (tokens.hasNext) {
      val h = fnv1a64(tokens.next())
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Static entry for generated code: simhash of a token ArrayData. */
  def ofTokenArray(arr: ArrayData): Long = {
    val it = (0 until arr.numElements()).iterator
      .filterNot(arr.isNullAt)
      .map(i => arr.getUTF8String(i).toString)
    simhash64(it)
  }
}

/** `simhash64(array<string>) -> long` Catalyst expression. */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash.ofTokenArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.ofTokenArray($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
