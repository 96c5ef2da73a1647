package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The md5-family MinHash signature over a shingle array — the native
  * form of the oracle-replayable hash family used by d13/d14 and the
  * md5-family compositions (c13/c14/c15):
  *
  *   sig_i = min over shingles g of
  *     conv(substring(md5(concat(i, ":", g)), 1, 15), 16, 10)::long
  *
  * Bit-identical to the composed HOF form (`array_min(transform(...))`
  * per slot, k slots): the first 15 hex chars of an md5 digest are the
  * top 60 bits, i.e. `(first 8 digest bytes as a big-endian long) >>> 4`.
  *
  * Native for the usual reason (see [[MinHashSig]]): the k interpreted
  * `transform` HOFs evaluate outside whole-stage codegen and re-walk the
  * shingle array k times, allocating a boxed array per slot per row —
  * this computes all k mins in ONE pass over the shingles inside
  * codegen. The md5 calls themselves (k per shingle) are unchanged, as
  * they must be: the oracle replays them.
  *
  * Null/empty semantics mirror `array_min(transform(...))`: a null
  * shingle contributes nothing (skipped), an array with no non-null
  * shingles yields a null signature array.
  */
case class Md5MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "md5_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    Md5MinHashEval.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val f = "graft.functions.Md5MinHashEval.signature"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $f($c, $k);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static eval helper (called from generated code). */
object Md5MinHashEval {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def signature(arr: ArrayData, k: Int): GenericArrayData = {
    val m = arr.numElements()
    val md = mdLocal.get()
    val mins = Array.fill(k)(Long.MaxValue)
    // "i:" prefixes, encoded once per row (ASCII)
    val prefixes = new Array[Array[Byte]](k)
    var i = 0
    while (i < k) {
      prefixes(i) = (i.toString + ":").getBytes(
        java.nio.charset.StandardCharsets.US_ASCII)
      i += 1
    }
    var any = false
    var g = 0
    while (g < m) {
      if (!arr.isNullAt(g)) {
        any = true
        val gb = arr.getUTF8String(g).getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(prefixes(j))
          md.update(gb)
          val d = md.digest()
          // first 15 hex chars == top 60 bits of the digest
          val top =
            ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
            ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
            ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          val v = top >>> 4
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      g += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }
}
