package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): an embedding is unit-
  * normalized, split into `m` contiguous subspaces of `dim/m` dims, and
  * each subvector is replaced by the index of its nearest codeword from a
  * per-subspace codebook of `ks` entries. A 64-dim float vector (256 B)
  * becomes m packed bytes — the memory-bandwidth
  * reduction that makes exhaustive scans viable at corpus scale.
  *
  * Query-time scoring is asymmetric distance computation (ADC): the query
  * precomputes a lookup table of its subvector dot products against every
  * codeword ([[PqLut]], m×ks doubles, once per query), and each corpus
  * row's approximate cosine is then m table lookups ([[PqAdc]]) instead
  * of dim multiplies.
  *
  * All three run once per corpus row or per query row — hot primitive
  * loops that must stay inside whole-stage codegen, hence native
  * expressions with `doGenCode` (same reasoning as [[NearestCentroids]]).
  * `codebook` rides with the plan as a reference object: m·ks·(dim/m)
  * floats — e.g. 64 KB at m=8, ks=256, dim=64 — broadcast like any
  * small model.
  *
  * Codes are PACKED: the output is `binary` — exactly m bytes per row
  * (hence ks ≤ 256; wider codebooks would trade m up instead). At corpus
  * scale the codes column IS the stored index, and m raw bytes beat an
  * `array<int>` layout (8-byte UnsafeArrayData header + null bitmap +
  * 4 bytes/element) by ~5× in storage and scan bandwidth.
  */
case class PqEncode(child: Expression, codebook: Array[Float],
    dim: Int, m: Int) extends UnaryExpression {

  require(m > 0 && dim % m == 0, s"dim $dim not divisible by m $m")
  require(codebook.length % (dim / m * m) == 0, "codebook shape mismatch")
  require(codebook.length / dim <= 256,
    s"ks ${codebook.length / dim} exceeds byte-code range; raise m instead")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqEval.encode(input.asInstanceOf[ArrayData], codebook, dim, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqEval.encode($c, $ref, $dim, $m)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-query ADC lookup table: unit-normalizes the query and emits the
  * m×ks doubles `lut[j*ks + c] = dot(q_j, codebook_j[c])`. Run once per
  * query row. */
case class PqLut(child: Expression, codebook: Array[Float],
    dim: Int, m: Int) extends UnaryExpression {

  require(m > 0 && dim % m == 0, s"dim $dim not divisible by m $m")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqEval.lut(input.asInstanceOf[ArrayData], codebook, dim, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqEval.lut($c, $ref, $dim, $m)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ADC score of a packed code column against a query's lookup table:
  * `Σ_j lut[j*ks + (codes[j] & 0xFF)]` ≈ cosine(query, original vector)
  * for unit-normalized inputs. The per-corpus-row hot loop — m additions
  * and lookups over m raw bytes, no float multiplies. */
case class PqAdc(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  require(ks > 0 && ks <= 256, "ks must be in 1..256 for byte codes")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (binary, array<double>), got (${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqEval.adc(codes.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.PqEval.adc($c, $l, $ks)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Norm-corrected ADC lookup table: the first m×ks doubles are the
  * subvector dot products ([[PqLut]]'s table), the second m×ks are the
  * squared norms ‖codeword‖² — what [[PqAdcCos]] needs to estimate the
  * true cosine `dot(q, x̂)/‖x̂‖` instead of the raw dot. The raw-dot ADC
  * implicitly assumes ‖x̂‖ ≈ 1, but k-means centroids sit INSIDE the
  * shell of their cluster (norm shrinkage), and when shrinkage varies
  * across codewords the raw dot is biased toward large-norm
  * reconstructions — measured on rotated anisotropic data: an EXACT
  * copy's own code ranked below random competitors. Subspaces are
  * orthogonal slices, so ‖x̂‖² = Σ_j ‖c_j‖² — m more lookups, no new
  * per-row float math. */
case class PqLutCos(child: Expression, codebook: Array[Float],
    dim: Int, m: Int) extends UnaryExpression {

  require(m > 0 && dim % m == 0, s"dim $dim not divisible by m $m")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut_cos"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_lut_cos requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqEval.lutCos(input.asInstanceOf[ArrayData], codebook, dim, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqEval.lutCos($c, $ref, $dim, $m)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Norm-corrected ADC score against a [[PqLutCos]] table:
  * `Σ_j dot_j / sqrt(Σ_j ‖c_j‖²)` ≈ cosine(query, original) with the
  * reconstruction-norm bias removed. 2m lookups per corpus row. */
case class PqAdcCos(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  require(ks > 0 && ks <= 256, "ks must be in 1..256 for byte codes")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cos"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_cos requires (binary, array<double>), got (${l.catalogString}, ${r.catalogString})")
  }

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqEval.adcCos(codes.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.PqEval.adcCos($c, $l, $ks)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static eval helpers (called from generated code). */
object PqEval {

  /** Unit-normalized copy of a float-array column value. */
  private def normalized(arr: ArrayData, dim: Int): Array[Double] = {
    val d = math.min(dim, arr.numElements())
    val v = new Array[Double](dim)
    var s = 0.0
    var i = 0
    while (i < d) { val x = arr.getFloat(i).toDouble; v(i) = x; s += x * x; i += 1 }
    if (s > 0) {
      val inv = 1.0 / math.sqrt(s)
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  def encode(arr: ArrayData, codebook: Array[Float], dim: Int, m: Int): Array[Byte] = {
    val sub = dim / m
    val ks = codebook.length / dim // = codebook.length / (m * sub)
    val v = normalized(arr, dim)
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val vBase = j * sub
      val cbBase = j * ks * sub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        var d2 = 0.0
        var i = 0
        val base = cbBase + c * sub
        while (i < sub) {
          val diff = v(vBase + i) - codebook(base + i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c } // ties keep the lower index
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    codes
  }

  def lut(arr: ArrayData, codebook: Array[Float], dim: Int, m: Int): GenericArrayData = {
    val sub = dim / m
    val ks = codebook.length / dim
    val v = normalized(arr, dim)
    val out = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      val vBase = j * sub
      val cbBase = j * ks * sub
      var c = 0
      while (c < ks) {
        var dot = 0.0
        var i = 0
        val base = cbBase + c * sub
        while (i < sub) { dot += v(vBase + i) * codebook(base + i); i += 1 }
        out(j * ks + c) = dot
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def adc(codes: Array[Byte], lut: ArrayData, ks: Int): Double = {
    val m = codes.length
    var s = 0.0
    var j = 0
    while (j < m) { s += lut.getDouble(j * ks + (codes(j) & 0xFF)); j += 1 }
    s
  }

  def lutCos(arr: ArrayData, codebook: Array[Float], dim: Int,
      m: Int): GenericArrayData = {
    val sub = dim / m
    val ks = codebook.length / dim
    val v = normalized(arr, dim)
    val out = new Array[Double](2 * m * ks)
    var j = 0
    while (j < m) {
      val vBase = j * sub
      val cbBase = j * ks * sub
      var c = 0
      while (c < ks) {
        var dot = 0.0
        var n2 = 0.0
        var i = 0
        val base = cbBase + c * sub
        while (i < sub) {
          val cw = codebook(base + i).toDouble
          dot += v(vBase + i) * cw
          n2 += cw * cw
          i += 1
        }
        out(j * ks + c) = dot
        out(m * ks + j * ks + c) = n2
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def adcCos(codes: Array[Byte], lut: ArrayData, ks: Int): Double = {
    val m = codes.length
    var s = 0.0
    var n2 = 0.0
    var j = 0
    while (j < m) {
      val c = codes(j) & 0xFF
      s += lut.getDouble(j * ks + c)
      n2 += lut.getDouble(m * ks + j * ks + c)
      j += 1
    }
    if (n2 == 0) 0.0 else s / math.sqrt(n2)
  }
}
