package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-LSH bucket keys under the md5-derived INTEGER hyperplane family
  * — [[SignLsh]]'s oracle twin (the d13/d14/d15 hash-family treatment
  * applied to the ANN stack): every hyperplane component is a small
  * integer derived from `md5("salt:table:plane:dim")`, the vector
  * quantizes to `floor(v·2^qBits)`, and the dot product is exact integer
  * arithmetic — sums stay under 2^40, so an independent engine (DuckDB
  * over the same md5 strings) replays the signature, the sign bits, and
  * the bucket keys bit-for-bit. The LIVE family ([[SignLsh]]) keeps its
  * splitmix double planes: a float dot's value is summation-exact here
  * too, but its hyperplanes are not SQL-derivable (adjudicated in
  * COVERAGE.md); this family exists so the identical candidate machinery
  * ([[graft.operators.Similarity.lshTopK]]) runs under a replayable one.
  *
  * Same shape contract as [[SignLsh]]: one array<long> of per-table
  * buckets, planes cached per geometry, a tight primitive loop (HOF
  * composition of the same math measured ~6× slower — see SignLsh).
  */
case class IntSignLsh(child: Expression, tables: Int, planesPerTable: Int,
    salt: String, qBits: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "int_sign_lsh"

  override protected def nullSafeEval(input: Any): Any =
    IntSignLshEval.buckets(input.asInstanceOf[ArrayData], tables,
      planesPerTable, salt, qBits)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IntSignLshEval.buckets($c, $tables, $planesPerTable, $saltRef, $qBits)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static eval helper (called from generated code); integer hyperplanes
  * cached per (tables, planes, dim, salt) process-wide. */
object IntSignLshEval {
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, String), Array[Array[Long]]]()

  /** First 15 hex chars of md5(s) as a non-negative long — the exact
    * value DuckDB's `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`
    * and Spark SQL's `conv(substring(md5(s),1,15),16,10)` produce. */
  def md5Long15(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new StringBuilder(32)
    d.foreach(b => hex.append(f"${b & 0xff}%02x"))
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Hyperplane component for (table, plane, dim j): md5-derived integer
    * in [-15, 15] — `(md5long % 31) - 15`, both operands non-negative so
    * the `%` agrees across engines. */
  def planes(tables: Int, planesPerTable: Int, dim: Int, salt: String): Array[Array[Long]] =
    Array.tabulate(tables * planesPerTable, dim)((tp, j) =>
      md5Long15(s"$salt:${tp / planesPerTable}:${tp % planesPerTable}:$j") % 31L - 15L)

  def buckets(arr: ArrayData, tables: Int, planesPerTable: Int,
      salt: String, qBits: Int): GenericArrayData = {
    val dim = arr.numElements()
    val ps = planeCache.computeIfAbsent((tables, planesPerTable, dim, salt),
      _ => planes(tables, planesPerTable, dim, salt))
    val scale = (1L << qBits).toDouble
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      q(i) = math.floor(arr.getFloat(i).toDouble * scale).toLong
      // dot sums must stay exact in BOTH engines (64 dims × |h| ≤ 15 ×
      // |q| ≤ 2^40 < 2^50 < BIGINT) — a huge component would saturate
      // toLong here while DuckDB errors on the BIGINT cast: fail LOUDLY
      // instead of diverging
      require(math.abs(q(i)) <= (1L << 40),
        s"int_sign_lsh: |component| ${arr.getFloat(i)} exceeds the " +
          s"exact-arithmetic bound 2^${40 - qBits} at qBits=$qBits")
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val plane = ps(t * planesPerTable + p)
        var dot = 0L
        var j = 0
        while (j < dim) { dot += q(j) * plane(j); j += 1 }
        if (dot >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
