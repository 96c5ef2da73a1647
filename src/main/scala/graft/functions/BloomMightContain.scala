package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a broadcast filter, as a native
  * expression with real codegen.
  *
  * This is the probe-side filter of [[graft.operators.Sketches]]' bloom-
  * prefiltered join — it runs once per row of the BIGGEST table in the
  * system, exactly the stage the sketch exists to accelerate. A black-box
  * Scala UDF there breaks whole-stage codegen for the entire scan-filter
  * pipeline; this expression keeps the scan → filter → shuffle-write span
  * fused (asserted in SketchesSpec via the executed plan).
  *
  * The filter rides an explicit `Broadcast` (one copy per executor, not
  * one per task in the serialized plan) and is unwrapped once per
  * generated class into a mutable member, so the per-row cost is one
  * virtual call on the already-local sketch.
  */
case class BloomMightContain(child: Expression, bloomBc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires an integral key, got ${other.catalogString}")
    }

  @transient private lazy val bloom: BloomFilter = bloomBc.value

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomCls = classOf[BloomFilter].getName
    val bcCls = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc, bcCls)
    val bloomVar = ctx.addMutableState(bloomCls, "graftBloom",
      v => s"$v = ($bloomCls) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$bloomVar.mightContainLong((long)($c))")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
