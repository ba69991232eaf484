package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen'd expression — the
  * semi-join-reduction primitive: build a filter over the (small) build
  * side's keys once, then discard probe-side rows BEFORE the shuffle.
  * On a 100 TB fact scan joined to a selective dimension this is the
  * difference between shuffling the whole fact table and shuffling the
  * ~matching fraction plus the false-positive ε — the same move Spark's
  * own AQE runtime filters (InjectRuntimeFilter) make internally, exposed
  * here as a library operator for engine-level composition.
  *
  * The filter travels as its serialized bytes (the case-class field, a
  * few hundred KB at 1M keys / 1% fpp); each executor deserializes once
  * lazily. Codegen embeds the expression instance via `addReferenceObj`,
  * so the per-row cost is one virtual call + k hash probes — no
  * per-row deserialization, and the probe stays inside whole-stage
  * codegen. Must be followed by an exact join: might-contain admits
  * false positives (never false negatives), so the pre-filter changes
  * cost, not semantics.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects BIGINT key, got ${child.dataType.simpleString}")

  /** Called from both interpreted and generated code. */
  def test(v: Long): Boolean = filter.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  def apply(key: Column, filter: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    ColumnBridge.column(
      new BloomMightContain(ColumnBridge.expression(key), out.toByteArray))
  }
}
