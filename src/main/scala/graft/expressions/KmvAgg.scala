package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded k-minimum-values buffer shared by the two KMV aggregates: a
  * PRIMITIVE ascending long array capped at k (the k smallest distinct
  * hashes win). Unboxed on purpose — this buffer is touched once per
  * input row on the aggregation hot path, and k <= a few hundred makes
  * the binary-search + memmove insert effectively constant-time.
  */
private[expressions] final class KmvBuffer(val k: Int) {
  var n: Int = 0
  val a: Array[Long] = new Array[Long](k)

  /** Insert-if-absent, keeping the k smallest in ascending order. */
  def add(v: Long): Unit = {
    if (n == k && v >= a(n - 1)) return
    var lo = 0
    var hi = n
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (a(m) < v) lo = m + 1 else hi = m
    }
    if (lo < n && a(lo) == v) return
    val keep = if (n == k) k - 1 else n
    System.arraycopy(a, lo, a, lo + 1, keep - lo)
    a(lo) = v
    if (n < k) n += 1
  }

  def mergeFrom(o: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < o.n) { add(o.a(i)); i += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * n)
    buf.putInt(n)
    var i = 0
    while (i < n) { buf.putLong(a(i)); i += 1 }
    buf.array()
  }

  def result(): ArrayData =
    new GenericArrayData(java.util.Arrays.copyOf(a, n))
}

private[expressions] object KmvBuffer {
  def deserialize(k: Int, bytes: Array[Byte]): KmvBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val m = buf.getInt
    val b = new KmvBuffer(k)
    // bytes came from a same-k buffer, already ascending + distinct
    var i = 0
    while (i < m) { b.a(i) = buf.getLong; i += 1 }
    b.n = m
    b
  }
}

/** MAP-COMBINABLE k-minimum-values sketch build: aggregates pre-hashed
  * 56-bit values ([[graft.operators.ThetaSketch.hash56]]) into the
  * ascending array of the k smallest distinct hashes.
  *
  * This is the aggregate the windowed build
  * ([[graft.operators.ThetaSketch.kmvSketch]]: distinct → per-group
  * ordered window) cannot be: a `TypedImperativeAggregate` with a real
  * `merge`, so Spark's ObjectHashAggregate runs it PARTIALLY map-side —
  * each input partition forwards at most k longs per group instead of
  * its whole distinct hash set, and no global distinct or window stage
  * exists at all. On a 100 TB fact scan that is the difference between
  * shuffling every distinct (group, hash) pair and shuffling
  * |groups|·k longs per partition. The two builds are provably
  * equivalent (the k smallest distinct values of a set are
  * merge-order-independent); `ThetaSketchAggSpec` pins it.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 1, s"kmv_agg needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_agg expects BIGINT hashes, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = b.mergeFrom(o)

  override def eval(b: KmvBuffer): Any = b.result()

  override def serialize(b: KmvBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KmvAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvAgg {
  /** Aggregate a pre-hashed BIGINT column into a k-KMV sketch array. */
  def apply(hash: Column, k: Int): Column =
    ColumnBridge.column(
      new KmvAgg(ColumnBridge.expression(hash), k).toAggregateExpression())
}

/** MAP-COMBINABLE union of KMV sketch ARRAYS: the merge step of every
  * sketch-iteration algorithm (ANF rounds, shard roll-ups, incremental
  * maintenance) as one partial aggregate. Replaces the
  * collect_list → flatten → array_distinct → sort → slice expression
  * chain, which must move every input array to the reducer before
  * deduplicating; here each map-side partition forwards at most k longs
  * per group. Union-exactness of KMV (the k smallest of merged sketches
  * equal the k smallest of the united set) makes this bit-identical to
  * the expression chain — `ThetaSketchAggSpec` pins it.
  */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k >= 1, s"kmv_merge_agg needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge_agg expects ARRAY<BIGINT> sketches, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) { b.add(arr.getLong(i)); i += 1 }
    }
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = b.mergeFrom(o)

  override def eval(b: KmvBuffer): Any = b.result()

  override def serialize(b: KmvBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(
      newChild: Expression): KmvMergeAgg = copy(child = newChild)
}

object KmvMergeAgg {
  /** Aggregate ARRAY<BIGINT> sketch columns into their k-KMV union. */
  def apply(sketch: Column, k: Int): Column =
    ColumnBridge.column(
      new KmvMergeAgg(ColumnBridge.expression(sketch), k)
        .toAggregateExpression())
}
