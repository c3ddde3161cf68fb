package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-bounded `collect_list` over a struct-of-longs: accumulates the
  * first `cap` values per group and DROPS the rest — the aggregation
  * buffer never exceeds `cap` elements on the map side, the merge side,
  * or the shuffle wire.
  *
  * Why it exists: the dedup pipelines bound viral buckets (a band key
  * shared by ~everything) before materializing per-bucket lists. The
  * census-window form (`count().over(partitionBy(bucket))` then filter)
  * does that with O(1) state but forces a full SORT of every banded row —
  * and any plan that consumes the window twice sorts twice. This
  * aggregate replaces census + collect with ONE hash aggregation: a
  * bucket with more than `cap - 1` members saturates at `cap` elements,
  * which the caller detects via `size(...) >= cap` and drops — same
  * drop-the-pathology semantics, no sort, bounded memory. Collection
  * order is partition-dependent (like `collect_list`); callers must be
  * order-insensitive.
  *
  * The element type is restricted to a struct of nullable-or-not LONG
  * fields (all current payloads: `(_gid)`, `(_gid, sig)`) so the buffer
  * serializes as flat longs + a null bitmask without dragging a generic
  * row serializer into the hot loop. */
case class BoundedCollectStruct(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  require(cap > 0, s"bounded_collect needs cap > 0: $cap")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]
  private def numFields: Int = structType.size

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.size <= 8 && s.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bounded_collect expects a struct of <= 8 LONG fields, got $other")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    new ArrayBuffer[InternalRow]()

  override def update(b: ArrayBuffer[InternalRow], input: InternalRow)
      : ArrayBuffer[InternalRow] = {
    if (b.size < cap) {
      val v = child.eval(input)
      if (v != null) b += v.asInstanceOf[InternalRow].copy()
    }
    b
  }

  override def merge(b: ArrayBuffer[InternalRow], other: ArrayBuffer[InternalRow])
      : ArrayBuffer[InternalRow] = {
    var i = 0
    while (b.size < cap && i < other.size) { b += other(i); i += 1 }
    b
  }

  override def eval(b: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(b.toArray[Any])

  override def serialize(b: ArrayBuffer[InternalRow]): Array[Byte] = {
    val n = numFields
    val bos = new ByteArrayOutputStream(4 + b.size * (1 + 8 * n))
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      val r = b(i)
      var mask = 0
      var f = 0
      while (f < n) { if (r.isNullAt(f)) mask |= (1 << f); f += 1 }
      out.writeByte(mask)
      f = 0
      while (f < n) { if ((mask & (1 << f)) == 0) out.writeLong(r.getLong(f)); f += 1 }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val n = numFields
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val count = in.readInt()
    val b = new ArrayBuffer[InternalRow](count)
    var i = 0
    while (i < count) {
      val mask = in.readByte()
      val vals = new Array[Any](n)
      var f = 0
      while (f < n) {
        vals(f) = if ((mask & (1 << f)) == 0) in.readLong() else null
        f += 1
      }
      b += InternalRow.fromSeq(vals.toIndexedSeq)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectStruct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectStruct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectStruct =
    copy(child = newChildren(0))
}

object BoundedCollectStruct {
  /** `bounded_collect(item, cap)` as a DataFrame aggregate column. */
  def column(item: Column, cap: Int): Column =
    GraftBridge.column(
      BoundedCollectStruct(GraftBridge.expression(item), cap).toAggregateExpression())
}
