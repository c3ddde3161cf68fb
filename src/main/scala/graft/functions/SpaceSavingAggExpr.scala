package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Space-Saving (Metwally et al.) bounded counter table: at most k
  * (item → (count, error)) entries. A new item evicts the current
  * minimum, inheriting its count as the overestimation error. The
  * classic guarantees survive arbitrary merge order:
  *   - every tracked count OVERestimates the true count by ≤ its error;
  *   - any item with true count > N/k is guaranteed tracked. */
final class SpaceSavingBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, (Long, Long)]()

  def add(item: String, by: Long, err: Long): Unit = {
    val cur = counts.get(item)
    if (cur != null) { counts.put(item, (cur._1 + by, cur._2 + err)); () }
    else if (counts.size < k) { counts.put(item, (by, err)); () }
    else {
      // evict the (count, item) minimum; the newcomer inherits its count
      var minK: String = null; var minV = (Long.MaxValue, 0L)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue._1 < minV._1 ||
          (e.getValue._1 == minV._1 && (minK == null || e.getKey < minK))) {
          minK = e.getKey; minV = e.getValue
        }
      }
      counts.remove(minK)
      counts.put(item, (minV._1 + by, minV._1 + err))
      ()
    }
  }
}

/** `space_saving(item, k)`: bounded heavy-hitter counters — the
  * map-side-capped frequent-items aggregate for streams too large to
  * count exactly. Output: array of (item, count, error) structs sorted
  * (count desc, item asc); `count − error` is a guaranteed LOWER bound
  * on the true frequency, and any item with true count > N/k is
  * present regardless of partitioning/merge order.
  *
  * NOT registered as a driver oracle query by itself: Space-Saving
  * counter VALUES are merge-order-dependent (only the guarantees are
  * deterministic) — the exact two-pass groupBy is the oracle-checkable
  * counterpart (p61), and the spec pins the containment + bound
  * guarantees against it. */
case class SpaceSaving(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {

  require(k > 0, s"space-saving needs k > 0: $k")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("count", LongType),
    StructField("error", LongType))))

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(k)

  override def update(b: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = item.eval(input)
    if (v != null) b.add(v.toString, 1L, 0L)
    b
  }

  override def merge(b: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b.add(e.getKey, e.getValue._1, e.getValue._2)
    }
    b
  }

  override def eval(b: SpaceSavingBuffer): Any = {
    val arr = new Array[(String, Long, Long)](b.counts.size)
    val it = b.counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next(); arr(j) = (e.getKey, e.getValue._1, e.getValue._2); j += 1
    }
    val sorted = arr.sortBy { case (i, c, _) => (-c, i) }
    new GenericArrayData(sorted.map { case (i, c, er) =>
      InternalRow(UTF8String.fromString(i), c, er)
    })
  }

  override def serialize(b: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue._1); out.writeLong(e.getValue._2)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new SpaceSavingBuffer(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) { b.add(in.readUTF(), in.readLong(), in.readLong()); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSaving =
    copy(item = newChildren(0))
}

object SpaceSaving {
  /** `space_saving(item, k)` as a DataFrame aggregate column. */
  def column(item: Column, k: Int): Column =
    GraftBridge.column(SpaceSaving(GraftBridge.expression(item), k)
      .toAggregateExpression())
}
