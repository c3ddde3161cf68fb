package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregation buffer: a min-heap of (score, id) pairs
  * keeping the k best by (score desc, id asc); the heap head is the
  * worst retained pair, evicted on a better arrival. */
final class TopKBuffer(val k: Int) {
  val heap = new java.util.PriorityQueue[(Double, Long)](math.max(k, 1),
    (a: (Double, Long), b: (Double, Long)) =>
      if (a._1 != b._1) java.lang.Double.compare(a._1, b._1)
      else java.lang.Long.compare(b._2, a._2))

  def add(score: Double, id: Long): Unit =
    if (heap.size < k) heap.add((score, id))
    else {
      val worst = heap.peek()
      if (score > worst._1 || (score == worst._1 && id < worst._2)) {
        heap.poll(); heap.add((score, id)); ()
      }
    }
}

/** Partial top-k aggregate: `top_k(score, id, k)` returns the k best
  * (id, score) pairs ordered (score desc, id asc).
  *
  * This replaces the `row_number().over(partitionBy(query))` top-k tail:
  * a window must shuffle EVERY scored row to sort it, so exact kNN over
  * an n-row corpus shuffled q×n rows just to keep q×k. As a
  * TypedImperativeAggregate the partial (map-side) buffers are already
  * capped at k, so the shuffle carries at most q × k × partitions heap
  * entries — at 100 TB the scored rows die in the map stage that
  * produced them. Semantics (ties broken by ascending id) are identical
  * to the window form, so oracle results are unchanged.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"top-k needs k > 0: $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType), StructField("cos", DoubleType))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) { val (s, i) = it.next(); b.add(s, i) }
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val arr = b.heap.toArray(new Array[(Double, Long)](b.heap.size))
    val sorted = arr.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(i, s) })
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.heap.size)
    val it = b.heap.iterator()
    while (it.hasNext) { val (s, i) = it.next(); out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) { b.add(in.readDouble(), in.readLong()); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** `top_k(score, id, k)` as a DataFrame aggregate column. */
  def column(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKByScore(GraftBridge.expression(score),
      GraftBridge.expression(id), k).toAggregateExpression())
}
