package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded KMV buffer: the k smallest DISTINCT long hashes seen so far
  * (a sorted set capped at k — insert evicts the current maximum once
  * full, so state is O(k) regardless of input cardinality). */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(x: Long): Unit = {
    if (set.size < k) { set.add(x); () }
    else if (x < set.last() && !set.contains(x)) {
      set.pollLast(); set.add(x); ()
    }
  }
}

/** `kmv_sketch(hash, k)`: the k smallest distinct values of a long hash
  * column, ascending — the KMV distinct-count sketch
  * (estimate = (k−1)·2^60 / kth when full; exact size when not), the
  * same estimator the Puffin stats writer persists
  * (graft.puffin.Sketches, role of the reference's
  * `apache-datasketches-theta-v1` blobs) lifted into a PER-GROUP
  * Catalyst aggregate.
  *
  * Scale shape: map-side partial buffers are capped at k entries, so a
  * per-source sketch over a 100 TB token stream shuffles
  * groups × k × partitions longs — the token stream itself dies in its
  * map stage. No upstream `distinct()` shuffle is needed: the buffer
  * dedups internally (TreeSet).
  */
case class KmvSketch(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k > 0, s"kmv sketch needs k > 0: $k")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hash.eval(input)
    if (h != null) b.add(h.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) b.add(it.next())
    b
  }

  override def eval(b: KmvBuffer): Any = {
    val arr = new Array[Long](b.set.size)
    val it = b.set.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) { b.add(in.readLong()); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(hash = newChildren(0))
}

object KmvSketch {
  /** `kmv_sketch(hash, k)` as a DataFrame aggregate column. */
  def column(hash: Column, k: Int): Column =
    GraftBridge.column(KmvSketch(GraftBridge.expression(hash), k)
      .toAggregateExpression())
}
