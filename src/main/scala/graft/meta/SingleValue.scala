package graft.meta

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import graft.spec.IcebergType
import graft.spec.IcebergType._

/** Iceberg single-value binary serialization (spec Appendix D) for stats
  * bounds stored in manifests — little-endian numerics, UTF-8 strings,
  * minimal big-endian two's-complement decimals. Mirrors the semantics of
  * /root/reference/crates/iceberg/src/spec/values (Datum::to_bytes /
  * try_from_bytes). Wrong bounds silently drop rows at plan time, so this
  * is round-trip tested.
  */
object SingleValue {

  def toBytes(t: IcebergType, v: Any): Array[Byte] = v match {
    case null => null
    case _ => t match {
      case BooleanT => Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
      case IntT | DateT => le(4).putInt(v.asInstanceOf[Int]).array()
      case LongT | TimeT | TimestampT | TimestamptzT =>
        le(8).putLong(v.asInstanceOf[Long]).array()
      case FloatT => le(4).putFloat(v.asInstanceOf[Float]).array()
      case DoubleT => le(8).putDouble(v.asInstanceOf[Double]).array()
      case StringT => v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
      case BinaryT | FixedT(_) => v.asInstanceOf[Array[Byte]]
      case UuidT =>
        val u = v.asInstanceOf[java.util.UUID]
        ByteBuffer.allocate(16).putLong(u.getMostSignificantBits)
          .putLong(u.getLeastSignificantBits).array()
      case DecimalT(_, _) =>
        v.asInstanceOf[java.math.BigDecimal].unscaledValue().toByteArray
      case other => throw new IllegalArgumentException(s"no single-value serde for $other")
    }
  }

  def fromBytes(t: IcebergType, b: Array[Byte]): Any =
    if (b == null) null
    else t match {
      case BooleanT => b(0) != 0
      case IntT | DateT => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
      case LongT | TimeT | TimestampT | TimestamptzT =>
        // 4-byte payload = bound written before an int→long schema
        // promotion: promote at read time (schema evolution keeps old
        // manifests serving under the widened type)
        if (b.length == 4) ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong
        else ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong
      case FloatT => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getFloat
      case DoubleT =>
        // float→double promotion, as above
        if (b.length == 4) ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getFloat.toDouble
        else ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getDouble
      case StringT => new String(b, StandardCharsets.UTF_8)
      case BinaryT | FixedT(_) => b
      case UuidT =>
        val bb = ByteBuffer.wrap(b)
        new java.util.UUID(bb.getLong, bb.getLong)
      case DecimalT(_, s) =>
        new java.math.BigDecimal(new java.math.BigInteger(b), s)
      case other => throw new IllegalArgumentException(s"no single-value serde for $other")
    }

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** Total order on Iceberg-internal scalars (for bounds comparison).
    * NaN handling follows the metrics evaluators: callers must special-case
    * NaN-only bounds; here NaN sorts above everything (IEEE total order). */
  def compare(t: IcebergType, a: Any, b: Any): Int = t match {
    case BooleanT => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case IntT | DateT => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongT | TimeT | TimestampT | TimestamptzT =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case FloatT => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case DoubleT => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case StringT =>
      // unsigned UTF-8 byte order = code-point order — matches how parquet
      // footers and the reference compute string min/max. UTF-16
      // String.compareTo would order U+E000..U+FFFF above supplementary
      // chars and mis-prune (ADVICE r1).
      java.util.Arrays.compareUnsigned(
        a.asInstanceOf[String].getBytes(StandardCharsets.UTF_8),
        b.asInstanceOf[String].getBytes(StandardCharsets.UTF_8))
    case DecimalT(_, _) =>
      a.asInstanceOf[java.math.BigDecimal].compareTo(b.asInstanceOf[java.math.BigDecimal])
    case BinaryT | FixedT(_) =>
      java.util.Arrays.compareUnsigned(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(s"no comparator for $other")
  }

  def isNaN(v: Any): Boolean = v match {
    case f: Float => f.isNaN
    case d: Double => d.isNaN
    case _ => false
  }
}
