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

  // ---- JSON single-value serde (spec Appendix D; reference
  // values/ser.rs Literal::try_into_json) — used for v3 field defaults
  // ("initial-default"/"write-default" in schema JSON). ----

  import com.fasterxml.jackson.databind.JsonNode

  def toJsonValue(t: IcebergType, v: Any): JsonNode = {
    val nf = graft.spec.Json.mapper.getNodeFactory
    t match {
      case BooleanT => nf.booleanNode(v.asInstanceOf[Boolean])
      case IntT => nf.numberNode(v.asInstanceOf[Int])
      case LongT => nf.numberNode(v.asInstanceOf[Long])
      case FloatT => nf.numberNode(v.asInstanceOf[Float])
      case DoubleT => nf.numberNode(v.asInstanceOf[Double])
      case StringT => nf.textNode(v.asInstanceOf[String])
      case DateT =>
        nf.textNode(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
      case TimeT => // micros since midnight → "HH:mm:ss.ffffff"
        nf.textNode(java.time.LocalTime.ofNanoOfDay(v.asInstanceOf[Long] * 1000L).toString)
      case TimestampT =>
        nf.textNode(java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(v.asInstanceOf[Long], 1000000L),
          (Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).toString)
      case TimestamptzT =>
        nf.textNode(java.time.OffsetDateTime.of(
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(v.asInstanceOf[Long], 1000000L),
            (Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC), java.time.ZoneOffset.UTC).toString)
      case DecimalT(_, _) => nf.textNode(v.asInstanceOf[java.math.BigDecimal].toPlainString)
      case UuidT => nf.textNode(v.asInstanceOf[java.util.UUID].toString)
      case BinaryT | FixedT(_) =>
        nf.textNode(v.asInstanceOf[Array[Byte]].map(b => f"$b%02X").mkString)
      case other => throw new IllegalArgumentException(s"no JSON single-value serde for $other")
    }
  }

  /** Spark literal for an Iceberg-internal value (micros/epoch-days ints
    * become real temporal literals), cast to the field's Spark type —
    * used to materialize v3 field defaults in scans and writes. */
  def toSparkLiteral(t: IcebergType, v: Any): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    val c = (t, v) match {
      case (DateT, d: Int) => lit(java.time.LocalDate.ofEpochDay(d.toLong))
      case (TimestampT, us: Long) => lit(java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))
      case (TimestamptzT, us: Long) => lit(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      case (UuidT, u: java.util.UUID) => lit(u.toString)
      case _ => lit(v)
    }
    c.cast(IcebergType.toSpark(t))
  }

  /** Iceberg-internal value → Catalyst-internal value (the native batch
    * reader materializes v3 defaults as codegen literals; dates and
    * timestamps share the int-days / long-micros encodings, so only
    * strings, uuids and decimals re-box). */
  def toCatalystValue(t: IcebergType, v: Any): Any = (t, v) match {
    case (_, null) => null
    case (StringT, s: String) => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case (UuidT, u: java.util.UUID) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(u.toString)
    case (DecimalT(p, s), d: java.math.BigDecimal) =>
      org.apache.spark.sql.types.Decimal(d, p, s)
    case _ => v
  }

  /** Catalyst literal value → Iceberg-internal value (for v3 defaults
    * arriving through SQL DDL: UTF8String → String, Decimal → BigDecimal;
    * date/timestamp catalyst forms are already the internal ints). */
  def fromCatalyst(t: IcebergType, v: Any): Any = (t, v) match {
    case (_, null) => null
    case (StringT, s) => s.toString
    case (DecimalT(_, sc), d: org.apache.spark.sql.types.Decimal) =>
      d.toJavaBigDecimal.setScale(sc)
    case (IntT | DateT, n: java.lang.Integer) => n.intValue
    case (LongT | TimestampT | TimestamptzT | TimeT, n: java.lang.Long) => n.longValue
    case (LongT, n: java.lang.Integer) => n.longValue
    case (FloatT, n: java.lang.Float) => n.floatValue
    case (DoubleT, n: java.lang.Double) => n.doubleValue
    case (BooleanT, b: java.lang.Boolean) => b.booleanValue
    case (tt, other) => throw new IllegalArgumentException(
      s"unsupported default literal $other for $tt")
  }

  def fromJsonValue(t: IcebergType, n: JsonNode): Any = t match {
    case BooleanT => n.asBoolean()
    case IntT => n.asInt()
    case LongT => n.asLong()
    case FloatT => n.asDouble().toFloat
    case DoubleT => n.asDouble()
    case StringT => n.asText()
    case DateT => java.time.LocalDate.parse(n.asText()).toEpochDay.toInt
    case TimeT => java.time.LocalTime.parse(n.asText()).toNanoOfDay / 1000L
    case TimestampT =>
      val ldt = java.time.LocalDateTime.parse(n.asText())
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    case TimestamptzT =>
      val odt = java.time.OffsetDateTime.parse(n.asText())
      odt.toEpochSecond * 1000000L + odt.getNano / 1000L
    case DecimalT(_, s) => new java.math.BigDecimal(n.asText()).setScale(s)
    case UuidT => java.util.UUID.fromString(n.asText())
    case BinaryT | FixedT(_) =>
      n.asText().grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    case other => throw new IllegalArgumentException(s"no JSON single-value serde for $other")
  }
}
