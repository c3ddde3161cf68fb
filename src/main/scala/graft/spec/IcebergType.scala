package graft.spec

import org.apache.spark.sql.types._

/** Iceberg type system (spec v2 subset + v3 gating).
  *
  * Mirrors the semantics of /root/reference/crates/iceberg/src/spec/
  * datatypes.rs:84-299 (Type/PrimitiveType enums) re-expressed as a Scala
  * ADT with Spark `DataType` conversion. Field-id addressing lives in
  * [[IcebergSchema]].
  */
sealed trait IcebergType {
  def isPrimitive: Boolean = this.isInstanceOf[PrimitiveIcebergType]
  /** JSON representation: string for primitives, object for nested. */
  def jsonName: String
}

sealed trait PrimitiveIcebergType extends IcebergType

object IcebergType {
  case object BooleanT extends PrimitiveIcebergType { val jsonName = "boolean" }
  case object IntT extends PrimitiveIcebergType { val jsonName = "int" }
  case object LongT extends PrimitiveIcebergType { val jsonName = "long" }
  case object FloatT extends PrimitiveIcebergType { val jsonName = "float" }
  case object DoubleT extends PrimitiveIcebergType { val jsonName = "double" }
  final case class DecimalT(precision: Int, scale: Int) extends PrimitiveIcebergType {
    require(precision <= 38, s"decimals with precision larger than 38 are not supported: $precision")
    val jsonName = s"decimal($precision, $scale)"
  }
  case object DateT extends PrimitiveIcebergType { val jsonName = "date" }
  /** µs since midnight, stored as long. */
  case object TimeT extends PrimitiveIcebergType { val jsonName = "time" }
  /** µs since epoch, no zone. */
  case object TimestampT extends PrimitiveIcebergType { val jsonName = "timestamp" }
  /** µs since epoch, UTC-adjusted. */
  case object TimestamptzT extends PrimitiveIcebergType { val jsonName = "timestamptz" }
  /** ns since epoch, no zone (v3, datatypes.rs:265). Spark has no ns
    * timestamp, so this maps to long-with-metadata like Time — exact ns
    * arithmetic stays integer math, never a lossy µs truncation. */
  case object TimestampNsT extends PrimitiveIcebergType { val jsonName = "timestamp_ns" }
  /** ns since epoch, UTC-adjusted (v3, datatypes.rs:268). */
  case object TimestamptzNsT extends PrimitiveIcebergType { val jsonName = "timestamptz_ns" }
  case object StringT extends PrimitiveIcebergType { val jsonName = "string" }
  case object UuidT extends PrimitiveIcebergType { val jsonName = "uuid" }
  final case class FixedT(length: Int) extends PrimitiveIcebergType {
    val jsonName = s"fixed[$length]"
  }
  case object BinaryT extends PrimitiveIcebergType { val jsonName = "binary" }
  /** Semi-structured values (v3, datatypes.rs:94,137-146) — maps onto
    * Spark 4's VariantType; binary-encoded metadata+value at rest. */
  case object VariantT extends IcebergType { val jsonName = "variant" }

  final case class StructT(fields: Seq[NestedField]) extends IcebergType {
    val jsonName = "struct"
    def fieldById(id: Int): Option[NestedField] = fields.find(_.id == id)
  }
  final case class ListT(elementId: Int, element: IcebergType, elementRequired: Boolean)
      extends IcebergType { val jsonName = "list" }
  final case class MapT(keyId: Int, key: IcebergType, valueId: Int, value: IcebergType,
      valueRequired: Boolean) extends IcebergType { val jsonName = "map" }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[(\d+)\]""".r

  def parsePrimitive(s: String): PrimitiveIcebergType = s match {
    case "boolean" => BooleanT
    case "int" => IntT
    case "long" => LongT
    case "float" => FloatT
    case "double" => DoubleT
    case "date" => DateT
    case "time" => TimeT
    case "timestamp" => TimestampT
    case "timestamptz" => TimestamptzT
    case "timestamp_ns" => TimestampNsT
    case "timestamptz_ns" => TimestamptzNsT
    case "string" => StringT
    case "uuid" => UuidT
    case "binary" => BinaryT
    case DecimalRe(p, sc) => DecimalT(p.toInt, sc.toInt)
    case FixedRe(l) => FixedT(l.toInt)
    case other => throw new IllegalArgumentException(s"unknown primitive type: $other")
  }

  /** Iceberg → Spark type (SURVEY.md §1.3 mapping). Field-id metadata is
    * attached at the schema level. */
  /** An Iceberg-internal default value as a SQL literal Spark's analyzer
    * can re-parse (the CURRENT_DEFAULT/EXISTS_DEFAULT contract). */
  private def defaultSqlLiteral(t: IcebergType, v: Any): String = t match {
    case StringT | UuidT =>
      "'" + v.asInstanceOf[String].replace("'", "''") + "'"
    case DateT => s"DATE '${java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)}'"
    case TimestampT =>
      // zone-less column: a TIMESTAMP_NTZ literal keeps the wall-clock
      // value regardless of the session timezone
      s"TIMESTAMP_NTZ '${TsLiteralFmt.format(java.time.LocalDateTime.ofInstant(
        microsInstant(v), java.time.ZoneOffset.UTC))}'"
    case TimestamptzT =>
      // zoned column: the stored default is an INSTANT — emit an explicit
      // +00:00 offset so Spark's analyzer does not reinterpret the text
      // in the session timezone (a zone-less literal would shift by the
      // session offset)
      s"TIMESTAMP '${TsLiteralFmt.format(java.time.LocalDateTime.ofInstant(
        microsInstant(v), java.time.ZoneOffset.UTC))}+00:00'"
    case BinaryT | FixedT(_) =>
      "X'" + v.asInstanceOf[Array[Byte]].map("%02X".format(_)).mkString + "'"
    case _ => String.valueOf(v) // bool / int / long / float / double / decimal
  }

  // full seconds + µs, space-separated — LocalDateTime.toString would
  // emit ISO 'T' and truncate :00 seconds, which Spark's literal parser
  // rejects once an offset is appended
  private val TsLiteralFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  private def microsInstant(v: Any): java.time.Instant = {
    val us = v.asInstanceOf[Long]
    java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
  }

  def toSpark(t: IcebergType): DataType = t match {
    case BooleanT => BooleanType
    case IntT => IntegerType
    case LongT => LongType
    case FloatT => FloatType
    case DoubleT => DoubleType
    case DecimalT(p, s) => DecimalType(p, s)
    case DateT => DateType
    case TimeT => LongType // µs since midnight + metadata tag
    case TimestampT => TimestampNTZType
    case TimestamptzT => TimestampType
    case TimestampNsT | TimestamptzNsT => LongType // ns since epoch + metadata tag
    case VariantT => VariantType
    case StringT => StringType
    case UuidT => StringType // canonical form
    case FixedT(_) => BinaryType
    case BinaryT => BinaryType
    case StructT(fields) =>
      StructType(fields.map { f =>
        val mb = new MetadataBuilder().putLong(IcebergSchema.FieldIdKey, f.id.toLong)
        // v3 field defaults surface as Spark's column-default metadata so
        // INSERTs omitting the column are filled by the analyzer
        // (CURRENT_DEFAULT) — reads of pre-default rows are served
        // natively by the scan (initial-default), EXISTS_DEFAULT is the
        // documentation of that value for Spark-side consumers
        f.writeDefault.foreach(v =>
          mb.putString("CURRENT_DEFAULT", defaultSqlLiteral(f.fieldType, v)))
        f.initialDefault.foreach(v =>
          mb.putString("EXISTS_DEFAULT", defaultSqlLiteral(f.fieldType, v)))
        val sf = StructField(f.name, toSpark(f.fieldType), nullable = !f.required,
          metadata = mb.build())
        f.doc.fold(sf)(sf.withComment) // Iceberg doc ⇄ Spark column comment
      })
    case ListT(_, elem, elemRequired) => ArrayType(toSpark(elem), containsNull = !elemRequired)
    case MapT(_, k, _, v, vRequired) => MapType(toSpark(k), toSpark(v), valueContainsNull = !vRequired)
  }

  /** Spark → Iceberg, assigning fresh field ids via the supplied counter.
    * Used when creating a table from an existing DataFrame schema. */
  def fromSpark(dt: DataType, nextId: () => Int): IcebergType = dt match {
    case BooleanType => BooleanT
    case ByteType | ShortType | IntegerType => IntT
    case LongType => LongT
    case FloatType => FloatT
    case DoubleType => DoubleT
    case d: DecimalType => DecimalT(d.precision, d.scale)
    case DateType => DateT
    case TimestampNTZType => TimestampT
    case TimestampType => TimestamptzT
    case StringType => StringT
    // Iceberg has no length-bounded strings, and once the schema
    // round-trips through table metadata Spark's padding/overflow checks
    // are gone — accepting CHAR/VARCHAR would silently drop the declared
    // constraint. Refuse with a pointer (Iceberg-Java behavior).
    case t @ (_: CharType | _: VarcharType) =>
      throw new IllegalArgumentException(
        s"char/varchar not supported (no length-bounded string in Iceberg; " +
          s"the declared length could not be enforced after a metadata " +
          s"round-trip): declare the column as STRING (got $t)")
    case BinaryType => BinaryT
    case VariantType => VariantT
    case st: StructType =>
      StructT(st.fields.toSeq.map { f =>
        val id = nextId()
        NestedField(id, f.name, fromSpark(f.dataType, nextId),
          required = !f.nullable, doc = f.getComment())
      })
    case ArrayType(elem, containsNull) =>
      val id = nextId()
      ListT(id, fromSpark(elem, nextId), elementRequired = !containsNull)
    case MapType(k, v, valueContainsNull) =>
      val kid = nextId()
      val vid = nextId()
      MapT(kid, fromSpark(k, nextId), vid, fromSpark(v, nextId), valueRequired = !valueContainsNull)
    case other => throw new IllegalArgumentException(s"unsupported Spark type for Iceberg: $other")
  }
}

/** One named, id-addressed field (datatypes.rs:561 NestedField). */
/** @param initialDefault v3 field default served for rows written BEFORE
  *   the field existed (datatypes.rs:573 `initial_default`) — fixed at
  *   add-column time, applied at read to files lacking the column.
  * @param writeDefault v3 default written when an insert omits the column
  *   (datatypes.rs:575 `write_default`) — may be updated later. */
final case class NestedField(
    id: Int,
    name: String,
    fieldType: IcebergType,
    required: Boolean,
    doc: Option[String] = None,
    initialDefault: Option[Any] = None,
    writeDefault: Option[Any] = None)
