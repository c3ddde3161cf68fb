package graft.spec

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import IcebergType._
import graft.functions.IcebergBucketExpr

/** Iceberg partition transforms — the reference's scalar-function surface
  * (/root/reference/crates/iceberg/src/transform/{bucket,truncate,temporal}.rs,
  * result-type and
  * projection rules in spec/transform.rs:52-280). Partition values and
  * pruning depend on these being bit-exact.
  *
  * Three evaluation surfaces, mirroring TransformFunction's array-level and
  * literal-level application (transform/mod.rs:34-70):
  *   - `toColumn`: vectorized Spark Column (whole-stage codegen) — write path.
  *   - `applyValue`: JVM scalar on Iceberg-internal values (date=Int days,
  *     timestamp=Long µs) — predicate projection for pruning.
  *   - `toHumanString`: partition-path rendering.
  */
sealed trait Transform {
  def name: String
  override def toString: String = name

  /** Can distinct source values map to the same output? (true for all but
    * identity/void — matters for predicate projection) */
  def resultType(src: IcebergType): IcebergType

  def toColumn(c: Column, srcType: IcebergType): Column

  /** Apply to an Iceberg-internal scalar (null-safe). */
  def applyValue(v: Any, srcType: IcebergType): Any

  /** Whether `project`ing equality predicates through this transform is
    * exact (order-preserving transforms also project ranges). */
  def preservesOrder: Boolean = false

  def toHumanString(v: Any): String = Transform.defaultHuman(v)
}

object Transform {

  case object Identity extends Transform {
    val name = "identity"
    def resultType(src: IcebergType): IcebergType = src
    def toColumn(c: Column, srcType: IcebergType): Column = c
    def applyValue(v: Any, srcType: IcebergType): Any = v
    override def preservesOrder = true
  }

  case object Void extends Transform {
    val name = "void"
    def resultType(src: IcebergType): IcebergType = src
    def toColumn(c: Column, srcType: IcebergType): Column =
      lit(null).cast(IcebergType.toSpark(srcType))
    def applyValue(v: Any, srcType: IcebergType): Any = null
  }

  final case class Bucket(n: Int) extends Transform {
    val name = s"bucket[$n]"
    def resultType(src: IcebergType): IcebergType = IntT
    def toColumn(c: Column, srcType: IcebergType): Column = IcebergBucketExpr.column(c, n)
    def applyValue(v: Any, srcType: IcebergType): Any =
      if (v == null) null
      else srcType match {
        case IntT | DateT => Murmur3.bucketInt(v.asInstanceOf[Int], n)
        case LongT | TimeT | TimestampT | TimestamptzT => Murmur3.bucketLong(v.asInstanceOf[Long], n)
        case StringT => Murmur3.bucketBytes(v.asInstanceOf[String].getBytes("UTF-8"), n)
        case BinaryT | FixedT(_) => Murmur3.bucketBytes(v.asInstanceOf[Array[Byte]], n)
        case UuidT =>
          val u = v.asInstanceOf[java.util.UUID]
          val bb = java.nio.ByteBuffer.allocate(16)
          bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
          Murmur3.bucketBytes(bb.array(), n)
        case DecimalT(_, _) =>
          Murmur3.hashUnscaled(v.asInstanceOf[java.math.BigDecimal].unscaledValue())
            .&(Integer.MAX_VALUE) % n
        case other => throw new IllegalArgumentException(s"bucket unsupported on $other")
      }
  }

  final case class Truncate(w: Int) extends Transform {
    val name = s"truncate[$w]"
    def resultType(src: IcebergType): IcebergType = src
    override def preservesOrder = true
    def toColumn(c: Column, srcType: IcebergType): Column = srcType match {
      // floored: v - (((v % w) + w) % w)  [transform/truncate.rs:29-80]
      case IntT | LongT => c - pmod(c, lit(w))
      case StringT => substring(c, 1, w) // UTF8String.substring walks code points
      case BinaryT => substring(c, 1, w) // byte slice on BinaryType
      case DecimalT(_, s) =>
        // unscaled-units truncate: v - (unscaled mod w)*10^-s
        val unit = java.math.BigDecimal.valueOf(w.toLong, s)
        c - pmod(c, lit(unit))
      case other => throw new IllegalArgumentException(s"truncate unsupported on $other")
    }
    def applyValue(v: Any, srcType: IcebergType): Any =
      if (v == null) null
      else srcType match {
        case IntT => val i = v.asInstanceOf[Int]; i - Math.floorMod(i, w)
        case LongT => val l = v.asInstanceOf[Long]; l - Math.floorMod(l, w.toLong)
        case StringT =>
          val s = v.asInstanceOf[String]
          if (s.codePointCount(0, s.length) <= w) s
          else s.substring(0, s.offsetByCodePoints(0, w))
        case BinaryT | FixedT(_) => v.asInstanceOf[Array[Byte]].take(w)
        case DecimalT(_, _) =>
          val d = v.asInstanceOf[java.math.BigDecimal]
          val unscaled = d.unscaledValue()
          val m = java.math.BigInteger.valueOf(w.toLong)
          val r = unscaled.mod(m) // BigInteger.mod is always non-negative
          new java.math.BigDecimal(unscaled.subtract(r), d.scale())
        case other => throw new IllegalArgumentException(s"truncate unsupported on $other")
      }
  }

  /** Shared base for temporal ordinal transforms (years/months/days/hours
    * relative to 1970-01-01; transform/temporal.rs:46-430). */
  sealed trait Temporal extends Transform {
    override def preservesOrder = true
    protected def check(src: IcebergType): Unit = src match {
      case DateT | TimestampT | TimestamptzT =>
      case other => throw new IllegalArgumentException(s"$name unsupported on $other")
    }
    protected def toUtc(v: Any, srcType: IcebergType): LocalDateTime = srcType match {
      case DateT => LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).atStartOfDay()
      case TimestampT | TimestamptzT =>
        val micros = v.asInstanceOf[Long]
        LocalDateTime.ofInstant(
          Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L), ZoneOffset.UTC)
      case other => throw new IllegalArgumentException(s"$name unsupported on $other")
    }
  }

  case object Year extends Temporal {
    val name = "year"
    def resultType(src: IcebergType): IcebergType = { check(src); IntT }
    def toColumn(c: Column, srcType: IcebergType): Column = year(c) - 1970
    def applyValue(v: Any, srcType: IcebergType): Any =
      if (v == null) null else toUtc(v, srcType).getYear - 1970
    override def toHumanString(v: Any): String =
      if (v == null) "null" else (v.asInstanceOf[Int] + 1970).toString
  }

  case object Month extends Temporal {
    val name = "month"
    def resultType(src: IcebergType): IcebergType = { check(src); IntT }
    def toColumn(c: Column, srcType: IcebergType): Column =
      (year(c) - 1970) * 12 + (month(c) - 1)
    def applyValue(v: Any, srcType: IcebergType): Any =
      if (v == null) null
      else { val d = toUtc(v, srcType); (d.getYear - 1970) * 12 + (d.getMonthValue - 1) }
    override def toHumanString(v: Any): String =
      if (v == null) "null"
      else {
        val m = v.asInstanceOf[Int]
        f"${1970 + Math.floorDiv(m, 12)}%04d-${Math.floorMod(m, 12) + 1}%02d"
      }
  }

  case object Day extends Temporal {
    val name = "day"
    // result is date-typed in the spec (transform.rs result_type)
    def resultType(src: IcebergType): IcebergType = { check(src); DateT }
    // date-typed column (matches resultType) so the Hive staging dir renders
    // as yyyy-MM-dd and parsePartition/LocalDate.parse round-trips
    def toColumn(c: Column, srcType: IcebergType): Column = c.cast(DateType)
    def applyValue(v: Any, srcType: IcebergType): Any =
      if (v == null) null
      else srcType match {
        case DateT => v
        case _ => Math.floorDiv(v.asInstanceOf[Long], 86400000000L).toInt
      }
    override def toHumanString(v: Any): String =
      if (v == null) "null" else LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
  }

  case object Hour extends Temporal {
    val name = "hour"
    def resultType(src: IcebergType): IcebergType = src match {
      case TimestampT | TimestamptzT => IntT
      case other => throw new IllegalArgumentException(s"hour unsupported on $other")
    }
    // exact integer arithmetic: days-since-epoch * 24 + hour-of-day (UTC)
    def toColumn(c: Column, srcType: IcebergType): Column =
      datediff(c.cast(DateType), lit("1970-01-01").cast(DateType)) * 24 + hour(c)
    def applyValue(v: Any, srcType: IcebergType): Any =
      if (v == null) null
      else Math.floorDiv(v.asInstanceOf[Long], 3600000000L).toInt
    override def toHumanString(v: Any): String =
      if (v == null) "null"
      else {
        val h = v.asInstanceOf[Int]
        val d = LocalDate.ofEpochDay(Math.floorDiv(h, 24).toLong)
        f"${d.getYear}%04d-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d-${Math.floorMod(h, 24)}%02d"
      }
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  def parse(s: String): Transform = s match {
    case "identity" => Identity
    case "void" => Void
    case "year" => Year
    case "month" => Month
    case "day" => Day
    case "hour" => Hour
    case BucketRe(n) => Bucket(n.toInt)
    case TruncateRe(w) => Truncate(w.toInt)
    case other => throw new IllegalArgumentException(s"unknown transform: $other")
  }

  def defaultHuman(v: Any): String = v match {
    case null => "null"
    case b: Array[Byte] => java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
    case other => other.toString
  }
}
