package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.spec.Murmur3

/** V2 `bucket` function exposed through the catalog plugin's
  * FunctionCatalog — what lets Spark resolve the `bucket(N, col)`
  * transform a scan reports in its `KeyGroupedPartitioning`, enabling
  * storage-partitioned joins between BUCKET-partitioned graft tables
  * (Iceberg's SparkFunctions/BucketFunction precedent; hashing identical
  * to `IcebergBucketExpr`/transform/bucket.rs:27-120). */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col) — iceberg murmur3_32 bucket transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, value), got ${inputType.catalogString}")
    new GraftBucketBound(inputType.fields(1).dataType)
  }
}

/** V2 temporal transform functions (years/months/days/hours) — resolve
  * the temporal partition transforms the write path declares in its
  * required distribution (and that temporal-partitioned scans could
  * report for SPJ). Ordinals relative to 1970-01-01, identical to
  * `Transform.applyValue` (transform/temporal.rs:46-430). */
final class GraftTemporalFunction(fnName: String,
    transform: graft.spec.Transform) extends UnboundFunction {
  override def name(): String = fnName
  override def description(): String =
    s"$fnName(col) — iceberg temporal transform (epoch-relative ordinal)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$fnName takes (value), got ${inputType.catalogString}")
    val dt = inputType.fields(0).dataType
    val ok = dt match {
      case DateType => fnName != "hours" // hours is undefined on dates
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    require(ok, s"$fnName over ${dt.catalogString} is not supported")
    new GraftTemporalBound(fnName, transform, dt)
  }
}

final class GraftTemporalBound(fnName: String, transform: graft.spec.Transform,
    valueType: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(valueType)
  override def resultType(): DataType = IntegerType
  override def name(): String = fnName
  override def canonicalName(): String =
    s"graft.$fnName(${valueType.catalogString})"

  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(0)) return null
    val (v, it) = valueType match {
      case DateType => (input.getInt(0), graft.spec.IcebergType.DateT)
      case TimestampType => (input.getLong(0), graft.spec.IcebergType.TimestamptzT)
      case TimestampNTZType => (input.getLong(0), graft.spec.IcebergType.TimestampT)
      case other => throw new UnsupportedOperationException(s"$fnName over $other")
    }
    Integer.valueOf(transform.applyValue(v, it).asInstanceOf[Int])
  }
}

object GraftTemporalFunctions {
  val byName: Map[String, GraftTemporalFunction] = Map(
    "years" -> new GraftTemporalFunction("years", graft.spec.Transform.Year),
    "months" -> new GraftTemporalFunction("months", graft.spec.Transform.Month),
    "days" -> new GraftTemporalFunction("days", graft.spec.Transform.Day),
    "hours" -> new GraftTemporalFunction("hours", graft.spec.Transform.Hour))
}

final class GraftBucketBound(valueType: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, valueType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // type-qualified so e.g. bucket-over-int and bucket-over-long scans
  // never report as co-partitioned (int and long hash differently is
  // false — they hash the same — but types must align for SPJ keys)
  override def canonicalName(): String = s"graft.bucket(${valueType.catalogString})"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(1)) return null
    val n = input.getInt(0)
    val b = valueType match {
      case IntegerType | DateType => Murmur3.bucketInt(input.getInt(1), n)
      case LongType | TimestampType | TimestampNTZType =>
        Murmur3.bucketLong(input.getLong(1), n)
      case StringType => Murmur3.bucketUtf8(input.getUTF8String(1), n)
      case BinaryType => Murmur3.bucketBytes(input.getBinary(1), n)
      case d: DecimalType =>
        Murmur3.bucketDecimal(input.getDecimal(1, d.precision, d.scale), n)
      case other => throw new UnsupportedOperationException(s"bucket over $other")
    }
    Integer.valueOf(b)
  }
}
