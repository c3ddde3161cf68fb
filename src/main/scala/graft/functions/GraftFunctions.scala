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
