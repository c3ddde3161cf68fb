package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.spec.Murmur3

/** Native Catalyst expression for the Iceberg `bucket[N]` transform:
  * `(murmur3_x86_32(bytes(v)) & Int.MaxValue) % N`.
  *
  * Semantics mirrored from /root/reference/crates/iceberg/src/transform/
  * bucket.rs:27-120. A native expression (with codegen) keeps the write
  * path's partition projection inside whole-stage codegen — a Scala UDF
  * here would box every row of a 100 TB append.
  */
case class IcebergBucketExpr(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  require(numBuckets > 0, s"bucket count must be positive: $numBuckets")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = s"iceberg_bucket"

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketExpr =
    copy(child = newChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | DateType | LongType | TimestampType | TimestampNTZType |
           StringType | BinaryType | _: DecimalType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket does not support type $other")
    }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType | DateType => Murmur3.bucketInt(input.asInstanceOf[Int], numBuckets)
    case LongType | TimestampType | TimestampNTZType =>
      Murmur3.bucketLong(input.asInstanceOf[Long], numBuckets)
    case StringType => Murmur3.bucketUtf8(input.asInstanceOf[UTF8String], numBuckets)
    case BinaryType => Murmur3.bucketBytes(input.asInstanceOf[Array[Byte]], numBuckets)
    case _: DecimalType => Murmur3.bucketDecimal(input.asInstanceOf[Decimal], numBuckets)
    case other => throw new IllegalStateException(s"unsupported bucket input type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = "graft.spec.Murmur3"
    val call: String => String = child.dataType match {
      case IntegerType | DateType => c => s"$m.bucketInt($c, $numBuckets)"
      case LongType | TimestampType | TimestampNTZType => c => s"$m.bucketLong($c, $numBuckets)"
      case StringType => c => s"$m.bucketUtf8($c, $numBuckets)"
      case BinaryType => c => s"$m.bucketBytes($c, $numBuckets)"
      case _: DecimalType => c => s"$m.bucketDecimal($c, $numBuckets)"
      case other => throw new IllegalStateException(s"unsupported bucket input type $other")
    }
    defineCodeGen(ctx, ev, call)
  }
}

object IcebergBucketExpr {
  def column(col: Column, n: Int): Column =
    GraftBridge.column(IcebergBucketExpr(GraftBridge.expression(col), n))
}
