package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.puffin.ThetaSketch

/** Native codegen theta entry hash (DataSketches murmur3-128 keying,
  * theta_sketch.rs interop contract) — replaces the per-row Scala UDFs the
  * stats job used in `Sketches.thetaColumns`. Same keying as
  * [[ThetaSketch.valueHash]]: integers hash their little-endian long
  * bytes, doubles canonicalize -0.0 first, strings hash UTF-8 bytes with
  * the empty string yielding 0 (the "ignored update" sentinel; null input
  * yields SQL null, which the `!= 0` filter downstream drops the same
  * way). A UDF here boxes and breaks whole-stage codegen over the full
  * stats scan; this stays fused — one static call per row.
  */
case class ThetaHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_theta_hash"

  override protected def withNewChildInternal(newChild: Expression): ThetaHashExpr =
    copy(child = newChild)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName does not support type $other")
  }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => ThetaSketch.hashLong(input.asInstanceOf[Long])
    case IntegerType => ThetaSketch.hashLong(input.asInstanceOf[Int].toLong)
    case ShortType => ThetaSketch.hashLong(input.asInstanceOf[Short].toLong)
    case ByteType => ThetaSketch.hashLong(input.asInstanceOf[Byte].toLong)
    case DoubleType => ThetaSketch.hashDouble(input.asInstanceOf[Double])
    case FloatType => ThetaSketch.hashDouble(input.asInstanceOf[Float].toDouble)
    case StringType => ThetaSketch.hashUtf8(input.asInstanceOf[UTF8String])
    case other => throw new IllegalStateException(s"unsupported theta input $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = "graft.puffin.ThetaSketch"
    val call: String => String = child.dataType match {
      case LongType => c => s"$t.hashLong($c)"
      case IntegerType | ShortType | ByteType => c => s"$t.hashLong((long)$c)"
      case DoubleType => c => s"$t.hashDouble($c)"
      case FloatType => c => s"$t.hashDouble((double)$c)"
      case StringType => c => s"$t.hashUtf8($c)"
      case other => throw new IllegalStateException(s"unsupported theta input $other")
    }
    defineCodeGen(ctx, ev, call)
  }
}

object ThetaHashExpr {
  def column(c: Column): Column =
    GraftBridge.column(ThetaHashExpr(GraftBridge.expression(c)))
}
