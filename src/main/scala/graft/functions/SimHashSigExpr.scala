package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SimHash signature in ONE pass over a document's word-hash array:
  * bit j of the result is set iff more than half the words have bit j
  * set in their 60-bit hash (2·ones_j > n — the exact majority rule of
  * [[graft.pipeline.Dedup.simhash]]'s aggregate form).
  *
  * Why an expression: the aggregate form exploded one row per word and
  * shuffled the word multiset into a 60-column sum aggregation — for a
  * per-DOC pure function. This computes the same long map-side inside
  * whole-stage codegen: zero extra rows, zero shuffle, one int[bits] of
  * scratch per row (same removal as
  * [[graft.functions.MinHashBandsExpr]]). */
case class SimHashSigExpr(child: Expression, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 60, s"simhash_sig supports 1..60 bits: $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def withNewChildInternal(newChild: Expression): SimHashSigExpr =
    copy(child = newChild)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> of word hashes, got $other")
  }

  // empty word array → null (the aggregate form had no rows to group —
  // the doc vanished; callers keep that contract by filtering nulls)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val sig = SimHashSigExpr.sig(input.asInstanceOf[ArrayData], bits)
    if (sig == -1L) null else sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = "graft.functions.SimHashSigExpr"
      s"""
         |${ev.value} = $cls.sig($c, $bits);
         |${ev.isNull} = ${ev.value} == -1L;
       """.stripMargin
    })
}

object SimHashSigExpr {

  /** One traversal; -1 signals an empty array (a real signature never
    * hits -1: bits ≤ 60 leaves the top bits clear). Called from
    * generated code — must stay a simple static method. */
  def sig(hashes: ArrayData, bits: Int): Long = {
    val m = hashes.numElements()
    if (m == 0) return -1L
    val ones = new Array[Int](bits)
    var k = 0
    while (k < m) {
      val x = hashes.getLong(k)
      var j = 0
      while (j < bits) {
        ones(j) += ((x >>> j) & 1L).toInt
        j += 1
      }
      k += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (2L * ones(j) > m) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def column(hashes: Column, bits: Int): Column =
    GraftBridge.column(SimHashSigExpr(GraftBridge.expression(hashes), bits))
}
