package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression computing a Z-ORDER (Morton) key over 1–7
  * numeric columns: each input is min-max scaled to `bitsPerDim` unsigned
  * bits (bounds come from the table's FILE STATS — no extra data pass),
  * then the dimensions' bits are interleaved into one long whose sort
  * order is the space-filling curve.
  *
  * Sorting a rewrite by this key clusters multi-dimensional locality into
  * files, so a query boxing several columns prunes on ALL of them from
  * min/max file stats — linear sort only ever serves its leading column.
  * Native codegen (one static call per row) keeps the rewrite inside
  * whole-stage codegen; nulls sort as the dimension's minimum.
  */
case class ZOrderExpr(children: Seq[Expression], mins: Seq[Double],
    maxs: Seq[Double]) extends Expression {

  require(children.nonEmpty && children.size <= 7, "zorder takes 1..7 columns")
  require(mins.size == children.size && maxs.size == children.size)

  private def bitsPerDim: Int = 63 / children.size

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zorder_key"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderExpr =
    copy(children = newChildren)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot(_.isInstanceOf[NumericType])
    if (bad.isEmpty) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder_key needs numeric columns, got ${bad.mkString(", ")}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var z = 0L
    var d = 0
    while (d < children.size) {
      val raw = children(d).eval(input)
      val v = if (raw == null) mins(d) else children(d).dataType match {
        case _: DecimalType => raw.asInstanceOf[Decimal].toDouble
        case _ => raw.asInstanceOf[Number].doubleValue()
      }
      z |= ZOrderExpr.spread(
        ZOrderExpr.scale(v, mins(d), maxs(d), bitsPerDim),
        children.size, d, bitsPerDim)
      d += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val z = ctx.freshName("z")
    val cls = "graft.functions.ZOrderExpr"
    val n = children.size
    val parts = children.zipWithIndex.map { case (c, d) =>
      val g = c.genCode(ctx)
      val asDouble = c.dataType match {
        case _: DecimalType => s"${g.value}.toDouble()"
        case _ => s"(double)(${g.value})"
      }
      val v = if (c.nullable)
        s"(${g.isNull} ? ${mins(d)}D : $asDouble)"
      else asDouble
      s"""${g.code}
         |$z |= $cls.spread($cls.scale($v, ${mins(d)}D, ${maxs(d)}D, $bitsPerDim),
         |  $n, $d, $bitsPerDim);""".stripMargin
    }
    ev.copy(
      code = code"""
        |long $z = 0L;
        |${parts.mkString("\n")}
        |long ${ev.value} = $z;""".stripMargin,
      isNull = FalseLiteral)
  }
}

object ZOrderExpr {
  /** Min-max scale to `bits` unsigned bits; degenerate range → 0. */
  def scale(v: Double, min: Double, max: Double, bits: Int): Long = {
    if (!(max > min) || v.isNaN) return 0L
    val clamped = math.min(math.max(v, min), max)
    val unit = (clamped - min) / (max - min)
    math.min(((1L << bits) - 1).toDouble, unit * ((1L << bits) - 1)).toLong
  }

  /** Spread `v`'s low `bits` bits so dimension `d` of `n` occupies bit
    * positions d, d+n, d+2n, ... (Morton interleave). */
  def spread(v: Long, n: Int, d: Int, bits: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((v >> i) & 1L) << (i * n + d)
      i += 1
    }
    out
  }

  def column(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double]): Column =
    GraftBridge.column(ZOrderExpr(cols.map(GraftBridge.expression), mins, maxs))
}
