package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

import graft.meta.SingleValue
import graft.spec.{IcebergSchema, IcebergType, NestedField}
import graft.spec.IcebergType._

/** Mini predicate AST mirroring the reference's expression layer
  * (/root/reference/crates/iceberg/src/expr/predicate.rs:321-338, term.rs:38,
  * operators expr/mod.rs:40-59).
  *
  * Catalyst handles data-level filtering; this AST exists because metadata
  * pruning (manifest summaries, file stats) must evaluate predicates
  * against *stats structures*, which Catalyst can't do. `toColumn` bridges
  * back to Catalyst for residual data filters, keeping the two worlds
  * consistent by construction.
  *
  * Literals are Iceberg-internal scalars: date=Int days, timestamp=Long µs,
  * decimal=java.math.BigDecimal, string=String.
  */
sealed trait Predicate {
  def and(other: Predicate): Predicate = Predicate.simplifyAnd(this, other)
  def or(other: Predicate): Predicate = Predicate.simplifyOr(this, other)
  def negate: Predicate
}

case object AlwaysTrue extends Predicate { def negate: Predicate = AlwaysFalse }
case object AlwaysFalse extends Predicate { def negate: Predicate = AlwaysTrue }

final case class And(left: Predicate, right: Predicate) extends Predicate {
  def negate: Predicate = Or(left.negate, right.negate)
}
final case class Or(left: Predicate, right: Predicate) extends Predicate {
  def negate: Predicate = And(left.negate, right.negate)
}
final case class Not(child: Predicate) extends Predicate {
  def negate: Predicate = child
}

sealed trait UnaryOp
case object IsNull extends UnaryOp
case object NotNull extends UnaryOp
case object IsNan extends UnaryOp
case object NotNan extends UnaryOp

final case class UnaryPred(op: UnaryOp, ref: String) extends Predicate {
  def negate: Predicate = op match {
    case IsNull => UnaryPred(NotNull, ref)
    case NotNull => UnaryPred(IsNull, ref)
    case IsNan => UnaryPred(NotNan, ref)
    case NotNan => UnaryPred(IsNan, ref)
  }
}

sealed trait BinaryOp { def negated: BinaryOp }
case object Lt extends BinaryOp { def negated = GtEq }
case object LtEq extends BinaryOp { def negated = Gt }
case object Gt extends BinaryOp { def negated = LtEq }
case object GtEq extends BinaryOp { def negated = Lt }
case object Eq extends BinaryOp { def negated = NotEq }
case object NotEq extends BinaryOp { def negated = Eq }
case object StartsWith extends BinaryOp { def negated = NotStartsWith }
case object NotStartsWith extends BinaryOp { def negated = StartsWith }

final case class BinaryPred(op: BinaryOp, ref: String, value: Any) extends Predicate {
  def negate: Predicate = BinaryPred(op.negated, ref, value)
}

sealed trait SetOp { def negated: SetOp }
case object In extends SetOp { def negated = NotIn }
case object NotIn extends SetOp { def negated = In }

final case class SetPred(op: SetOp, ref: String, values: Set[Any]) extends Predicate {
  def negate: Predicate = SetPred(op.negated, ref, values)
}

object Predicate {
  // bind-time const-folding (expr/predicate.rs:340-372)
  def simplifyAnd(l: Predicate, r: Predicate): Predicate = (l, r) match {
    case (AlwaysFalse, _) | (_, AlwaysFalse) => AlwaysFalse
    case (AlwaysTrue, x) => x
    case (x, AlwaysTrue) => x
    case _ => And(l, r)
  }

  def simplifyOr(l: Predicate, r: Predicate): Predicate = (l, r) match {
    case (AlwaysTrue, _) | (_, AlwaysTrue) => AlwaysTrue
    case (AlwaysFalse, x) => x
    case (x, AlwaysFalse) => x
    case _ => Or(l, r)
  }

  /** NOT-elimination by operator negation (expr/visitors/rewrite_not.rs). */
  def rewriteNot(p: Predicate): Predicate = p match {
    case Not(child) => rewriteNot(child.negate)
    case And(l, r) => And(rewriteNot(l), rewriteNot(r))
    case Or(l, r) => Or(rewriteNot(l), rewriteNot(r))
    case other => other
  }

  /** Column names referenced by the predicate. */
  def references(p: Predicate): Set[String] = p match {
    case And(l, r) => references(l) ++ references(r)
    case Or(l, r) => references(l) ++ references(r)
    case Not(c) => references(c)
    case UnaryPred(_, r) => Set(r)
    case BinaryPred(_, r, _) => Set(r)
    case SetPred(_, r, _) => Set(r)
    case _ => Set.empty
  }

  /** Validate refs AND literals against a schema (name → field-id binding
    * + literal type check/coercion; the analyzer role of
    * expr/predicate.rs bind()). Throws on unknown column or a literal
    * whose type can't pair with the column's. */
  def bind(p: Predicate, schema: IcebergSchema, caseSensitive: Boolean = true): Predicate = {
    def field(r: String): NestedField =
      schema.findField(r, caseSensitive).getOrElse(
        throw new IllegalArgumentException(s"cannot bind reference: $r"))
    def walk(q: Predicate): Predicate = q match {
      case And(l, r) => And(walk(l), walk(r))
      case Or(l, r) => Or(walk(l), walk(r))
      case Not(c) => Not(walk(c))
      case u @ UnaryPred(op, r) =>
        val t = field(r).fieldType
        if (op == IsNan || op == NotNan)
          require(t == FloatT || t == DoubleT, s"is_nan on non-floating column $r: $t")
        u
      case BinaryPred(op, r, v) =>
        val t = field(r).fieldType
        if (op == StartsWith || op == NotStartsWith)
          require(t == StringT, s"starts_with on non-string column $r: $t")
        BinaryPred(op, r, bindLiteral(t, v, r))
      case SetPred(op, r, vs) =>
        val t = field(r).fieldType
        SetPred(op, r, vs.map(bindLiteral(t, _, r)))
      case other => other
    }
    rewriteNot(walk(p))
  }

  /** Literal ↔ column type pairing with safe numeric widening
    * (datatypes.rs:284-299 pairing rules). */
  private def bindLiteral(t: IcebergType, v: Any, ref: String): Any = (t, v) match {
    case (_, null) => null
    case (IntT, i: Int) => i
    case (IntT, l: Long) if l.isValidInt => l.toInt
    case (LongT, l: Long) => l
    case (LongT, i: Int) => i.toLong
    case (FloatT, f: Float) => f
    case (DoubleT, d: Double) => d
    case (DoubleT, f: Float) => f.toDouble
    case (DateT, i: Int) => i
    case (TimeT | TimestampT | TimestamptzT, l: Long) => l
    case (StringT, s: String) => s
    case (BooleanT, b: Boolean) => b
    case (DecimalT(_, s), d: java.math.BigDecimal) =>
      try d.setScale(s)
      catch { case _: ArithmeticException => throw new IllegalArgumentException(
        s"decimal literal $d does not fit scale $s of column $ref") }
    case (BinaryT | FixedT(_), b: Array[Byte]) => b
    case _ => throw new IllegalArgumentException(
      s"literal $v (${v.getClass.getSimpleName}) does not pair with column $ref: $t")
  }

  /** Residual data filter as a Catalyst Column (applied above the scan,
    * mirroring DataFusion's Inexact pushdown re-application —
    * integrations/datafusion/src/table/mod.rs:145-151). */
  def toColumn(p: Predicate, schema: IcebergSchema): Column = p match {
    case AlwaysTrue => lit(true)
    case AlwaysFalse => lit(false)
    case And(l, r) => toColumn(l, schema) && toColumn(r, schema)
    case Or(l, r) => toColumn(l, schema) || toColumn(r, schema)
    case Not(c) => !toColumn(c, schema)
    case UnaryPred(IsNull, r) => col(r).isNull
    case UnaryPred(NotNull, r) => col(r).isNotNull
    case UnaryPred(IsNan, r) => org.apache.spark.sql.functions.isnan(col(r))
    case UnaryPred(NotNan, r) => !org.apache.spark.sql.functions.isnan(col(r))
    case BinaryPred(op, r, v) =>
      val t = fieldType(schema, r)
      val c = col(r)
      val l = toSparkLiteral(t, v)
      op match {
        case Lt => c < l
        case LtEq => c <= l
        case Gt => c > l
        case GtEq => c >= l
        case Eq => c === l
        case NotEq => c =!= l
        case StartsWith => c.startsWith(v.asInstanceOf[String])
        case NotStartsWith => !c.startsWith(v.asInstanceOf[String])
      }
    case SetPred(In, r, vs) =>
      val t = fieldType(schema, r)
      col(r).isin(vs.toSeq.map(v => sparkValue(t, v)): _*)
    case SetPred(NotIn, r, vs) =>
      val t = fieldType(schema, r)
      !col(r).isin(vs.toSeq.map(v => sparkValue(t, v)): _*)
  }

  private def fieldType(schema: IcebergSchema, name: String): IcebergType =
    schema.findField(name).map(_.fieldType)
      .getOrElse(throw new IllegalArgumentException(s"unbound reference $name"))

  private def toSparkLiteral(t: IcebergType, v: Any): Column = lit(sparkValue(t, v))

  /** Iceberg-internal scalar → external JVM value Spark's lit() accepts. */
  def sparkValue(t: IcebergType, v: Any): Any =
    if (v == null) null
    else t match {
      case DateT => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case TimestampT | TimestamptzT =>
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(v.asInstanceOf[Long], 1000000L),
          Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L))
      case _ => v
    }

  // ---- convenience constructors ----
  def eqTo(r: String, v: Any): Predicate = BinaryPred(Eq, r, v)
  def lt(r: String, v: Any): Predicate = BinaryPred(Lt, r, v)
  def ltEq(r: String, v: Any): Predicate = BinaryPred(LtEq, r, v)
  def gt(r: String, v: Any): Predicate = BinaryPred(Gt, r, v)
  def gtEq(r: String, v: Any): Predicate = BinaryPred(GtEq, r, v)
  def in(r: String, vs: Any*): Predicate = SetPred(In, r, vs.toSet)
  def startsWith(r: String, v: String): Predicate = BinaryPred(StartsWith, r, v)
  def isNullPred(r: String): Predicate = UnaryPred(IsNull, r)
  def notNullPred(r: String): Predicate = UnaryPred(NotNull, r)

  /** µs since epoch for a UTC timestamp string "yyyy-MM-ddTHH:mm:ss". */
  def tsMicros(isoLocal: String): Long =
    java.time.LocalDateTime.parse(isoLocal).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L

  def dateDays(iso: String): Int = java.time.LocalDate.parse(iso).toEpochDay.toInt
}
