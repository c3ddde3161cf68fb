package graft.expr

import org.apache.spark.sql.sources._

import graft.spec.{IcebergSchema, IcebergType, NestedField}
import graft.spec.IcebergType._

/** Spark `sources.Filter` → `graft.expr.Predicate` translation — the
  * reverse of the reference's DataFusion bridge
  * (crates/integrations/datafusion/src/physical_plan/expr_to_predicate.rs
  * :45-300). This is what lets a plain `df.filter(...)` on the DSv2
  * surface reach manifest/file-level metadata pruning: Spark lowers the
  * Catalyst expression to `sources.Filter`s, we lift the translatable
  * subset into the metadata AST, and whatever doesn't translate stays a
  * residual Catalyst filter (inexact pushdown — same contract as the
  * reference's `TableProviderFilterPushDown::Inexact`).
  */
object SparkFilters {

  /** Translate a filter; None = untranslatable (stays residual-only). */
  def toPredicate(f: Filter, schema: IcebergSchema): Option[Predicate] = f match {
    case EqualTo(a, v) => literal(schema, a, v).map(BinaryPred(Eq, a, _))
    case EqualNullSafe(a, null) => known(schema, a).map(_ => UnaryPred(graft.expr.IsNull, a))
    case EqualNullSafe(a, v) => literal(schema, a, v).map(BinaryPred(Eq, a, _))
    case GreaterThan(a, v) => literal(schema, a, v).map(BinaryPred(Gt, a, _))
    case GreaterThanOrEqual(a, v) => literal(schema, a, v).map(BinaryPred(GtEq, a, _))
    case LessThan(a, v) => literal(schema, a, v).map(BinaryPred(Lt, a, _))
    case LessThanOrEqual(a, v) => literal(schema, a, v).map(BinaryPred(LtEq, a, _))
    case In(a, vs) =>
      if (vs.contains(null)) None // null in IN-list: Catalyst three-valued, keep residual
      else {
        val lits = vs.toSeq.map(literal(schema, a, _))
        if (lits.forall(_.isDefined)) Some(SetPred(graft.expr.In, a, lits.flatten.toSet))
        else None
      }
    case IsNull(a) => known(schema, a).map(_ => UnaryPred(graft.expr.IsNull, a))
    case IsNotNull(a) => known(schema, a).map(_ => UnaryPred(NotNull, a))
    case StringStartsWith(a, v) => known(schema, a).map(_ => BinaryPred(StartsWith, a, v))
    case And(l, r) =>
      // partial AND is sound for pruning: a file matching (l AND r) matches l
      (toPredicate(l, schema), toPredicate(r, schema)) match {
        case (Some(lp), Some(rp)) => Some(lp.and(rp))
        case (Some(lp), None) => Some(lp)
        case (None, Some(rp)) => Some(rp)
        case _ => None
      }
    case Or(l, r) =>
      // OR must translate completely or not at all
      for (lp <- toPredicate(l, schema); rp <- toPredicate(r, schema)) yield lp.or(rp)
    case Not(c) => toPredicateExact(c, schema).map(p => Predicate.rewriteNot(p.negate))
    // AlwaysTrue is what TRUNCATE TABLE and a bare `DELETE FROM t` arrive
    // as (SupportsDeleteV2.truncateTable's default): translating it makes
    // both the whole-file metadata path instead of a silent no-op / full
    // CoW rewrite.
    case org.apache.spark.sql.sources.AlwaysTrue() => Some(graft.expr.AlwaysTrue)
    case org.apache.spark.sql.sources.AlwaysFalse() => Some(graft.expr.AlwaysFalse)
    case _ => None // StringContains/EndsWith, nested etc.
  }

  /** Like toPredicate but refuses PARTIAL translations. Partial And is a
    * weakening (matches a superset) — sound for pruning — but under Not a
    * weakening becomes a strengthening: ¬(l∧r) does NOT imply ¬l, so
    * pruning with ¬l could skip files whose rows satisfy the original
    * filter via ¬r. Anything under a Not must translate completely or the
    * whole Not stays residual (same refusal as Iceberg's SparkFilters). */
  def toPredicateExact(f: Filter, schema: IcebergSchema): Option[Predicate] = f match {
    case And(l, r) =>
      for (lp <- toPredicateExact(l, schema); rp <- toPredicateExact(r, schema)) yield lp.and(rp)
    case Or(l, r) =>
      for (lp <- toPredicateExact(l, schema); rp <- toPredicateExact(r, schema)) yield lp.or(rp)
    case Not(c) => toPredicateExact(c, schema).map(p => Predicate.rewriteNot(p.negate))
    case leaf => toPredicate(leaf, schema)
  }

  /** Conjunction of every translatable filter (pruning predicate). */
  def toPredicate(filters: Seq[Filter], schema: IcebergSchema): Predicate =
    filters.flatMap(toPredicate(_, schema))
      .foldLeft(graft.expr.AlwaysTrue: Predicate)(_.and(_))

  /** Exact conjunction of ALL filters, or None if any filter translates
    * partially or not at all. This is the `SupportsDelete` contract: a
    * metadata delete removes exactly the matching rows, so a weakened
    * (superset) translation — fine for pruning — would over-delete. */
  def exactConjunction(filters: Seq[Filter], schema: IcebergSchema): Option[Predicate] = {
    val exact = filters.map(toPredicateExact(_, schema))
    if (exact.exists(_.isEmpty)) None
    else Some(exact.flatten.foldLeft(graft.expr.AlwaysTrue: Predicate)(_.and(_)))
  }

  private def known(schema: IcebergSchema, name: String): Option[NestedField] =
    schema.findField(name)

  /** External Spark filter value → Iceberg-internal scalar for the field's
    * type (date=Int days, timestamp=Long µs, decimal=BigDecimal), with
    * numeric width adaptation. None if the value can't represent. */
  def literal(schema: IcebergSchema, name: String, v: Any): Option[Any] = {
    if (v == null) return None
    known(schema, name).flatMap { f =>
      (f.fieldType, v) match {
        case (DateT, d: java.sql.Date) => Some(d.toLocalDate.toEpochDay.toInt)
        case (DateT, d: java.time.LocalDate) => Some(d.toEpochDay.toInt)
        case (TimestampT | TimestamptzT, t: java.sql.Timestamp) =>
          val i = t.toInstant
          Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
        case (TimestampT | TimestamptzT, i: java.time.Instant) =>
          Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
        case (TimestampT, t: java.time.LocalDateTime) =>
          val i = t.toInstant(java.time.ZoneOffset.UTC)
          Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
        case (IntT, n: java.lang.Integer) => Some(n.intValue)
        case (IntT, n: java.lang.Long) if n.longValue.isValidInt => Some(n.intValue)
        case (LongT, n: java.lang.Long) => Some(n.longValue)
        case (LongT, n: java.lang.Integer) => Some(n.longValue)
        case (FloatT, n: java.lang.Float) => Some(n.floatValue)
        case (FloatT, n: java.lang.Double) => Some(n.floatValue)
        case (DoubleT, n: java.lang.Double) => Some(n.doubleValue)
        case (DoubleT, n: java.lang.Float) => Some(n.doubleValue)
        case (DecimalT(_, s), d: java.math.BigDecimal) => Some(d.setScale(s))
        case (DecimalT(_, s), d: BigDecimal) => Some(d.bigDecimal.setScale(s))
        case (StringT, s: String) => Some(s)
        case (BooleanT, b: java.lang.Boolean) => Some(b.booleanValue)
        case _ => None
      }
    }
  }
}
