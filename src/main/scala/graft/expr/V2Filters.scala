package graft.expr

import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Predicate => V2Predicate}
import org.apache.spark.sql.types._

import graft.spec.IcebergSchema

/** DSv2 `Predicate` → metadata AST, for runtime (dynamic-partition-
  * pruning-style) scan filtering: Spark evaluates the dimension side of a
  * join, hands the fact scan an `IN(part_col, ...)` over the observed join
  * keys, and the scan re-plans its file set through the normal partition /
  * metrics evaluators.
  *
  * Only the shapes dynamic pruning actually emits are translated (IN / = /
  * AND over a top-level column with foldable literals); anything else
  * returns None and the scan keeps its static plan — runtime filtering
  * must never narrow on a guess (same refusal discipline as
  * [[SparkFilters]], which handles the V1 `sources.Filter` mirror of
  * this translation).
  */
object V2Filters {

  def toPredicate(p: V2Predicate, schema: IcebergSchema): Option[Predicate] = p match {
    case a: V2And =>
      for {
        l <- toPredicate(a.left(), schema)
        r <- toPredicate(a.right(), schema)
      } yield l.and(r)
    case _ => p.name() match {
      case "IN" if p.children().nonEmpty =>
        ref(p.children()(0)).flatMap { name =>
          val vs = p.children().drop(1).map(external)
          if (vs.exists(_.isEmpty)) None
          else {
            val lits = vs.flatten.map(v => SparkFilters.literal(schema, name, v))
            if (lits.exists(_.isEmpty)) None
            else Some(SetPred(In, name, lits.flatten.toSet))
          }
        }
      case "=" if p.children().length == 2 =>
        ref(p.children()(0)).flatMap { name =>
          external(p.children()(1)).flatMap(v =>
            SparkFilters.literal(schema, name, v).map(BinaryPred(Eq, name, _)))
        }
      case _ => None
    }
  }

  private def ref(e: V2Expression): Option[String] = e match {
    case r: NamedReference if r.fieldNames().length == 1 => Some(r.fieldNames()(0))
    case _ => None
  }

  /** Catalyst-internal literal → the external Spark value representation
    * `SparkFilters.literal` expects (UTF8String → String, epoch-day int →
    * LocalDate, µs long → Instant, Decimal → BigDecimal). */
  private def external(e: V2Expression): Option[Any] = e match {
    case l: V2Literal[_] => (l.dataType, l.value) match {
      case (_, null) => None
      case (StringType, v) => Some(v.toString)
      case (DateType, d: java.lang.Integer) =>
        Some(java.time.LocalDate.ofEpochDay(d.longValue))
      case (TimestampType | TimestampNTZType, us: java.lang.Long) =>
        Some(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us.longValue, 1000000L),
          Math.floorMod(us.longValue, 1000000L) * 1000L))
      case (_: DecimalType, d: Decimal) => Some(d.toJavaBigDecimal)
      case (BooleanType | IntegerType | LongType | FloatType | DoubleType |
            ShortType | ByteType, v) => Some(v)
      case _ => None
    }
    case _ => None
  }
}
