package org.apache.spark.sql

import org.apache.spark.sql.connector.expressions._

/** Bridge to the `private[sql]` connector Transform case classes
  * (expressions.scala): `CREATE TABLE ... PARTITIONED BY` hands the
  * catalog plugin `Transform`s whose concrete types Scala hides outside
  * the sql package. Destructures them into plain data. */
object GraftTransformBridge {

  /** (transform name, integer argument if any, source column path). */
  def destructure(t: Transform): (String, Option[Int], Array[String]) = {
    def num(l: Literal[_]): Int = l.value match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(s"bad literal: $other")
    }
    t match {
      case IdentityTransform(ref) => ("identity", None, ref.fieldNames)
      case bt: BucketTransform =>
        require(bt.columns.length == 1,
          s"multi-column bucket unsupported: ${bt.describe}")
        ("bucket", Some(num(bt.numBuckets)), bt.columns.head.fieldNames)
      case YearsTransform(ref) => ("year", None, ref.fieldNames)
      case MonthsTransform(ref) => ("month", None, ref.fieldNames)
      case DaysTransform(ref) => ("day", None, ref.fieldNames)
      case HoursTransform(ref) => ("hour", None, ref.fieldNames)
      case ApplyTransform("truncate", args) if args.length == 2 =>
        (args(0), args(1)) match {
          case (r: NamedReference, l: Literal[_]) => ("truncate", Some(num(l)), r.fieldNames)
          case (l: Literal[_], r: NamedReference) => ("truncate", Some(num(l)), r.fieldNames)
          case _ => throw new IllegalArgumentException(
            s"unsupported truncate arguments: ${t.describe}")
        }
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform: ${other.describe}")
    }
  }
}
