package graft.sources

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

import graft.meta.{DataFile, SingleValue}
import graft.spec.{IcebergType, NestedField}
import graft.table.GraftTable

/** Evaluate an aggregation against manifest statistics alone (zero data
  * reads, driver-side over the cached manifest plan). Returns None unless
  * EVERY function in the aggregation is provably exact from metadata —
  * partial answers would be silently wrong, so it is all or nothing.
  *
  * Exactness rules (same statistics contract as the reference's
  * data_file.rs stats and Iceberg Java's aggregate pushdown):
  *   - any delete file in scope poisons every count/bound → None
  *   - COUNT(*): sum of data-file record counts — always present
  *   - COUNT(col): sum of (value_counts - null_value_counts); both maps
  *     must carry the field for every file
  *   - MIN/MAX(col): fold of per-file lower/upper bounds; every file must
  *     carry the bound, and float/double are rejected because NaN is
  *     excluded from parquet bounds (the same reason
  *     StrictMetricsEvaluator gates on NaN counts)
  */
object GraftMetadataAggregates {

  def evaluate(table: GraftTable, agg: Aggregation)
      : Option[(StructType, InternalRow)] = {
    val scan = table.newScan()
    if (scan.planDeletes().nonEmpty) return None
    val files = scan.planFiles().map(_.file)

    val cols = Seq.newBuilder[(StructField, Any)]
    agg.aggregateExpressions().zipWithIndex.foreach { case (fn, i) =>
      evalOne(table, files, fn, i) match {
        case Some(col) => cols += col
        case None => return None
      }
    }
    val resolved = cols.result()
    val schema = StructType(resolved.map(_._1))
    Some((schema, new GenericInternalRow(resolved.map(_._2).toArray)))
  }

  private def evalOne(table: GraftTable, files: Seq[DataFile],
      fn: AggregateFunc, i: Int): Option[(StructField, Any)] = fn match {
    case _: CountStar =>
      Some((StructField(s"count_star_$i", LongType, nullable = false),
        files.map(_.recordCount).sum))

    case c: Count if !c.isDistinct =>
      fieldOf(table, c.column()).flatMap { f =>
        val perFile = files.map { df =>
          (df.valueCounts.get(f.id), df.nullValueCounts.get(f.id)) match {
            case (Some(vc), Some(nc)) => Some(vc - nc)
            case _ => None
          }
        }
        if (perFile.exists(_.isEmpty)) None
        else Some((StructField(s"count_${f.name}_$i", LongType, nullable = false),
          perFile.flatten.sum))
      }

    case m: Min =>
      boundAgg(table, files, m.column(), i, "min", _.lowerBounds,
        (t, a, b) => if (SingleValue.compare(t, a, b) <= 0) a else b)

    case m: Max =>
      boundAgg(table, files, m.column(), i, "max", _.upperBounds,
        (t, a, b) => if (SingleValue.compare(t, a, b) >= 0) a else b)

    case _ => None
  }

  private def boundAgg(table: GraftTable, files: Seq[DataFile],
      col: V2Expression, i: Int, label: String,
      bounds: DataFile => Map[Int, Any],
      pick: (IcebergType, Any, Any) => Any): Option[(StructField, Any)] =
    fieldOf(table, col).flatMap { f =>
      f.fieldType match {
        // NaN is excluded from parquet bounds, so a float bound-fold is not
        // the true min/max whenever any NaN row exists — never provable
        case IcebergType.FloatT | IcebergType.DoubleT => None
        case t: graft.spec.PrimitiveIcebergType =>
          val sparkType: DataType = IcebergType.toSpark(t)
          val field = StructField(s"${label}_${f.name}_$i", sparkType, nullable = true)
          if (files.isEmpty) Some((field, null))
          else {
            val perFile = files.map(df => bounds(df).get(f.id))
            if (perFile.exists(_.isEmpty)) None
            else {
              val folded = perFile.flatten.reduce((a, b) => pick(t, a, b))
              // TimestampT maps to Spark's NTZ type, whose converter wants a
              // LocalDateTime (sparkValue's java.sql.Timestamp is the
              // zoned form)
              val external = (t, folded) match {
                case (IcebergType.TimestampT, us: Long) =>
                  java.time.LocalDateTime.ofEpochSecond(
                    Math.floorDiv(us, 1000000L),
                    (Math.floorMod(us, 1000000L) * 1000L).toInt,
                    java.time.ZoneOffset.UTC)
                case _ => graft.expr.Predicate.sparkValue(t, folded)
              }
              Some((field,
                CatalystTypeConverters.createToCatalystConverter(sparkType)(external)))
            }
          }
        case _ => None
      }
    }

  /** Resolve a v2 column reference to a top-level schema field (nested
    * references are not answerable from flat stats maps here). */
  private def fieldOf(table: GraftTable, col: V2Expression): Option[NestedField] =
    col match {
      case ref: NamedReference if ref.fieldNames().length == 1 =>
        table.schema.fields.find(_.name == ref.fieldNames()(0))
      case _ => None
    }
}

/** Single pre-computed row, executed driver-side (Spark lowers LocalScan
  * to a LocalTableScanExec — no executors, no shuffle, no files). */
final class GraftAggScan(schema: StructType, row: InternalRow)
    extends Scan with LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = Array(row)
  override def description(): String = "GraftAggScan(metadata-only aggregate)"
}
