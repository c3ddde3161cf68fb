package graft.sources

import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, WriteBuilder}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.expr.{AlwaysTrue, Predicate, SparkFilters}
import graft.table.GraftTable

/** SQL row-level operations (`DELETE FROM` / `UPDATE` / `MERGE INTO`),
  * GROUP-BASED copy-on-write: Spark rewrites the command into a
  * `ReplaceData` plan — read the affected groups, recompute their rows,
  * write them back — and this connector supplies the two halves:
  *
  *   - the SCAN plans candidate files with metadata pruning on the
  *     command's condition, but (per the group-based contract) must
  *     return EVERY live row of those files: the condition selects
  *     groups, never rows. So no parquet row filters are pushed — even
  *     row-group pruning would silently drop rows that the commit then
  *     deletes with the file. MoR position deletes / DVs still apply in
  *     the reader (deleted rows must NOT be resurrected by the rewrite).
  *   - the WRITE is the native batch writer in replace-files mode: the
  *     commit tombstones exactly the files the scan planned and adds the
  *     rewritten ones in one atomic `overwrite` snapshot.
  *
  * At 100 TB the plan shape is the right one: a partition-aligned DELETE
  * or UPDATE touches only the pruned files' groups; everything else is
  * untouched metadata. (Translatable DELETEs don't even get here — Spark
  * prefers the `SupportsDelete` metadata path, which the table also
  * implements.)
  */
final class GraftRowLevelOperationBuilder(table: GraftTable,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {

  /** `write.delete|update|merge.mode` routes each command: copy-on-write
    * (default) → group-based rewrite; merge-on-read → position-delta
    * write (GraftDelta). */
  override def build(): RowLevelOperation = {
    val key = info.command match {
      case Command.DELETE => "write.delete.mode"
      case Command.UPDATE => "write.update.mode"
      case Command.MERGE => "write.merge.mode"
    }
    table.metadata.properties.getOrElse(key, "copy-on-write") match {
      case "merge-on-read" => new GraftDeltaOperation(table, info.command)
      case "copy-on-write" => new GraftRowLevelOperation(table, info.command)
      case other => throw new IllegalArgumentException(
        s"$key must be copy-on-write or merge-on-read, got '$other'")
    }
  }
}

final class GraftRowLevelOperation(table: GraftTable, cmd: Command)
    extends RowLevelOperation {

  /** File paths planned by this operation's scan — the groups the write's
    * commit replaces. Set on the driver at scan planning time, which
    * always precedes the write job that consumes the scan. */
  @volatile private[sources] var scannedPaths: Set[String] = Set.empty

  override def command(): Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftCowScanBuilder(table, this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(table, info.schema(), replaceOp = Some(this))

  /** `_file` anchors the rewrite: with a metadata attribute present Spark
    * builds ReplaceData projections and hands the writer rows projected
    * down to exactly the table columns (otherwise the rewrite's internal
    * operation column leaks into the write schema). */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      GraftBatchScan.FileColumn))

  override def description(): String = s"graft-cow-$cmd ${table.name}"
}

final class GraftCowScanBuilder(table: GraftTable, op: GraftRowLevelOperation)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var predicate: Predicate = AlwaysTrue
  private var required: Option[StructType] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    predicate = SparkFilters.toPredicate(filters.toSeq, table.schema)
    filters
  }

  /** Nothing is exact: the condition only selects groups. */
  override def pushedFilters(): Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def build(): Scan =
    // pushedFilters = Nil: no parquet row/row-group filtering — every live
    // row of every planned file must reach the rewrite. MoR deletes of all
    // three kinds (position, DV, equality) and v3 defaults apply in the
    // native reader, so the rewrite re-emits exactly the live, defaulted
    // rows of the replaced files.
    new GraftCowBatchScan(table, predicate, required, op)
}

/** CoW scan with RUNTIME group filtering (SupportsRuntimeV2Filtering on
  * `_file`): before the rewrite runs, Spark evaluates a subquery finding
  * the distinct `_file`s whose rows actually match the command (for MERGE,
  * a join against the source — the case with NO static pushdown at all)
  * and narrows this scan to those files. At 100 TB this is what keeps a
  * sparse MERGE from rewriting the whole table: only files containing a
  * matched row are re-planned, re-read, and replaced. */
final class GraftCowBatchScan(table: GraftTable, predicate: Predicate,
    required: Option[StructType], op: GraftRowLevelOperation)
    extends GraftBatchScan(table, predicate, Nil, required,
      onPlanned = paths => op.scannedPaths = paths.toSet)
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftBatchScan.FileColumn))

  override def filter(predicates: Array[V2Predicate]): Unit = {
    val pathSets = predicates.flatMap(filePathsOf)
    if (pathSets.nonEmpty)
      setRuntimeFileFilter(pathSets.reduce(_ intersect _))
  }

  /** `IN(_file, ...)` / `=(_file, lit)` → the referenced path set; None
    * for anything unrecognized (never narrows on a guess). */
  private def filePathsOf(p: V2Predicate): Option[Set[String]] = {
    def isFileRef(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case r: NamedReference =>
          r.fieldNames.sameElements(Array(GraftBatchScan.FileColumn))
        case _ => false
      }
    def lit(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] =
      e match {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          Some(String.valueOf(l.value))
        case _ => None
      }
    p.name() match {
      case "IN" if p.children().nonEmpty && isFileRef(p.children()(0)) =>
        val vals = p.children().drop(1).map(lit)
        if (vals.forall(_.isDefined)) Some(vals.flatten.toSet) else None
      case "=" if p.children().length == 2 && isFileRef(p.children()(0)) =>
        lit(p.children()(1)).map(Set(_))
      case _ => None
    }
  }
}
