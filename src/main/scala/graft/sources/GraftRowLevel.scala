package graft.sources

import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, WriteBuilder}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.expr.{AlwaysTrue, Predicate, SparkFilters}
import graft.meta.FileContent
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
  *
  * Equality-delete tables are refused (their MoR application is a
  * distributed anti-join, not a per-file reader concern) — compact first.
  */
final class GraftRowLevelOperationBuilder(table: GraftTable,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(table, info.command)
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

  override def build(): Scan = {
    val hasEqDeletes = table.newScan().planDeletes()
      .exists(_.file.content == FileContent.EqualityDeletes)
    if (hasEqDeletes)
      throw new UnsupportedOperationException(
        "SQL row-level operations on tables with equality deletes are not " +
          "supported; compact first (rewriteDataFiles) or use the table API")
    // pushedFilters = Nil: no parquet row/row-group filtering — every live
    // row of every planned file must reach the rewrite
    new GraftBatchScan(table, predicate, Nil, required,
      onPlanned = tasks => op.scannedPaths = tasks.map(_.file.filePath).toSet)
  }
}
