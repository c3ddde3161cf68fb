package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit}

import graft.catalog.{Catalog, CommitRetry}
import graft.expr.{AlwaysTrue, ExpressionEvaluator, InclusiveMetricsEvaluator, InclusiveProjection, ManifestEvaluator, Predicate}
import graft.io.FileIO
import graft.meta._
import graft.spec._

/** A loaded table handle — metadata tree + IO (reference table.rs).
  * Immutable; every commit produces a new handle via the catalog.
  */
final class GraftTable(
    val name: String,
    val metadata: TableMetadata,
    val version: Int,
    val catalog: Catalog) {

  def io: FileIO = catalog.io
  def schema: IcebergSchema = metadata.currentSchema
  def spec: PartitionSpec = metadata.defaultSpec
  def location: String = metadata.location

  def newScan(): TableScan = new TableScan(this)

  /** Multi-action transaction: stage several actions, land them in ONE
    * catalog swap (reference transaction/mod.rs). */
  def newTransaction: Transaction = new Transaction(this)

  /** A read-only view of this table pinned at `snapshotId` — scans and
    * metadata tables see that snapshot as current (time travel; writes
    * are unaffected because commits re-load the live base via CAS). */
  def atSnapshot(snapshotId: Long): GraftTable = {
    require(metadata.snapshotById(snapshotId).isDefined,
      s"snapshot $snapshotId not found")
    new GraftTable(name, metadata.copy(currentSnapshotId = Some(snapshotId)),
      version, catalog)
  }

  /** Pin at the snapshot that was current at `timestampMs` (snapshot-log
    * resolution — Iceberg's as-of-timestamp rule). */
  def asOfTimestamp(timestampMs: Long): GraftTable = {
    val id = metadata.snapshotLog.filter(_._2 <= timestampMs).lastOption
      .map(_._1).getOrElse(throw new IllegalArgumentException(
        s"no snapshot committed at or before $timestampMs"))
    atSnapshot(id)
  }

  def append(df: DataFrame): GraftTable = AppendWriter.append(this, df)

  /** Stage an append on a branch (write-audit-publish): the table's main
    * line is untouched until `publish` fast-forwards to the branch. */
  def appendToBranch(df: DataFrame, branch: String): GraftTable =
    AppendWriter.append(this, df, branch = Some(branch))

  /** Publish a staged branch: fast-forward main to its head (refused if
    * the branch has diverged from current). */
  def publish(branch: String): GraftTable = Transactions.fastForward(this, branch)

  /** Row-level DELETE WHERE as a MoR position-delete commit. */
  def deleteWhere(p: Predicate, spark: SparkSession): GraftTable =
    DeleteWriter.deleteWhere(this, p, spark)

  /** Row-level DELETE WHERE as v3 Puffin deletion vectors. */
  def deleteWhereDV(p: Predicate, spark: SparkSession): GraftTable =
    DeleteWriter.deleteWhereDV(this, p, spark)

  /** Equality-delete commit on the given key columns. */
  def equalityDelete(keys: DataFrame, keyCols: Seq[String]): GraftTable =
    DeleteWriter.equalityDelete(this, keys, keyCols, keys.sparkSession)

  /** Atomic upsert: equality delete on `keyCols` + append of `df` in ONE
    * snapshot (the Flink upsert-mode commit shape). */
  def upsert(df: DataFrame, keyCols: Seq[String]): GraftTable =
    DeleteWriter.upsert(this, df, keyCols, df.sparkSession)

  /** Atomic OVERWRITE WHERE: delete matching rows + insert replacement
    * in one snapshot (copy-on-write). */
  def overwriteWhere(p: Predicate, replacement: DataFrame,
      spark: SparkSession): GraftTable =
    RowOps.overwriteWhere(this, p, replacement, spark)

  /** UPDATE ... SET assignments WHERE p (copy-on-write). */
  def updateWhere(p: Predicate, assignments: Map[String, Column],
      spark: SparkSession): GraftTable =
    RowOps.updateWhere(this, p, assignments, spark)

  /** MERGE (upsert) `source` on `keyCols` (copy-on-write). */
  def mergeInto(source: DataFrame, keyCols: Seq[String]): GraftTable =
    RowOps.mergeInto(this, source, keyCols, source.sparkSession)

  /** Compaction: rewrite the current snapshot to ~target-size files,
    * folding MoR deletes in (replace commit). */
  def rewriteManifests(smallManifestBytes: Long = 8L << 20): GraftTable =
    Maintenance.rewriteManifests(this, smallManifestBytes)

  /** Z-order rewrite over `cols` (multi-dimensional clustering). */
  def rewriteDataFilesZOrder(spark: SparkSession, cols: Seq[String],
      targetFileSizeBytes: Long = 512L << 20): GraftTable =
    Maintenance.rewriteDataFilesZOrder(this, spark, cols, targetFileSizeBytes)

  def rewriteDataFiles(spark: SparkSession,
      targetFileSizeBytes: Long = 512L << 20): GraftTable =
    Maintenance.rewriteDataFiles(this, spark, targetFileSizeBytes)

  /** Expire snapshots older than the timestamp, retaining ancestors. */
  def expireSnapshots(olderThanMs: Long, retainLast: Int = 1): GraftTable =
    Maintenance.expireSnapshots(this, olderThanMs, retainLast)

  /** GC data files referenced by no snapshot (returns deleted paths);
    * listing, anti-join and deletion run as Spark jobs. */
  def removeOrphanFiles(olderThanMs: Long, spark: SparkSession): Seq[String] =
    Maintenance.removeOrphanFiles(this, olderThanMs, spark)

  /** Roll back to an earlier snapshot (metadata-only). */
  def rollbackTo(snapshotId: Long): GraftTable =
    Maintenance.rollbackTo(this, snapshotId)

  /** Re-commit an append snapshot's files onto the current head
    * (write-audit-publish when fast-forward is impossible). */
  def cherrypick(snapshotId: Long): GraftTable =
    Maintenance.cherrypickSnapshot(this, snapshotId)

  /** Compact position-delete files, dropping dangling rows. */
  def rewritePositionDeletes(spark: SparkSession): GraftTable =
    Maintenance.rewritePositionDeletes(this, spark)

  /** Schema-evolution builder (metadata-only commit;
    * transaction/update_schema.rs:116-147). */
  def updateSchema(): UpdateSchema = new UpdateSchema(this)

  def updateProperties(set: Map[String, String],
      remove: Set[String] = Set.empty): GraftTable =
    Transactions.updateProperties(this, set, remove)

  def replaceSortOrder(fields: Seq[graft.spec.SortField]): GraftTable =
    Transactions.replaceSortOrder(this, fields)

  def upgradeFormatVersion(to: Int): GraftTable =
    Transactions.upgradeFormatVersion(this, to)

  def updateLocation(newLocation: String): GraftTable =
    Transactions.updateLocation(this, newLocation)

  def updateStatistics(set: Seq[graft.spec.StatisticsFile] = Nil,
      removeSnapshotIds: Set[Long] = Set.empty): GraftTable =
    Transactions.updateStatistics(this, set, removeSnapshotIds)

  def updatePartitionStatistics(set: Seq[graft.spec.PartitionStatisticsFile] = Nil,
      removeSnapshotIds: Set[Long] = Set.empty): GraftTable =
    Transactions.updatePartitionStatistics(this, set, removeSnapshotIds)

  def writePartitionStats(spark: SparkSession): GraftTable =
    Maintenance.writePartitionStats(this, spark)

  /** Row-level CDC over (from, to]: see graft.table.Changelog. */
  def changesBetween(spark: SparkSession, fromSnapshotId: Long,
      toSnapshotId: Long, netChanges: Boolean = false): DataFrame =
    Changelog.changesBetween(this, spark, fromSnapshotId, toSnapshotId, netChanges)

  def readPartitionStats(spark: SparkSession,
      snapshotId: Option[Long] = None): DataFrame =
    Maintenance.readPartitionStats(this, spark, snapshotId)

  /** Register existing parquet files without rewriting (migration path;
    * name-mapping read resolution for id-less files). */
  def addFiles(spark: SparkSession, paths: Seq[String]): GraftTable =
    AddFiles.addFiles(this, spark, paths)

  /** Partition evolution: install a new default spec; old files keep
    * their layout, scans prune per spec. */
  def updateSpec(fields: Seq[(String, Transform)]): GraftTable =
    Transactions.updateSpec(this, fields)

  /** Create/move a branch to a snapshot (defaults to current). */
  def createBranch(name: String, snapshotId: Option[Long] = None): GraftTable =
    Transactions.setRef(this, name, snapshotId.orElse(metadata.currentSnapshotId)
      .getOrElse(throw new IllegalStateException("empty table has no snapshot")), "branch")

  /** Create/move a tag pinning a snapshot (defaults to current). */
  def createTag(name: String, snapshotId: Option[Long] = None): GraftTable =
    Transactions.setRef(this, name, snapshotId.orElse(metadata.currentSnapshotId)
      .getOrElse(throw new IllegalStateException("empty table has no snapshot")), "tag")

  def removeRef(name: String): GraftTable = Transactions.removeRef(this, name)

  def refsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    metadata.refs.toSeq.sortBy(_._1)
      .map { case (n, r) => (n, r.refType, r.snapshotId) }
      .toDF("name", "type", "snapshot_id")
  }

  def refresh(): GraftTable = GraftTable.load(name, catalog)

  /** All manifests of the current snapshot ([] if table is empty). */
  def currentManifests: Seq[ManifestFile] =
    metadata.currentSnapshot.map { snap =>
      ManifestIO.readManifestList(io, snap.manifestList, partTypes,
        graft.crypto.MetadataEncryption.listKeyFor(metadata, snap))
    }.getOrElse(Nil)

  def partTypes: Map[Int, IcebergType.StructT] =
    metadata.partitionSpecs.map { s =>
      // partition types resolve against the schema current when the spec
      // was created; current schema suffices while we only add columns
      s.specId -> s.partitionType(schema)
    }.toMap

  // ---- metadata inspect tables (inspect/metadata_table.rs:28-92;
  //      column sets mirror inspect/{snapshots,manifests,history}.rs
  //      field-for-field, pinned by MetadataTablesParitySpec) ----

  /** snapshots (inspect/snapshots.rs:47-74): committed_at, snapshot_id,
    * parent_id, operation, manifest_list, summary — plus this engine's
    * `sequence_number` extension appended LAST (deterministic handle for
    * fixtures; reference columns stay a clean prefix). */
  def snapshotsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    metadata.snapshots.map(s => (new java.sql.Timestamp(s.timestampMs),
      s.snapshotId, s.parentSnapshotId, s.operation, s.manifestList,
      s.summary, s.sequenceNumber))
      .toDF("committed_at", "snapshot_id", "parent_id", "operation",
        "manifest_list", "summary", "sequence_number")
  }

  /** manifests (inspect/manifests.rs:46-139): the reference fills the
    * data AND delete count columns with the manifest's one count triple
    * (manifests.rs:171-182) — mirrored as-is for interop; bounds in
    * partition_summaries render as strings. */
  def manifestsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    currentManifests.map { m =>
      val spec = metadata.specById(m.partitionSpecId).getOrElse(this.spec)
      val summaries = m.partitions.zip(spec.fields).map { case (fs, _) =>
        GraftTable.PartitionSummaryRow(fs.containsNull, fs.containsNan,
          fs.lowerBound.map(String.valueOf), fs.upperBound.map(String.valueOf))
      }
      GraftTable.ManifestRow(m.content, m.manifestPath, m.manifestLength,
        m.partitionSpecId, m.addedSnapshotId,
        m.addedFilesCount, m.existingFilesCount, m.deletedFilesCount,
        m.addedFilesCount, m.existingFilesCount, m.deletedFilesCount,
        summaries)
    }.toDF()
  }

  /** history (inspect/history.rs:55-76): snapshot-log entries with the
    * parent id resolved per snapshot and live-lineage membership. */
  def historyDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val currentAncestors = ancestorIds.toSet
    metadata.snapshotLog.map { case (id, ts) =>
      (new java.sql.Timestamp(ts), id,
        metadata.snapshotById(id).flatMap(_.parentSnapshotId),
        currentAncestors.contains(id))
    }.toDF("made_current_at", "snapshot_id", "parent_id", "is_current_ancestor")
  }

  /** entries metadata table (inspect/metadata_table.rs): one row per
    * manifest entry of the current snapshot, tombstones included. */
  def entriesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    currentManifests.flatMap { m =>
      val sp = metadata.specById(m.partitionSpecId).getOrElse(spec)
      ManifestIO.readManifest(io, m.manifestPath, schema, sp, m.keyMetadata).map { e =>
        (e.status, e.snapshotId, e.sequenceNumber.getOrElse(m.sequenceNumber),
          e.dataFile.content, e.dataFile.filePath, e.dataFile.recordCount,
          e.dataFile.fileSizeInBytes)
      }
    }.toDF("status", "snapshot_id", "sequence_number", "content",
      "file_path", "record_count", "file_size_in_bytes")
  }

  /** partitions metadata table: per-partition rollup from manifests only
    * (no data read). */
  def partitionsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    newScan().planFiles()
      .groupBy(t => (t.specId, spec.partitionPath(t.file.partition)))
      .map { case ((specId, part), ts) =>
        (part, specId, ts.map(_.file.recordCount).sum, ts.size,
          ts.map(_.file.fileSizeInBytes).sum)
      }.toSeq.sortBy(t => (t._2, t._1))
      .toDF("partition", "spec_id", "record_count", "file_count",
        "total_size_in_bytes")
  }

  def filesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    newScan().planFiles().map { t =>
      (t.file.filePath, t.file.content, t.file.recordCount, t.file.fileSizeInBytes,
        spec.partitionPath(t.file.partition))
    }.toDF("file_path", "content", "record_count", "file_size_in_bytes", "partition")
  }

  /** delete_files inspect table (Java's delete_files — `files` lists the
    * data side): one row per alive delete file in the current snapshot. */
  def deleteFilesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    newScan().planDeletes().map { d =>
      (d.file.filePath, d.file.content, d.file.fileFormat,
        d.file.recordCount, d.file.fileSizeInBytes, d.specId,
        d.sequenceNumber, d.file.equalityIds)
    }.toDF("file_path", "content", "file_format", "record_count",
      "file_size_in_bytes", "spec_id", "sequence_number", "equality_ids")
  }

  /** position_deletes inspect table (Java's position_deletes): the actual
    * delete ROWS across formats — parquet pos-delete files are read
    * DISTRIBUTED; DV bitmaps decode on executors (same shape as the MoR
    * read path, no positions ever materialize on the driver). */
  def positionDeletesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, input_file_name, lit}
    val deletes = newScan().planDeletes()
      .filter(_.file.content == FileContent.PositionDeletes)
    val (dvs, parquets) = deletes.partition(_.file.fileFormat == "PUFFIN")
    val empty = Seq.empty[(String, Long, String)]
      .toDF("file_path", "pos", "delete_file_path")
    val enc = graft.crypto.Encryption.confFor(metadata.properties)
    val pdf =
      if (parquets.isEmpty) empty
      else spark.read.options(enc).parquet(parquets.map(_.file.filePath): _*)
        .select(col("file_path"), col("pos"),
          input_file_name().as("delete_file_path"))
    val ddf =
      if (dvs.isEmpty) empty
      else {
        val descriptors = dvs.flatMap(d => d.file.referencedDataFile.map(ref =>
          (d.file.filePath, d.file.contentOffset.getOrElse(0L),
            d.file.contentSizeInBytes.getOrElse(0L), ref)))
        spark.sparkContext
          .parallelize(descriptors, math.max(1, math.min(descriptors.size, 64)))
          .flatMap { case (puffin, offset, len, ref) =>
            val io = graft.io.FileIO.local()
            val meta = graft.puffin.Puffin.BlobMetadata(
              graft.puffin.Puffin.DeletionVectorV1, Nil, 0L, 0L, offset, len,
              Map.empty)
            graft.puffin.Puffin.dvDeserialize(
              graft.puffin.Puffin.readBlob(io, puffin, meta))
              .iterator.map(pos => (ref, pos, puffin))
          }.toDF("file_path", "pos", "delete_file_path")
      }
    pdf.union(ddf)
  }

  /** all_manifests: every manifest reachable from ANY snapshot (Iceberg's
    * all_manifests inspect table) — one row per (manifest, snapshot). */
  def allManifestsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    metadata.snapshots.flatMap { s =>
      ManifestIO.readManifestList(io, s.manifestList, partTypes,
          graft.crypto.MetadataEncryption.listKeyFor(metadata, s))
        .map(m => (s.snapshotId, m.manifestPath, m.manifestLength, m.content,
          m.partitionSpecId, m.addedFilesCount, m.existingFilesCount,
          m.deletedFilesCount))
    }.toDF("reference_snapshot_id", "path", "length", "content",
      "partition_spec_id", "added_data_files_count",
      "existing_data_files_count", "deleted_data_files_count")
  }

  /** all_files: every data/delete file referenced by any snapshot,
    * deduplicated by path (all_files inspect table). */
  def allFilesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    metadata.snapshots.flatMap { s =>
      ManifestIO.readManifestList(io, s.manifestList, partTypes,
          graft.crypto.MetadataEncryption.listKeyFor(metadata, s)).flatMap { m =>
        val sp = metadata.specById(m.partitionSpecId).getOrElse(spec)
        ManifestIO.readManifest(io, m.manifestPath, schema, sp, m.keyMetadata)
          .filter(_.isAlive)
          .map(e => (e.dataFile.filePath, e.dataFile.content,
            e.dataFile.recordCount, e.dataFile.fileSizeInBytes))
      }
    }.distinct
      .toDF("file_path", "content", "record_count", "file_size_in_bytes")
  }

  /** all_entries: manifest entries of every snapshot's manifest list,
    * tombstones included, tagged with the referencing snapshot. */
  def allEntriesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    metadata.snapshots.flatMap { s =>
      ManifestIO.readManifestList(io, s.manifestList, partTypes,
          graft.crypto.MetadataEncryption.listKeyFor(metadata, s)).flatMap { m =>
        val sp = metadata.specById(m.partitionSpecId).getOrElse(spec)
        ManifestIO.readManifest(io, m.manifestPath, schema, sp, m.keyMetadata).map { e =>
          (s.snapshotId, e.status, e.snapshotId,
            e.sequenceNumber.getOrElse(m.sequenceNumber),
            e.dataFile.content, e.dataFile.filePath, e.dataFile.recordCount)
        }
      }
    }.toDF("reference_snapshot_id", "status", "snapshot_id",
      "sequence_number", "content", "file_path", "record_count")
  }

  /** metadata_log_entries metadata table (table_metadata.rs metadata_log):
    * every metadata.json generation plus the live one, with the snapshot
    * that was current when each was written. The log is O(commits) and
    * each file is KB-scale JSON, so the driver-side reads are bounded. */
  def metadataLogEntriesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val current = s"$location/metadata/v$version.metadata.json"
    val entries = metadata.metadataLog :+ (current, metadata.lastUpdatedMs)
    entries.map { case (file, ts) =>
      val snapId =
        if (file == current) metadata.currentSnapshotId
        else scala.util.Try(
          TableMetadata.fromJsonString(io.readString(file)).currentSnapshotId)
          .toOption.flatten
      (new java.sql.Timestamp(ts), file, snapId)
    }.toDF("timestamp", "file", "latest_snapshot_id")
  }

  private def ancestorIds: Seq[Long] = {
    val byId = metadata.snapshots.map(s => s.snapshotId -> s).toMap
    Iterator.iterate(metadata.currentSnapshot)(s => s.flatMap(_.parentSnapshotId).flatMap(byId.get))
      .takeWhile(_.isDefined).flatten.map(_.snapshotId).toSeq
  }
}

object GraftTable {

  /** manifests-table row shapes (inspect/manifests.rs:46-139 column
    * names/types — field names ARE the column names via the encoder). */
  final case class PartitionSummaryRow(contains_null: Boolean,
      contains_nan: Option[Boolean], lower_bound: Option[String],
      upper_bound: Option[String])
  final case class ManifestRow(content: Int, path: String, length: Long,
      partition_spec_id: Int, added_snapshot_id: Long,
      added_data_files_count: Int, existing_data_files_count: Int,
      deleted_data_files_count: Int, added_delete_files_count: Int,
      existing_delete_files_count: Int, deleted_delete_files_count: Int,
      partition_summaries: Seq[PartitionSummaryRow])
  def load(name: String, catalog: Catalog): GraftTable = {
    val (md, v) = catalog.loadTable(name)
    new GraftTable(name, md, v, catalog)
  }

  def create(name: String, catalog: Catalog, schema: IcebergSchema,
      spec: PartitionSpec = PartitionSpec.unpartitioned,
      properties: Map[String, String] = Map.empty): GraftTable = {
    catalog.createTable(name, schema, spec, properties)
    load(name, catalog)
  }

  /** Greedy row-group packing into ~target-sized (start, length) read
    * ranges — shared by local and distributed planning so both produce
    * byte-identical splits. */
  def splitRanges(size: Long, offsets: Seq[Long], target: Long = 128L << 20)
      : Seq[(Long, Long)] =
    if (offsets.size <= 1 || size <= target) Seq((0L, size))
    else {
      val bounds = offsets :+ size
      val ranges = Seq.newBuilder[(Long, Long)]
      var start = bounds.head
      var i = 1
      while (i < bounds.size) {
        if (bounds(i) - start >= target || i == bounds.size - 1) {
          ranges += ((start, bounds(i) - start))
          start = bounds(i)
        }
        i += 1
      }
      ranges.result()
    }
}

/** Unit of scan work (scan/task.rs:55-130). */
final case class FileScanTask(
    file: DataFile,
    specId: Int,
    sequenceNumber: Long)

/** Driver-compact planning result: exactly what execution needs, WITHOUT
  * the per-file stats maps (bounds/value-counts/column-sizes) that
  * dominate task size. At ~200k planned files the full `DataFile` stats
  * put GBs on the driver; this caps the footprint at ~100 bytes + the
  * partition tuple per file. Everything pruning-derived (missing-default
  * names, null counts for the projected columns, row-group split ranges)
  * is pre-reduced where the stats still exist — on the executor in
  * distributed planning, inline in local planning. */
final case class CompactFileTask(
    filePath: String,
    fileSize: Long,
    recordCount: Long,
    specId: Int,
    sequenceNumber: Long,
    partition: Seq[Any],
    sortOrderId: Option[Int],
    missingDefaults: Seq[String],
    splitRanges: Seq[(Long, Long)],
    nullCounts: Map[Int, Long],
    firstRowId: Option[Long] = None)

/** A delete file in scope for the scanned snapshot (DeleteFileIndex entry,
  * delete_file_index.rs:37). */
final case class DeleteTask(
    file: DataFile,
    sequenceNumber: Long,
    /** Partition spec the delete file was written under — scopes
      * equality deletes to their partition (delete_file_index.rs). */
    specId: Int = -1)

/** Append-only incremental scan over (from, to] — see
  * TableScan.appendsBetween. */
final class IncrementalScan private[table] (
    table: GraftTable, toSnapshotId: Long, rangeIds: Set[Long]) {

  def planFiles(): Seq[FileScanTask] = {
    val snap = table.metadata.snapshotById(toSnapshotId).get
    ManifestIO.readManifestList(table.io, snap.manifestList, table.partTypes,
        graft.crypto.MetadataEncryption.listKeyFor(table.metadata, snap))
      .filter(_.content == ManifestContent.Data)
      .flatMap { m =>
        val spec = table.metadata.specById(m.partitionSpecId).getOrElse(table.spec)
        ManifestIO.readManifest(table.io, m.manifestPath, table.schema, spec,
          m.keyMetadata)
          .filter(e => e.status == ManifestStatus.Added &&
            e.snapshotId.exists(rangeIds.contains))
          .map(e => FileScanTask(e.dataFile, m.partitionSpecId,
            e.sequenceNumber.getOrElse(m.sequenceNumber)))
      }
  }

  def toDF(spark: SparkSession): DataFrame = {
    val tasks = planFiles()
    val sparkSchema = table.schema.toSpark
    if (tasks.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)
    else
      graft.SessionConf.scanSession(spark).read.schema(sparkSchema)
        .parquet(tasks.map(_.file.filePath): _*)
  }
}

/** Byte-range slice of a FileScanTask (scan/task.rs:60-62 start/length):
  * the distribution unit a cluster scheduler hands to one reader. Splits
  * land on parquet row-group boundaries (split_offsets). */
final case class FileSplit(task: FileScanTask, start: Long, length: Long)

/** Per-stage planning counters (arrow/scan_metrics.rs:54-72). */
final case class ScanMetrics(
    totalDataManifests: Int,
    skippedManifests: Int,
    entriesConsidered: Long,
    skippedByPartition: Long,
    skippedByMetrics: Long,
    resultFiles: Int)

/** Process-global accumulator of planning counters (VERDICT r14 item 6):
  * every [[TableScan.planWithMetrics]] / [[TableScan
  * .planCompactDistributed]] call reports its [[ScanMetrics]] here, so a
  * harness that brackets a query (reset → run → snapshot) sees the file
  * counts its scans actually planned. This is what lets a PRUNE
  * regression self-attribute in bench telemetry: the r14 band-probe
  * defect (2512 of 4096 files planned instead of 248) moved no task-cpu
  * anomaly a human would flag, but a files_planned counter jumping 10×
  * at constant result rows is unmissable. Driver-side only (planning
  * never runs on executors except the distributed path, which carries
  * its counters back through accumulators before recording). */
object ScanMetricsSink {
  private val scans = new java.util.concurrent.atomic.AtomicLong
  private val manifestsTotal = new java.util.concurrent.atomic.AtomicLong
  private val manifestsSkipped = new java.util.concurrent.atomic.AtomicLong
  private val entries = new java.util.concurrent.atomic.AtomicLong
  private val byPartition = new java.util.concurrent.atomic.AtomicLong
  private val byMetrics = new java.util.concurrent.atomic.AtomicLong
  private val files = new java.util.concurrent.atomic.AtomicLong

  private[table] def record(m: ScanMetrics): Unit = {
    scans.incrementAndGet()
    manifestsTotal.addAndGet(m.totalDataManifests.toLong)
    manifestsSkipped.addAndGet(m.skippedManifests.toLong)
    entries.addAndGet(m.entriesConsidered)
    byPartition.addAndGet(m.skippedByPartition)
    byMetrics.addAndGet(m.skippedByMetrics)
    files.addAndGet(m.resultFiles.toLong)
  }

  def reset(): Unit = {
    scans.set(0); manifestsTotal.set(0); manifestsSkipped.set(0)
    entries.set(0); byPartition.set(0); byMetrics.set(0); files.set(0)
  }

  /** (scans, manifests total, manifests skipped, entries considered,
    * skipped by partition, skipped by metrics, files planned). */
  def snapshot(): (Long, Long, Long, Long, Long, Long, Long) =
    (scans.get(), manifestsTotal.get(), manifestsSkipped.get(),
      entries.get(), byPartition.get(), byMetrics.get(), files.get())
}

/** Snapshot-scoped scan with pruning pipeline (scan/mod.rs:381-498):
  * manifest list → [ManifestEvaluator on partition summaries] → entries →
  * [ExpressionEvaluator on exact partition values] →
  * [InclusiveMetricsEvaluator on column stats] → FileScanTasks →
  * `spark.read.parquet` + residual Catalyst filter.
  *
  * Planning walks metadata driver-side (manifests are KB-scale Avro);
  * the data itself never touches the driver — at 100 TB the executors do
  * all data IO, and file-level parallelism comes from the planned file
  * list feeding Spark's split generation.
  */
final class TableScan private[table] (
    table: GraftTable,
    filter: Predicate = AlwaysTrue,
    selected: Seq[String] = Nil,
    snapshotId: Option[Long] = None,
    limitRows: Option[Long] = None,
    metaCols: Boolean = false,
    deletedCol: Boolean = false) {

  private val DeletedCol = "_deleted"

  def withFilter(p: Predicate): TableScan =
    new TableScan(table, Predicate.bind(p, table.schema), selected, snapshotId, limitRows, metaCols, deletedCol)

  def select(cols: String*): TableScan =
    new TableScan(table, filter, cols.toSeq, snapshotId, limitRows, metaCols, deletedCol)

  def useSnapshot(id: Long): TableScan =
    new TableScan(table, filter, selected, Some(id), limitRows, metaCols, deletedCol)

  /** Scan a named branch/tag (ref-scoped read, scan/mod.rs ref support). */
  def useRef(name: String): TableScan = {
    val ref = table.metadata.refs.getOrElse(name,
      throw new IllegalArgumentException(s"no such ref: $name"))
    useSnapshot(ref.snapshotId)
  }

  /** Incremental append scan: only rows ADDED by snapshots in
    * (fromSnapshotId, toSnapshotId] (the reference's incremental scan /
    * CDC-append surface). Planning walks the ancestor chain and keeps
    * manifest entries whose committing snapshot falls in the range —
    * delete/replace snapshots in range are rejected (an append-only
    * changelog can't represent them). */
  def appendsBetween(fromSnapshotId: Long, toSnapshotId: Long): IncrementalScan =
    appendsBetween(fromSnapshotId, toSnapshotId, skipNonAppend = false)

  /** As above; `skipNonAppend = true` silently excludes delete/replace
    * snapshots in range instead of failing (the streaming-read
    * `streaming-skip-delete-snapshots` contract: their row-level changes
    * are not representable in an append-only changelog). */
  def appendsBetween(fromSnapshotId: Long, toSnapshotId: Long,
      skipNonAppend: Boolean): IncrementalScan = {
    val byId = table.metadata.snapshots.map(s => s.snapshotId -> s).toMap
    val to = byId.getOrElse(toSnapshotId,
      throw new IllegalArgumentException(s"snapshot $toSnapshotId not found"))
    // full ancestor chain to → root; the start snapshot must actually sit
    // on it — after a rollback or branch switch it does not, and silently
    // walking to the root would serve the FULL table as an "increment"
    val chain = Iterator.iterate(Option(to))(
        _.flatMap(_.parentSnapshotId).flatMap(byId.get))
      .takeWhile(_.isDefined).flatten.toSeq
    // -1 is the explicit "from the beginning" sentinel (streaming initial
    // offset); any real id must actually sit on the ancestor chain
    val fromIdx =
      if (fromSnapshotId == -1L) chain.length
      else chain.indexWhere(_.snapshotId == fromSnapshotId)
    if (fromIdx < 0)
      throw new IllegalArgumentException(
        s"snapshot $fromSnapshotId is not an ancestor of $toSnapshotId — " +
          "incremental scan window undefined (rollback or branch switch?)")
    val rangeIds = chain.take(fromIdx).flatMap { s =>
      if (s.operation == "append") Some(s.snapshotId)
      else if (skipNonAppend) None
      else throw new IllegalArgumentException(
        s"snapshot ${s.snapshotId} is '${s.operation}', not append — " +
          "incremental append scan undefined")
    }.toSet
    new IncrementalScan(table, toSnapshotId, rangeIds)
  }

  /** Limit pushdown (scan/mod.rs TableScanBuilder::with_limit): caps the
    * result AND, for unfiltered scans with no deletes, short-circuits
    * file planning once manifest record counts cover the limit. */
  def limit(n: Long): TableScan =
    new TableScan(table, filter, selected, snapshotId, Some(n), metaCols, deletedCol)

  /** Surface the reserved metadata columns (metadata_columns.rs:33-90):
    * `_file` (source file path), `_pos` (row position in file), `_spec_id`
    * (partition spec of the file), `_partition` (typed partition tuple of
    * the default spec; null for files of other specs). */
  def withMetadataColumns(): TableScan =
    new TableScan(table, filter, selected, snapshotId, limitRows, metaCols = true,
      deletedCol)

  /** The scan's rows with ONLY the v3 lineage pair appended
    * (materialized-wins resolution) — the frame a lineage-preserving
    * rewrite re-emits (Maintenance compaction, RowOps CoW). */
  def toLineageDF(spark: SparkSession): DataFrame =
    lineageSelect(withMetadataColumns().toDF(spark))

  private[table] def readTasksLineage(spark: SparkSession,
      tasks: Seq[FileScanTask]): DataFrame =
    lineageSelect(withMetadataColumns().readTasks(spark, tasks))

  private def lineageSelect(df: DataFrame): DataFrame =
    df.select(table.schema.fields.map(f => col(f.name)) ++ Seq(
      col(graft.spec.RowLineage.RowIdName),
      col(graft.spec.RowLineage.LastUpdatedName)): _*)

  /** Also serve `_deleted` (metadata_columns.rs:38,75 — reserved id
    * i32.MAX-3): the scan then SERVES MoR-deleted rows with a boolean
    * marker instead of filtering them — position deletes, deletion
    * vectors and equality deletes all mark. The V1-path twin of the
    * native reader's projected-`_deleted` behavior (explicit here
    * because this path cannot see the downstream projection). */
  def withDeletedColumn(): TableScan =
    new TableScan(table, filter, selected, snapshotId, limitRows, metaCols = true,
      deletedCol = true)

  private def snapshot: Option[Snapshot] =
    snapshotId.map(id => table.metadata.snapshotById(id).getOrElse(
      throw new IllegalArgumentException(s"snapshot $id not found")))
      .orElse(table.metadata.currentSnapshot)

  /** Per-spec partition-space filter (PartitionFilterCache, scan/cache.rs:31). */
  private lazy val partitionFilters: Map[Int, Predicate] =
    table.metadata.partitionSpecs.map { s =>
      s.specId -> InclusiveProjection.project(filter, table.schema, s)
    }.toMap

  private def cacheKey(path: String): String =
    s"$path#${table.schema.schemaId}"

  private def readListCached(snap: graft.spec.Snapshot): Seq[ManifestFile] =
    ManifestCache.manifestList(cacheKey(snap.manifestList)) {
      ManifestIO.readManifestList(table.io, snap.manifestList, table.partTypes,
        graft.crypto.MetadataEncryption.listKeyFor(table.metadata, snap))
    }

  private def readManifestCached(m: ManifestFile, spec: PartitionSpec): Seq[ManifestEntry] =
    ManifestCache.manifest(cacheKey(m.manifestPath)) {
      ManifestIO.readManifest(table.io, m.manifestPath, table.schema, spec,
        m.keyMetadata)
    }

  def planFiles(): Seq[FileScanTask] = planWithMetrics()._1

  /** planFiles + per-stage pruning counters (the reference's ScanMetrics,
    * arrow/scan_metrics.rs:54-72). */
  def planWithMetrics(): (Seq[FileScanTask], ScanMetrics) = {
    val snap = snapshot.getOrElse(return (Nil, ScanMetrics(0, 0, 0L, 0L, 0L, 0)))
    val manifests = readListCached(snap)

    val dataManifests = manifests.filter(_.content == ManifestContent.Data)
    val survivors = dataManifests.filter { m =>
      val spec = table.metadata.specById(m.partitionSpecId).getOrElse(table.spec)
      ManifestEvaluator.manifestMightMatch(
        partitionFilters(m.partitionSpecId), m.partitions, spec, table.schema)
    }
    val byPartition = new java.util.concurrent.atomic.AtomicLong()
    val byMetrics = new java.util.concurrent.atomic.AtomicLong()
    val entriesSeen = new java.util.concurrent.atomic.AtomicLong()

    // manifests are independent KB-scale Avro files: read them in
    // parallel (the reference pipelines this across io/cpu pools,
    // scan/mod.rs:381-498; a 100 TB snapshot has thousands of manifests
    // and a sequential driver loop would dominate planning latency)
    val tasks = parallelFlatMap(survivors) { m =>
      val spec = table.metadata.specById(m.partitionSpecId).getOrElse(table.spec)
      val partFilter = partitionFilters(m.partitionSpecId)
      readManifestCached(m, spec)
        .filter(_.isAlive)
        .filter { e =>
          entriesSeen.incrementAndGet()
          val ok = ExpressionEvaluator.partitionMatches(
            partFilter, e.dataFile.partition, spec, table.schema)
          if (!ok) byPartition.incrementAndGet()
          ok
        }
        .filter { e =>
          val ok = InclusiveMetricsEvaluator.fileMightMatch(filter, e.dataFile, table.schema)
          if (!ok) byMetrics.incrementAndGet()
          ok
        }
        .map(e => FileScanTask(e.dataFile, m.partitionSpecId,
          e.sequenceNumber.getOrElse(m.sequenceNumber)))
    }
    val metrics = ScanMetrics(
      totalDataManifests = dataManifests.size,
      skippedManifests = dataManifests.size - survivors.size,
      entriesConsidered = entriesSeen.get(),
      skippedByPartition = byPartition.get(),
      skippedByMetrics = byMetrics.get(),
      resultFiles = tasks.size)
    ScanMetricsSink.record(metrics)
    (tasks, metrics)
  }

  private def parallelFlatMap[A, B](items: Seq[A])(f: A => Seq[B]): Seq[B] =
    if (items.size <= 1) items.flatMap(f)
    else {
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      Await.result(Future.sequence(items.map(i => Future(f(i)))), Duration.Inf)
        .flatten
    }

  /** Upper bound on live data-file entries in this snapshot, from the
    * manifest-list counters alone (one cached KB-scale read) — the
    * auto-mode trigger for distributed planning. */
  def estimatedDataEntries: Long =
    snapshot.map { snap =>
      readListCached(snap)
        .filter(_.content == ManifestContent.Data)
        .map(m => m.addedFilesCount.toLong + m.existingFilesCount.toLong).sum
    }.getOrElse(0L)

  /** DISTRIBUTED planning: the same manifest → entry pruning pipeline as
    * `planWithMetrics`, run as a Spark job over the manifest files — the
    * reference streams tasks through bounded channels so planning memory
    * never scales with snapshot size (scan/mod.rs:381-498); here the
    * manifest fan-out IS the parallelism and the driver only collects
    * pre-reduced [[CompactFileTask]] descriptors (~100 bytes/file instead
    * of the multi-KB stats maps). At 200k files that is the difference
    * between ~20 MB and GBs of driver heap.
    *
    * The executors apply the IDENTICAL evaluator code
    * (ExpressionEvaluator / InclusiveMetricsEvaluator) per entry, so
    * pruning decisions are equal to the local planner by construction —
    * asserted by PlanningSpec. The manifest LIST is still read on the
    * driver (one small Avro file) because ManifestEvaluator pruning needs
    * it anyway to build the job's input.
    *
    * `projectedFieldIds` bounds the null-count stats carried back;
    * `defaulted` is (field id, name) of v3 initial-default columns so the
    * per-file missing-default set is decided where the stats still exist. */
  def planCompactDistributed(spark: org.apache.spark.sql.SparkSession,
      projectedFieldIds: Set[Int],
      defaulted: Seq[(Int, String)],
      targetSplitSize: Long = 128L << 20): (Seq[CompactFileTask], ScanMetrics) = {
    val snap = snapshot.getOrElse(return (Nil, ScanMetrics(0, 0, 0L, 0L, 0L, 0)))
    val manifests = readListCached(snap)
    val dataManifests = manifests.filter(_.content == ManifestContent.Data)
    val survivors = dataManifests.filter { m =>
      val spec = table.metadata.specById(m.partitionSpecId).getOrElse(table.spec)
      ManifestEvaluator.manifestMightMatch(
        partitionFilters(m.partitionSpecId), m.partitions, spec, table.schema)
    }
    val emptyMetrics = ScanMetrics(dataManifests.size,
      dataManifests.size - survivors.size, 0L, 0L, 0L, 0)
    if (survivors.isEmpty) return (Nil, emptyMetrics)

    // capture ONLY serializable locals (GraftTable holds a live hadoop
    // Configuration via FileIO; executors rebuild their own from the
    // broadcast conf — the AppendWriter footer-harvest pattern)
    val schema = table.schema
    val filter0 = filter
    val partFilters = partitionFilters
    val specById = table.metadata.partitionSpecs.map(s => s.specId -> s).toMap
    val defaultSpec = table.spec
    val conf = new org.apache.spark.util.SerializableConfiguration(table.io.conf)
    val entriesSeen = spark.sparkContext.longAccumulator("graft.plan.entries")
    val byPartition = spark.sparkContext.longAccumulator("graft.plan.skippedByPartition")
    val byMetrics = spark.sparkContext.longAccumulator("graft.plan.skippedByMetrics")

    val descs = survivors.map(m =>
      (m.manifestPath, m.partitionSpecId, m.sequenceNumber,
        m.keyMetadata.orNull))
    val parallelism = math.max(1,
      math.min(descs.size, spark.sparkContext.defaultParallelism * 2))
    val tasks = spark.sparkContext.parallelize(descs, parallelism)
      .flatMap { case (mpath, specId, mseq, keyMeta) =>
        val io = new graft.io.FileIO(conf.value)
        val spec = specById.getOrElse(specId, defaultSpec)
        val pf = partFilters.getOrElse(specId, filter0)
        ManifestIO.readManifest(io, mpath, schema, spec, Option(keyMeta))
          .filter(_.isAlive)
          .filter { e =>
            entriesSeen.add(1L)
            val ok = ExpressionEvaluator.partitionMatches(
              pf, e.dataFile.partition, spec, schema)
            if (!ok) byPartition.add(1L)
            ok
          }
          .filter { e =>
            val ok = InclusiveMetricsEvaluator.fileMightMatch(filter0, e.dataFile, schema)
            if (!ok) byMetrics.add(1L)
            ok
          }
          .map { e =>
            val f = e.dataFile
            val missing =
              if (defaulted.isEmpty ||
                  (f.columnSizes.isEmpty && f.valueCounts.isEmpty)) Nil
              else defaulted.collect { case (id, n)
                if !f.columnSizes.contains(id) && !f.valueCounts.contains(id) => n }
            CompactFileTask(f.filePath, f.fileSizeInBytes, f.recordCount,
              specId, e.sequenceNumber.getOrElse(mseq), f.partition,
              f.sortOrderId, missing,
              GraftTable.splitRanges(f.fileSizeInBytes, f.splitOffsets, targetSplitSize),
              f.nullValueCounts.filter(kv => projectedFieldIds(kv._1)),
              f.firstRowId)
          }
      }.collect().toSeq
    val metrics = emptyMetrics.copy(
      entriesConsidered = entriesSeen.value,
      skippedByPartition = byPartition.value,
      skippedByMetrics = byMetrics.value,
      resultFiles = tasks.size)
    ScanMetricsSink.record(metrics)
    (tasks, metrics)
  }

  /** Alive delete files in scope for this snapshot. At 100 TB the delete
    * manifests are read once per scan; actual delete application happens
    * distributed (anti-joins in toDF), never on the driver. */
  def planDeletes(): Seq[DeleteTask] = {
    val snap = snapshot.getOrElse(return Nil)
    val deleteManifests = readListCached(snap)
      .filter(_.content == ManifestContent.Deletes)
    parallelFlatMap(deleteManifests) { m =>
      val spec = table.metadata.specById(m.partitionSpecId).getOrElse(table.spec)
      readManifestCached(m, spec)
        .filter(_.isAlive)
        .map(e => DeleteTask(e.dataFile, e.sequenceNumber.getOrElse(m.sequenceNumber),
          m.partitionSpecId))
    }
  }

  /** Planned file count with vs without pruning — for tests/metrics. */
  def planSummary(): (Int, Int) = {
    val all = snapshot.map { snap =>
      readListCached(snap)
        .filter(_.content == ManifestContent.Data)
        .map(m => m.addedFilesCount + m.existingFilesCount).sum
    }.getOrElse(0)
    (planFiles().size, all)
  }

  /** Byte-range split planning over the pruned file set: each file is
    * sliced at row-group boundaries into ~targetSplitSize chunks. Spark's
    * own scan does equivalent splitting via files.maxPartitionBytes when
    * toDF delegates to the parquet source; this surface exists for
    * schedulers that consume FileScanTasks directly (scan/task.rs
    * semantics) and to verify split math against footer offsets. */
  def planSplits(targetSplitSize: Long = 128L << 20): Seq[FileSplit] =
    planFiles().flatMap { t =>
      val size = t.file.fileSizeInBytes
      val offsets = t.file.splitOffsets
      if (offsets.size <= 1 || size <= targetSplitSize)
        Seq(FileSplit(t, 0L, size))
      else {
        // greedy: accumulate row groups until the target is exceeded
        val bounds = offsets :+ size
        val splits = Seq.newBuilder[FileSplit]
        var start = bounds.head
        var i = 1
        while (i < bounds.size) {
          if (bounds(i) - start >= targetSplitSize || i == bounds.size - 1) {
            splits += FileSplit(t, start, bounds(i) - start)
            start = bounds(i)
          }
          i += 1
        }
        splits.result()
      }
    }

  /** planFiles truncated to the first files covering `limitRows` —
    * sound only when every planned row qualifies (no filter; deletes
    * still applied downstream but would under-fill, so skip then). */
  private def planWithLimit(): Seq[FileScanTask] = {
    val tasks = planFiles()
    limitRows match {
      case Some(n) if filter == AlwaysTrue && planDeletes().isEmpty =>
        var acc = 0L
        tasks.takeWhile { t =>
          val need = acc < n
          acc += t.file.recordCount
          need
        }
      case _ => tasks
    }
  }

  /** Read a specific task subset with MoR deletes applied but no residual
    * filter/projection — the CoW rewrite path (RowOps) uses this to
    * re-emit surviving rows of only the touched files. */
  private[table] def readTasks(spark: SparkSession,
      tasks: Seq[FileScanTask]): DataFrame = dfForTasks(spark, tasks)

  def toDF(spark: SparkSession): DataFrame = {
    val tasks = planWithLimit()
    val withMeta = dfForTasks(spark, tasks)
    val filtered = filter match {
      case AlwaysTrue => withMeta
      case p => withMeta.filter(Predicate.toColumn(p, table.schema))
    }
    val projected =
      if (selected.isEmpty) filtered else filtered.select(selected.map(col): _*)
    limitRows.map(n => projected.limit(n.toInt)).getOrElse(projected)
  }

  /** Timestamp backing `_metadata.file_modification_time` for the
    * explicit-file relation (ADVICE r15): the scan's snapshot commit
    * time — a served file is at most as new as the snapshot that added
    * it. The fabricated epoch-0 this replaces was a silent wrong answer
    * for any user projecting that column. */
  private def scanMtimeMs: Long =
    table.metadata.currentSnapshot.map(_.timestampMs)
      .getOrElse(table.metadata.lastUpdatedMs)

  private def dfForTasks(spark: SparkSession, tasks: Seq[FileScanTask]): DataFrame = {
    val sparkSchema = table.schema.toSpark
    // id-based projection (pipeline.rs:160-168) via a conf-carrying session
    // clone — the caller's session conf is never mutated, so concurrent
    // queries can't observe scan settings (graft.SessionConf). Encrypted
    // tables add their PME decryption entries as per-relation options.
    val reader = graft.SessionConf.scanSession(spark)
    val encConf = graft.crypto.Encryption.confFor(table.metadata.properties)
    val base =
      if (tasks.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)
      else {
        // name-mapping read path (spec/name_mapping): when legacy files
        // carry no embedded field ids, read with each field's mapped
        // physical name — id-ful files still resolve by the field-id
        // metadata, id-less files name-match the alias — then rename to
        // canonical names
        val useMapping =
          table.metadata.properties.get("graft.read.use-name-mapping").contains("true")
        val mapping = if (useMapping) NameMapping.fromTable(table.metadata) else None
        mapping match {
          case Some(nm) =>
            // mapped read schema: every field (nested included) renamed to
            // its physical alias with field-id metadata stripped — with ids
            // present Spark NULL-FILLS id-less files (ignoreMissing)
            // instead of name-matching, so mapped resolution must be
            // name-based for every file (true for both foreign files and
            // our own, which write the then-current names)
            val physical = nm.physicalSchema(table.schema)
            // explicit-file relation, same as the unmapped branch below
            // (ADVICE r15): the listing-based read paid the one-task-per-
            // path InMemoryFileIndex job this bridge eliminates. The
            // physical schema carries NO field-id metadata, so resolution
            // stays name-based for every file — the mapped contract.
            val rawPhys = org.apache.spark.sql.GraftFileRelationBridge
              .parquetOverFiles(reader,
                tasks.map(t => (qualifyPath(t.file.filePath),
                  t.file.fileSizeInBytes)).distinctBy(_._1),
                physical,
                encConf ++ graft.SessionConf.HadoopIoConf,
                mtimeMs = scanMtimeMs)
            // deletes join on _metadata → must run before the rename
            // projection drops it (position/DV deletes only for mapped
            // tables; equality deletes would need alias-aware keys).
            // The cast renames nested struct fields back positionally.
            applyDeletes(spark, rawPhys, tasks, mark = deletedCol)
              .select(table.schema.fields.zip(sparkSchema.fields)
                .zip(physical.fields).map { case ((f, sf), pf) =>
                  col(pf.name).cast(sf.dataType).as(f.name)
                } ++ (if (deletedCol)
                  Seq(col(DeletedCol), col("_file"), col("_pos"))
                else Nil): _*)
          case None =>
            // v3 initial-defaults: files written BEFORE a defaulted field
            // existed serve the default, not null. Column presence is
            // decided per file from the harvested stats maps (a file
            // written without the field has no entry for its id —
            // metadata-only, no footer reads); stat-less imported files
            // conservatively count as having every column (null-fill).
            // Tasks group by their missing-default set — one parquet
            // read per group (almost always 1–2 groups), unioned.
            val defaulted = table.schema.fields.filter(_.initialDefault.isDefined)
            def missingFor(t: FileScanTask): Seq[NestedField] =
              if (t.file.columnSizes.isEmpty && t.file.valueCounts.isEmpty) Nil
              else defaulted.filter(f =>
                !t.file.columnSizes.contains(f.id) && !t.file.valueCounts.contains(f.id))
            val groups =
              if (defaulted.isEmpty) Seq(tasks -> Seq.empty[NestedField])
              else tasks.groupBy(missingFor).toSeq.map(_.swap)
            // lineage-requesting reads also ask for the MATERIALIZED
            // reserved columns (RowLineage): files written by compaction
            // carry per-row lineage; field-id projection null-fills files
            // without them, and addMetadataColumns coalesces with
            // first_row_id + pos inheritance
            val readSchema =
              if (metaCols)
                org.apache.spark.sql.types.StructType(
                  sparkSchema.fields ++ graft.spec.RowLineage.sparkFields)
              else sparkSchema
            groups.map { case (ts, missing) =>
              // explicit-file relation: paths AND sizes come from the
              // manifests, so the read skips InMemoryFileIndex's
              // listing pass entirely (one stat per file — a
              // task-per-path Spark job at high file counts; r15-opt)
              // distinct by path: planFiles may emit several byte-range
              // tasks for one physical file, and the listing-based read
              // deduped them implicitly (InMemoryFileIndex keys by path)
              // paths FS-QUALIFIED (file:///…): `_metadata.file_path`
              // renders the status path verbatim and the MoR delete join
              // compares it against delete rows that stored the
              // qualified form — a bare manifest string would miss
              val raw = org.apache.spark.sql.GraftFileRelationBridge
                .parquetOverFiles(reader,
                  ts.map(t => (qualifyPath(t.file.filePath),
                    t.file.fileSizeInBytes)).distinctBy(_._1),
                  readSchema,
                  encConf ++ graft.SessionConf.HadoopIoConf,
                  mtimeMs = scanMtimeMs)
              val filled = missing.foldLeft(raw) { (df, f) =>
                df.withColumn(f.name, defaultLiteral(f))
              }
              applyDeletes(spark, filled, ts, mark = deletedCol)
            }.reduce(_ unionByName _)
        }
      }
    val withDeleted =
      if (deletedCol && (tasks.isEmpty || !base.columns.contains(DeletedCol)))
        base.withColumn(DeletedCol, lit(false))
      else base
    if (!metaCols || tasks.isEmpty) withDeleted
    else addMetadataColumns(spark, withDeleted, tasks)
  }

  /** Spark literal for a field's initial-default. */
  private def defaultLiteral(f: NestedField): Column =
    SingleValue.toSparkLiteral(f.fieldType, f.initialDefault.get)

  /** Reserved metadata columns (metadata_columns.rs:33-90): `_file` and
    * `_pos` come from Spark's parquet `_metadata` struct (exactly what the
    * reference synthesizes as a virtual RowNumber column,
    * pipeline.rs:221-245); `_spec_id`, the typed `_partition` tuple, and
    * the v3 row-lineage pair `_row_id` / `_last_updated_sequence_number`
    * (first_row_id + position inheritance, metadata_columns.rs _row_id)
    * join in from the planned task descriptors (broadcast — O(files)
    * driver rows, never data). */
  private def addMetadataColumns(spark: SparkSession, df: DataFrame,
      tasks: Seq[FileScanTask]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.broadcast
    // UNIFIED across evolved specs (partitioning.rs): every file serves
    // the fields its own spec defines, null elsewhere — a pre-evolution
    // file no longer collapses to an all-null tuple
    val partType = PartitionSpec.unifiedPartitionType(
      table.metadata.partitionSpecs, table.schema)
    val partSchema = org.apache.spark.sql.types.StructType(
      partType.fields.map(f => org.apache.spark.sql.types.StructField(
        f.name, IcebergType.toSpark(f.fieldType), nullable = true)))
    val taskSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_gf_meta_file",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_spec_id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("_partition", partSchema, nullable = true),
      org.apache.spark.sql.types.StructField("_gf_first_row_id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("_gf_task_seq",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    tasks.foreach { t =>
      // project this file's spec-shaped tuple into the unified struct:
      // field-id-addressed, so evolution reorders/drops never misalign
      val spec = table.metadata.specById(t.specId).getOrElse(table.spec)
      val idxById = spec.fields.zipWithIndex.map { case (f, i) => f.fieldId -> i }.toMap
      val part = Row(partType.fields.map { uf =>
        idxById.get(uf.id) match {
          case Some(i) if i < t.file.partition.length =>
            Predicate.sparkValue(uf.fieldType, t.file.partition(i))
          case _ => null
        }
      }: _*)
      rows.add(Row(qualifyPath(t.file.filePath), t.specId, part,
        t.file.firstRowId.map(java.lang.Long.valueOf).orNull, t.sequenceNumber))
    }
    val taskDf = spark.createDataFrame(rows, taskSchema)
    // `_file`/`_pos` may already be materialized (the marked-delete path
    // carries them out of applyDeletes; re-deriving from `_metadata`
    // there would be ambiguous)
    val withFp =
      if (df.columns.contains("_file")) df
      else df.withColumn("_file", col("_metadata.file_path"))
        .withColumn("_pos", col("_metadata.row_index"))
    // materialized lineage (written by compaction) wins; files without the
    // columns (or name-mapped reads, which skip them) fall back to
    // first_row_id + pos inheritance / the file's sequence number
    val lineageRead = withFp.columns.contains(graft.spec.RowLineage.RowIdName)
    val withLineage = withFp
      .join(broadcast(taskDf), col("_file") === col("_gf_meta_file"), "left")
    val rowIdExpr =
      if (lineageRead)
        coalesce(col(graft.spec.RowLineage.RowIdName),
          col("_gf_first_row_id") + col("_pos"))
      else col("_gf_first_row_id") + col("_pos")
    val lastSeqExpr =
      if (lineageRead)
        coalesce(col(graft.spec.RowLineage.LastUpdatedName), col("_gf_task_seq"))
      else col("_gf_task_seq")
    withLineage
      .withColumn(graft.spec.RowLineage.RowIdName, rowIdExpr)
      .withColumn(graft.spec.RowLineage.LastUpdatedName, lastSeqExpr)
      .drop("_gf_meta_file", "_gf_first_row_id", "_gf_task_seq")
  }

  private def qualifyPath(p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    table.io.fs(p).makeQualified(hp).toString
  }

  /** MoR delete application (§2.3 join semantics):
    *   - position deletes: left-anti join on
    *     (_metadata.file_path, _metadata.row_index) ↔ (file_path, pos)
    *     [positional_deletes.rs:35]
    *   - equality deletes: left-anti join on the equality-id columns scoped
    *     to data_seq < delete_seq; plain `===` keeps any row whose key
    *     contains null [delete_filter.rs:190, caching_delete_file_loader.rs
    *     :421-424]
    * Both are executor-side joins — Spark broadcasts small delete sets
    * automatically, so at 100 TB this stays shuffle-free until delete sets
    * grow past the broadcast threshold (then it's a hash join, still never
    * driver-side).
    */
  private def applyDeletes(spark: SparkSession, raw: DataFrame,
      tasks: Seq[FileScanTask], mark: Boolean = false): DataFrame = {
    val deletes = planDeletes()
    if (deletes.isEmpty)
      return if (mark)
        raw.withColumn("_file", col("_metadata.file_path"))
          .withColumn("_pos", col("_metadata.row_index"))
          .withColumn(DeletedCol, lit(false))
      else raw

    val FILE = "_gf_file"; val POS = "_gf_pos"; val SEQ = "_gf_seq"
    val encConf = graft.crypto.Encryption.confFor(table.metadata.properties)
    var work = raw
      .withColumn(FILE, col("_metadata.file_path"))
      .withColumn(POS, col("_metadata.row_index"))
    // mark-instead-of-skip (`_deleted`, metadata_columns.rs:38,75): each
    // anti-join below becomes a LEFT join onto a distinct flagged side;
    // the marker is the OR of the per-source flags
    val flags = scala.collection.mutable.ArrayBuffer[String]()

    // only read the delete files that can touch a scanned data file
    // (referenced-data-file + file_path bounds — DeleteFileIndex role)
    val posAll = deletes.filter(d =>
      d.file.content == FileContent.PositionDeletes && d.file.fileFormat != "PUFFIN")
    val posParquet =
      if (posAll.isEmpty) Nil
      else {
        val idx = new PosDeleteIndex(posAll, qualifyPath)
        val keep = scala.collection.mutable.LinkedHashSet.empty[String]
        tasks.foreach(t => idx.candidatesFor(qualifyPath(t.file.filePath))
          .foreach(d => keep += d.file.filePath))
        posAll.filter(d => keep.contains(d.file.filePath))
      }
    if (posParquet.nonEmpty) {
      val pd = spark.read.options(encConf).parquet(posParquet.map(_.file.filePath): _*)
      if (mark) {
        val flagged = pd.select(col("file_path"), col("pos")).distinct()
          .withColumn("_gf_del_pp", lit(true))
        work = work.join(flagged,
          work(FILE) === flagged("file_path") && work(POS) === flagged("pos"),
          "left").drop(flagged("file_path")).drop(flagged("pos"))
        flags += "_gf_del_pp"
      } else work = work.join(pd,
        work(FILE) === pd("file_path") && work(POS) === pd("pos"), "left_anti")
    }

    // v3 deletion vectors: each entry is a roaring-bitmap blob range in a
    // Puffin file, scoped to one data file. Blobs are decoded ON THE
    // EXECUTORS (a parallelized job over blob descriptors — the driver
    // never materializes positions) and applied with the same anti-join.
    val dvs = deletes.filter(d =>
      d.file.content == FileContent.PositionDeletes && d.file.fileFormat == "PUFFIN")
    if (dvs.nonEmpty) {
      import spark.implicits._
      val descriptors = dvs.flatMap(d => d.file.referencedDataFile.map(ref =>
        (d.file.filePath, d.file.contentOffset.getOrElse(0L),
          d.file.contentSizeInBytes.getOrElse(0L), qualifyPath(ref))))
      val dvRows = spark.sparkContext
        .parallelize(descriptors, math.max(1, math.min(descriptors.size, 64)))
        .flatMap { case (puffin, offset, len, ref) =>
          // executor-local FileIO (Hadoop Configuration isn't serializable;
          // same pattern as the footer harvest in AppendWriter)
          val io = graft.io.FileIO.local()
          val meta = graft.puffin.Puffin.BlobMetadata(
            graft.puffin.Puffin.DeletionVectorV1, Nil, 0L, 0L, offset, len, Map.empty)
          graft.puffin.Puffin.dvDeserialize(
            graft.puffin.Puffin.readBlob(io, puffin, meta))
            .iterator.map(pos => (ref, pos))
        }
        .toDF("file_path", "pos")
      if (mark) {
        val flagged = dvRows.distinct().withColumn("_gf_del_dv", lit(true))
        work = work.join(flagged,
          work(FILE) === flagged("file_path") && work(POS) === flagged("pos"),
          "left").drop(flagged("file_path")).drop(flagged("pos"))
        flags += "_gf_del_dv"
      } else work = work.join(dvRows,
        work(FILE) === dvRows("file_path") && work(POS) === dvRows("pos"), "left_anti")
    }

    val eqDeletes = deletes.filter(_.file.content == FileContent.EqualityDeletes)
    if (eqDeletes.nonEmpty) {
      import spark.implicits._
      // per-row data sequence number from the owning file (broadcast map
      // join); qualify paths to match _metadata.file_path's rendering
      // (manifest paths may lack the filesystem scheme)
      def qualify(p: String): String = {
        val hp = new org.apache.hadoop.fs.Path(p)
        table.io.fs(p).makeQualified(hp).toString
      }
      val seqDf = tasks.map(t => (qualify(t.file.filePath), t.sequenceNumber))
        .toDF("_gf_seq_file", SEQ)
      work = work.join(org.apache.spark.sql.functions.broadcast(seqDf),
        work(FILE) === seqDf("_gf_seq_file"), "left").drop("_gf_seq_file")
      // one anti-join per (key set, sequence number, partition scope)
      // group — plan depth grows with delete commits until compaction
      // folds them away; warn before the plan gets pathological (hundreds
      // of stacked joins slow analysis and risk codegen limits).
      // Scope rule (delete_file_index.rs:137-141): global iff the delete's
      // spec is unpartitioned; otherwise only data files of the same spec
      // and partition tuple are affected (see the native reader's EqGroup).
      val eqGroups = eqDeletes.groupBy(d => (d.file.equalityIds, d.sequenceNumber,
        if (table.metadata.specById(d.specId).forall(_.fields.isEmpty)) None
        else Some((d.specId, d.file.partition))))
      if (eqGroups.size > 20)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"table ${table.name}: ${eqGroups.size} equality-delete groups stack " +
            s"${eqGroups.size} anti-joins onto every scan — run rewriteDataFiles " +
            "to fold them into the data")
      eqGroups.zipWithIndex.foreach {
        case (((ids, delSeq, scope), group), gi) =>
          val keyNames = ids.map(id => table.schema.idToField(id).name)
          val dels = spark.read.options(encConf).parquet(group.map(_.file.filePath): _*)
            .select(keyNames.map(col): _*).distinct()
          val scopeCond = scope match {
            case None => lit(true)
            case Some((sid, tup)) =>
              // partition-scoped: restrict the anti-join to rows from
              // same-spec-same-tuple files (scoped foreign deletes are
              // rare and the file list is the already-pruned task set)
              val inScope = tasks.filter(t =>
                t.specId == sid && t.file.partition == tup)
                .map(t => qualify(t.file.filePath))
              if (inScope.isEmpty) lit(false) else work(FILE).isin(inScope: _*)
          }
          if (mark) {
            val flagName = s"_gf_del_eq$gi"
            val flagged = dels.withColumn(flagName, lit(true))
            val keyCond = keyNames.map(n => work(n) === flagged(n)).reduce(_ && _)
            work = work.join(flagged,
              keyCond && work(SEQ) < lit(delSeq) && scopeCond, "left")
            keyNames.foreach(n => work = work.drop(flagged(n)))
            flags += flagName
          } else {
            val keyCond = keyNames.map(n => work(n) === dels(n)).reduce(_ && _)
            work = work.join(dels, keyCond && work(SEQ) < lit(delSeq) && scopeCond,
              "left_anti")
          }
      }
      work = work.drop(SEQ)
    }
    if (mark) {
      // keep the row coordinates under their reserved names: the joins
      // above put a second parquet relation (hence a second `_metadata`)
      // in scope, so addMetadataColumns could no longer derive them
      // unambiguously — it reuses these instead
      work.withColumn(DeletedCol,
          flags.map(f => coalesce(col(f), lit(false)))
            .reduceOption(_ || _).getOrElse(lit(false)))
        .drop(flags.toSeq: _*)
        .withColumnRenamed(FILE, "_file").withColumnRenamed(POS, "_pos")
    } else work.drop(FILE, POS)
  }
}
