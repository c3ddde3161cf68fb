package graft.table

import java.util.UUID

import graft.meta._
import graft.spec.{IcebergSchema, PartitionSpec, Snapshot, TableMetadata}

/** Shared snapshot-commit machinery used by append, row-delta (deletes) and
  * rewrite (compaction) actions — the role of the reference's Transaction +
  * snapshot producers (transaction/mod.rs:175-252: refresh base, re-apply,
  * optimistic CAS with backoff).
  */
object Commits {

  /** Read the base metadata's current manifest list ([] for empty tables). */
  def baseManifests(io: graft.io.FileIO, base: TableMetadata): Seq[ManifestFile] =
    base.currentSnapshot.map(s =>
      ManifestIO.readManifestList(io, s.manifestList, partTypes(base))).getOrElse(Nil)

  def partTypes(base: TableMetadata): Map[Int, graft.spec.IcebergType.StructT] =
    base.partitionSpecs.map(s => s.specId -> s.partitionType(base.currentSchema)).toMap

  /** Write one manifest for `entries` and return its list descriptor. */
  def writeManifest(
      io: graft.io.FileIO,
      base: TableMetadata,
      fileName: String,
      entries: Seq[ManifestEntry],
      schema: IcebergSchema,
      spec: PartitionSpec,
      content: Int,
      snapshotId: Long,
      seq: Long): ManifestFile = {
    val path = s"${base.location}/metadata/$fileName.avro"
    val (_, len) = ManifestIO.writeManifest(io, path, entries, schema, spec)
    val partType = spec.partitionType(schema)

    val alive = entries.filter(_.isAlive).map(_.dataFile)
    val summaries = partType.fields.zipWithIndex.map { case (pf, i) =>
      val vals = alive.map(_.partition(i))
      val nonNull = vals.filter(_ != null)
      FieldSummary(
        containsNull = vals.exists(_ == null),
        containsNan = Some(nonNull.exists(SingleValue.isNaN)),
        lowerBound = if (nonNull.isEmpty) None
          else Some(nonNull.reduce((a, b) => if (SingleValue.compare(pf.fieldType, a, b) <= 0) a else b)),
        upperBound = if (nonNull.isEmpty) None
          else Some(nonNull.reduce((a, b) => if (SingleValue.compare(pf.fieldType, a, b) >= 0) a else b)))
    }

    def count(st: Int) = entries.count(_.status == st)
    def rows(st: Int) = entries.filter(_.status == st).map(_.dataFile.recordCount).sum
    ManifestFile(
      manifestPath = path,
      manifestLength = len,
      partitionSpecId = spec.specId,
      content = content,
      sequenceNumber = seq,
      minSequenceNumber = entries.flatMap(_.sequenceNumber).minOption.getOrElse(seq),
      addedSnapshotId = snapshotId,
      addedFilesCount = count(ManifestStatus.Added),
      existingFilesCount = count(ManifestStatus.Existing),
      deletedFilesCount = count(ManifestStatus.Deleted),
      addedRowsCount = rows(ManifestStatus.Added),
      existingRowsCount = rows(ManifestStatus.Existing),
      deletedRowsCount = rows(ManifestStatus.Deleted),
      partitions = summaries)
  }

  /** Rewrite the base's data manifests dropping `dropPaths`: dropped files
    * become Deleted tombstones, survivors become Existing with resolved
    * sequence numbers; untouched manifests pass through. Delete manifests
    * are kept unless `dropDeleteManifests`. */
  def rewriteManifestsDropping(io: graft.io.FileIO, base: TableMetadata,
      dropPaths: Set[String], commitUuid: String, snapshotId: Long,
      seq: Long, dropDeleteManifests: Boolean = false): Seq[ManifestFile] =
    baseManifests(io, base).flatMap { m =>
      if (m.content != ManifestContent.Data)
        if (dropDeleteManifests) None else Some(m)
      else {
        val spec = base.partitionSpecs.find(_.specId == m.partitionSpecId)
          .getOrElse(base.defaultSpec)
        val entries = ManifestIO.readManifest(io, m.manifestPath,
          base.currentSchema, spec)
        if (!entries.exists(e => e.isAlive && dropPaths(e.dataFile.filePath))) Some(m)
        else {
          val newEntries = entries.filter(_.isAlive).map { e =>
            val resolvedSeq = e.sequenceNumber.orElse(Some(m.sequenceNumber))
            if (dropPaths(e.dataFile.filePath))
              e.copy(status = ManifestStatus.Deleted,
                snapshotId = Some(snapshotId), sequenceNumber = resolvedSeq)
            else
              e.copy(status = ManifestStatus.Existing, sequenceNumber = resolvedSeq)
          }
          Some(writeManifest(io, base,
            s"$commitUuid-rw${m.manifestPath.hashCode.abs}", newEntries,
            base.currentSchema, spec, ManifestContent.Data, snapshotId, seq))
        }
      }
    }

  /** One snapshot commit with optimistic retry. `manifests` is re-invoked
    * per attempt against the refreshed base and must return the FULL new
    * manifest list.
    *
    * With `branch` set, the commit targets that ref instead of the main
    * line (write-audit-publish staging): the new snapshot's parent and
    * manifest base are the BRANCH head, the ref moves to the new
    * snapshot, and `current-snapshot-id` / `snapshot-log` are untouched —
    * readers of the table see nothing until a fast-forward publish. */
  def commit(table: GraftTable, operation: String, commitUuid: String,
      extraSummary: Map[String, String] = Map.empty,
      branch: Option[String] = None)(
      manifests: (TableMetadata, Long, Long) => Seq[ManifestFile]): GraftTable = {
    val io = table.io
    val snapshotId = math.abs(UUID.randomUUID().getMostSignificantBits)

    graft.catalog.CommitRetry.run(table.catalog, table.name) { (base0, version) =>
      // manifest building and parentage resolve against the branch head;
      // ref/current bookkeeping below applies to the true base
      val base = branch match {
        case Some(b) =>
          val head = base0.refs.getOrElse(b, throw new IllegalArgumentException(
            s"unknown branch: $b")).snapshotId
          base0.copy(currentSnapshotId = Some(head))
        case None => base0
      }
      val seq = base.lastSequenceNumber + 1
      val all = manifests(base, seq, snapshotId)
      val listPath = s"${base.location}/metadata/snap-$snapshotId-$commitUuid.avro"
      ManifestIO.writeManifestList(io, listPath, all, partTypes(base))

      val now = System.currentTimeMillis()
      val dataMs = all.filter(_.content == ManifestContent.Data)
      val delMs = all.filter(_.content == ManifestContent.Deletes)
      val addedRecords = dataMs.filter(_.addedSnapshotId == snapshotId)
        .map(_.addedRowsCount).sum
      val summary = Map(
        "total-data-files" -> dataMs.map(m => m.addedFilesCount + m.existingFilesCount).sum.toString,
        "total-delete-files" -> delMs.map(m => m.addedFilesCount + m.existingFilesCount).sum.toString,
        "total-records" -> dataMs.map(m => m.addedRowsCount + m.existingRowsCount).sum.toString,
        "added-records" -> addedRecords.toString
      ) ++ extraSummary

      // v3 row lineage: append commits consume a contiguous row-id block
      // equal to the rows they added (AppendWriter assigned the per-file
      // first_row_id from this same base.nextRowId). Only manifests THIS
      // snapshot added count — carried base manifests keep historical
      // added-row totals. The snapshot records its (first-row-id,
      // added-rows) range (snapshot.rs:76-81) so an update-action catalog
      // can re-derive next-row-id from `add-snapshot` alone.
      val addedRows = if (operation == "append") addedRecords else 0L

      val snap = Snapshot(
        snapshotId = snapshotId,
        parentSnapshotId = base.currentSnapshotId,
        sequenceNumber = seq,
        timestampMs = now,
        manifestList = listPath,
        operation = operation,
        summary = summary,
        schemaId = Some(base.currentSchema.schemaId),
        firstRowId = Some(base.nextRowId),
        addedRows = Some(addedRows))
      val updated = branch match {
        case None => base0.copy(
          lastSequenceNumber = seq,
          lastUpdatedMs = now,
          currentSnapshotId = Some(snapshotId),
          snapshots = base0.snapshots :+ snap,
          snapshotLog = base0.snapshotLog :+ (snapshotId, now),
          // metadataLog entry appended centrally by CommitRetry.run
          nextRowId = base0.nextRowId + addedRows)
        case Some(b) => base0.copy(
          lastSequenceNumber = seq,
          lastUpdatedMs = now,
          // current snapshot and snapshot-log untouched: the spec's
          // snapshot-log records the MAIN line's history only
          snapshots = base0.snapshots :+ snap,
          refs = base0.refs + (b -> base0.refs(b).copy(snapshotId = snapshotId)),
          nextRowId = base0.nextRowId + addedRows)
      }

      (updated, (_: Int) => table.refresh())
    }
  }
}
