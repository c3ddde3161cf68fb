package graft.table

import java.util.UUID

import org.apache.spark.sql.SparkSession

import graft.catalog.CommitRetry
import graft.meta._
import graft.spec.TableMetadata

/** Table maintenance actions: rewrite-files compaction (the reference
  * integration surface's headline: DataFrame read/write + compaction) and
  * expire_snapshots (transaction/expire_snapshots.rs:54 semantics).
  */
object Maintenance {

  /** Compact the current snapshot into ~targetFileSizeBytes files.
    *
    * Reads the snapshot MoR-applied (position/equality deletes folded in),
    * rewrites through the shared staged-write path, and commits a `replace`
    * snapshot whose manifest list contains only the rewritten files — so
    * delete manifests drop out and the MoR join disappears from subsequent
    * scans. All data movement is executor-side; the driver only handles
    * file descriptors.
    *
    * Concurrency: like the reference's replace commit, this validates that
    * no other snapshot landed between planning and commit and aborts
    * otherwise (rewrite is re-runnable).
    */
  def rewriteDataFiles(table: GraftTable, spark: SparkSession,
      targetFileSizeBytes: Long = 512L << 20): GraftTable = {
    val scan = table.newScan()
    val tasks = scan.planFiles()
    if (tasks.isEmpty) return table
    val baseSnapshotId = table.metadata.currentSnapshotId

    val totalBytes = tasks.map(_.file.fileSizeInBytes).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileSizeBytes).toInt)
    val df0 = scan.toDF(spark)
    // unpartitioned: explicit file-count control; partitioned: the staged
    // write's per-partition fanout governs sizes (input splits are already
    // coalesced by files.maxPartitionBytes)
    val df = if (table.spec.isUnpartitioned) df0.repartition(nOut) else df0

    val commitUuid = UUID.randomUUID().toString
    val files = AppendWriter.writeDataFiles(table, df, commitUuid)

    Commits.commit(table, "replace", commitUuid, Map(
      "rewritten-data-files" -> tasks.size.toString,
      "added-data-files" -> files.size.toString)) { (base, seq, snapshotId) =>
      if (base.currentSnapshotId != baseSnapshotId)
        throw new IllegalStateException(
          "concurrent commit during rewrite; re-run compaction")
      val entries = files.map(f => ManifestEntry(ManifestStatus.Added, Some(snapshotId),
        Some(seq), Some(seq), f))
      Seq(Commits.writeManifest(table.io, base, s"$commitUuid-m0", entries,
        table.schema, table.spec, ManifestContent.Data, snapshotId, seq))
    }
  }

  /** Expire snapshots older than `olderThanMs`, retaining at least
    * `retainLast` ancestors of the current snapshot (current is never
    * expired). Metadata-only commit; expired manifest lists are deleted,
    * unreachable data-file GC is a separate concern (remove_orphan_files).
    */
  def expireSnapshots(table: GraftTable, olderThanMs: Long,
      retainLast: Int = 1): GraftTable = {
    CommitRetry.run(table.catalog, table.name) { (base, version) =>
      // branch/tag targets are always retained (refs pin history)
      val retained = retainedIds(base, retainLast) ++ base.refs.values.map(_.snapshotId)
      val (keep, expired) = base.snapshots.partition(s =>
        retained.contains(s.snapshotId) || s.timestampMs >= olderThanMs)
      if (expired.isEmpty) (base, (_: Int) => table.refresh())
      else {
        val expiredIds = expired.map(_.snapshotId).toSet
        val updated = base.copy(
          snapshots = keep,
          snapshotLog = base.snapshotLog.filterNot { case (id, _) => expiredIds.contains(id) },
          lastUpdatedMs = System.currentTimeMillis())
        (updated, (_: Int) => {
          expired.foreach(s => table.io.delete(s.manifestList))
          table.refresh()
        })
      }
    }
  }

  /** Delete data files not referenced by ANY snapshot and older than
    * `olderThanMs` (remove_orphan_files). The rename-free write design
    * makes this the one required GC: failed jobs leave invisible files
    * under `data/commit-*`; age-gating keeps in-flight commits safe.
    * Listing is driver-side per directory but file-count-bounded by the
    * table tree (object stores: use a prefix-listing inventory job). */
  def removeOrphanFiles(table: GraftTable, olderThanMs: Long): Seq[String] = {
    val io = table.io
    val referenced: Set[String] = table.metadata.snapshots.flatMap { s =>
      ManifestIO.readManifestList(io, s.manifestList, Commits.partTypes(table.metadata))
        .flatMap { m =>
          val spec = table.metadata.specById(m.partitionSpecId)
            .getOrElse(table.metadata.defaultSpec)
          ManifestIO.readManifest(io, m.manifestPath, table.metadata.currentSchema, spec)
            .map(_.dataFile.filePath)
        }
    }.map(normalize).toSet

    val dataDir = s"${table.location}/data"
    if (!io.exists(dataDir)) return Nil
    val candidates = io.listFilesRecursive(dataDir)
      .filter { case (p, _, mtime) =>
        mtime < olderThanMs && !referenced.contains(normalize(p)) &&
          !p.endsWith("_SUCCESS")
      }
    candidates.map { case (p, _, _) => io.delete(p); p }
  }

  private def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+", "/")

  /** Roll the table back to an earlier snapshot (set-current-snapshot /
    * rollback action): metadata-only, the abandoned snapshots stay until
    * expire. */
  def rollbackTo(table: GraftTable, snapshotId: Long): GraftTable =
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      require(base.snapshotById(snapshotId).isDefined, s"snapshot $snapshotId not found")
      val updated = base.copy(
        currentSnapshotId = Some(snapshotId),
        snapshotLog = base.snapshotLog :+ (snapshotId, System.currentTimeMillis()),
        lastUpdatedMs = System.currentTimeMillis())
      (updated, (_: Int) => table.refresh())
    }

  /** The last `retainLast` ancestors of the current snapshot (incl. it). */
  private def retainedIds(base: TableMetadata, retainLast: Int): Set[Long] = {
    val byId = base.snapshots.map(s => s.snapshotId -> s).toMap
    Iterator.iterate(base.currentSnapshot)(_.flatMap(_.parentSnapshotId).flatMap(byId.get))
      .takeWhile(_.isDefined).flatten.map(_.snapshotId)
      .take(math.max(1, retainLast)).toSet
  }
}
