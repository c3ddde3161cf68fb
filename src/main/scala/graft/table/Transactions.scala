package graft.table

import graft.catalog.CommitRetry
import graft.spec.{SortField, SortOrder}

/** Metadata-only transaction actions beyond append/delete/rewrite
  * (reference transaction/mod.rs:135-170 + action/mod.rs):
  * property updates, sort-order replacement, format-version upgrade.
  * Each is an optimistic-retry CAS against the catalog — no snapshot,
  * no data IO.
  */
object Transactions {

  /** Set/overwrite table properties (UpdatePropertiesAction). */
  /** Reserved property keys (table_properties.rs:309 RESERVED_PROPERTIES):
    * creation/update control knobs whose values are never persisted as
    * plain properties — setting them here is refused ('format-version'
    * routes through the upgrade action in the catalog plugin). */
  val ReservedProperties: Set[String] = Set(
    "format-version", "uuid", "snapshot-count", "current-snapshot-id",
    "current-snapshot-summary", "current-snapshot-timestamp-ms",
    "current-schema", "default-partition-spec", "default-sort-order")

  def updateProperties(table: GraftTable, set: Map[String, String],
      remove: Set[String] = Set.empty): GraftTable = {
    require(set.keySet.intersect(remove).isEmpty,
      "cannot set and remove the same property")
    val reserved = set.keySet.intersect(ReservedProperties)
    require(reserved.isEmpty,
      s"cannot set reserved table properties: ${reserved.mkString(", ")} " +
        "(reserved keys control create/upgrade behavior and are never " +
        "persisted; use the dedicated action — e.g. ALTER ... SET " +
        "TBLPROPERTIES ('format-version'='3') routes to the upgrade)")
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      val updated = base.copy(
        properties = base.properties -- remove ++ set,
        lastUpdatedMs = System.currentTimeMillis())
      (updated, (_: Int) => table.refresh())
    }
  }

  /** Replace the default sort order (ReplaceSortOrderAction,
    * transaction — the write path uses it to cluster within partitions). */
  def replaceSortOrder(table: GraftTable, fields: Seq[SortField]): GraftTable = {
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      fields.foreach { f =>
        require(base.currentSchema.idToField.contains(f.sourceId),
          s"sort field references unknown column id ${f.sourceId}")
      }
      val newId =
        if (fields.isEmpty) 0
        else math.max(1, base.sortOrders.map(_.orderId).max + 1)
      val order = SortOrder(newId, fields)
      val updated = base.copy(
        sortOrders = if (fields.isEmpty) base.sortOrders else base.sortOrders :+ order,
        defaultSortOrderId = newId,
        lastUpdatedMs = System.currentTimeMillis())
      (updated, (_: Int) => table.refresh())
    }
  }

  /** Partition evolution (spec/partition.rs evolution rules): install a
    * new default partition spec built from (column, transform) pairs.
    * Existing files keep their old spec id — scans already resolve
    * partition types, filters and pruning PER SPEC, so mixed-generation
    * tables work unchanged; new appends use the new layout. */
  def updateSpec(table: GraftTable,
      fields: Seq[(String, graft.spec.Transform)]): GraftTable = {
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      val newSpecId = base.partitionSpecs.map(_.specId).max + 1
      val schema = base.currentSchema
      // spec rule (partition evolution): a field with the same
      // (source id, transform) as one in ANY earlier spec keeps that
      // field id and name — ids are stable across evolution, so the
      // unified `_partition` struct and partition stats stay
      // field-id-addressed; only genuinely new fields mint fresh ids
      val existing: Map[(Int, graft.spec.Transform), graft.spec.PartitionField] =
        base.partitionSpecs.flatMap(_.fields)
          .map(f => (f.sourceId, f.transform) -> f).toMap
      var fid = math.max(graft.spec.PartitionSpec.StartFieldId - 1,
        base.lastPartitionId)
      val spec = graft.spec.PartitionSpec(newSpecId, fields.map { case (colName, t) =>
        val f = schema.findField(colName).getOrElse(
          throw new IllegalArgumentException(s"no such column: $colName"))
        existing.get((f.id, t)) match {
          case Some(prior) => prior
          case None =>
            fid += 1
            val name = t match {
              case graft.spec.Transform.Identity => f.name
              case graft.spec.Transform.Bucket(_) => s"${f.name}_bucket"
              case graft.spec.Transform.Truncate(_) => s"${f.name}_trunc"
              case other => s"${f.name}_${other.name}"
            }
            graft.spec.PartitionField(f.id, fid, name, t)
        }
      })
      val updated = base.copy(
        partitionSpecs = base.partitionSpecs :+ spec,
        defaultSpecId = newSpecId,
        lastPartitionId = math.max(base.lastPartitionId, spec.lastAssignedFieldId),
        lastUpdatedMs = System.currentTimeMillis())
      (updated, (_: Int) => table.refresh())
    }
  }

  /** Create/move a branch or tag to a snapshot (SetSnapshotRef update).
    * Tags pin history for reproducible reads (the training-data
    * provenance case); branches get their own lineage via useRef scans. */
  def setRef(table: GraftTable, name: String, snapshotId: Long,
      refType: String, minSnapshotsToKeep: Option[Int] = None,
      maxSnapshotAgeMs: Option[Long] = None,
      maxRefAgeMs: Option[Long] = None): GraftTable = {
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      require(base.snapshotById(snapshotId).isDefined,
        s"snapshot $snapshotId not found")
      val ref = graft.spec.SnapshotRef(snapshotId, refType,
        minSnapshotsToKeep, maxSnapshotAgeMs, maxRefAgeMs)
      val updated = base.copy(
        refs = base.refs + (name -> ref),
        lastUpdatedMs = System.currentTimeMillis())
      (updated, (_: Int) => table.refresh())
    }
  }

  /** Fast-forward publish (the write-audit-publish primitive): move the
    * current table state to `ref`'s head, required to be a DESCENDANT of
    * the current snapshot — audited staged work on a branch becomes the
    * table's truth atomically, with no history rewrite. Refuses diverged
    * branches (that's a merge, not a fast-forward). */
  def fastForward(table: GraftTable, ref: String): GraftTable =
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      val target = base.refs.getOrElse(ref,
        throw new IllegalArgumentException(s"unknown ref: $ref"))
      val byId = base.snapshots.map(s => s.snapshotId -> s).toMap
      val ancestorsOfTarget = Iterator.iterate(byId.get(target.snapshotId))(
        _.flatMap(_.parentSnapshotId).flatMap(byId.get))
        .takeWhile(_.isDefined).flatten.map(_.snapshotId).toSet
      base.currentSnapshotId.foreach { cur =>
        require(ancestorsOfTarget.contains(cur),
          s"$ref (${target.snapshotId}) is not a descendant of current ($cur): not a fast-forward")
      }
      val now = System.currentTimeMillis()
      val updated = base.copy(
        currentSnapshotId = Some(target.snapshotId),
        refs = base.refs + ("main" -> base.refs.get("main")
          .map(_.copy(snapshotId = target.snapshotId))
          .getOrElse(graft.spec.SnapshotRef(target.snapshotId, "branch"))),
        // the spec requires snapshot-log to record EVERY change to main's
        // current-snapshot-id: as-of-timestamp reads and the history
        // metadata table resolve from it, so a publish without a log entry
        // would be invisible to both
        snapshotLog =
          if (base.currentSnapshotId.contains(target.snapshotId)) base.snapshotLog
          else base.snapshotLog :+ (target.snapshotId, now),
        lastUpdatedMs = now)
      (updated, (_: Int) => table.refresh())
    }

  def removeRef(table: GraftTable, name: String): GraftTable =
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      (base.copy(refs = base.refs - name,
        lastUpdatedMs = System.currentTimeMillis()),
        (_: Int) => table.refresh())
    }

  /** Upgrade format version (1→2→3; downgrade refused —
    * transaction/upgrade_format_version.rs). v3 unlocks row lineage,
    * deletion vectors and ns timestamps; those writers already emit
    * v3-compatible metadata, so the upgrade is metadata-only. */
  def upgradeFormatVersion(table: GraftTable, to: Int): GraftTable = {
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      require(to >= base.formatVersion,
        s"cannot downgrade format version ${base.formatVersion} -> $to")
      require(to <= 3, s"unsupported format version $to")
      val updated =
        if (to == base.formatVersion) base
        else base.copy(formatVersion = to, lastUpdatedMs = System.currentTimeMillis())
      (updated, (_: Int) => table.refresh())
    }
  }

  /** Register (or replace, by id) a snapshot-level encryption key
    * (encrypted_key.rs; v3 `encryption-keys` registry). The rotation
    * workflow: register the new wrapped key, point writers at it
    * (`encryption.footer-key-id`), retire the old id with
    * [[removeEncryptionKey]] once no live snapshot's files used it. */
  def addEncryptionKey(table: GraftTable, key: graft.spec.EncryptedKey): GraftTable =
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      require(base.formatVersion >= 3,
        s"encryption-keys require format-version 3 (table is v${base.formatVersion})")
      val kept = base.encryptionKeys.filterNot(_.keyId == key.keyId)
      (base.copy(encryptionKeys = kept :+ key,
        lastUpdatedMs = System.currentTimeMillis()),
        (_: Int) => table.refresh())
    }

  def removeEncryptionKey(table: GraftTable, keyId: String): GraftTable =
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      require(base.encryptionKeys.exists(_.keyId == keyId),
        s"unknown encryption key: $keyId")
      require(!base.properties.get(graft.crypto.Encryption.FooterKeyProp)
          .contains(keyId),
        s"key $keyId is the active footer key — rotate " +
          s"${graft.crypto.Encryption.FooterKeyProp} first")
      (base.copy(encryptionKeys = base.encryptionKeys.filterNot(_.keyId == keyId),
        lastUpdatedMs = System.currentTimeMillis()),
        (_: Int) => table.refresh())
    }

  /** Move the table's root location (transaction/update_location.rs).
    * Existing files keep their absolute manifest-addressed paths, so
    * reads are unaffected; FUTURE commits place data files under the new
    * root. (The Hadoop catalog keeps metadata.json under its own
    * warehouse/<table> dir — location only governs data placement there,
    * matching the catalog-owned-metadata model of the REST/JDBC
    * catalogs.) */
  def updateLocation(table: GraftTable, newLocation: String): GraftTable = {
    require(newLocation.nonEmpty && !newLocation.endsWith("/"),
      s"location must be a non-empty path without trailing slash: '$newLocation'")
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      (base.copy(location = newLocation,
        lastUpdatedMs = System.currentTimeMillis()),
        (_: Int) => table.refresh())
    }
  }

  /** Register/replace/remove partition statistics files
    * (statistic_file.rs:60-71, table_metadata.rs partition_statistics):
    * one per snapshot, set replaces. */
  def updatePartitionStatistics(table: GraftTable,
      set: Seq[graft.spec.PartitionStatisticsFile] = Nil,
      removeSnapshotIds: Set[Long] = Set.empty): GraftTable = {
    require(set.map(_.snapshotId).distinct.size == set.size,
      "duplicate snapshot ids in partition statistics set")
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      val dropped = removeSnapshotIds ++ set.map(_.snapshotId)
      val updated = base.copy(
        partitionStatistics =
          base.partitionStatistics.filterNot(s => dropped(s.snapshotId)) ++ set,
        lastUpdatedMs = System.currentTimeMillis())
      (updated, (_: Int) => table.refresh())
    }
  }

  /** Register/replace/remove statistics files
    * (transaction/update_statistics.rs set_statistics/remove_statistics):
    * at most one statistics file per snapshot — a set for an already-
    * covered snapshot replaces that entry. */
  def updateStatistics(table: GraftTable,
      set: Seq[graft.spec.StatisticsFile] = Nil,
      removeSnapshotIds: Set[Long] = Set.empty): GraftTable = {
    require(set.map(_.snapshotId).distinct.size == set.size,
      "duplicate snapshot ids in statistics set")
    CommitRetry.run(table.catalog, table.name) { (base, _) =>
      val dropped = removeSnapshotIds ++ set.map(_.snapshotId)
      val updated = base.copy(
        statistics = base.statistics.filterNot(s => dropped(s.snapshotId)) ++ set,
        lastUpdatedMs = System.currentTimeMillis())
      (updated, (_: Int) => table.refresh())
    }
  }
}
