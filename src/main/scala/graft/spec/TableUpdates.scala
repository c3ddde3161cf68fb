package graft.spec

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import Json._

/** The Iceberg REST commit model (reference catalog/mod.rs:440-700 and the
  * REST spec's CommitTableRequest): a commit is NOT "here is my whole new
  * metadata document" but a list of declarative update actions guarded by
  * requirement asserts, both validated and APPLIED by the catalog service
  * against ITS current metadata. This is what makes two non-overlapping
  * commits (say a property change and an append) both succeed without a
  * retry, and what lets the service reject a stale snapshot chain with 409.
  *
  * `TableUpdate.applyTo` mirrors the reference's `TableMetadataBuilder`
  * semantics (table_metadata_builder.rs:345 add_snapshot, :517 set_ref):
  * derived fields (last-sequence-number, last-column-id, next-row-id,
  * snapshot-log) are recomputed here, never trusted from the client.
  *
  * JSON shape matches the spec's kebab-case discriminated unions:
  * `{"action": "add-snapshot", "snapshot": {...}}`,
  * `{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 1}`.
  */
sealed trait TableUpdate {
  def action: String
  def toJson: ObjectNode
  /** Apply this update to `base`, recomputing derived fields. `added` is the
    * set of snapshot ids added earlier in the SAME update list (set-ref uses
    * the snapshot's own timestamp only for snapshots added this commit,
    * table_metadata_builder.rs:538-546). */
  def applyTo(base: TableMetadata, added: Set[Long]): TableMetadata

  protected def base(extra: (ObjectNode => Unit)*): ObjectNode = {
    val o = obj()
    o.put("action", action)
    extra.foreach(_(o))
    o
  }
}

object TableUpdate {
  final case class AssignUuid(uuid: String) extends TableUpdate {
    val action = "assign-uuid"
    def toJson = base(_.put("uuid", uuid))
    def applyTo(b: TableMetadata, added: Set[Long]) = b.copy(tableUuid = uuid)
  }

  final case class UpgradeFormatVersion(formatVersion: Int) extends TableUpdate {
    val action = "upgrade-format-version"
    def toJson = base(_.put("format-version", formatVersion))
    def applyTo(b: TableMetadata, added: Set[Long]) = {
      require(formatVersion >= b.formatVersion,
        s"cannot downgrade format version ${b.formatVersion} -> $formatVersion")
      b.copy(formatVersion = formatVersion)
    }
  }

  final case class AddSchema(schema: IcebergSchema) extends TableUpdate {
    val action = "add-schema"
    def toJson = base(_.set[ObjectNode]("schema", schema.toJson))
    def applyTo(b: TableMetadata, added: Set[Long]) = b.copy(
      schemas = b.schemas.filterNot(_.schemaId == schema.schemaId) :+ schema,
      lastColumnId = math.max(b.lastColumnId, schema.highestFieldId))
  }

  final case class SetCurrentSchema(schemaId: Int) extends TableUpdate {
    val action = "set-current-schema"
    def toJson = base(_.put("schema-id", schemaId))
    def applyTo(b: TableMetadata, added: Set[Long]) = {
      // -1 = last added schema (catalog/mod.rs:656 semantics)
      val id = if (schemaId == -1) b.schemas.last.schemaId else schemaId
      require(b.schemaById(id).isDefined, s"set-current-schema: unknown schema id $id")
      b.copy(currentSchemaId = id)
    }
  }

  final case class AddSpec(spec: PartitionSpec) extends TableUpdate {
    val action = "add-spec"
    def toJson = base(_.set[ObjectNode]("spec", spec.toJson))
    def applyTo(b: TableMetadata, added: Set[Long]) = b.copy(
      partitionSpecs = b.partitionSpecs.filterNot(_.specId == spec.specId) :+ spec,
      lastPartitionId = math.max(b.lastPartitionId, spec.lastAssignedFieldId))
  }

  final case class SetDefaultSpec(specId: Int) extends TableUpdate {
    val action = "set-default-spec"
    def toJson = base(_.put("spec-id", specId))
    def applyTo(b: TableMetadata, added: Set[Long]) = {
      val id = if (specId == -1) b.partitionSpecs.last.specId else specId
      require(b.specById(id).isDefined, s"set-default-spec: unknown spec id $id")
      b.copy(defaultSpecId = id)
    }
  }

  final case class AddSortOrder(sortOrder: SortOrder) extends TableUpdate {
    val action = "add-sort-order"
    def toJson = base(_.set[ObjectNode]("sort-order", sortOrder.toJson))
    def applyTo(b: TableMetadata, added: Set[Long]) = b.copy(
      sortOrders = b.sortOrders.filterNot(_.orderId == sortOrder.orderId) :+ sortOrder)
  }

  final case class SetDefaultSortOrder(sortOrderId: Int) extends TableUpdate {
    val action = "set-default-sort-order"
    def toJson = base(_.put("sort-order-id", sortOrderId))
    def applyTo(b: TableMetadata, added: Set[Long]) = {
      val id = if (sortOrderId == -1) b.sortOrders.last.orderId else sortOrderId
      require(b.sortOrders.exists(_.orderId == id),
        s"set-default-sort-order: unknown order id $id")
      b.copy(defaultSortOrderId = id)
    }
  }

  final case class AddSnapshot(snapshot: Snapshot) extends TableUpdate {
    val action = "add-snapshot"
    def toJson = base(_.set[ObjectNode]("snapshot", snapshot.toJson))
    def applyTo(b: TableMetadata, added: Set[Long]) = {
      require(b.snapshotById(snapshot.snapshotId).isEmpty,
        s"snapshot already exists: ${snapshot.snapshotId}")
      require(b.formatVersion < 2 || snapshot.parentSnapshotId.isEmpty ||
        snapshot.sequenceNumber > b.lastSequenceNumber,
        s"snapshot sequence ${snapshot.sequenceNumber} is not newer than " +
          s"last sequence ${b.lastSequenceNumber}")
      // next-row-id re-derived from the snapshot's row range, never trusted
      // from the client document (table_metadata_builder.rs:402-421)
      val nextRow = snapshot.firstRowId match {
        case Some(first) =>
          require(first >= b.nextRowId,
            s"first-row-id $first is behind table next-row-id ${b.nextRowId}")
          first + snapshot.addedRows.getOrElse(0L)
        case None => b.nextRowId
      }
      b.copy(
        snapshots = b.snapshots :+ snapshot,
        lastSequenceNumber = math.max(b.lastSequenceNumber, snapshot.sequenceNumber),
        lastUpdatedMs = math.max(b.lastUpdatedMs, snapshot.timestampMs),
        nextRowId = nextRow)
    }
  }

  final case class SetSnapshotRef(refName: String, reference: SnapshotRef)
      extends TableUpdate {
    val action = "set-snapshot-ref"
    def toJson = base { o =>
      o.put("ref-name", refName)
      // SnapshotReference is #[serde(flatten)]ed (catalog/mod.rs:568-574)
      o.put("snapshot-id", reference.snapshotId)
      o.put("type", reference.refType)
    }
    def applyTo(b: TableMetadata, added: Set[Long]) = {
      val snap = b.snapshotById(reference.snapshotId).getOrElse(
        throw new IllegalArgumentException(
          s"cannot set '$refName' to unknown snapshot ${reference.snapshotId}"))
      if (refName == "main") {
        // main is the current-snapshot pointer, not a refs entry, in this
        // implementation's metadata model; the log entry uses the snapshot's
        // own timestamp when it was added this commit, else commit wall time
        // (table_metadata_builder.rs:538-556)
        val ts = if (added.contains(snap.snapshotId)) snap.timestampMs
                 else System.currentTimeMillis()
        b.copy(
          currentSnapshotId = Some(snap.snapshotId),
          snapshotLog = b.snapshotLog :+ (snap.snapshotId, ts))
      } else {
        b.copy(refs = b.refs + (refName -> reference))
      }
    }
  }

  final case class RemoveSnapshots(snapshotIds: Seq[Long]) extends TableUpdate {
    val action = "remove-snapshots"
    def toJson = base { o =>
      val a = arr(); snapshotIds.foreach(a.add); o.set[ObjectNode]("snapshot-ids", a)
    }
    def applyTo(b: TableMetadata, added: Set[Long]) = {
      val gone = snapshotIds.toSet
      b.copy(
        snapshots = b.snapshots.filterNot(s => gone.contains(s.snapshotId)),
        snapshotLog = b.snapshotLog.filterNot { case (id, _) => gone.contains(id) })
    }
  }

  final case class RemoveSnapshotRef(refName: String) extends TableUpdate {
    val action = "remove-snapshot-ref"
    def toJson = base(_.put("ref-name", refName))
    def applyTo(b: TableMetadata, added: Set[Long]) =
      if (refName == "main") b.copy(currentSnapshotId = None)
      else b.copy(refs = b.refs - refName)
  }

  final case class SetLocation(location: String) extends TableUpdate {
    val action = "set-location"
    def toJson = base(_.put("location", location))
    def applyTo(b: TableMetadata, added: Set[Long]) = b.copy(location = location)
  }

  final case class SetProperties(updates: Map[String, String]) extends TableUpdate {
    val action = "set-properties"
    def toJson = base { o =>
      val u = obj()
      updates.toSeq.sortBy(_._1).foreach { case (k, v) => u.put(k, v) }
      o.set[ObjectNode]("updates", u)
    }
    def applyTo(b: TableMetadata, added: Set[Long]) =
      b.copy(properties = b.properties ++ updates)
  }

  final case class RemoveProperties(removals: Seq[String]) extends TableUpdate {
    val action = "remove-properties"
    def toJson = base { o =>
      val a = arr(); removals.foreach(a.add); o.set[ObjectNode]("removals", a)
    }
    def applyTo(b: TableMetadata, added: Set[Long]) =
      b.copy(properties = b.properties -- removals)
  }

  final case class RemovePartitionSpecs(specIds: Seq[Int]) extends TableUpdate {
    val action = "remove-partition-specs"
    def toJson = base { o =>
      val a = arr(); specIds.foreach(a.add(_)); o.set[ObjectNode]("spec-ids", a)
    }
    def applyTo(b: TableMetadata, added: Set[Long]) = {
      require(!specIds.contains(b.defaultSpecId),
        s"cannot remove default spec ${b.defaultSpecId}")
      b.copy(partitionSpecs = b.partitionSpecs.filterNot(s => specIds.contains(s.specId)))
    }
  }

  final case class RemoveSchemas(schemaIds: Seq[Int]) extends TableUpdate {
    val action = "remove-schemas"
    def toJson = base { o =>
      val a = arr(); schemaIds.foreach(a.add(_)); o.set[ObjectNode]("schema-ids", a)
    }
    def applyTo(b: TableMetadata, added: Set[Long]) = {
      require(!schemaIds.contains(b.currentSchemaId),
        s"cannot remove current schema ${b.currentSchemaId}")
      b.copy(schemas = b.schemas.filterNot(s => schemaIds.contains(s.schemaId)))
    }
  }

  final case class SetStatistics(statistics: StatisticsFile) extends TableUpdate {
    val action = "set-statistics"
    def toJson = base(_.set[ObjectNode]("statistics", statistics.toJson))
    def applyTo(b: TableMetadata, added: Set[Long]) = b.copy(
      statistics = b.statistics.filterNot(_.snapshotId == statistics.snapshotId)
        :+ statistics)
  }

  final case class RemoveStatistics(snapshotId: Long) extends TableUpdate {
    val action = "remove-statistics"
    def toJson = base(_.put("snapshot-id", snapshotId))
    def applyTo(b: TableMetadata, added: Set[Long]) =
      b.copy(statistics = b.statistics.filterNot(_.snapshotId == snapshotId))
  }

  final case class SetPartitionStatistics(partitionStatistics: PartitionStatisticsFile)
      extends TableUpdate {
    val action = "set-partition-statistics"
    def toJson = base(
      _.set[ObjectNode]("partition-statistics", partitionStatistics.toJson))
    def applyTo(b: TableMetadata, added: Set[Long]) = b.copy(
      partitionStatistics = b.partitionStatistics
        .filterNot(_.snapshotId == partitionStatistics.snapshotId)
        :+ partitionStatistics)
  }

  final case class RemovePartitionStatistics(snapshotId: Long) extends TableUpdate {
    val action = "remove-partition-statistics"
    def toJson = base(_.put("snapshot-id", snapshotId))
    def applyTo(b: TableMetadata, added: Set[Long]) = b.copy(
      partitionStatistics = b.partitionStatistics.filterNot(_.snapshotId == snapshotId))
  }

  def fromJson(n: JsonNode): TableUpdate = n("action").asText() match {
    case "assign-uuid" => AssignUuid(n("uuid").asText())
    case "upgrade-format-version" => UpgradeFormatVersion(n("format-version").asInt())
    case "add-schema" => AddSchema(IcebergSchema.schemaFromJson(n("schema")))
    case "set-current-schema" => SetCurrentSchema(n("schema-id").asInt())
    case "add-spec" => AddSpec(PartitionSpec.fromJson(n("spec")))
    case "set-default-spec" => SetDefaultSpec(n("spec-id").asInt())
    case "add-sort-order" => AddSortOrder(SortOrder.fromJson(n("sort-order")))
    case "set-default-sort-order" => SetDefaultSortOrder(n("sort-order-id").asInt())
    case "add-snapshot" => AddSnapshot(Snapshot.fromJson(n("snapshot")))
    case "set-snapshot-ref" => SetSnapshotRef(n("ref-name").asText(),
      SnapshotRef(n("snapshot-id").asLong(), n("type").asText()))
    case "remove-snapshots" => RemoveSnapshots(n("snapshot-ids").elems.map(_.asLong()))
    case "remove-snapshot-ref" => RemoveSnapshotRef(n("ref-name").asText())
    case "set-location" => SetLocation(n("location").asText())
    case "set-properties" => SetProperties(
      n("updates").fieldsMap.map { case (k, v) => k -> v.asText() })
    case "remove-properties" => RemoveProperties(n("removals").elems.map(_.asText()))
    case "remove-partition-specs" => RemovePartitionSpecs(
      n("spec-ids").elems.map(_.asInt()))
    case "remove-schemas" => RemoveSchemas(n("schema-ids").elems.map(_.asInt()))
    case "set-statistics" => SetStatistics(StatisticsFile.fromJson(n("statistics")))
    case "remove-statistics" => RemoveStatistics(n("snapshot-id").asLong())
    case "set-partition-statistics" => SetPartitionStatistics(
      PartitionStatisticsFile.fromJson(n("partition-statistics")))
    case "remove-partition-statistics" => RemovePartitionStatistics(
      n("snapshot-id").asLong())
    case other => throw new IllegalArgumentException(s"unknown update action: $other")
  }
}

/** Commit preconditions, validated by the SERVICE against its current
  * metadata (catalog/mod.rs:440-500, :702-810). A failed check is a
  * `CommitConflict`-shaped 409: the client refreshes and retries. */
sealed trait TableRequirement {
  def reqType: String
  def toJson: ObjectNode
  /** Throws IllegalStateException (mapped to 409 by the service) on violation. */
  def check(current: TableMetadata): Unit

  protected def base(extra: (ObjectNode => Unit)*): ObjectNode = {
    val o = obj()
    o.put("type", reqType)
    extra.foreach(_(o))
    o
  }
  protected def fail(msg: String): Nothing = throw new IllegalStateException(msg)
}

object TableRequirement {
  final case class AssertTableUuid(uuid: String) extends TableRequirement {
    val reqType = "assert-table-uuid"
    def toJson = base(_.put("uuid", uuid))
    def check(m: TableMetadata): Unit =
      if (m.tableUuid != uuid) fail(s"table uuid changed: ${m.tableUuid} != $uuid")
  }

  /** `snapshotId=None` asserts the ref does not exist yet; for `main` the
    * asserted state is the current-snapshot pointer (catalog/mod.rs:756-786). */
  final case class AssertRefSnapshotId(ref: String, snapshotId: Option[Long])
      extends TableRequirement {
    val reqType = "assert-ref-snapshot-id"
    def toJson = base { o =>
      o.put("ref", ref)
      snapshotId.foreach(o.put("snapshot-id", _))
    }
    def check(m: TableMetadata): Unit = {
      val actual = if (ref == "main") m.currentSnapshotId else m.refs.get(ref).map(_.snapshotId)
      (actual, snapshotId) match {
        case (a, e) if a == e => ()
        case (Some(a), Some(e)) => fail(s"ref $ref is at $a, expected $e")
        case (Some(a), None) => fail(s"ref $ref exists at $a, expected absent")
        case (None, Some(e)) => fail(s"ref $ref is absent, expected $e")
        case _ => ()
      }
    }
  }

  final case class AssertCurrentSchemaId(currentSchemaId: Int) extends TableRequirement {
    val reqType = "assert-current-schema-id"
    def toJson = base(_.put("current-schema-id", currentSchemaId))
    def check(m: TableMetadata): Unit =
      if (m.currentSchemaId != currentSchemaId)
        fail(s"current schema is ${m.currentSchemaId}, expected $currentSchemaId")
  }

  final case class AssertLastAssignedFieldId(lastAssignedFieldId: Int)
      extends TableRequirement {
    val reqType = "assert-last-assigned-field-id"
    def toJson = base(_.put("last-assigned-field-id", lastAssignedFieldId))
    def check(m: TableMetadata): Unit =
      if (m.lastColumnId != lastAssignedFieldId)
        fail(s"last column id is ${m.lastColumnId}, expected $lastAssignedFieldId")
  }

  final case class AssertDefaultSpecId(defaultSpecId: Int) extends TableRequirement {
    val reqType = "assert-default-spec-id"
    def toJson = base(_.put("default-spec-id", defaultSpecId))
    def check(m: TableMetadata): Unit =
      if (m.defaultSpecId != defaultSpecId)
        fail(s"default spec is ${m.defaultSpecId}, expected $defaultSpecId")
  }

  final case class AssertLastAssignedPartitionId(lastAssignedPartitionId: Int)
      extends TableRequirement {
    val reqType = "assert-last-assigned-partition-id"
    def toJson = base(_.put("last-assigned-partition-id", lastAssignedPartitionId))
    def check(m: TableMetadata): Unit =
      if (m.lastPartitionId != lastAssignedPartitionId)
        fail(s"last partition id is ${m.lastPartitionId}, expected $lastAssignedPartitionId")
  }

  final case class AssertDefaultSortOrderId(defaultSortOrderId: Int)
      extends TableRequirement {
    val reqType = "assert-default-sort-order-id"
    def toJson = base(_.put("default-sort-order-id", defaultSortOrderId))
    def check(m: TableMetadata): Unit =
      if (m.defaultSortOrderId != defaultSortOrderId)
        fail(s"default sort order is ${m.defaultSortOrderId}, expected $defaultSortOrderId")
  }

  def fromJson(n: JsonNode): TableRequirement = n("type").asText() match {
    case "assert-table-uuid" => AssertTableUuid(n("uuid").asText())
    case "assert-ref-snapshot-id" => AssertRefSnapshotId(n("ref").asText(),
      n.opt("snapshot-id").map(_.asLong()))
    case "assert-current-schema-id" => AssertCurrentSchemaId(n("current-schema-id").asInt())
    case "assert-last-assigned-field-id" => AssertLastAssignedFieldId(
      n("last-assigned-field-id").asInt())
    case "assert-default-spec-id" => AssertDefaultSpecId(n("default-spec-id").asInt())
    case "assert-last-assigned-partition-id" => AssertLastAssignedPartitionId(
      n("last-assigned-partition-id").asInt())
    case "assert-default-sort-order-id" => AssertDefaultSortOrderId(
      n("default-sort-order-id").asInt())
    case other => throw new IllegalArgumentException(s"unknown requirement type: $other")
  }
}

object TableUpdates {

  /** Apply an update list in order (each sees its predecessors' effects),
    * tracking which snapshots were added within this same commit. */
  def applyAll(base: TableMetadata, updates: Seq[TableUpdate]): TableMetadata = {
    var added = Set.empty[Long]
    updates.foldLeft(base) { (m, u) =>
      val next = u.applyTo(m, added)
      u match {
        case TableUpdate.AddSnapshot(s) => added += s.snapshotId
        case _ => ()
      }
      next
    }
  }

  /** Client side: express `base -> updated` as spec update actions. Derived
    * fields (last ids, sequence number, next-row-id, snapshot/metadata logs)
    * are intentionally NOT diffed — `applyTo` recomputes them, and the
    * metadata log belongs to the catalog service. */
  def diff(base: TableMetadata, updated: TableMetadata): Seq[TableUpdate] = {
    import TableUpdate._
    val out = Seq.newBuilder[TableUpdate]

    if (updated.tableUuid != base.tableUuid) out += AssignUuid(updated.tableUuid)
    if (updated.formatVersion != base.formatVersion)
      out += UpgradeFormatVersion(updated.formatVersion)
    if (updated.location != base.location) out += SetLocation(updated.location)

    // schemas / specs / sort orders: append-mostly id-keyed lists
    val baseSchemaIds = base.schemas.map(_.schemaId).toSet
    updated.schemas.filterNot(s => base.schemas.contains(s)).foreach { s =>
      out += AddSchema(s)
    }
    val goneSchemas = baseSchemaIds -- updated.schemas.map(_.schemaId).toSet
    if (goneSchemas.nonEmpty) out += RemoveSchemas(goneSchemas.toSeq.sorted)
    if (updated.currentSchemaId != base.currentSchemaId)
      out += SetCurrentSchema(updated.currentSchemaId)

    val baseSpecIds = base.partitionSpecs.map(_.specId).toSet
    updated.partitionSpecs.filterNot(base.partitionSpecs.contains).foreach { s =>
      out += AddSpec(s)
    }
    val goneSpecs = baseSpecIds -- updated.partitionSpecs.map(_.specId).toSet
    if (goneSpecs.nonEmpty) out += RemovePartitionSpecs(goneSpecs.toSeq.sorted)
    if (updated.defaultSpecId != base.defaultSpecId)
      out += SetDefaultSpec(updated.defaultSpecId)

    updated.sortOrders.filterNot(base.sortOrders.contains).foreach { s =>
      out += AddSortOrder(s)
    }
    if (updated.defaultSortOrderId != base.defaultSortOrderId)
      out += SetDefaultSortOrder(updated.defaultSortOrderId)

    // snapshots, in sequence order so applyTo's monotonicity checks hold
    val baseSnapIds = base.snapshots.map(_.snapshotId).toSet
    updated.snapshots.filterNot(s => baseSnapIds.contains(s.snapshotId))
      .sortBy(s => (s.sequenceNumber, s.timestampMs))
      .foreach(s => out += AddSnapshot(s))
    val goneSnaps = baseSnapIds -- updated.snapshots.map(_.snapshotId).toSet
    if (goneSnaps.nonEmpty) out += RemoveSnapshots(goneSnaps.toSeq.sorted)

    if (updated.currentSnapshotId != base.currentSnapshotId)
      updated.currentSnapshotId match {
        case Some(id) => out += SetSnapshotRef("main", SnapshotRef(id, "branch"))
        case None => out += RemoveSnapshotRef("main")
      }
    (base.refs.keySet -- updated.refs.keySet).toSeq.sorted.foreach { name =>
      out += RemoveSnapshotRef(name)
    }
    updated.refs.toSeq.sortBy(_._1).foreach { case (name, r) =>
      if (!base.refs.get(name).contains(r)) out += SetSnapshotRef(name, r)
    }

    // properties
    val propUpdates = updated.properties.filter { case (k, v) =>
      !base.properties.get(k).contains(v)
    }
    if (propUpdates.nonEmpty) out += SetProperties(propUpdates)
    val propRemovals = base.properties.keySet -- updated.properties.keySet
    if (propRemovals.nonEmpty) out += RemoveProperties(propRemovals.toSeq.sorted)

    // statistics files, keyed by snapshot id
    updated.statistics.filterNot(base.statistics.contains).foreach { s =>
      out += SetStatistics(s)
    }
    (base.statistics.map(_.snapshotId).toSet --
      updated.statistics.map(_.snapshotId).toSet).toSeq.sorted.foreach { id =>
      out += RemoveStatistics(id)
    }
    updated.partitionStatistics.filterNot(base.partitionStatistics.contains).foreach { s =>
      out += SetPartitionStatistics(s)
    }
    (base.partitionStatistics.map(_.snapshotId).toSet --
      updated.partitionStatistics.map(_.snapshotId).toSet).toSeq.sorted.foreach { id =>
      out += RemovePartitionStatistics(id)
    }

    out.result()
  }

  /** Requirements guarding a `diff(base, updated)` commit: assert exactly the
    * base state the update list was computed against, scoped to the areas it
    * touches (so non-overlapping commits can interleave, the point of the
    * requirement model). The main-branch assert is included whenever the
    * snapshot chain or pointer changes. */
  def requirements(base: TableMetadata, updates: Seq[TableUpdate]): Seq[TableRequirement] = {
    import TableRequirement._
    import TableUpdate._
    val out = Seq.newBuilder[TableRequirement]
    out += AssertTableUuid(base.tableUuid)
    val touchesMain = updates.exists {
      case _: AddSnapshot | _: RemoveSnapshots => true
      case SetSnapshotRef("main", _) | RemoveSnapshotRef("main") => true
      case _ => false
    }
    if (touchesMain) out += AssertRefSnapshotId("main", base.currentSnapshotId)
    updates.foreach {
      case SetSnapshotRef(name, _) if name != "main" =>
        out += AssertRefSnapshotId(name, base.refs.get(name).map(_.snapshotId))
      case _: AddSchema | _: SetCurrentSchema | _: RemoveSchemas =>
        out += AssertCurrentSchemaId(base.currentSchemaId)
        out += AssertLastAssignedFieldId(base.lastColumnId)
      case _: AddSpec | _: SetDefaultSpec | _: RemovePartitionSpecs =>
        out += AssertDefaultSpecId(base.defaultSpecId)
        out += AssertLastAssignedPartitionId(base.lastPartitionId)
      case _: AddSortOrder | _: SetDefaultSortOrder =>
        out += AssertDefaultSortOrderId(base.defaultSortOrderId)
      case _ => ()
    }
    out.result().distinct
  }

  def updatesToJson(updates: Seq[TableUpdate]): ArrayNode = {
    val a = arr(); updates.foreach(u => a.add(u.toJson)); a
  }

  def requirementsToJson(reqs: Seq[TableRequirement]): ArrayNode = {
    val a = arr(); reqs.foreach(r => a.add(r.toJson)); a
  }
}
