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

    val sourcePaths = tasks.map(_.file.filePath).toSet
    Commits.commit(table, "replace", commitUuid, Map(
      "rewritten-data-files" -> tasks.size.toString,
      "added-data-files" -> files.size.toString)) { (base, seq, snapshotId) =>
      // Concurrent APPENDS are fine — their manifests pass through the
      // rewrite untouched. What must abort: a concurrent commit that
      // removed one of our sources (rows would duplicate — the new files
      // re-add them) or added DELETE files (folded set becomes stale and
      // their rows would resurrect). Serializable-lite for compaction.
      Commits.validateReplace(table.io, base, baseSnapshotId, sourcePaths,
        None, table.schema, failOnNewDeletes = true)
      val entries = files.map(f => ManifestEntry(ManifestStatus.Added, Some(snapshotId),
        Some(seq), Some(seq), f))
      val rewritten = Commits.rewriteManifestsDropping(table.io, base,
        sourcePaths, commitUuid, snapshotId, seq,
        // the rewrite folded every delete in scope; validation above
        // guarantees no newer ones exist
        dropDeleteManifests = true)
      Commits.writeManifest(table.io, base, s"$commitUuid-m0", entries,
        table.schema, table.spec, ManifestContent.Data, snapshotId, seq) +: rewritten
    }
  }

  /** Z-ORDER rewrite: like rewriteDataFiles but the data is re-clustered
    * along a Morton curve over `cols` before writing, so per-file min/max
    * stats become selective on EVERY listed column — a box query over
    * (x, y) prunes files on both, where a linear sort serves only its
    * leading column. Column bounds come from the planned files' stats
    * (metadata-only, no extra data pass); the key itself is a native
    * codegen expression (functions.ZOrderExpr).
    *
    * Scale shape: one range shuffle on the z-key (+ the write). Same
    * conflict validation as plain compaction. */
  def rewriteDataFilesZOrder(table: GraftTable, spark: SparkSession,
      cols: Seq[String], targetFileSizeBytes: Long = 512L << 20): GraftTable = {
    require(cols.nonEmpty, "zorder needs at least one column")
    val scan = table.newScan()
    val tasks = scan.planFiles()
    if (tasks.isEmpty) return table
    val baseSnapshotId = table.metadata.currentSnapshotId

    val fields = cols.map(c => table.schema.findField(c).getOrElse(
      throw new IllegalArgumentException(s"unknown zorder column: $c")))
    def boundOf(id: Int,
        side: graft.meta.DataFile => Map[Int, Any]): Seq[Double] =
      tasks.flatMap(tk => side(tk.file).get(id)).map {
        case n: Number => n.doubleValue()
        case d: java.math.BigDecimal => d.doubleValue()
        case other => throw new IllegalArgumentException(
          s"zorder needs numeric bounds, got $other")
      }
    val mins = fields.map(f => boundOf(f.id, _.lowerBounds)
      .reduceOption(math.min(_, _)).getOrElse(0.0))
    val maxs = fields.map(f => boundOf(f.id, _.upperBounds)
      .reduceOption(math.max(_, _)).getOrElse(0.0))

    val totalBytes = tasks.map(_.file.fileSizeInBytes).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileSizeBytes).toInt)
    val zcol = graft.functions.ZOrderExpr.column(
      cols.map(org.apache.spark.sql.functions.col), mins, maxs)
    val df = scan.toDF(spark)
      .withColumn("__z", zcol)
      .repartitionByRange(nOut, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

    val commitUuid = UUID.randomUUID().toString
    val files = AppendWriter.writeDataFiles(table, df, commitUuid)
    val sourcePaths = tasks.map(_.file.filePath).toSet
    Commits.commit(table, "replace", commitUuid, Map(
      "rewritten-data-files" -> tasks.size.toString,
      "added-data-files" -> files.size.toString,
      "zorder-columns" -> cols.mkString(","))) { (base, seq, snapshotId) =>
      Commits.validateReplace(table.io, base, baseSnapshotId, sourcePaths,
        None, table.schema, failOnNewDeletes = true)
      val entries = files.map(f => ManifestEntry(ManifestStatus.Added, Some(snapshotId),
        Some(seq), Some(seq), f))
      val rewritten = Commits.rewriteManifestsDropping(table.io, base,
        sourcePaths, commitUuid, snapshotId, seq, dropDeleteManifests = true)
      Commits.writeManifest(table.io, base, s"$commitUuid-m0", entries,
        table.schema, table.spec, ManifestContent.Data, snapshotId, seq) +: rewritten
    }
  }

  /** Expire snapshots older than `olderThanMs`, retaining at least
    * `retainLast` ancestors of the current snapshot (current is never
    * expired). Metadata-only commit; expired manifest lists are deleted,
    * unreachable data-file GC is a separate concern (remove_orphan_files).
    *
    * Ref-aware retention (expire_snapshots.rs:40-50 semantics):
    *   - refs older than their `max-ref-age-ms` (per-ref, falling back to
    *     `history.expire.max-ref-age-ms`) are removed first — main never;
    *   - each surviving BRANCH retains its latest `min-snapshots-to-keep`
    *     ancestors (per-ref, falling back to the
    *     `history.expire.min-snapshots-to-keep` property, then 1) plus
    *     every ancestor newer than the branch cutoff (`max-snapshot-age-
    *     ms` per-ref, else the global `olderThanMs`);
    *   - tags pin exactly their target snapshot.
    */
  def expireSnapshots(table: GraftTable, olderThanMs: Long,
      retainLast: Int = 1, nowMs: Long = System.currentTimeMillis()): GraftTable = {
    CommitRetry.run(table.catalog, table.name) { (base0, version) =>
      // phase 1: age out refs (never main)
      val base = {
        val defaultRefAge = base0.properties.get("history.expire.max-ref-age-ms").map(_.toLong)
        val byId = base0.snapshots.map(s => s.snapshotId -> s).toMap
        val survivors = base0.refs.filter { case (name, r) =>
          name == "main" || {
            val age = r.maxRefAgeMs.orElse(defaultRefAge)
            val ts = byId.get(r.snapshotId).map(_.timestampMs)
            age.isEmpty || ts.isEmpty || nowMs - ts.get <= age.get
          }
        }
        base0.copy(refs = survivors)
      }
      // phase 2: per-branch ancestor retention
      val defaultKeep = base.properties
        .get("history.expire.min-snapshots-to-keep").map(_.toInt)
      val byId = base.snapshots.map(s => s.snapshotId -> s).toMap
      def ancestors(headId: Long): Iterator[graft.spec.Snapshot] =
        Iterator.iterate(byId.get(headId))(_.flatMap(_.parentSnapshotId).flatMap(byId.get))
          .takeWhile(_.isDefined).flatten
      val branchRetained = base.refs.flatMap {
        case (_, r) if r.refType == "branch" =>
          val keepCount = r.minSnapshotsToKeep.orElse(defaultKeep).getOrElse(1)
          val cutoff = r.maxSnapshotAgeMs.map(nowMs - _).getOrElse(olderThanMs)
          val chain = ancestors(r.snapshotId).toSeq
          (chain.take(math.max(1, keepCount)) ++
            chain.filter(_.timestampMs >= cutoff)).map(_.snapshotId)
        case (_, r) => Seq(r.snapshotId) // tag pins its target only
      }.toSet
      val retained = retainedIds(base, retainLast) ++ branchRetained
      val (keep, expired) = base.snapshots.partition(s =>
        retained.contains(s.snapshotId) || s.timestampMs >= olderThanMs)
      if (expired.isEmpty) (base, (_: Int) => table.refresh())
      else {
        val expiredIds = expired.map(_.snapshotId).toSet
        // statistics registrations of expired snapshots are dangling —
        // drop them and delete their files alongside the manifest lists
        val droppedStats = base.statistics.filter(s => expiredIds(s.snapshotId))
        val droppedPartStats =
          base.partitionStatistics.filter(s => expiredIds(s.snapshotId))
        val updated = base.copy(
          snapshots = keep,
          snapshotLog = base.snapshotLog.filterNot { case (id, _) => expiredIds.contains(id) },
          statistics = base.statistics.filterNot(s => expiredIds(s.snapshotId)),
          partitionStatistics =
            base.partitionStatistics.filterNot(s => expiredIds(s.snapshotId)),
          lastUpdatedMs = System.currentTimeMillis())
        (updated, (_: Int) => {
          expired.foreach(s => table.io.delete(s.manifestList))
          droppedStats.foreach(s => table.io.delete(s.statisticsPath))
          droppedPartStats.foreach(s => table.io.delete(s.statisticsPath))
          table.refresh()
        })
      }
    }
  }

  /** Delete data files not referenced by ANY snapshot and older than
    * `olderThanMs` (remove_orphan_files). The rename-free write design
    * makes this the one required GC: failed jobs leave invisible files
    * under `data/commit-*`; age-gating keeps in-flight commits safe.
    *
    * Fully distributed: manifest entry reads, per-subtree recursive
    * listing, the referenced-vs-candidate anti-join, and the deletions all
    * run as Spark jobs — the driver holds only manifest descriptors and
    * the (small) orphan list it returns, never the O(files) path sets. */
  def removeOrphanFiles(table: GraftTable, olderThanMs: Long,
      spark: SparkSession): Seq[String] = {
    val io = table.io
    val sc = spark.sparkContext
    val dataDir = s"${table.location}/data"
    if (!io.exists(dataDir)) return Nil

    // referenced paths: O(manifests) descriptors on the driver, entries
    // decoded on executors
    val specById = table.metadata.partitionSpecs.map(s => s.specId -> s).toMap
    val defaultSpec = table.metadata.defaultSpec
    val schema = table.metadata.currentSchema
    val manifests: Seq[(String, Int)] = table.metadata.snapshots.flatMap { s =>
      ManifestIO.readManifestList(io, s.manifestList, Commits.partTypes(table.metadata))
        .map(m => (m.manifestPath, m.partitionSpecId))
    }.distinct
    val referenced = sc.parallelize(manifests,
        math.max(1, math.min(manifests.size, 64)))
      .flatMap { case (mp, specId) =>
        val exIo = new graft.io.FileIO(new org.apache.hadoop.conf.Configuration())
        ManifestIO.readManifest(exIo, mp, schema, specById.getOrElse(specId, defaultSpec))
          .map(e => (normalize(e.dataFile.filePath), ()))
      }

    // candidates: one listing task per first-level subtree (data/commit-*)
    val fs = io.fs(dataDir)
    val top = fs.listStatus(new org.apache.hadoop.fs.Path(dataDir)).toSeq
    val topFiles = top.filter(_.isFile)
      .map(f => (f.getPath.toString, f.getModificationTime))
    val subtrees = top.filter(_.isDirectory).map(_.getPath.toString)
    val candidates = sc.parallelize(subtrees,
        math.max(1, math.min(subtrees.size, 64)))
      .flatMap { d =>
        val exIo = new graft.io.FileIO(new org.apache.hadoop.conf.Configuration())
        exIo.listFilesRecursive(d).map { case (p, _, mtime) => (p, mtime) }
      } ++ sc.parallelize(topFiles, math.max(1, math.min(topFiles.size, 8)))

    // anti-join + distributed delete; only the orphan list reaches the driver
    candidates
      .filter { case (p, mtime) => mtime < olderThanMs && !p.endsWith("_SUCCESS") }
      .map { case (p, _) => (normalize(p), p) }
      .subtractByKey(referenced)
      .mapPartitions { it =>
        val exIo = new graft.io.FileIO(new org.apache.hadoop.conf.Configuration())
        it.map { case (_, p) => exIo.delete(p); p }
      }
      .collect().toSeq.sorted
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

  /** Consolidate small data manifests (Iceberg's rewrite_manifests
    * action; the Java RewriteManifests precedent — iceberg-rust tracks it
    * as planned surface). A long-lived table accretes one manifest per
    * commit; at 100 TB that is thousands of KB-scale Avro files whose
    * open/read latency dominates scan PLANNING. This groups data
    * manifests smaller than `smallManifestBytes` per partition spec and
    * rewrites each group into consolidated manifests of Existing entries
    * (resolved sequence numbers), committed as a `replace` snapshot.
    * Metadata-only: no data files move, delete manifests and
    * already-large manifests pass through. */
  def rewriteManifests(table: GraftTable,
      smallManifestBytes: Long = 8L << 20): GraftTable = {
    val io = table.io
    val before = Commits.baseManifests(io, table.metadata)
      .filter(m => m.content == ManifestContent.Data &&
        m.manifestLength < smallManifestBytes)
    if (before.size <= 1) return table // nothing to consolidate
    val commitUuid = UUID.randomUUID().toString
    Commits.commit(table, "replace", commitUuid,
      Map("manifests-rewritten" -> before.size.toString)) { (base, seq, snapshotId) =>
      val manifests = Commits.baseManifests(io, base)
      val (data, rest) = manifests.partition(_.content == ManifestContent.Data)
      val (small, big) = data.partition(_.manifestLength < smallManifestBytes)
      if (small.size <= 1) manifests
      else {
        val merged = small.groupBy(_.partitionSpecId).toSeq.sortBy(_._1)
          .map { case (specId, group) =>
            val spec = base.partitionSpecs.find(_.specId == specId)
              .getOrElse(base.defaultSpec)
            val entries = group.flatMap { m =>
              ManifestIO.readManifest(io, m.manifestPath, base.currentSchema, spec)
                .filter(_.isAlive)
                .map(e => e.copy(status = ManifestStatus.Existing,
                  sequenceNumber = e.sequenceNumber.orElse(Some(m.sequenceNumber))))
            }
            Commits.writeManifest(io, base, s"$commitUuid-mrw$specId", entries,
              base.currentSchema, spec, ManifestContent.Data, snapshotId, seq)
          }
        big ++ merged ++ rest
      }
    }
  }

  /** Compute and register the partition-statistics file for the current
    * snapshot (statistic_file.rs:60-71): the per-partition rollup
    * (records, files, bytes) that `partitionsDf` derives from manifests,
    * persisted as one parquet under metadata/ and registered in
    * `TableMetadata.partitionStatistics` — planners read the file
    * instead of re-walking manifests. Rollup derivation is manifest-only
    * (KB-scale Avro), no data IO. */
  def writePartitionStats(table: GraftTable,
      spark: org.apache.spark.sql.SparkSession): GraftTable = {
    val snapshotId = table.metadata.currentSnapshotId.getOrElse(0L)
    val dir = s"${table.location}/metadata/partition-stats-$snapshotId-" +
      java.util.UUID.randomUUID()
    table.partitionsDf(spark).coalesce(1).write.parquet(dir)
    val path = table.io.listFiles(dir).map(_._1).find(_.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no stats parquet in $dir"))
    Transactions.updatePartitionStatistics(table,
      set = Seq(graft.spec.PartitionStatisticsFile(
        snapshotId, path, table.io.size(path))))
  }

  /** Read back the registered partition stats for a snapshot (current by
    * default). */
  def readPartitionStats(table: GraftTable,
      spark: org.apache.spark.sql.SparkSession,
      snapshotId: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val sid = snapshotId.orElse(table.metadata.currentSnapshotId).getOrElse(0L)
    val f = table.metadata.partitionStatisticsFor(sid).getOrElse(
      throw new IllegalArgumentException(s"no partition statistics for snapshot $sid"))
    spark.read.parquet(f.statisticsPath)
  }

  /** The last `retainLast` ancestors of the current snapshot (incl. it). */
  private def retainedIds(base: TableMetadata, retainLast: Int): Set[Long] = {
    val byId = base.snapshots.map(s => s.snapshotId -> s).toMap
    Iterator.iterate(base.currentSnapshot)(_.flatMap(_.parentSnapshotId).flatMap(byId.get))
      .takeWhile(_.isDefined).flatten.map(_.snapshotId)
      .take(math.max(1, retainLast)).toSet
  }
}
