package graft.sources

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.catalog.{Catalog => GraftCatalog}
import graft.table.GraftTable

/** SQL maintenance procedures — `CALL <cat>.system.<proc>(...)`, the
  * Iceberg stored-procedure surface over the table actions
  * (rewrite/expire/orphans/rollback/branch/tag/stats):
  *
  * {{{
  * CALL cat.system.rewrite_data_files('t')
  * CALL cat.system.expire_snapshots('t', 2)
  * CALL cat.system.remove_orphan_files('t', <older_than_ms>)
  * CALL cat.system.rollback_to_snapshot('t', <snapshot_id>)
  * CALL cat.system.create_branch('t', 'audit')  -- and create_tag
  * CALL cat.system.rewrite_manifests('t')
  * CALL cat.system.write_partition_stats('t')
  * }}}
  *
  * Each procedure loads the live table, runs the corresponding
  * distributed action, and returns a one-row summary via `LocalScan`. */
object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  private def str(v: String): Any = UTF8String.fromString(v)

  private abstract class Proc(catalog: GraftCatalog,
      val procName: String,
      params: Seq[(String, DataType)],
      out: Seq[(String, DataType)]) extends UnboundProcedure with BoundProcedure {

    protected def table(args: InternalRow): GraftTable =
      GraftTable.load(args.getUTF8String(0).toString, catalog)

    def run(args: InternalRow): Seq[Any]

    /** Multi-row procedures (e.g. ancestors_of) override this; the
      * default wraps the single-row `run`. */
    def runRows(args: InternalRow): Seq[Seq[Any]] = Seq(run(args))

    /** SQL-literal default per parameter name — a parameter listed here
      * may be omitted at the call site. */
    def paramDefaults: Map[String, String] = Map.empty

    override def name(): String = procName
    override def description(): String = s"graft $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] =
      params.map { case (n, t) =>
        val b = ProcedureParameter.in(n, t)
        paramDefaults.get(n).foreach(b.defaultValue)
        b.build()
      }.toArray

    override def call(input: InternalRow): JIterator[Scan] = {
      val values = runRows(input)
      val schema = StructType(out.map { case (n, t) => StructField(n, t) })
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          values.map(r => new GenericInternalRow(r.toArray): InternalRow).toArray
        override def readSchema(): StructType = schema
      }
      Collections.singletonList(scan).iterator()
    }
  }

  def load(name: String, catalog: GraftCatalog): Option[UnboundProcedure] = {
    def spark = SparkSession.active
    name match {
      case "rewrite_data_files" => Some(new Proc(catalog, name,
          Seq("table" -> StringType),
          Seq("rewritten_data_files_count" -> IntegerType,
            "added_data_files_count" -> IntegerType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val before = t.newScan().planFiles().size
          val after = t.rewriteDataFiles(spark).newScan().planFiles().size
          Seq(before, after)
        }
      })
      // BINPACK variant (r14): merge only fragmented partitions —
      // >= min_input_files files under 0.75 × target_file_size_bytes;
      // see Maintenance.rewriteSmallFiles for the delete-manifest and
      // convergence contracts. target_file_size_bytes defaults (via
      // <= 0, r15) to the table's own write.target-file-size-bytes
      // property, reference table_properties.rs:351.
      case "rewrite_small_files" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "target_file_size_bytes" -> LongType,
            "min_input_files" -> IntegerType),
          Seq("rewritten_data_files_count" -> IntegerType,
            "added_data_files_count" -> IntegerType)) {
        override def paramDefaults: Map[String, String] =
          Map("target_file_size_bytes" -> "-1", "min_input_files" -> "2")
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val rewritten = graft.table.Maintenance.rewriteSmallFiles(t, spark,
            targetFileSizeBytes = a.getLong(1), minInputFiles = a.getInt(2))
          val summary = rewritten.metadata.currentSnapshot
            .filter(_ => rewritten.metadata.currentSnapshotId !=
              t.metadata.currentSnapshotId)
            .map(_.summary).getOrElse(Map.empty)
          Seq(summary.getOrElse("rewritten-data-files", "0").toInt,
            summary.getOrElse("added-data-files", "0").toInt)
        }
      })
      case "rewrite_data_files_zorder" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "columns" -> StringType),
          Seq("rewritten_data_files_count" -> IntegerType,
            "added_data_files_count" -> IntegerType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val cols = a.getUTF8String(1).toString.split(",").map(_.trim).toSeq
          val before = t.newScan().planFiles().size
          val after = t.rewriteDataFilesZOrder(spark, cols)
            .newScan().planFiles().size
          Seq(before, after)
        }
      })
      case "rewrite_manifests" => Some(new Proc(catalog, name,
          Seq("table" -> StringType),
          Seq("rewritten_manifests_count" -> IntegerType,
            "added_manifests_count" -> IntegerType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val before = t.currentManifests.size
          val after = t.rewriteManifests().currentManifests.size
          Seq(before, after)
        }
      })
      case "expire_snapshots" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "retain_last" -> IntegerType),
          Seq("deleted_snapshots_count" -> IntegerType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val before = t.metadata.snapshots.size
          val after = t.expireSnapshots(System.currentTimeMillis() + 3600000L,
            retainLast = a.getInt(1)).metadata.snapshots.size
          Seq(before - after)
        }
      })
      case "remove_orphan_files" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "older_than_ms" -> LongType),
          Seq("orphan_file_count" -> IntegerType)) {
        def run(a: InternalRow): Seq[Any] =
          Seq(table(a).removeOrphanFiles(a.getLong(1), spark).size)
      })
      case "rollback_to_snapshot" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "snapshot_id" -> LongType),
          Seq("previous_snapshot_id" -> LongType,
            "current_snapshot_id" -> LongType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val prev = t.metadata.currentSnapshotId.getOrElse(-1L)
          val cur = t.rollbackTo(a.getLong(1))
            .metadata.currentSnapshotId.getOrElse(-1L)
          Seq(prev, cur)
        }
      })
      case "create_branch" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "branch" -> StringType),
          Seq("branch" -> StringType, "snapshot_id" -> LongType)) {
        def run(a: InternalRow): Seq[Any] = {
          val b = a.getUTF8String(1).toString
          val t = table(a).createBranch(b)
          Seq(str(b), t.metadata.refs(b).snapshotId)
        }
      })
      case "create_tag" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "tag" -> StringType),
          Seq("tag" -> StringType, "snapshot_id" -> LongType)) {
        def run(a: InternalRow): Seq[Any] = {
          val b = a.getUTF8String(1).toString
          val t = table(a).createTag(b)
          Seq(str(b), t.metadata.refs(b).snapshotId)
        }
      })
      case "add_partition_field" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "field" -> StringType,
            "transform" -> StringType),
          Seq("spec_id" -> IntegerType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val cur = t.spec.fields.map(f =>
            t.schema.idToField(f.sourceId).name -> f.transform)
          val added = a.getUTF8String(1).toString ->
            graft.spec.Transform.parse(a.getUTF8String(2).toString)
          Seq(t.updateSpec(cur :+ added).spec.specId)
        }
      })
      case "drop_partition_field" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "field" -> StringType),
          Seq("spec_id" -> IntegerType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val drop = a.getUTF8String(1).toString
          val cur = t.spec.fields.map(f =>
            t.schema.idToField(f.sourceId).name -> f.transform)
          require(cur.exists(_._1 == drop), s"not a partition field: $drop")
          Seq(t.updateSpec(cur.filterNot(_._1 == drop)).spec.specId)
        }
      })
      case "fast_forward" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "branch" -> StringType),
          Seq("previous_snapshot_id" -> LongType,
            "current_snapshot_id" -> LongType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val prev = t.metadata.currentSnapshotId.getOrElse(-1L)
          val cur = t.publish(a.getUTF8String(1).toString)
            .metadata.currentSnapshotId.getOrElse(-1L)
          Seq(prev, cur)
        }
      })
      case "write_partition_stats" => Some(new Proc(catalog, name,
          Seq("table" -> StringType),
          Seq("statistics_path" -> StringType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a).writePartitionStats(spark)
          Seq(str(t.metadata.partitionStatistics.lastOption
            .map(_.statisticsPath).getOrElse("")))
        }
      })
      case "cherrypick_snapshot" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "snapshot_id" -> LongType),
          Seq("source_snapshot_id" -> LongType,
            "current_snapshot_id" -> LongType)) {
        def run(a: InternalRow): Seq[Any] = {
          val src = a.getLong(1)
          val cur = table(a).cherrypick(src)
            .metadata.currentSnapshotId.getOrElse(-1L)
          Seq(src, cur)
        }
      })
      case "rollback_to_timestamp" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "timestamp_ms" -> LongType),
          Seq("previous_snapshot_id" -> LongType,
            "current_snapshot_id" -> LongType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val prev = t.metadata.currentSnapshotId.getOrElse(-1L)
          val cur = graft.table.Maintenance
            .rollbackToTimestamp(t, a.getLong(1))
            .metadata.currentSnapshotId.getOrElse(-1L)
          Seq(prev, cur)
        }
      })
      case "publish_changes" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "wap_id" -> StringType),
          Seq("source_snapshot_id" -> LongType,
            "current_snapshot_id" -> LongType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val wapId = a.getUTF8String(1).toString
          val srcId = t.metadata.snapshots
            .find(_.summary.get("wap.id").contains(wapId))
            .map(_.snapshotId).getOrElse(-1L)
          val cur = graft.table.Maintenance.publishChanges(t, wapId)
            .metadata.currentSnapshotId.getOrElse(-1L)
          Seq(srcId, cur)
        }
      })
      case "drop_branch" | "drop_tag" => Some(new Proc(catalog, name,
          Seq("table" -> StringType,
            (if (name == "drop_branch") "branch" else "tag") -> StringType),
          Seq("ref" -> StringType, "snapshot_id" -> LongType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val ref = a.getUTF8String(1).toString
          require(ref != "main", "cannot drop the main branch")
          val wantType = if (procName == "drop_branch") "branch" else "tag"
          val r = t.metadata.refs.getOrElse(ref,
            throw new IllegalArgumentException(s"unknown ref: $ref"))
          require(r.refType == wantType,
            s"$ref is a ${r.refType}, not a $wantType")
          t.removeRef(ref)
          Seq(str(ref), r.snapshotId)
        }
      })
      case "snapshot" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "dest" -> StringType),
          Seq("dest" -> StringType, "snapshot_id" -> LongType)) {
        def run(a: InternalRow): Seq[Any] = {
          val dest = a.getUTF8String(1).toString
          val snap = graft.table.Maintenance.snapshotTable(table(a), dest)
          Seq(str(dest), snap.metadata.currentSnapshotId.getOrElse(-1L))
        }
      })
      case "set_current_snapshot" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "snapshot_id" -> LongType),
          Seq("previous_snapshot_id" -> LongType,
            "current_snapshot_id" -> LongType)) {
        // Iceberg's set_current_snapshot: rollbackTo already moves the
        // head to ANY existing snapshot (forward or back), which is the
        // whole contract — the separate name is the Java procedure surface
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val prev = t.metadata.currentSnapshotId.getOrElse(-1L)
          val cur = t.rollbackTo(a.getLong(1))
            .metadata.currentSnapshotId.getOrElse(-1L)
          Seq(prev, cur)
        }
      })
      case "rewrite_position_delete_files" => Some(new Proc(catalog, name,
          Seq("table" -> StringType),
          Seq("rewritten_delete_files_count" -> IntegerType,
            "added_delete_files_count" -> IntegerType)) {
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a).rewritePositionDeletes(spark)
          val s = t.metadata.currentSnapshot.map(_.summary).getOrElse(Map.empty)
          Seq(s.getOrElse("rewritten-delete-files", "0").toInt,
            s.getOrElse("added-delete-files", "0").toInt)
        }
      })
      case "ancestors_of" => Some(new Proc(catalog, name,
          Seq("table" -> StringType),
          Seq("snapshot_id" -> LongType, "timestamp_ms" -> LongType)) {
        def run(a: InternalRow): Seq[Any] = Nil
        override def runRows(a: InternalRow): Seq[Seq[Any]] = {
          val md = table(a).metadata
          val byId = md.snapshots.map(s => s.snapshotId -> s).toMap
          Iterator.iterate(md.currentSnapshotId.flatMap(byId.get))(
            _.flatMap(_.parentSnapshotId).flatMap(byId.get))
            .takeWhile(_.isDefined).flatten
            .map(s => Seq[Any](s.snapshotId, s.timestampMs)).toSeq
        }
      })
      case "register_table" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "metadata_file" -> StringType),
          Seq("current_snapshot_id" -> LongType, "total_records" -> LongType)) {
        def run(a: InternalRow): Seq[Any] = {
          val md = catalog.registerTable(a.getUTF8String(0).toString,
            a.getUTF8String(1).toString)
          Seq(md.currentSnapshotId.getOrElse(-1L),
            md.currentSnapshot.flatMap(_.summary.get("total-records"))
              .map(_.toLong).getOrElse(-1L))
        }
      })
      case "add_files" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "source_dir" -> StringType),
          Seq("added_files_count" -> IntegerType)) {
        // Iceberg's add_files migration procedure, directory form: adopt
        // every parquet file under source_dir in place (no copy)
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val paths = t.io.listFiles(a.getUTF8String(1).toString)
            .map(_._1).filter(_.endsWith(".parquet")).sorted
          t.addFiles(spark, paths)
          Seq(paths.size)
        }
      })
      case "compute_table_stats" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "columns" -> StringType),
          Seq("statistics_path" -> StringType)) {
        // Java's compute_table_stats: NDV sketches per column into a
        // Puffin statistics file registered in table metadata
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val cols0 = a.getUTF8String(1).toString
          val cols =
            if (cols0.isEmpty)
              t.schema.fields.filter(_.fieldType.isPrimitive).map(_.name)
            else cols0.split(",").map(_.trim).toSeq
          val (withStats, _) =
            graft.puffin.Sketches.writeDistinctStats(t, spark, cols)
          Seq(str(withStats.metadata.statistics.lastOption
            .map(_.statisticsPath).getOrElse("")))
        }
      })
      case "create_changelog_view" => Some(new Proc(catalog, name,
          Seq("table" -> StringType, "view" -> StringType,
            "net_changes" -> BooleanType),
          Seq("view_name" -> StringType, "change_count" -> LongType)) {
        // Iceberg's create_changelog_view procedure: register the CDC
        // frame (inserts + parent-resolved deletes per snapshot, with
        // _change_type/_change_ordinal/_commit_snapshot_id) as a temp
        // view so downstream SQL can consume row-level changes
        def run(a: InternalRow): Seq[Any] = {
          val t = table(a)
          val viewName = a.getUTF8String(1).toString
          val head = t.metadata.currentSnapshotId.getOrElse(
            throw new IllegalArgumentException("table has no snapshots"))
          val sess = SparkSession.getDefaultSession.getOrElse(spark)
          val df = graft.table.Changelog.changesBetween(
            t, sess, fromSnapshotId = -1L, toSnapshotId = head,
            netChanges = a.getBoolean(2))
          // the frame rides the scan-conf session CLONE (SessionConf), so
          // a plain createOrReplaceTempView would register the view on the
          // clone and strand it — rebind the plan onto the USER's session
          org.apache.spark.sql.GraftBridge
            .ofRows(sess, df.queryExecution.logical)
            .createOrReplaceTempView(viewName)
          Seq(str(viewName), df.count())
        }
      })
      case _ => None
    }
  }

  val Names: Seq[String] = Seq("rewrite_data_files",
    "rewrite_data_files_zorder", "rewrite_manifests",
    "expire_snapshots", "remove_orphan_files", "rollback_to_snapshot",
    "create_branch", "create_tag", "fast_forward",
    "add_partition_field", "drop_partition_field", "write_partition_stats",
    "create_changelog_view")
}
