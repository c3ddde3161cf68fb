package graft.table

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.expr.Predicate
import graft.meta._

/** Copy-on-write row-level operations: OVERWRITE WHERE and UPDATE WHERE
  * (reference Operation::Overwrite, snapshot.rs:40-60 — replace matching
  * rows in one atomic snapshot).
  *
  * Shape: candidate files come from pruned planning; files whose stats
  * prove a full match are simply dropped, boundary files are rewritten
  * keeping their non-matching rows; replacement rows append. All data
  * movement is executor-side (the rewrite is a filtered scan → staged
  * write over ONLY the touched files — at 100 TB an overwrite of one
  * partition never reads the other 99.9%).
  */
object RowOps {

  /** Atomically delete rows matching `predicate` and insert `replacement`.
    * CoW: touched files are dropped/rewritten in the same snapshot. */
  def overwriteWhere(table: GraftTable, predicate: Predicate,
      replacement: DataFrame, spark: SparkSession): GraftTable = {
    val bound = Predicate.bind(predicate, table.schema)
    val tasks = table.newScan().withFilter(bound).planFiles()

    val (whole, partial) = tasks.partition(t =>
      graft.expr.StrictMetricsEvaluator.fileMustMatch(bound, t.file, table.schema))

    // survivors of boundary files (rows NOT matching) must be rewritten —
    // read through the scan's task reader so existing MoR deletes are
    // folded in (a raw parquet read would resurrect deleted rows)
    val survivors =
      if (partial.isEmpty) None
      else Some(table.newScan().readTasks(spark, partial)
        .filter(!Predicate.toColumn(bound, table.schema)))

    val newData = (survivors, Option(replacement)) match {
      case (Some(s), Some(r)) => Some(s.unionByName(r.select(s.columns.map(col): _*)))
      case (Some(s), None) => Some(s)
      case (None, Some(r)) => Some(r)
      case (None, None) =>
        if (whole.isEmpty) return table // nothing matched, nothing to insert
        None // pure whole-file drop: still commits the manifest rewrite
    }

    val commitUuid = UUID.randomUUID().toString
    val newFiles = newData
      .map(d => AppendWriter.writeDataFiles(table, d, commitUuid))
      .getOrElse(Nil)
    val dropPaths = (whole ++ partial).map(_.file.filePath).toSet

    Commits.commit(table, "overwrite", commitUuid, Map(
      "deleted-data-files" -> dropPaths.size.toString,
      "added-data-files" -> newFiles.size.toString)) { (base, seq, snapshotId) =>
      Commits.validateReplace(table.io, base, table.metadata.currentSnapshotId,
        dropPaths, Commits.conflictFilterFor(base, "delete", bound), table.schema,
        failOnDeletesApplyingTo = dropPaths)
      val rewritten = Commits.rewriteManifestsDropping(table.io, base, dropPaths,
        commitUuid, snapshotId, seq)
      val added =
        if (newFiles.isEmpty) Nil
        else {
          val entries = newFiles.map(f => ManifestEntry(ManifestStatus.Added,
            Some(snapshotId), Some(seq), Some(seq), f))
          Seq(Commits.writeManifest(table.io, base, s"$commitUuid-m0", entries,
            base.currentSchema, base.defaultSpec, ManifestContent.Data, snapshotId, seq))
        }
      added ++ rewritten
    }
  }

  /** MERGE (upsert): table rows whose key matches a source row are
    * replaced by that source row; unmatched source rows are inserted —
    * one atomic overwrite snapshot.
    *
    * Planning: for a single small key set the candidate files come from
    * an IN-predicate over metadata pruning (clustered/bucketed tables
    * touch only matching files); otherwise every data file is a rewrite
    * candidate (the unavoidable CoW bound — MoR equality deletes are the
    * alternative for huge sparse merges, see equalityDelete). */
  def mergeInto(table: GraftTable, source: DataFrame, keyCols: Seq[String],
      spark: SparkSession): GraftTable = {
    require(keyCols.nonEmpty, "merge requires key columns")
    keyCols.foreach { c =>
      require(table.schema.findField(c).isDefined, s"unknown merge key: $c")
    }
    val keys = source.select(keyCols.map(col): _*).distinct()

    val planPredicate: Predicate = keyCols match {
      case Seq(single) =>
        val vals = keys.limit(10001).collect().map(_.get(0))
        if (vals.length <= 10000)
          graft.expr.SetPred(graft.expr.In, single,
            vals.map(v => sparkToInternal(table, single, v)).toSet)
        else graft.expr.AlwaysTrue
      case _ => graft.expr.AlwaysTrue
    }
    val candidates = table.newScan()
      .withFilter(Predicate.bind(planPredicate, table.schema)).planFiles()

    val survivors =
      if (candidates.isEmpty) None
      else Some(table.newScan().readTasks(spark, candidates)
        .join(keys, keyCols, "left_anti"))
    val ordered = source.select(table.schema.fields.map(f => col(f.name)): _*)
    val newData = survivors.map(_.unionByName(ordered)).getOrElse(ordered)

    val commitUuid = UUID.randomUUID().toString
    val newFiles = AppendWriter.writeDataFiles(table, newData, commitUuid)
    val dropPaths = candidates.map(_.file.filePath).toSet

    Commits.commit(table, "overwrite", commitUuid, Map(
      "merged-data-files" -> dropPaths.size.toString,
      "added-data-files" -> newFiles.size.toString)) { (base, seq, snapshotId) =>
      // merge has no static predicate bounding the conflict region: under
      // serializable isolation ANY concurrently-added data row may match
      // a source key, so the filter is AlwaysTrue (every new file trips)
      Commits.validateReplace(table.io, base, table.metadata.currentSnapshotId,
        dropPaths, Commits.conflictFilterFor(base, "merge", graft.expr.AlwaysTrue),
        table.schema, failOnDeletesApplyingTo = dropPaths)
      val rewritten = Commits.rewriteManifestsDropping(table.io, base, dropPaths,
        commitUuid, snapshotId, seq)
      val added =
        if (newFiles.isEmpty) Nil
        else {
          val entries = newFiles.map(f => ManifestEntry(ManifestStatus.Added,
            Some(snapshotId), Some(seq), Some(seq), f))
          Seq(Commits.writeManifest(table.io, base, s"$commitUuid-m0", entries,
            base.currentSchema, base.defaultSpec, ManifestContent.Data, snapshotId, seq))
        }
      added ++ rewritten
    }
  }

  /** Spark external value → Iceberg-internal scalar for planning. */
  private def sparkToInternal(table: GraftTable, colName: String, v: Any): Any =
    graft.expr.SparkFilters.literal(table.schema, colName, v).getOrElse(v)

  /** UPDATE ... SET assignments WHERE predicate, as a CoW overwrite:
    * matching rows re-emitted with the assignments applied. */
  def updateWhere(table: GraftTable, predicate: Predicate,
      assignments: Map[String, Column], spark: SparkSession): GraftTable = {
    assignments.keys.foreach { c =>
      require(table.schema.findField(c).isDefined, s"unknown update column: $c")
    }
    val bound = Predicate.bind(predicate, table.schema)
    val tasks = table.newScan().withFilter(bound).planFiles()
    if (tasks.isEmpty) return table

    val updated = table.newScan().readTasks(spark, tasks)
      .filter(Predicate.toColumn(bound, table.schema))
      .withColumns(assignments)
    overwriteWhere(table, predicate, updated, spark)
  }
}
