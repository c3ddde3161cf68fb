package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.catalog.Catalog
import graft.spec.Json
import graft.table.{Changelog, GraftTable}

/** Streaming-offset for the changelog source: the last snapshot id whose
  * changes have been emitted (same shape as GraftStreamOffset, but a V1
  * `execution.streaming.Offset` — the changelog source is a V1 `Source`
  * because its batches are computed DataFrames, not file splits). */
final case class GraftChangelogOffset(snapshotId: Long)
    extends org.apache.spark.sql.execution.streaming.Offset {
  override def json(): String = Json.obj().put("snapshotId", snapshotId).toString
}

object GraftChangelogOffset {
  def of(o: org.apache.spark.sql.execution.streaming.Offset): GraftChangelogOffset =
    o match {
      case g: GraftChangelogOffset => g
      case other =>
        GraftChangelogOffset(Json.parse(other.json()).get("snapshotId").asLong())
    }
}

/** Streaming READ of the row-level changelog — `spark.readStream
  * .format("graft").option("read-changelog", "true")`: each micro-batch
  * is `Changelog.changesBetween(start, end]` for the snapshot window the
  * offsets advanced over, so inserts AND deletes flow as `_change_type`
  * rows (the CDC surface i23 serves in batch, now tailable). Iceberg's
  * Spark source exposes the same idea as a changelog read; the reference
  * reserves `_change_type` (metadata_columns.rs:53,90).
  *
  * V1 `Source` (not MicroBatchStream): a changelog batch is a COMPUTED
  * DataFrame (parent-scan joins against delete descriptors), not a set of
  * file splits — `getBatch` hands Spark the computed plan's RDD wrapped
  * as a streaming batch. Exactly-once holds the same way as the append
  * stream: offsets are snapshot ids, and a replayed `(start, end]` window
  * recomputes the identical change set from the immutable snapshot chain.
  *
  * Scale shape: per batch the driver walks manifest Avro for the window's
  * snapshots only; row work is the same executor joins as the batch
  * changelog. `_change_ordinal` is per-WINDOW (0-based within the batch),
  * `_commit_snapshot_id` is globally stable — order by it downstream.
  *
  * Options: `net-changes=true` cancels CoW carry-over delete+insert pairs
  * per batch (Iceberg's remove-carryovers semantics);
  * `max-snapshots-per-micro-batch=N` caps how many snapshots one batch's
  * change window spans (admission control — a backfill over deep history
  * becomes N-snapshot windows instead of one giant batch).
  *
  * Admission control rides the same V2 traits the file source uses on the
  * V1 API (`FileStreamSource` precedent — `Source` extends
  * `SparkDataStream`, so `SupportsAdmissionControl` +
  * `SupportsTriggerAvailableNow` apply): `latestOffset(start, limit)`
  * advances at most `max-snapshots-per-micro-batch` snapshots, and
  * `Trigger.AvailableNow` pins the target snapshot at query start, drains
  * to it in admission-sized batches, then stops — instead of Spark's
  * single-batch fallback for plain V1 sources. */
final class GraftChangelogSource(
    spark: SparkSession,
    tableName: String,
    catalog: Catalog,
    options: Map[String, String])
    extends org.apache.spark.sql.execution.streaming.Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def reload(): GraftTable = GraftTable.load(tableName, catalog)

  private val netChanges = options.get("net-changes").contains("true")

  private val maxSnaps =
    GraftMicroBatchStream.positiveIntOption(options, "max-snapshots-per-micro-batch")

  // row-based admission (`max-rows-per-micro-batch`, shared with the
  // append stream): the window extends while the cumulative CHANGE-row
  // weight — added-records + deleted-records, since a changelog batch
  // emits delete rows too — stays under the cap. A single fat snapshot
  // is still one batch (the snapshot is the atomic replay unit), but a
  // backlog of many snapshots drains in row-bounded windows instead of
  // whatever the snapshot-count cap happens to weigh.
  private val maxRows =
    GraftMicroBatchStream.positiveLongOption(options, "max-rows-per-micro-batch")

  private def changeRows(s: graft.spec.Snapshot): Long =
    GraftMicroBatchStream.summaryLong(s, "added-records") +
      GraftMicroBatchStream.summaryLong(s, "deleted-records")

  override val schema: StructType = Changelog.outputSchema(reload())

  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] =
    reload().metadata.currentSnapshotId.map(GraftChangelogOffset(_))

  // Trigger.AvailableNow: pin the drain target at query start (commits
  // racing the query run are left for the next one)
  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(reload().metadata.currentSnapshotId.getOrElse(-1L))

  // the option is the DEFAULT limit; Trigger.Once passes allAvailable
  // instead and must drain the whole backlog in its one batch
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    GraftMicroBatchStream.defaultLimit(maxSnaps, maxRows)

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    // first call of a fresh query hands a null start (V1 contract —
    // FileStreamSource.latestOffset ignores it the same way)
    val from = Option(start) match {
      case Some(o: org.apache.spark.sql.execution.streaming.Offset) =>
        GraftChangelogOffset.of(o).snapshotId
      case Some(o) => Json.parse(o.json()).get("snapshotId").asLong()
      case None => -1L
    }
    var pending = GraftMicroBatchStream.ancestryAfter(reload(), from)
    availableNowTarget.foreach { tgt =>
      val i = pending.indexWhere(_.snapshotId == tgt)
      pending = if (i < 0) Nil else pending.take(i + 1)
    }
    GraftMicroBatchStream.admit(pending, limit, changeRows) match {
      case Some(s) => GraftChangelogOffset(s.snapshotId)
      case None => Option(start).getOrElse(null)
    }
  }

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    reload().metadata.currentSnapshotId.map(GraftChangelogOffset(_)).orNull

  override def getBatch(
      start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset): DataFrame = {
    val from = start.map(GraftChangelogOffset.of(_).snapshotId).getOrElse(-1L)
    val to = GraftChangelogOffset.of(end).snapshotId
    val t = reload()
    // the stream's schema was resolved ONCE at source construction; a
    // mid-stream table schema change would misalign batch rows against
    // it (silent column swap) — fail loudly instead
    val nowSchema = Changelog.outputSchema(t)
    if (nowSchema != schema)
      throw new IllegalStateException(
        s"table ${t.name} changed schema mid-stream (was $schema, " +
          s"now $nowSchema); restart the changelog stream")
    val changes = Changelog.changesBetween(t, spark, from, to, netChanges)
    org.apache.spark.sql.GraftSessionBridge.internalCreateStreamingDataFrame(
      spark, changes.queryExecution.toRdd, schema)
  }

  override def commit(end: org.apache.spark.sql.execution.streaming.Offset): Unit = ()

  override def stop(): Unit = ()
}
