package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.Catalog
import graft.table.{AppendWriter, GraftTable}

/** Structured Streaming ingest: `readStream → transforms → Graft table`,
  * each micro-batch one atomic append commit.
  *
  * Exactly-once: the (queryId, batchId) pair is recorded in the snapshot
  * summary; on restart-replay (checkpoint rewind) an already-committed
  * batch is skipped, so stream retries never double-append — the same
  * idempotence contract the reference's transactional writers give batch
  * engines, extended to streaming. The table's optimistic-retry CAS
  * handles concurrent batch/stream writers.
  *
  * Scale: each micro-batch runs the normal distributed append (executors
  * write + harvest); commit cost is O(files in batch) metadata, so
  * steady-state streams should compact periodically (rewriteDataFiles)
  * like any Iceberg deployment.
  */
object GraftStreamWriter {

  val QueryIdKey = "streaming-query-id"
  val BatchIdKey = "streaming-batch-id"

  /** Start the stream. Caller owns the checkpoint location (Spark's
    * offset log) — the table summary only guards the commit side.
    *
    * Idempotence keys on Spark's STABLE streaming query id (the
    * `StreamingQuery.id` persisted in the checkpoint metadata, exposed to
    * foreachBatch via the `sql.streaming.queryId` local property) — NOT
    * runId or job description, which change on every restart and would
    * defeat replay detection after a checkpoint rewind. */
  def start(stream: DataFrame, tableName: String, catalog: Catalog,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val queryId = Option(batch.sparkSession.sparkContext.getLocalProperty(
          "sql.streaming.queryId")).getOrElse(
          throw new IllegalStateException(
            "sql.streaming.queryId local property unset inside foreachBatch; " +
              "cannot establish an exactly-once commit key"))
        commitBatch(tableName, catalog, batch, queryId, batchId)
        ()
      }
      .start()

  /** One micro-batch append, skipped if this query already committed this
    * batch id or a later one (checkpoint replay after failure). Batch ids
    * are compared only WITHIN the same query id — two independent streams
    * writing to one table never mask each other's batches. */
  def commitBatch(tableName: String, catalog: Catalog, batch: DataFrame,
      queryId: String, batchId: Long): GraftTable = {
    val table = GraftTable.load(tableName, catalog)
    if (alreadyCommitted(table, queryId, batchId)) table
    else AppendWriter.append(table, batch,
      Map(QueryIdKey -> queryId, BatchIdKey -> batchId.toString))
  }

  private def alreadyCommitted(table: GraftTable, queryId: String,
      batchId: Long): Boolean =
    table.metadata.snapshots
      .filter(_.summary.get(QueryIdKey).contains(queryId))
      .flatMap(_.summary.get(BatchIdKey))
      .exists(_.toLong >= batchId)

  /** UPSERT-mode streaming sink (Flink's `upsert=true` shape): each
    * micro-batch lands as ONE atomic eq-delete+append commit on
    * `keyCols` — a key seen again replaces its earlier row; a key never
    * seen inserts. Within one micro-batch duplicate keys collapse first
    * (`dropDuplicates` — micro-batches carry no row order, so upstream
    * should pre-aggregate if last-event-wins matters). Same
    * (queryId, batchId) exactly-once replay skip as the append sink. */
  def startUpsert(stream: DataFrame, tableName: String, catalog: Catalog,
      keyCols: Seq[String], checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val queryId = Option(batch.sparkSession.sparkContext.getLocalProperty(
          "sql.streaming.queryId")).getOrElse(
          throw new IllegalStateException(
            "sql.streaming.queryId local property unset inside foreachBatch; " +
              "cannot establish an exactly-once commit key"))
        commitUpsertBatch(tableName, catalog, batch, keyCols, queryId, batchId)
        ()
      }
      .start()

  def commitUpsertBatch(tableName: String, catalog: Catalog, batch: DataFrame,
      keyCols: Seq[String], queryId: String, batchId: Long): GraftTable = {
    val table = GraftTable.load(tableName, catalog)
    if (alreadyCommitted(table, queryId, batchId)) table
    else graft.table.DeleteWriter.upsert(table,
      batch.dropDuplicates(keyCols), keyCols, batch.sparkSession,
      Map(QueryIdKey -> queryId, BatchIdKey -> batchId.toString))
  }
}
