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
    * offset log) — the table summary only guards the commit side. */
  def start(stream: DataFrame, tableName: String, catalog: Catalog,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val queryId = Option(batch.sparkSession.sparkContext.getLocalProperty(
          "spark.job.description")).getOrElse("graft-stream")
        commitBatch(tableName, catalog, batch, queryId, batchId)
        ()
      }
      .start()

  /** One micro-batch append, skipped if (queryId, batchId) was already
    * committed (checkpoint replay after failure). */
  def commitBatch(tableName: String, catalog: Catalog, batch: DataFrame,
      queryId: String, batchId: Long): GraftTable = {
    val table = GraftTable.load(tableName, catalog)
    val alreadyCommitted = table.metadata.snapshots.exists(s =>
      s.summary.get(QueryIdKey).contains(queryId) &&
        s.summary.get(BatchIdKey).exists(_.toLong >= batchId))
    if (alreadyCommitted) table
    else AppendWriter.append(table, batch,
      Map(QueryIdKey -> queryId, BatchIdKey -> batchId.toString))
  }
}
