package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}

import graft.pipeline.Membership
import graft.table.GraftTable

/** Continuous EXACT ingest dedup — the full production admission loop
  * over the persisted membership artifact ([[graft.pipeline.Membership]]):
  * probe → admit → atomically fold, per trigger, so each trigger's
  * admissions are visible to the next trigger's probe.
  *
  * Planned as a BATCH query per trigger (foreachBatch), like
  * [[StreamingLsh.probeIndexPruned]] and for the same reason: the probe
  * needs the trigger's data driver-side (touched buckets, candidate
  * keys) and the corpus table reloads from its catalog per trigger —
  * reload-is-refresh on any backend.
  */
object StreamingMembership {

  /** The streaming loop: per trigger, reload the corpus table, run
    * [[Membership.ingestBatch]] (probe → first-per-key admission →
    * atomic fold), and hand the ADMITTED rows to `sink`. Delivery is
    * AT-LEAST-ONCE: the emit runs before the fold commits, so a trigger
    * replayed after a crash between emit and fold re-emits its
    * admissions (and a replay after the fold emits nothing — the table
    * itself is exactly-once, see ingestBatch's scaladoc); idempotent
    * sinks key on (batchId, rows). */
  def dedupIngest(rows: DataFrame, corpusName: String,
      catalog: graft.catalog.Catalog, keyCol: String, orderCol: String)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val t = GraftTable.load(corpusName, catalog)
      Membership.ingestBatch(t, batch, keyCol, orderCol,
        adm => sink(adm, batchId))
      ()
    }
}
