package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch CDC last-writer-wins snapshot
  * ([[graft.pipeline.Sessions.cdcSnapshot]]): per key, keep the current
  * winning event under the (ts, event_id) total order and emit the
  * refreshed snapshot row whenever a micro-batch changes it. A key whose
  * winner is the tombstone type emits `deleted = true` — the retraction
  * a downstream upsert sink (e.g. [[GraftStreamWriter]]'s upsert mode)
  * applies as a delete.
  *
  * LWW needs NO watermark: max-by-(ts, id) is order-insensitive, so
  * late or shuffled events converge to the same winner the batch
  * operator picks — the agreement the spec pins. State per key is O(1)
  * (the winner + a count), independent of event volume.
  */
object StreamingCdc {

  final case class CdcEvent(user_id: Long, event_id: Long, ts_us: Long,
      event_type: String, value: Double)

  final case class CdcState(nEvents: Long, tsUs: Long, eventId: Long,
      eventType: String, value: Double)

  /** One snapshot refresh: the key's current row, or its deletion. */
  final case class SnapshotUpdate(user_id: Long, n_events: Long,
      last_event_id: Long, last_ts_us: Long, last_type: String,
      last_value: Double, deleted: Boolean)

  def snapshots(events: DataFrame,
      tombstoneType: String = "error"): Dataset[SnapshotUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    // normalize event time to integer MICROseconds up front (the same
    // unit the batch operator compares on): ms-truncating Timestamp
    // getters would let a sub-ms tie pick a different LWW winner than
    // the batch op; nanos-long inputs divide exactly
    val tsUs = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        tsUs.as("ts_us"),
        col("event_type").cast("string").as("event_type"),
        col("value").cast("double").as("value"))
      .as[CdcEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        processGroup(tombstoneType))
  }

  private[streaming] def processGroup(tombstoneType: String)(
      key: Long, events: Iterator[CdcEvent],
      state: GroupState[CdcState]): Iterator[SnapshotUpdate] = {
    var st = state.getOption.getOrElse(CdcState(0L, Long.MinValue, Long.MinValue, "", 0.0))
    val before = st
    events.foreach { e =>
      val wins = e.ts_us > st.tsUs || (e.ts_us == st.tsUs && e.event_id > st.eventId)
      st = CdcState(st.nEvents + 1L,
        if (wins) e.ts_us else st.tsUs,
        if (wins) e.event_id else st.eventId,
        if (wins) e.event_type else st.eventType,
        if (wins) e.value else st.value)
    }
    if (st == before) Iterator.empty
    else {
      state.update(st)
      Iterator.single(SnapshotUpdate(key, st.nEvents, st.eventId, st.tsUs,
        st.eventType, st.value, deleted = st.eventType == tombstoneType))
    }
  }
}
