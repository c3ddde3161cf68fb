package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming stateful operators over event streams — the
  * streaming twins of the batch pipeline ops (graft.pipeline.Sessions):
  *
  *   - `sessionize`: gap-based sessions via `flatMapGroupsWithState` with
  *     an event-time timeout. State per user is ONE open session (three
  *     longs) — at 100 TB/day of events the state store holds
  *     O(active users), not O(events), and sessions close themselves when
  *     the watermark passes their gap horizon (no unbounded growth).
  *   - `windowedCounts`: watermarked tumbling-window aggregation, the
  *     append-mode "finalized windows only" shape.
  *
  * Both run identically over a graft streaming read
  * (`spark.readStream.format("graft")`) or any other source.
  */
object StatefulSessions {

  final case class SessionEvent(user_id: Long, ts: Timestamp)

  /** Open-session state: event-time bounds in µs + event count. */
  final case class OpenSession(startUs: Long, endUs: Long, events: Long)

  /** One CLOSED session (append-mode output). Bounds in integer µs,
    * matching the batch operator's (start_us, end_us) columns. */
  final case class UserSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  /** Gap-sessionize a stream with columns (user_id, ts). Sessions are
    * emitted when CLOSED — by a later event past the gap, or by the
    * event-time timeout once the watermark passes end + gap. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processGroup(gapUs))
  }

  /** Per-group transition: fold the batch's events (in event-time order)
    * into the open session, emitting every session a gap closes; on
    * timeout emit the open session and clear state. Exposed for direct
    * unit testing. */
  private[streaming] def processGroup(gapUs: Long)(
      user: Long, events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[UserSession] = {
    def emit(s: OpenSession) = UserSession(user, s.startUs, s.endUs, s.events)

    if (state.hasTimedOut) {
      val out = state.getOption.map(emit)
      state.remove()
      return out.iterator
    }

    val sorted = events.toArray.sortBy(_.ts.getTime)
    val closed = Seq.newBuilder[UserSession]
    var open = state.getOption
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
      open match {
        case Some(s) if us - s.endUs > gapUs =>
          closed += emit(s)
          open = Some(OpenSession(us, us, 1L))
        case Some(s) =>
          open = Some(OpenSession(math.min(s.startUs, us),
            math.max(s.endUs, us), s.events + 1L))
        case None =>
          open = Some(OpenSession(us, us, 1L))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.endUs / 1000L + gapUs / 1000L)
    }
    closed.result().iterator
  }

  /** Watermarked tumbling-window counts per event_type: in append mode
    * only FINALIZED windows (watermark past window end) are emitted —
    * the exactly-once windowed rollup a streaming ingest feeds into a
    * graft table. */
  def windowedCounts(events: DataFrame, windowMinutes: Int = 60,
      watermarkMinutes: Int = 30): DataFrame =
    events
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"))
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))
}
