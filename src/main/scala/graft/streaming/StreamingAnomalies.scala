package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch daily-anomaly gate
  * ([[graft.pipeline.Sessions.dailyAnomalies]]): per event_type, a
  * rolling ring of the last 7 FINALIZED day counts; each day that
  * finalizes (watermark passes its end) is judged against the trailing
  * window with the SAME integer inequality as the batch op —
  * 2·(7n−S)² > 21·(7·SS−S²) ⟺ |z| > 3 — so a streamed day and a
  * batch-recomputed day can never disagree.
  *
  * State per event_type: the open day's count plus ≤7 (day, count)
  * history pairs — O(1), independent of event volume. Days finalize in
  * event-time order via the timeout (watermark ≥ end of the open day);
  * a late event for a finalized day is dropped (the watermark already
  * passed it — the same contract Spark's windowed aggregates apply).
  */
object StreamingAnomalies {

  final case class TypedEvent(event_type: String, ts: Timestamp)

  /** openDay/-Count: the day currently accumulating. history: the last
    * ≤7 finalized (day, n) pairs, oldest first. */
  final case class DayState(openDay: Long, openCount: Long,
      history: Seq[(Long, Long)])

  final case class DayVerdict(event_type: String, day: Long, n: Long,
      anomaly: Option[Boolean])

  private val DayUs = 86400L * 1000000L

  def anomalies(events: DataFrame, watermarkMinutes: Int = 60): Dataset[DayVerdict] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type").cast("string").as("event_type"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .as[TypedEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processGroup)
  }

  /** Judge a finalized day against the trailing ≤7-day history with the
    * batch op's integer inequality. None until 7 days of history. */
  private[streaming] def judge(history: Seq[(Long, Long)], n: Long): Option[Boolean] =
    if (history.size < 7) None
    else {
      val ns = history.takeRight(7).map(_._2)
      val s = ns.sum
      val ss = ns.map(x => x * x).sum
      Some(2 * (7 * n - s) * (7 * n - s) > 21 * (7 * ss - s * s))
    }

  private[streaming] def processGroup(
      key: String, events: Iterator[TypedEvent],
      state: GroupState[DayState]): Iterator[DayVerdict] = {
    val out = Seq.newBuilder[DayVerdict]

    def finalizeDay(st: DayState): DayState = {
      out += DayVerdict(key, st.openDay, st.openCount,
        judge(st.history, st.openCount))
      DayState(-1L, 0L,
        (st.history :+ (st.openDay, st.openCount)).takeRight(7))
    }

    if (state.hasTimedOut) {
      state.getOption.filter(_.openDay >= 0).foreach { st =>
        val closed = finalizeDay(st)
        state.update(closed)
        // keep history alive one more window in case the type goes quiet
        state.setTimeoutTimestamp((st.openDay + 2) * DayUs / 1000L)
      }
      return out.result().iterator
    }

    val sorted = events.toArray.sortBy(_.ts.getTime)
    var st = state.getOption.getOrElse(DayState(-1L, 0L, Nil))
    sorted.foreach { e =>
      val day = e.ts.getTime * 1000L / DayUs
      if (st.openDay < 0) st = DayState(day, 1L, st.history)
      else if (day == st.openDay) st = st.copy(openCount = st.openCount + 1L)
      else if (day > st.openDay) {
        // event-time order within the sorted batch: finalize, then open
        st = finalizeDay(st).copy(openDay = day, openCount = 1L)
      }
      // day < openDay: late event for a finalized day — dropped
    }
    state.update(st)
    if (st.openDay >= 0)
      state.setTimeoutTimestamp((st.openDay + 1) * DayUs / 1000L)
    out.result().iterator
  }
}
