package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the real-time twin of the batch
  * [[graft.pipeline.Sessions.funnel]] (strict step order, whole funnel
  * inside `windowUs` of step 1).
  *
  * Per-user state is O(steps) longs in the state store (never the event
  * history): each incoming event can only advance the next unfilled
  * step. A user emits exactly ONE row — on completing the final step
  * (immediately: the conversion-alerting path) or on the event-time
  * timeout once the watermark passes t1 + window (the funnel can no
  * longer advance, so the partial depth is final). After emission a
  * DONE marker absorbs stray events until its own timeout reclaims the
  * store slot.
  *
  * Reconciliation contract with the batch operator: for in-watermark,
  * event-time-ordered input, emitted (user_id, steps_completed, t1_us,
  * t_last_us) match the batch funnel restricted to users whose horizon
  * passed. Out-of-order step-1 events inside the watermark may pin a
  * later t1 than the batch min — the documented streaming approximation
  * (state holds step times, not event history).
  */
object StreamingFunnel {

  final case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)

  /** stepUs(i) = µs time step i+1 was reached; -1 = unreached.
    * done = row already emitted, absorbing until timeout. */
  final case class FunnelState(stepUs: Seq[Long], done: Boolean)

  final case class FunnelResult(user_id: Long, steps_completed: Int,
      t1_us: Long, t_last_us: Long, converted: Boolean)

  /** Funnel a stream with columns (user_id, event_type, ts). */
  def funnel(events: DataFrame, steps: Seq[String],
      windowMinutes: Int = 7 * 24 * 60,
      watermarkMinutes: Int = 60): Dataset[FunnelResult] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type").cast("string").as("event_type"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processGroup(steps, windowMinutes * 60L * 1000000L))
  }

  /** Per-group transition, exposed for direct unit testing. */
  private[streaming] def processGroup(steps: Seq[String], windowUs: Long)(
      user: Long, events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelResult] = {
    def result(s: Seq[Long], converted: Boolean) = {
      val reached = s.takeWhile(_ >= 0)
      FunnelResult(user, reached.size, reached.headOption.getOrElse(-1L),
        reached.lastOption.getOrElse(-1L), converted)
    }

    if (state.hasTimedOut) {
      val out = state.getOption match {
        case Some(FunnelState(s, false)) => Iterator(result(s, converted = false))
        case _ => Iterator.empty // DONE marker reclaimed silently
      }
      state.remove()
      return out
    }

    val sorted = events.toArray.sortBy(_.ts.getTime)
    var st = state.getOption.getOrElse(
      FunnelState(Seq.fill(steps.size)(-1L), done = false))
    val emitted = Seq.newBuilder[FunnelResult]
    sorted.foreach { e =>
      if (!st.done) {
        val us = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
        val next = st.stepUs.indexWhere(_ < 0)
        if (next >= 0 && e.event_type == steps(next)) {
          val inOrder = next == 0 || us >= st.stepUs(next - 1)
          val inWindow = next == 0 || us - st.stepUs.head <= windowUs
          if (inOrder && inWindow) {
            st = FunnelState(st.stepUs.updated(next, us), done = false)
            if (next == steps.size - 1) { // conversion: emit immediately
              emitted += result(st.stepUs, converted = true)
              st = FunnelState(st.stepUs, done = true)
            }
          }
        }
      }
    }
    state.update(st)
    // horizon: nothing can change after t1 + window (or, with no t1 yet,
    // keep a rolling window-sized lease so empty state self-reclaims)
    val horizonUs =
      if (st.stepUs.head >= 0) st.stepUs.head + windowUs
      else sorted.lastOption.map(e => e.ts.getTime * 1000L + windowUs)
        .getOrElse(windowUs)
    state.setTimeoutTimestamp(horizonUs / 1000L)
    emitted.result().iterator
  }
}
