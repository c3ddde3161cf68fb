package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming funnel: strict-order step machine with conversion-time
  * emission and horizon-timeout partials — the real-time twin of
  * graft.pipeline.Sessions.funnel. */
class StreamingFunnelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-funnel-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Base = 24L * 60 // minutes past epoch (late-data margin)
  private def ts(minutes: Long): Timestamp = new Timestamp((Base + minutes) * 60000L)
  private def us(minutes: Long): Long = (Base + minutes) * 60000000L

  private val Steps = Seq("view", "click", "purchase")

  test("streaming funnel: conversion emits immediately, partial on horizon") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val source = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingFunnel.funnel(
      source.toDF().toDF("user_id", "event_type", "ts"), Steps,
      windowMinutes = 60, watermarkMinutes = 10)

    val q = out.writeStream
      .format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // user 1 converts within the window; user 2 stops after click;
    // user 3's purchase comes BEFORE its click (order violation)
    source.addData(
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(10)),
      (2L, "view", ts(0)), (2L, "click", ts(8)),
      (3L, "view", ts(0)), (3L, "purchase", ts(4)), (3L, "click", ts(6)))
    q.processAllAvailable()
    // push the watermark past every horizon (t1 + 60) so partials time out
    source.addData((99L, "view", ts(300)))
    q.processAllAvailable()
    source.addData((98L, "view", ts(600)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("funnel_out")
      .select("user_id", "steps_completed", "t1_us", "t_last_us", "converted")
      .collect().map(_.toString).toSeq

    assert(rows.contains(s"[1,3,${us(0)},${us(10)},true]"), s"got $rows")
    assert(rows.contains(s"[2,2,${us(0)},${us(8)},false]"), s"got $rows")
    // user 3: purchase ignored (click not yet reached), then click lands
    // → depth 2, never converted
    assert(rows.contains(s"[3,2,${us(0)},${us(6)},false]"), s"got $rows")
    // exactly one row per decided user
    assert(rows.count(_.startsWith("[1,")) === 1)
    assert(rows.count(_.startsWith("[2,")) === 1)
    assert(rows.count(_.startsWith("[3,")) === 1)
  }

  test("processGroup: window bound blocks late steps, done state absorbs") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // direct transition-function test via TestGroupState
    val state = org.apache.spark.sql.streaming.TestGroupState.create[StreamingFunnel.FunnelState](
      org.apache.spark.api.java.Optional.empty[StreamingFunnel.FunnelState](),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(1000L), hasTimedOut = false)
    val windowUs = 60L * 60000000L // 60 min
    val events = Iterator(
      StreamingFunnel.FunnelEvent(5L, "view", ts(0)),
      StreamingFunnel.FunnelEvent(5L, "click", ts(30)),
      // purchase AFTER t1 + 60 min → window bound blocks it
      StreamingFunnel.FunnelEvent(5L, "purchase", ts(90)))
    val out = StreamingFunnel.processGroup(Steps, windowUs)(5L, events, state).toSeq
    assert(out.isEmpty, s"no conversion expected: $out")
    assert(state.get.stepUs === Seq(us(0), us(30), -1L))

    // a second batch converting at the boundary (ts = t1 + window exactly)
    val out2 = StreamingFunnel.processGroup(Steps, windowUs)(5L,
      Iterator(StreamingFunnel.FunnelEvent(5L, "purchase", ts(60))), state).toSeq
    assert(out2.map(_.converted) === Seq(true))
    assert(out2.head.steps_completed === 3)
    // done: further purchases are absorbed, nothing re-emits
    val out3 = StreamingFunnel.processGroup(Steps, windowUs)(5L,
      Iterator(StreamingFunnel.FunnelEvent(5L, "purchase", ts(61))), state).toSeq
    assert(out3.isEmpty)
  }
}
