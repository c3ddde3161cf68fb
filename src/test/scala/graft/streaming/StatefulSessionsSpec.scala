package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Stateful streaming: flatMapGroupsWithState sessionization with
  * event-time timeouts, and watermarked windowed aggregation. */
class StatefulSessionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("stateful-sessions-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // offset from epoch 0: an event AT the initial watermark (0) is dropped
  // as late data by the stateful operator's boundary predicate
  private val Base = 24L * 60 // minutes
  private def ts(minutes: Long): Timestamp = new Timestamp((Base + minutes) * 60000L)
  private def us(minutes: Long): Long = (Base + minutes) * 60000000L

  test("streaming sessionize: gap closes a session, emitted once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val source = MemoryStream[(Long, Timestamp)]
    val sessions = StatefulSessions.sessionize(
      source.toDF().toDF("user_id", "ts"), gapMinutes = 30)

    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // user 1: two events 5 min apart (one session); user 2: one event
    source.addData((1L, ts(0)), (1L, ts(5)), (2L, ts(1)))
    q.processAllAvailable()
    // 2 hours later: the in-batch gap closes user 1's first session
    // immediately; the watermark advance times out user 2's
    source.addData((1L, ts(120)))
    q.processAllAvailable()
    // one more advance so the timeout fires in a batch that sees it
    source.addData((3L, ts(240)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions_out")
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(_.toString).sorted.toSeq
    assert(out.contains(s"[1,${us(0)},${us(5)},2]"), s"user1 session missing: $out")
    assert(out.contains(s"[2,${us(1)},${us(1)},1]"), s"user2 timeout session missing: $out")
    // the 240-min watermark advance times out user 1's 120-min session too
    assert(out.contains(s"[1,${us(120)},${us(120)},1]"), s"got $out")
    // user 3's session is still open (nothing advanced the watermark past
    // 240 + gap) — never emitted
    assert(!out.exists(_.startsWith("[3,")), s"got $out")
  }

  test("processGroup folds multi-session batches in event-time order") {
    import StatefulSessions._
    val gapUs = 30L * 60 * 1000000L
    // harness state stub
    var stored: Option[OpenSession] = None
    val state = new org.apache.spark.sql.streaming.GroupState[OpenSession] {
      override def exists: Boolean = stored.isDefined
      override def get: OpenSession = stored.get
      override def getOption: Option[OpenSession] = stored
      override def update(s: OpenSession): Unit = stored = Some(s)
      override def remove(): Unit = stored = None
      override def hasTimedOut: Boolean = false
      override def setTimeoutDuration(d: Long): Unit = ()
      override def setTimeoutDuration(d: String): Unit = ()
      override def setTimeoutTimestamp(t: Long): Unit = ()
      override def setTimeoutTimestamp(t: Long, add: String): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
      override def getCurrentWatermarkMs(): Long = 0L
      override def getCurrentProcessingTimeMs(): Long = 0L
    }
    // out-of-order events spanning two gaps: sorted → 3 sessions, 2 closed
    val events = Seq(ts(100), ts(0), ts(5), ts(200), ts(101))
      .map(t => SessionEvent(7L, t)).iterator
    val closed = processGroup(gapUs)(7L, events, state).toSeq
    assert(closed == Seq(
      UserSession(7L, us(0), us(5), 2),
      UserSession(7L, us(100), us(101), 2)))
    assert(stored.contains(OpenSession(us(200), us(200), 1)))
  }

  test("watermarked windowed counts emit only finalized windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val source = MemoryStream[(Timestamp, String)]
    val counts = StatefulSessions.windowedCounts(
      source.toDF().toDF("ts", "event_type"),
      windowMinutes = 60, watermarkMinutes = 30)

    val q = counts.writeStream
      .format("memory").queryName("window_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()

    source.addData((ts(10), "click"), (ts(20), "click"), (ts(40), "view"))
    q.processAllAvailable()
    // advance the watermark far enough to finalize the first hour
    source.addData((ts(200), "click"))
    q.processAllAvailable()
    source.addData((ts(400), "click"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("window_out")
      .select("window_start", "event_type", "n_events")
      .collect().map(_.toString).sorted.toSeq
    assert(out.contains("[1970-01-02 00:00:00.0,click,2]"), s"got $out")
    assert(out.contains("[1970-01-02 00:00:00.0,view,1]"), s"got $out")
    // hour starting at 180 min finalized by the 400-min event
    assert(out.contains("[1970-01-02 03:00:00.0,click,1]"), s"got $out")
  }
}
