package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming anomaly gate: finalized day counts judged with the batch
  * operator's integer inequality — streamed and batch verdicts must
  * agree. */
class StreamingAnomaliesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-anomalies-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val DayMs = 86400000L
  private def ts(day: Long, i: Long): Timestamp =
    new Timestamp((day + 1) * DayMs + i * 1000L) // day+1: late-data margin

  test("judge matches the batch inequality on hand history") {
    val steady = (0L until 7L).map(d => (d, 10L))
    assert(StreamingAnomalies.judge(steady, 100L) === Some(true))
    assert(StreamingAnomalies.judge(steady, 10L) === Some(false))
    assert(StreamingAnomalies.judge(steady.take(6), 100L) === None)
    // zero variance: any deviation flags, equality does not
    assert(StreamingAnomalies.judge(steady, 11L) === Some(true))
  }

  test("streamed day verdicts equal the batch operator's on the same events") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // 8 days of data for type "a": 7 steady days of 4 events, then a
    // spike day of 40; a trailing day-9 event advances the watermark so
    // day 8 finalizes
    val days = (0L until 7L).flatMap(d => (0L until 4L).map(i => ("a", ts(d, i)))) ++
      (0L until 40L).map(i => ("a", ts(7L, i)))
    val source = MemoryStream[(String, Timestamp)]
    val q = StreamingAnomalies.anomalies(
        source.toDF().toDF("event_type", "ts"), watermarkMinutes = 60)
      .writeStream.format("memory").queryName("anom_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    source.addData(days: _*)
    q.processAllAvailable()
    source.addData(("a", ts(9L, 0L))) // watermark push: day 8 finalizes
    q.processAllAvailable()
    source.addData(("a", ts(12L, 0L)))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("anom_out")
      .select(col("day"), col("n"), col("anomaly"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getBoolean(2))))).toMap

    // batch twin over the identical event set
    val batch = graft.pipeline.Sessions.dailyAnomalies(
        days.zipWithIndex.map { case ((t, time), i) => (i.toLong, t, time) }
          .toDF("event_id", "event_type", "ts"))
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getBoolean(3))))).toMap

    // every batch day that the stream finalized must agree exactly
    batch.foreach { case (day, verdict) =>
      streamed.get(day).foreach(sv => assert(sv === verdict,
        s"day $day: stream $sv vs batch $verdict"))
    }
    // the spike day finalized and flagged
    val spike = streamed.collect { case (d, (40L, v)) => (d, v) }
    assert(spike.nonEmpty, s"spike day not finalized: $streamed")
    assert(spike.head._2 === Some(true), s"got $streamed")
  }
}
