package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming exact dedup: cross-batch duplicate suppression and
  * watermark-bounded state expiry. */
class StreamingDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-dedup-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("dedupExact suppresses duplicates across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val source = MemoryStream[(Long, String)]
    val q = StreamingDedup.dedupExact(source.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_exact_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()

    source.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
    q.processAllAvailable()
    source.addData((4L, "beta"), (5L, "gamma"), (6L, "alpha"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_exact_out")
      .select("text").as[String].collect().sorted.toSeq
    // one survivor per distinct text, duplicates dropped in- AND
    // cross-batch
    assert(out === Seq("alpha", "beta", "gamma"))
  }

  test("dedupWithinWatermark: horizon-local dups dropped, state expires past it") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val source = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.dedupWithinWatermark(
      source.toDF().toDF("doc_id", "ts", "text"), horizon = "10 minutes")
      .writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // batch 1: dup inside one batch — suppressed
    source.addData((1L, ts(100), "alpha"), (2L, ts(101), "alpha"),
      (3L, ts(102), "beta"))
    q.processAllAvailable()
    // batch 2: dup within the horizon of the first sighting — suppressed
    source.addData((4L, ts(105), "alpha"))
    q.processAllAvailable()
    // batch 3: advance event time far past the horizon so alpha's state
    // expires...
    source.addData((5L, ts(500), "gamma"))
    q.processAllAvailable()
    // batch 4: ...then the SAME text re-admits (state was dropped — the
    // bounded-state contract, long-range dups belong to batch dedup)
    source.addData((6L, ts(501), "alpha"))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_wm_out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 3L, 5L, 6L),
      s"expected horizon-local dedup with expiry, got $ids")
  }
}
