package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming CDC snapshot: the last emission per key must equal the
  * batch LWW operator on the same events — in any arrival order. */
class StreamingCdcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-cdc-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def run(batches: Seq[Seq[(Long, Timestamp, Long, String, Double, String)]],
      name: String): Map[Long, StreamingCdc.SnapshotUpdate] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = StreamingCdc.snapshots(
        source.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // last emission per key wins (memory sink appends update rows in
    // batch order; within one batch each key emits at most once)
    spark.table(name).as[StreamingCdc.SnapshotUpdate].collect()
      .zipWithIndex.groupBy(_._1.user_id)
      .map { case (k, v) => k -> v.maxBy(_._2)._1 }
  }

  test("streamed snapshot converges to the batch LWW operator, any order") {
    import spark.implicits._
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[(Long, Timestamp, Long, String, Double, String)].collect().toSeq

    val batch = graft.pipeline.Sessions.cdcSnapshot(
        graft.Tables.events(spark, "/root/testdata/sf0.001"))
      .select(col("user_id"), col("n_events"), col("last_event_id"),
        col("last_type"), col("last_value_cents"))
      .as[(Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap

    // arrival order 1: event order; arrival order 2: reversed halves
    val (h1, h2) = events.splitAt(events.size / 2)
    Seq("cdc_fwd" -> Seq(h1, h2), "cdc_rev" -> Seq(h2.reverse, h1.reverse))
      .foreach { case (name, batches) =>
        val streamed = run(batches, name)
        val live = streamed.filterNot(_._2.deleted)
        assert(live.keySet === batch.keySet, s"$name key sets differ")
        live.foreach { case (uid, s) =>
          val b = batch(uid)
          assert(s.n_events === b._2, s"$name n_events($uid)")
          assert(s.last_event_id === b._3, s"$name last_event_id($uid)")
          assert(s.last_type === b._4, s"$name last_type($uid)")
          assert(math.round(s.last_value * 100) === b._5, s"$name last_value($uid)")
        }
        // deleted keys are exactly the users the batch op dropped
        val allUsers = events.map(_._3).toSet
        assert(streamed.filter(_._2.deleted).keySet === allUsers -- batch.keySet,
          s"$name tombstones")
      }
  }

  test("per-batch emission: unchanged keys stay silent, tombstone retracts") {
    import spark.implicits._
    val t = (s: String) => Timestamp.valueOf(s)
    val b1 = Seq(
      (1L, t("2024-01-01 10:00:00"), 7L, "signup", 1.0, "{}"),
      (2L, t("2024-01-01 11:00:00"), 8L, "view", 2.0, "{}"))
    val b2 = Seq( // only user 8 changes; user 7 must not re-emit
      (3L, t("2024-01-01 12:00:00"), 8L, "error", 0.0, "{}"))
    implicit val sq = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = StreamingCdc.snapshots(
        source.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("cdc_inc")
      .outputMode(OutputMode.Update)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    source.addData(b1: _*); q.processAllAvailable()
    val after1 = spark.table("cdc_inc").as[StreamingCdc.SnapshotUpdate].collect()
    source.addData(b2: _*); q.processAllAvailable()
    val after2 = spark.table("cdc_inc").as[StreamingCdc.SnapshotUpdate].collect()
    q.stop()
    assert(after1.length === 2 && after1.forall(!_.deleted))
    val delta = after2.drop(after1.length)
    assert(delta.map(_.user_id).toSeq === Seq(8L), "only the changed key emits")
    assert(delta.head.deleted, "tombstone emits a retraction")
  }
}
