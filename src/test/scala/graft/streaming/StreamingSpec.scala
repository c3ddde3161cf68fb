package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._
import graft.table.GraftTable

/** Streaming ingest: micro-batch appends with exactly-once replay guard. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "v", DoubleT, required = false)))

  test("memory stream lands as append commits; scan sees all batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-stream-").toString,
      FileIO.fromSpark(spark))
    GraftTable.create("st1", catalog, schema)

    val source = MemoryStream[(Long, Double)]
    source.addData((1L, 0.5), (2L, 1.5))
    val q = GraftStreamWriter.start(
      source.toDF().toDF("id", "v"), "st1", catalog,
      java.nio.file.Files.createTempDirectory("ckpt-").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    q.processAllAvailable()
    source.addData((3L, 2.5))
    q.processAllAvailable()
    q.stop()

    val t = GraftTable.load("st1", catalog)
    assert(t.newScan().toDF(spark).count() === 3)
    // one snapshot per non-empty micro-batch, tagged with batch ids
    val batches = t.metadata.snapshots.flatMap(_.summary.get(GraftStreamWriter.BatchIdKey))
    assert(batches.nonEmpty)
  }

  test("upsert-mode stream: later batches replace keys, restart replays as no-ops") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-upstream-").toString,
      FileIO.fromSpark(spark))
    GraftTable.create("ust", catalog, schema)
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-ups-").toString

    val source = MemoryStream[(Long, Double)]
    def start() = GraftStreamWriter.startUpsert(
      source.toDF().toDF("id", "v"), "ust", catalog, Seq("id"), ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

    source.addData((1L, 0.5), (2L, 1.5))
    val q = start()
    q.processAllAvailable()
    // batch 2: replace key 2, insert key 3
    source.addData((2L, 9.5), (3L, 2.5))
    q.processAllAvailable()
    q.stop()

    val t = GraftTable.load("ust", catalog)
    val got = t.newScan().toDF(spark).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((1L, 0.5), (2L, 9.5), (3L, 2.5)),
      "key 2 must carry the LATEST batch's value")
    assert(t.metadata.currentSnapshot.get.operation === "overwrite")

    // restart on the same checkpoint: committed epochs replay as no-ops,
    // fresh data upserts exactly once
    val before = t.metadata.snapshots.size
    val q2 = start()
    source.addData((3L, 7.5))
    q2.processAllAvailable()
    q2.stop()
    val after = GraftTable.load("ust", catalog)
    assert(after.newScan().toDF(spark).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((1L, 0.5), (2L, 9.5), (3L, 7.5)))
    assert(after.metadata.snapshots.size === before + 1,
      "one new commit for the fresh batch, none for replays")

    // direct failure-replay of an already-committed batch id is a no-op
    val replayed = GraftStreamWriter.commitUpsertBatch("ust", catalog,
      Seq((2L, 0.0)).toDF("id", "v"), Seq("id"),
      queryId = q2.id.toString, batchId = 0)
    assert(replayed.metadata.snapshots.size === before + 1)
  }

  test("native DSv2 streaming sink: writeStream.format(graft) appends per epoch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-sink-").toString
    val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    GraftTable.create("sink1", catalog, schema)

    val source = MemoryStream[(Long, Double)]
    source.addData((1L, 0.5), (2L, 1.5))
    val q = source.toDF().toDF("id", "v").writeStream
      .format("graft")
      .option("warehouse", wh)
      .option("table", "sink1")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-sink-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable()
    source.addData((3L, 2.5))
    q.processAllAvailable()
    q.stop()

    val t = GraftTable.load("sink1", catalog)
    assert(t.newScan().toDF(spark).count() === 3)
    // each committed epoch is tagged for the replay guard
    val tagged = t.metadata.snapshots.flatMap(_.summary.get(GraftStreamWriter.QueryIdKey))
    assert(tagged.nonEmpty && tagged.distinct.size === 1)
    // replaying an already-committed epoch is a no-op
    val epochs = t.metadata.snapshots.flatMap(_.summary.get(GraftStreamWriter.BatchIdKey))
    assert(epochs.map(_.toLong).distinct.size === epochs.size)
  }

  test("native sink restart on the same checkpoint: no duplicates, new data lands once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-sink2-").toString
    val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    GraftTable.create("sink2", catalog, schema)
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-sink2-").toString

    val source = MemoryStream[(Long, Double)]
    def start() = source.toDF().toDF("id", "v").writeStream
      .format("graft").option("warehouse", wh).option("table", "sink2")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()

    source.addData((1L, 0.5), (2L, 1.5))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(GraftTable.load("sink2", catalog).newScan().toDF(spark).count() === 2)

    // restart from the same checkpoint: committed epochs replay as no-ops,
    // fresh data commits exactly once
    val q2 = start()
    source.addData((3L, 2.5))
    q2.processAllAvailable()
    q2.stop()
    val t = GraftTable.load("sink2", catalog)
    assert(t.newScan().toDF(spark).count() === 3)
    assert(t.newScan().toDF(spark).select("id").distinct().count() === 3)
  }

  test("replayed batch id is skipped (exactly-once on checkpoint rewind)") {
    import spark.implicits._
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-stream2-").toString,
      FileIO.fromSpark(spark))
    GraftTable.create("st2", catalog, schema)

    val batch = Seq((1L, 0.5), (2L, 1.5)).toDF("id", "v")
    GraftStreamWriter.commitBatch("st2", catalog, batch, "q1", batchId = 0)
    // failure-replay of the same batch
    GraftStreamWriter.commitBatch("st2", catalog, batch, "q1", batchId = 0)
    val t = GraftTable.load("st2", catalog)
    assert(t.newScan().toDF(spark).count() === 2)
    assert(t.metadata.snapshots.size === 1)
    // a later batch still lands
    GraftStreamWriter.commitBatch("st2", catalog,
      Seq((3L, 2.5)).toDF("id", "v"), "q1", batchId = 1)
    assert(GraftTable.load("st2", catalog).newScan().toDF(spark).count() === 3)
    // a DIFFERENT query's batch 0 is NOT masked by q1's progress: batch ids
    // compare only within a query id, so independent streams never drop data
    GraftStreamWriter.commitBatch("st2", catalog,
      Seq((4L, 3.5)).toDF("id", "v"), "q2", batchId = 0)
    assert(GraftTable.load("st2", catalog).newScan().toDF(spark).count() === 4)
    // ...while q2's own replay of batch 0 is still skipped
    GraftStreamWriter.commitBatch("st2", catalog,
      Seq((4L, 3.5)).toDF("id", "v"), "q2", batchId = 0)
    assert(GraftTable.load("st2", catalog).newScan().toDF(spark).count() === 4)
  }
}
