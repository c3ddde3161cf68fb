package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._
import graft.table.GraftTable

/** Streaming READ of a graft table: snapshot-id offsets, checkpointed
  * restart continuation, tail mode, and admission control. */
class StreamReadSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("stream-read-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "v", DoubleT, required = false)))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def readStream(warehouse: String, name: String, extra: (String, String)*) = {
    val r = spark.readStream.format("graft")
      .option("warehouse", warehouse).option("table", name)
    extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  private def runAvailableNow(df: org.apache.spark.sql.DataFrame,
      outDir: String, ckpt: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("offsets round-trip json") {
    val o = GraftStreamOffset(42L)
    assert(GraftStreamOffset.fromJson(o.json()) === o)
  }

  test("backfill then tail: each restart picks up exactly the new snapshots") {
    import spark.implicits._
    val warehouse = tmp("graft-sr-")
    val catalog = new HadoopCatalog(warehouse, FileIO.fromSpark(spark))
    var t = GraftTable.create("sr1", catalog, schema)
    t = t.append(Seq((1L, 0.5), (2L, 1.5)).toDF("id", "v"))
    t = t.append(Seq((3L, 2.5)).toDF("id", "v"))

    val outDir = tmp("sr1-out-"); val ckpt = tmp("sr1-ckpt-")
    runAvailableNow(readStream(warehouse, "sr1"), outDir, ckpt)
    assert(spark.read.parquet(outDir).count() === 3)

    // two more snapshots; the restarted query must deliver ONLY them
    t = t.append(Seq((4L, 3.5)).toDF("id", "v"))
    t = t.append(Seq((5L, 4.5)).toDF("id", "v"))
    runAvailableNow(readStream(warehouse, "sr1"), outDir, ckpt)
    val out = spark.read.parquet(outDir)
    assert(out.count() === 5) // no duplicates from the replayed range
    assert(out.select("id").as[Long].collect().sorted === Array(1L, 2L, 3L, 4L, 5L))
  }

  test("stream-from=latest skips history; filters prune streamed files") {
    import spark.implicits._
    val warehouse = tmp("graft-sr2-")
    val catalog = new HadoopCatalog(warehouse, FileIO.fromSpark(spark))
    var t = GraftTable.create("sr2", catalog, schema)
    t = t.append(Seq((1L, 0.5)).toDF("id", "v")) // history: must NOT appear

    val outDir = tmp("sr2-out-"); val ckpt = tmp("sr2-ckpt-")
    runAvailableNow(readStream(warehouse, "sr2", "stream-from" -> "latest"),
      outDir, ckpt)
    t = t.append(Seq((2L, 1.5), (10L, 9.5)).toDF("id", "v"))
    runAvailableNow(
      readStream(warehouse, "sr2", "stream-from" -> "latest").filter($"id" > 5L),
      outDir, ckpt)
    val out = spark.read.parquet(outDir)
    assert(out.select("id").as[Long].collect().sorted === Array(10L))
  }

  test("readStream.table through the catalog plugin streams appends") {
    import spark.implicits._
    val warehouse = tmp("graft-sr5-")
    val catalog = new HadoopCatalog(warehouse, FileIO.fromSpark(spark))
    var t = GraftTable.create("srt", catalog, schema)
    t = t.append(Seq((1L, 0.5), (2L, 1.5)).toDF("id", "v"))
    t = t.append(Seq((3L, 2.5)).toDF("id", "v"))

    spark.conf.set("spark.sql.catalog.graftrs", "graft.sources.GraftCatalogPlugin")
    spark.conf.set("spark.sql.catalog.graftrs.warehouse", warehouse)
    val outDir = tmp("srt-out-"); val ckpt = tmp("srt-ckpt-")
    val q = spark.readStream.table("graftrs.srt")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(outDir).select("id").as[Long].collect().sorted
      === Array(1L, 2L, 3L))
  }

  test("max-rows-per-micro-batch groups snapshots under the row cap") {
    import spark.implicits._
    val warehouse = tmp("graft-sr4-")
    val catalog = new HadoopCatalog(warehouse, FileIO.fromSpark(spark))
    var t = GraftTable.create("sr4", catalog, schema)
    for (k <- 0 until 5)
      t = t.append((1L to 10L).map(i => (k * 10L + i, i * 1.0)).toDF("id", "v"))

    val outDir = tmp("sr4-out-"); val ckpt = tmp("sr4-ckpt-")
    runAvailableNow(readStream(warehouse, "sr4",
      "max-rows-per-micro-batch" -> "25"), outDir, ckpt)
    assert(spark.read.parquet(outDir).count() === 50)
    // 5 snapshots × 10 rows under a 25-row cap → 2+2+1 snapshots = 3 batches
    val batches = new java.io.File(ckpt, "commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches === 3, s"expected 3 row-capped micro-batches, got $batches")
  }

  test("max-snapshots-per-micro-batch bounds each batch; delete snapshots skip or fail") {
    import spark.implicits._
    val warehouse = tmp("graft-sr3-")
    val catalog = new HadoopCatalog(warehouse, FileIO.fromSpark(spark))
    var t = GraftTable.create("sr3", catalog, schema)
    for (i <- 1 to 4) t = t.append(Seq((i.toLong, i * 1.0)).toDF("id", "v"))
    t = t.deleteWhere(graft.expr.Predicate.eqTo("id", 4L), spark)

    // un-skipped delete snapshot fails the stream
    val failDir = tmp("sr3-fail-")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = readStream(warehouse, "sr3").writeStream.format("parquet")
        .option("path", failDir).option("checkpointLocation", tmp("sr3-fckpt-"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // skipping deletes + 1 snapshot per batch: 5 snapshots → ≥5 batches,
    // appended rows all arrive (delete's row-level change is skipped)
    val outDir = tmp("sr3-out-"); val ckpt = tmp("sr3-ckpt-")
    runAvailableNow(readStream(warehouse, "sr3",
      "streaming-skip-delete-snapshots" -> "true",
      "max-snapshots-per-micro-batch" -> "1"), outDir, ckpt)
    val out = spark.read.parquet(outDir)
    assert(out.select("id").as[Long].collect().sorted === Array(1L, 2L, 3L, 4L))
    val batches = new java.io.File(ckpt, "commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 5, s"expected one micro-batch per snapshot, got $batches")
  }

  test("read-changelog stream equals changesBetween; restart tails new changes") {
    import spark.implicits._
    val warehouse = tmp("graft-sr5-")
    val catalog = new HadoopCatalog(warehouse, FileIO.fromSpark(spark))
    var t = GraftTable.create("sr5", catalog, schema)
    t = t.append(Seq((1L, 0.5), (2L, 1.5), (3L, 2.5)).toDF("id", "v"))
    t = t.append(Seq((4L, 3.5)).toDF("id", "v"))
    t = t.deleteWhere(graft.expr.Predicate.eqTo("id", 2L), spark) // MoR delete
    val firstHead = t.metadata.currentSnapshotId.get

    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v", "_change_type", "_commit_snapshot_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
          r.getLong(3))).toSet

    val outDir = tmp("sr5-out-"); val ckpt = tmp("sr5-ckpt-")
    runAvailableNow(readStream(warehouse, "sr5", "read-changelog" -> "true"),
      outDir, ckpt)
    val streamed = normalize(spark.read.parquet(outDir))
    val batch = normalize(t.changesBetween(spark, -1L, firstHead))
    assert(streamed === batch,
      "streamed changelog must equal changesBetween over the same range")
    assert(streamed.exists(_._3 == "delete"), "MoR delete must flow as a change row")
    assert(streamed.count(_._3 == "insert") === 4)

    // restart after more commits: ONLY the new window's changes arrive
    t = t.append(Seq((5L, 4.5)).toDF("id", "v"))
    t = t.deleteWhere(graft.expr.Predicate.eqTo("id", 1L), spark)
    runAvailableNow(readStream(warehouse, "sr5", "read-changelog" -> "true"),
      outDir, ckpt)
    val total = normalize(spark.read.parquet(outDir))
    val expected = batch ++ normalize(
      t.changesBetween(spark, firstHead, t.metadata.currentSnapshotId.get))
    assert(total === expected, "restart must deliver exactly the new changes")
  }

  test("changelog admission control: max-snapshots caps each batch under AvailableNow") {
    import spark.implicits._
    val warehouse = tmp("graft-sr6-")
    val catalog = new HadoopCatalog(warehouse, FileIO.fromSpark(spark))
    var t = GraftTable.create("sr6", catalog, schema)
    for (i <- 1 to 4) t = t.append(Seq((i.toLong, i * 1.0)).toDF("id", "v"))
    t = t.deleteWhere(graft.expr.Predicate.eqTo("id", 3L), spark)

    val outDir = tmp("sr6-out-"); val ckpt = tmp("sr6-ckpt-")
    runAvailableNow(readStream(warehouse, "sr6", "read-changelog" -> "true",
      "max-snapshots-per-micro-batch" -> "1"), outDir, ckpt)
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "_change_type", "_commit_snapshot_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val streamed = normalize(spark.read.parquet(outDir))
    val batch = normalize(
      t.changesBetween(spark, -1L, t.metadata.currentSnapshotId.get))
    assert(streamed === batch,
      "admission-batched changelog must equal changesBetween over the range")
    // 5 snapshots at 1 per batch: the un-batched V1 fallback would be 1
    val batches = new java.io.File(ckpt, "commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 5, s"expected one micro-batch per snapshot, got $batches")

    // a restarted AvailableNow run with NO new commits must terminate
    // without writing anything (pinned target == checkpointed offset)
    runAvailableNow(readStream(warehouse, "sr6", "read-changelog" -> "true",
      "max-snapshots-per-micro-batch" -> "1"), outDir, ckpt)
    assert(normalize(spark.read.parquet(outDir)) === batch)
  }

  test("changelog admission control: max-rows drains a 100k-row backlog in bounded batches") {
    import spark.implicits._
    val warehouse = tmp("graft-sr8-")
    val catalog = new HadoopCatalog(warehouse, FileIO.fromSpark(spark))
    var t = GraftTable.create("sr8", catalog, schema)
    // 100k-row backlog committed as ten 10k-row snapshots, plus one FAT
    // 30k-row snapshot that exceeds the cap on its own
    for (k <- 0 until 10)
      t = t.append((1L to 10000L).map(i => (k * 10000L + i, 1.0)).toDF("id", "v"))
    t = t.append((1L to 30000L).map(i => (100000L + i, 2.0)).toDF("id", "v"))

    val outDir = tmp("sr8-out-"); val ckpt = tmp("sr8-ckpt-")
    runAvailableNow(readStream(warehouse, "sr8", "read-changelog" -> "true",
      "max-rows-per-micro-batch" -> "25000"), outDir, ckpt)
    val out = spark.read.parquet(outDir)
    assert(out.count() === 130000L)
    assert(out.select("id").distinct().count() === 130000L)
    // window admission by added-records: 10k+10k fits under 25k, a third
    // snapshot would overflow → five 2-snapshot batches; the 30k fat
    // snapshot exceeds the cap alone and still drains as ITS OWN batch
    // (the snapshot is the atomic replay unit) → 6 total
    val batches = new java.io.File(ckpt, "commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches === 6, s"expected 6 row-capped micro-batches, got $batches")
  }

  test("Trigger.Once drains the whole backlog despite per-batch caps") {
    import spark.implicits._
    val warehouse = tmp("graft-sr7-")
    val catalog = new HadoopCatalog(warehouse, FileIO.fromSpark(spark))
    var t = GraftTable.create("sr7", catalog, schema)
    for (i <- 1 to 5) t = t.append(Seq((i.toLong, i * 1.0)).toDF("id", "v"))

    // Spark passes ReadLimit.allAvailable() under Once — a source that
    // self-capped at max-snapshots anyway would deliver 1 snapshot and
    // terminate "successfully" with 4 silently unprocessed
    val outDir = tmp("sr7-out-"); val ckpt = tmp("sr7-ckpt-")
    val q = readStream(warehouse, "sr7", "max-snapshots-per-micro-batch" -> "1")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.Once()).start()
    q.awaitTermination()
    assert(spark.read.parquet(outDir).select("id").as[Long].collect().sorted
      === (1L to 5L).toArray, "Once must deliver every pending snapshot")

    // same contract on the changelog source
    val outC = tmp("sr7c-out-"); val ckptC = tmp("sr7c-ckpt-")
    val qc = readStream(warehouse, "sr7", "read-changelog" -> "true",
      "max-snapshots-per-micro-batch" -> "1")
      .writeStream.format("parquet")
      .option("path", outC).option("checkpointLocation", ckptC)
      .trigger(Trigger.Once()).start()
    qc.awaitTermination()
    assert(spark.read.parquet(outC).count() === 5,
      "Once must deliver the whole changelog backlog")

    // a malformed cap fails at query START with a clear message
    val e = intercept[Exception] {
      readStream(warehouse, "sr7", "max-snapshots-per-micro-batch" -> "0")
        .writeStream.format("noop")
        .option("checkpointLocation", tmp("sr7bad-")).start()
        .awaitTermination()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("max-snapshots-per-micro-batch")),
      s"want the option named in the failure, got: ${msgs(e)}")
  }
}
